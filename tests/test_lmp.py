"""LAMMPS driver: input parsing + the fix-external callback protocol with
a mocked lammps handle (reference theforce/cl/lmp.py:8-113 semantics),
including unit and virial conversions."""

import numpy as np
import pytest

from autoforce_tpu import units
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.cl.lmp import (
    NKTV2P,
    LammpsDriver,
    LammpsScript,
    read_lammps_file,
)
from autoforce_tpu.system import bulk_fcc

SCRIPT = """
# a comment
units {units}
atom_style atomic
#AutoForce atomic_numbers={{1: 29, 2: 79}}
read_data data.cu   # trailing comment
fix AutoForce all external pf/callback 1 1
run 100
"""


def test_parse_script(tmp_path):
    p = tmp_path / "in.lammps"
    p.write_text(SCRIPT.format(units="metal"))
    s = LammpsScript.parse(p)
    assert s.units == "metal"
    assert s.atomic_numbers == {1: 29, 2: 79}
    assert s.fix_id == "AutoForce"
    assert s.commands[s.fix_index].startswith("fix AutoForce all external")
    # comments stripped, blank lines dropped
    assert all(c == c.strip() and "#" not in c for c in s.commands)
    # back-compat tuple view
    u, table, fid, fidx, cmds = read_lammps_file(p)
    assert (u, table, fid, fidx) == ("metal", {1: 29, 2: 79}, "AutoForce",
                                     s.fix_index)


def test_parse_script_errors(tmp_path):
    p = tmp_path / "bad.lammps"
    p.write_text("units metal\nrun 1\n")
    with pytest.raises(RuntimeError, match="fix AutoForce"):
        LammpsScript.parse(p)
    p.write_text("units metal\nfix AutoForce all external pf/callback 1 1\n")
    with pytest.raises(RuntimeError, match="atomic_numbers"):
        LammpsScript.parse(p)


class FakeLammps:
    """Minimal mocked lammps python handle (protocol surface only)."""

    def __init__(self, system):
        self.system = system
        self.pushed = {}

    def extract_box(self):
        c = np.asarray(self.system.cell)
        assert np.allclose(c, np.triu(c)), "fake box assumes upper-tri cell"
        boxlo = (0.0, 0.0, 0.0)
        boxhi = (c[0, 0], c[1, 1], c[2, 2])
        # LAMMPS tilt: xy, yz, xz
        return boxlo, boxhi, c[0, 1], c[1, 2], c[0, 2], self.system.pbc, None

    def gather_atoms(self, name, t, count):
        if name == "x":
            return self.system.positions.reshape(-1).copy()
        if name == "type":
            return np.ones(len(self.system), dtype=int)
        raise KeyError(name)

    def fix_external_set_energy_global(self, fix_id, e):
        self.pushed["energy"] = (fix_id, float(e))

    def fix_external_set_virial_global(self, fix_id, v):
        self.pushed["virial"] = (fix_id, np.asarray(v).copy())


@pytest.mark.parametrize("lmp_units", ["metal", "real"])
def test_callback_pushes_converted_results(lmp_units):
    """The callback must return forces/energy/virial in LAMMPS units:
    metal = eV/A (identity), real = kcal/mol(/A), virial in P*V with the
    LAMMPS nktv2p pressure convention and Voigt order xx yy zz xy xz yz."""
    s = bulk_fcc("Cu", 3.6).repeat((2, 1, 1))
    s.rattle(0.03, seed=0)
    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.0)
    s.calc = lj

    e_ref = s.get_potential_energy()
    f_ref = s.get_forces()
    stress_ref = s.get_stress()

    # LAMMPS-side state in LAMMPS distance units (metal/real: Angstrom)
    fake = FakeLammps(s.copy())
    driver = LammpsDriver(fake, lj, lmp_units, {1: 29}, "AutoForce")
    n = len(s)
    tag = np.arange(1, n + 1)  # LAMMPS tags are 1-based
    fext = np.zeros((n, 3))
    driver(None, 0, n, tag, None, fext)

    kcal = 0.0433641
    efac = 1.0 if lmp_units == "metal" else kcal
    assert fake.pushed["energy"][0] == "AutoForce"
    np.testing.assert_allclose(fake.pushed["energy"][1] * efac, e_ref,
                               rtol=1e-9)
    np.testing.assert_allclose(fext * efac, f_ref, atol=1e-9)

    # virial: v = -stress * vol / nktv2p, order xx yy zz xy xz yz
    vol = s.volume
    expect = -stress_ref * vol / NKTV2P[lmp_units]
    expect = expect[[0, 1, 2, 5, 4, 3]]
    np.testing.assert_allclose(fake.pushed["virial"][1], expect, atol=1e-12)

    # permuted tags must permute forces accordingly
    perm = np.random.default_rng(1).permutation(n)
    fext2 = np.zeros((n, 3))
    driver(None, 1, n, perm + 1, None, fext2)
    np.testing.assert_allclose(fext2 * efac, f_ref[perm], atol=1e-9)
