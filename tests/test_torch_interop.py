"""Binary interop with the reference's torch-pickled model folders.

The fixture is FABRICATED in the reference's exact on-disk layout
(theforce/regression/gppotential.py:1060-1119 to_folder/save): a
``model`` file holding a torch pickle of a ``PosteriorPotential`` whose
``X.X`` are ``Local`` objects (theforce/descriptor/atoms.py:36-56
attribute layout) and whose ``_raw_data`` are ``ase.Atoms`` carrying
SinglePointCalculator results (atoms.py:524-534 as_ase), plus the
``cutoff`` / ``gp`` / ``info`` / ``stats`` text files (gp emission
grammar: gppotential.py:418-437 + similarity/universal.py:74-85).
theforce/ase are not installed here, so the pickled class paths are
registered as throwaway modules ONLY while writing the fixture — the
loader must then read it back with no trace of them.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.io.torch_interop import (load_reference_folder,
                                            parse_state_string,
                                            read_reference_folder)
from autoforce_tpu.neighbors import displacements, neighbor_table
from autoforce_tpu.system import bulk_fcc

RC = 4.5

GP_STATE = (
    "GaussianProcessPotential([UniversalSoapKernel(3, 3, 4, PolyCut(4.5),"
    " atomic_unit=None, chemical=DiracDeltaChemical(), normalize=True,"
    " a=None, a_not=[])], noise=Positive(signal=tensor(0.0100),"
    " requires_grad=True), parametric=AutoMean())"
)


class _FakeModules:
    """Temporarily register pickled class paths as real modules so the
    fixture can be torch.save'd by reference; removed on exit so the
    loader cannot possibly import them."""

    _paths = (
        "theforce", "theforce.regression",
        "theforce.regression.gppotential",
        "theforce.descriptor", "theforce.descriptor.atoms",
        "ase", "ase.atoms", "ase.cell",
        "ase.calculators", "ase.calculators.singlepoint",
    )

    def __enter__(self):
        self._added = []
        for path in self._paths:
            if path not in sys.modules:
                mod = types.ModuleType(path)
                sys.modules[path] = mod
                self._added.append(path)
                parent, _, leaf = path.rpartition(".")
                if parent:
                    setattr(sys.modules[parent], leaf, mod)
        self.cls = {}
        for module, name in (
            ("theforce.regression.gppotential", "PosteriorPotential"),
            ("theforce.regression.gppotential",
             "GaussianProcessPotential"),
            ("theforce.descriptor.atoms", "LocalsData"),
            ("theforce.descriptor.atoms", "Local"),
            ("ase.atoms", "Atoms"),
            ("ase.cell", "Cell"),
            ("ase.calculators.singlepoint", "SinglePointCalculator"),
        ):
            cls = type(name, (), {"__module__": module})
            setattr(sys.modules[module], name, cls)
            self.cls[name] = cls
        return self

    def __exit__(self, *exc):
        for path in self._added:
            sys.modules.pop(path, None)
        return False

    def make(self, name, **attrs):
        obj = object.__new__(self.cls[name])
        obj.__dict__.update(attrs)
        return obj


def _labelled_systems():
    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=RC)
    out = []
    for seed in (3, 4):
        s = bulk_fcc("Cu", 3.6).repeat((2, 2, 1))
        s.rattle(0.06, seed=seed)
        s.calc = lj
        out.append((s, s.get_potential_energy(), s.get_forces()))
    return out


def write_fixture_folder(folder):
    """Fabricate <folder>/{model,cutoff,gp,info,stats} in the
    reference's emission format.  Returns the ground truth
    (energies, forces, LCE arrays) for later comparison."""
    os.makedirs(folder, exist_ok=True)
    systems = _labelled_systems()
    s0 = systems[0][0]
    t = neighbor_table(s0.positions, s0.cell, s0.pbc, RC)
    r = displacements(s0.positions, s0.cell, t)

    truth = {"energies": [], "lce": []}
    with _FakeModules() as fm:
        locals_list = []
        for i in range(10):
            m = t.mask[i]
            j = np.asarray(t.idx[i][m], dtype=np.int64)
            rv = np.asarray(r[i][m], dtype=np.float64)
            b = s0.numbers[j].astype(np.int64)
            a = int(s0.numbers[i])
            locals_list.append(fm.make(
                "Local",
                index=i, number=a,
                _i=torch.from_numpy(np.full_like(j, i)),
                _j=torch.from_numpy(j),
                _a=torch.from_numpy(np.full_like(b, a)),
                _b=torch.from_numpy(b),
                _r=torch.from_numpy(rv),
                _m=torch.ones(len(j), dtype=torch.bool),
                off=None, _d=None, _argsort=None,
            ))
            truth["lce"].append((a, rv.copy(), b.copy()))
        X = fm.make("LocalsData", X=locals_list, trainable=False)

        raw = []
        for k, (s, e, f) in enumerate(systems):
            spc = fm.make(
                "SinglePointCalculator",
                results={"energy": float(e),
                         "free_energy": float(e),
                         "forces": torch.from_numpy(np.asarray(f))},
                atoms=None,
            )
            arrays = {"numbers": s.numbers.astype(np.int64),
                      "positions": s.positions.copy()}
            if k == 0:
                arrays["momenta"] = np.zeros((len(s), 3))
            # both ase pickle layouts must load: modern (_cellobj/_pbc)
            # and plain attribute names
            if k == 0:
                cellkw = dict(
                    _cellobj=fm.make("Cell", array=np.asarray(s.cell)),
                    _pbc=np.asarray(s.pbc, dtype=bool))
            else:
                cellkw = dict(cell=np.asarray(s.cell),
                              pbc=np.asarray(s.pbc, dtype=bool))
            raw.append(fm.make("Atoms", arrays=arrays, info={},
                               calc=spc, **cellkw))
            truth["energies"].append(float(e))

        gp = fm.make("GaussianProcessPotential",
                     _parameters={}, _buffers={}, _modules={},
                     training=False)
        pp = fm.make("PosteriorPotential",
                     X=X, _raw_data=raw, gp=gp,
                     cutoff=RC,
                     mu=torch.zeros(len(locals_list), dtype=torch.float64))
        torch.save(pp, os.path.join(folder, "model"))

    with open(os.path.join(folder, "cutoff"), "w") as f:
        f.write(f"{RC}\n")
    with open(os.path.join(folder, "gp"), "w") as f:
        f.write("\n#flag: \n")
        f.write(GP_STATE + "\n")
    with open(os.path.join(folder, "info"), "w") as f:
        f.write(f"data: {len(systems)}, inducing: 10\n")
    with open(os.path.join(folder, "stats"), "w") as f:
        f.write("ediff -> mean: 0.0 std: 0.0  fdiff -> mean: 0.0 "
                "std: 0.0  R2: 1.0\n")
    return truth


def test_parse_state_string():
    tree = parse_state_string(GP_STATE)
    assert tree["name"] == "GaussianProcessPotential"
    kern = tree["args"][0][0]
    assert kern["name"] == "UniversalSoapKernel"
    assert kern["args"][:3] == [3, 3, 4]
    noise = tree["kwargs"]["noise"]
    assert noise["kwargs"]["signal"] == pytest.approx(0.01)


def test_read_reference_folder(tmp_path):
    folder = str(tmp_path / "refmodel.pckl")
    truth = write_fixture_folder(folder)
    assert not any(m.startswith(("theforce", "ase"))
                   for m in sys.modules), "fixture modules leaked"

    items, meta = read_reference_folder(folder)
    assert meta["cutoff"] == pytest.approx(RC)
    assert meta["noise"] == pytest.approx(0.01)
    assert (meta["lmax"], meta["nmax"], meta["exponent"]) == (3, 3, 4)

    atoms = [o for c, o in items if c == "atoms"]
    envs = [o for c, o in items if c == "local"]
    assert len(atoms) == 2 and len(envs) == 10

    # extraction is VERBATIM: energies/forces/LCE arrays byte-match
    for s, e in zip(atoms, truth["energies"]):
        assert s.calc.results["energy"] == pytest.approx(e)
        assert s.calc.results["forces"].shape == (len(s), 3)
        assert s.pbc.all() and np.asarray(s.cell).any()
    for env, (a, rv, b) in zip(envs, truth["lce"]):
        assert env.number == a
        np.testing.assert_array_equal(env.numbers, b)
        np.testing.assert_allclose(env.rvec, rv, atol=0)


def test_load_reference_folder_retrains(tmp_path):
    folder = str(tmp_path / "refmodel.pckl")
    write_fixture_folder(folder)
    model = load_reference_folder(folder)
    assert model.m == 10 and model.ndata == 2

    # the refit model must actually predict the folder's FP data
    from autoforce_tpu.calculator.active import ActiveCalculator

    calc = ActiveCalculator(covariance=model, calculator=None,
                            logfile=None, pckl=None, tape=None)
    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=RC)
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 1))
    s.rattle(0.06, seed=3)
    s.calc = calc
    e_ml, f_ml = s.get_potential_energy(), s.get_forces()
    s_ref = s.copy()
    s_ref.calc = lj
    # loose bars: 10 inducing / 2 records is a deliberately tiny model —
    # this asserts the refit plumbing produces a working potential, not
    # converged accuracy
    assert abs(e_ml - s_ref.get_potential_energy()) / len(s) < 2e-2
    assert np.abs(f_ml - s_ref.get_forces()).mean() < 0.2


def test_include_folder(tmp_path, monkeypatch):
    folder = str(tmp_path / "refmodel.pckl")
    write_fixture_folder(folder)
    monkeypatch.chdir(tmp_path)

    from autoforce_tpu.calculator.active import ActiveCalculator

    calc = ActiveCalculator(covariance=None, calculator=None,
                            logfile=None, pckl=None, tape=None,
                            kernel_kw=dict(cutoff=RC, lmax=3, nmax=3))
    calc.include_folder(folder)
    # items replay through the sampling policy (same as include_tape):
    # the model must have learned, but a structure the model already
    # predicts within threshold is legitimately not re-added
    ndata, m = calc.size
    assert ndata >= 1 and m > 0
