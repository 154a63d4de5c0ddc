"""LAMMPS-driven MLMD via fix external pf/callback
(counterpart of theforce/cl/lmp.py).

The LAMMPS input script must contain
    #AutoForce atomic_numbers={1: 29, ...}
    fix AutoForce all external pf/callback 1 1
LAMMPS calls back into python each step; positions are gathered, the ML
calculator predicts, and energy/forces/virial are pushed back.  Gated on
the ``lammps`` python module being importable.
"""

from __future__ import annotations

import numpy as np

from ..system import System

NKTV2P = {
    "lj": 1.0,
    "real": 68568.415,
    "metal": 1.6021765e6,
    "si": 1.0,
    "cgs": 1.0,
    "electron": 2.94210108e13,
    "micro": 1.0,
    "nano": 1.0,
}

# unit conversion factors LAMMPS-unit-system -> eV/Angstrom
_DIST = {"metal": 1.0, "real": 1.0}
_ENERGY = {"metal": 1.0, "real": 0.0433641}  # kcal/mol -> eV
_FORCE = {"metal": 1.0, "real": 0.0433641}


def read_lammps_file(file):
    commands = []
    units = "metal"
    fixID = None
    fixIndex = None
    scope = {}
    for line in open(file):
        if line.lower().startswith("#autoforce"):
            exec(line[10:].strip(), scope)  # noqa: S102 (reference convention)
            continue
        if "#" in line:
            line = line[: line.index("#")]
        line = " ".join(line.split())
        if not line:
            continue
        if line.startswith("units"):
            units = line.split()[1]
        if line.lower().startswith("fix autoforce"):
            fixID = line.split()[1]
            fixIndex = len(commands)
        commands.append(line)
    if fixID is None:
        raise RuntimeError("no fix AutoForce in the input script!")
    return units, scope["atomic_numbers"], fixID, fixIndex, commands


class LammpsDriver:
    def __init__(self, lmp, calc, units, map_numbers, fixID):
        self.lmp = lmp
        self.calc = calc
        self.units = units
        self.map_numbers = map_numbers
        self.fixID = fixID
        self.system = None

    def get_cell(self):
        boxlo, (xhi, yhi, zhi), xy, yz, xz, pbc, _ = self.lmp.extract_box()
        cell = np.array([[xhi, xy, xz], [0.0, yhi, yz], [0.0, 0.0, zhi]])
        return cell * _DIST.get(self.units, 1.0), pbc

    def __call__(self, caller, ntimestep, nlocal, tag, pos, fext):
        lmp = self.lmp
        cell, pbc = self.get_cell()
        xyz = np.array(lmp.gather_atoms("x", 1, 3)).reshape(-1, 3)
        xyz = xyz * _DIST.get(self.units, 1.0)
        if self.system is None:
            types = np.array(lmp.gather_atoms("type", 0, 1))
            numbers = [self.map_numbers[t] for t in types]
            self.system = System(
                numbers=numbers, positions=xyz, cell=cell, pbc=pbc
            )
            self.system.calc = self.calc
        else:
            self.system.set_cell(cell)
            self.system.set_positions(xyz)
        f = self.system.get_forces()[tag - 1]
        e = self.system.get_potential_energy()
        fext[:] = f / _FORCE.get(self.units, 1.0)
        lmp.fix_external_set_energy_global(
            self.fixID, e / _ENERGY.get(self.units, 1.0)
        )
        try:
            v = self.system.get_stress()
            vol = self.system.volume
            v = -v / (NKTV2P[self.units] / vol)
            v = np.array([v[0], v[1], v[2], v[5], v[4], v[3]])
            lmp.fix_external_set_virial_global(self.fixID, v)
        except Exception:
            pass


def main():
    import argparse

    try:
        from lammps import lammps
    except ImportError as e:
        raise SystemExit(
            "the 'lammps' python module is required for the LAMMPS driver"
        ) from e

    from .. import cl as cline

    parser = argparse.ArgumentParser(description="MLMD driven by LAMMPS")
    parser.add_argument("-i", "--input", default="in.lammps")
    args = parser.parse_args()
    units, map_numbers, fixID, fixIndex, commands = read_lammps_file(args.input)
    lmp = lammps()
    calc = cline.gen_active_calc()
    driver = LammpsDriver(lmp, calc, units, map_numbers, fixID)
    lmp.commands_list(commands[: fixIndex + 1])
    lmp.set_fix_external_callback(fixID, driver)
    lmp.commands_list(commands[fixIndex + 1 :])


if __name__ == "__main__":
    main()
