"""MLMD driver: ``python -m autoforce_tpu.cl.md -i POSCAR``
(counterpart of theforce/cl/md.py)."""

from __future__ import annotations

import numpy as np

from .. import cl as cline
from .. import units
from ..calculator.active import FilterDeltas
from ..io.xyz import write_xyz
from ..md import BerendsenNPT, BerendsenNVT, Langevin
from ..system import maxwell_boltzmann_velocities


def md(
    atoms,
    dynamics="NPT",
    dt=None,
    tem=300.0,
    picos=100,
    bulk_modulus=None,
    stress=0.0,
    iso=False,
    trajectory="md.extxyz",
    loginterval=1,
    append=False,
    rattle=0.0,
    tdamp=25,
    pdamp=100,
    friction=1e-3,
    ml_filter=0.8,
):
    """MD with on-the-fly learning.  tem may be a list (temperature ladder);
    picos > 0 -> duration in ps, picos < 0 -> -picos steps."""
    calc = cline.gen_active_calc()
    atoms.calc = calc
    if rattle:
        atoms.rattle(rattle)

    temperatures = tem if hasattr(tem, "__iter__") else [tem]
    maxwell_boltzmann_velocities(atoms, temperatures[0])
    atoms.get_potential_energy()

    if dt is None:
        dt = 0.25 if (np.asarray(atoms.numbers) == 1).any() else 1.0

    target = atoms
    if ml_filter:
        filt = FilterDeltas(calc, shrink=ml_filter)
        atoms.calc = filt

    mode = "a" if append else "w"
    frames = {"mode": mode}

    def write_frame():
        from ..system import SinglePointCalculator

        snap = atoms.copy()
        snap.calc = SinglePointCalculator(snap, **calc.results)
        write_xyz(trajectory, snap, mode=frames["mode"])
        frames["mode"] = "a"

    for T in temperatures:
        if dynamics.upper() == "NPT" and bulk_modulus is not None:
            dyn = BerendsenNPT(
                atoms,
                dt * units.fs,
                temperature_K=T,
                pressure_GPa=stress,
                taut=tdamp * units.fs,
                taup=pdamp * units.fs,
                isotropic=iso,
            )
        elif dynamics.upper() == "LANGEVIN":
            dyn = Langevin(
                atoms, dt * units.fs, temperature_K=T, friction=friction / units.fs
            )
        elif dynamics.upper() == "DEVICE":
            from .device_wrap import run_device_md

            run_device_md(atoms, calc, dt, T, friction, picos, write_frame,
                          loginterval)
            continue
        else:
            dyn = BerendsenNVT(
                atoms, dt * units.fs, temperature_K=T, taut=tdamp * units.fs
            )
        dyn.attach(write_frame, loginterval)
        if calc.meta is not None:
            dyn.attach(calc.meta.update)
        steps = int(picos * 1000 / dt) if picos > 0 else int(-picos)
        dyn.run(steps)
    return atoms


def main():
    import argparse

    from ..io.poscar import read_structure

    parser = argparse.ArgumentParser(description="Machine-learning MD")
    parser.add_argument("-i", "--input", default="POSCAR")
    args = parser.parse_args()
    atoms = read_structure(args.input)
    kwargs = cline.get_default_args(md)
    cline.update_args(kwargs)
    md(atoms, **kwargs)


if __name__ == "__main__":
    main()
