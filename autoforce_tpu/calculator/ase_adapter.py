"""Optional ASE interoperability (gated on ase being installed).

The framework is ASE-free, but real ASE users can plug the learned
potential into ASE dynamics: ``AseCalculatorAdapter`` wraps any of our
calculators as an ``ase.calculators.calculator.Calculator``; conversion
helpers map ase.Atoms <-> System.
"""

from __future__ import annotations

import numpy as np

from ..system import System

try:
    import ase
    from ase.calculators.calculator import Calculator, all_changes

    HAVE_ASE = True
except ImportError:  # pragma: no cover - ase absent in this image
    HAVE_ASE = False
    Calculator = object
    all_changes = None


def system_from_ase(atoms) -> System:
    s = System(
        numbers=atoms.numbers,
        positions=atoms.positions,
        cell=np.asarray(atoms.cell),
        pbc=atoms.pbc,
    )
    try:
        s.set_velocities(atoms.get_velocities())
    except Exception:
        pass
    return s


def system_to_ase(system):
    if not HAVE_ASE:
        raise ImportError("ase is not installed")
    atoms = ase.Atoms(
        numbers=system.numbers,
        positions=system.positions,
        cell=system.cell,
        pbc=system.pbc,
    )
    return atoms


class AseCalculatorAdapter(Calculator):
    """Wraps an autoforce_tpu calculator for use with ASE dynamics."""

    implemented_properties = ["energy", "forces", "stress", "free_energy"]

    def __init__(self, calc, **kwargs):
        if not HAVE_ASE:
            raise ImportError("ase is not installed")
        Calculator.__init__(self, **kwargs)
        self._calc = calc

    def calculate(self, atoms=None, properties=("energy",),
                  system_changes=all_changes):
        Calculator.calculate(self, atoms, properties, system_changes)
        res = self._calc.calculate(system_from_ase(self.atoms))
        self.results.update(res)
        self.results["free_energy"] = res["energy"]
