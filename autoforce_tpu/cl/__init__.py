"""Command-line layer (counterpart of theforce/cl/__init__.py).

Reads an ``ARGS`` file from the working directory — one
``key = value`` python expression per line, ``#`` comments — and exposes
:func:`gen_active_calc` which merges ARGS over the ActiveCalculator's
signature defaults.  ``calculator=`` accepts 'EMT' | 'LJ' | 'ZERO' |
'VASP' | path-to-script.py; predefined names map to oracle scripts served
over the socket-calculator protocol — or run in-process when
``inprocess=True`` (the default here, since a single TPU host usually
wants the oracle in the same process unless it is real DFT).
"""

from __future__ import annotations

import inspect
import os

from ..calculator.active import ActiveCalculator

# unit names available inside ARGS expressions (the reference imports
# kcal_mol into its cl namespace for exactly this, theforce/cl/__init__.py:16);
# make_mesh so `mesh = make_mesh(data=8)` works from an ARGS file
from ..parallel import make_mesh  # noqa: F401
from ..units import GPa, bar, fs, kB, kcal_mol  # noqa: F401


def strip(line):
    if "#" in line:
        line = line[: line.index("#")]
    return line.strip()


def read_args(path="ARGS"):
    args = {}
    if os.path.isfile(path):
        lines = [strip(line) for line in open(path).readlines()]
        lines = ",".join(filter("".__ne__, lines))
        args.update(eval(f"dict({lines})"))  # noqa: S307 (reference format)
    return args


def _calc_script(name):
    if name.endswith(".py"):
        return name
    caps = name.upper()
    from ..calculator import scripts

    base = os.path.dirname(scripts.__file__)
    table = {
        "EMT": "emt.py",
        "LJ": "lj.py",
        "ZERO": "zero.py",
    }
    if caps in table:
        return os.path.join(base, table[caps])
    if caps == "VASP":
        from ..calculator import vasp

        return vasp.__file__
    if caps == "GAUSSIAN":
        from ..calculator import gaussian

        return gaussian.__file__
    raise RuntimeError(f"calculator {caps} is not implemented")


def resolve_calculator(value, inprocess=True):
    if value is None or not isinstance(value, str):
        return value
    script = _calc_script(value)
    if inprocess:
        from ..calculator.socket import get_scope

        return get_scope(script)["calc"]
    from ..calculator.socket import SocketCalculator

    return SocketCalculator(script=script)


ARGS = {}


def refresh(path="ARGS"):
    """(Re)read the ARGS file from the current working directory."""
    ARGS.clear()
    ARGS.update(read_args(path))
    if "calculator" in ARGS and ARGS["calculator"] is not None:
        ARGS["calculator"] = resolve_calculator(
            ARGS["calculator"], inprocess=ARGS.pop("inprocess", True)
        )
    return ARGS


refresh()


def get_default_args(func):
    sig = inspect.signature(func)
    return {
        k: v.default
        for k, v in sig.parameters.items()
        if v.default is not inspect.Parameter.empty
    }


def update_args(kwargs, source=None):
    if source is None:
        source = ARGS
    for kw in kwargs:
        if kw in source:
            kwargs[kw] = source[kw]


def gen_active_calc(**over):
    kwargs = get_default_args(ActiveCalculator.__init__)
    update_args(kwargs)
    update_args(kwargs, source=over)
    return ActiveCalculator(**kwargs)
