"""Water-dimer-style relax + NEB with a toy flexible-molecule oracle
(analog of the reference's water examples; no DFT needed)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))

import numpy as np

from autoforce_tpu.calculator.parametric import ParametricCalculator, get_lj_terms
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.opt import LBFGS, NEB, FIRE
from autoforce_tpu.opt.neb import interpolate_images
from autoforce_tpu.system import System

oracle = ParametricCalculator(
    get_lj_terms([(8, 8), (8, 1), (1, 1)], epsilon=0.2, sigma=1.8, rc=6.0,
                 trainable=False),
    rc=6.0,
)
calc = ActiveCalculator(calculator=oracle, stdout=True,
                        kernel_kw=dict(cutoff=6.0, lmax=3, nmax=3))

dimer = System(
    symbols=["O", "H", "H", "O", "H", "H"],
    positions=[
        [0, 0, 0], [0.96, 0, 0], [-0.3, 0.91, 0],
        [2.9, 0, 0], [3.6, 0.7, 0], [3.6, -0.7, 0],
    ],
)
dimer.calc = calc
LBFGS(dimer).run(fmax=0.05, steps=200)
print("relaxed energy:", dimer.get_potential_energy())

# NEB between the relaxed dimer and a swapped-orientation copy
last = dimer.copy()
last.positions = last.positions[[3, 4, 5, 0, 1, 2]]
images = interpolate_images(dimer, last, 7)
for im in images:
    im.calc = calc
band = NEB(images, climb=True)
FIRE(band, dt=0.05).run(fmax=0.1, steps=300)
print("barrier:", band.barrier())
