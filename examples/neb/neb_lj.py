"""NEB barrier with a pre-trained ML model (LJ oracle)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.opt import FIRE, NEB
from autoforce_tpu.opt.neb import interpolate_images
from autoforce_tpu.system import System

lj = LennardJones(epsilon=0.5, sigma=2.2, rc=6.0)
calc = ActiveCalculator(calculator=lj, stdout=True,
                        kernel_kw=dict(cutoff=6.0, lmax=3, nmax=3))
first = System(numbers=[29] * 3, positions=[[0, 0, 0], [2.5, 0, 0], [5.0, 0, 0]])
last = first.copy()
last.positions = last.positions[::-1]
images = interpolate_images(first, last, 7)
for im in images:
    im.calc = calc
band = NEB(images, climb=True)
FIRE(band, dt=0.05).run(fmax=0.05, steps=300)
print("barrier:", band.barrier())
