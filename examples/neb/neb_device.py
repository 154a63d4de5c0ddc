"""On-chip NEB: the whole band (all images' forces in one replica-batched
evaluation, improved tangents, springs, climbing image, band FIRE) runs
inside one jitted device loop (opt/device_neb.py), with on-the-fly
learning on uncertainty trips."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), "..", ".."))
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.opt import DeviceNEB
from autoforce_tpu.opt.neb import interpolate_images
from autoforce_tpu.system import bulk_fcc

lj = LennardJones(epsilon=0.5, sigma=2.2, rc=4.5)
calc = ActiveCalculator(calculator=lj, stdout=True,
                        kernel_kw=dict(cutoff=4.5, lmax=3, nmax=3))
first = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
first.rattle(0.05, seed=1)
last = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
last.rattle(0.05, seed=2)
for im in (first, last):
    im.calc = calc
images = interpolate_images(first, last, 7)
band = DeviceNEB(images, calc, k=0.1, climb=True, dt=0.05)
band.run(fmax=0.05, steps=300)
print("barrier:", band.barrier())
