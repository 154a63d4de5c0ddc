"""Device-resident MD dispatch for cl.md (dynamics='DEVICE')."""

from ..md.device_md import DeviceMD
from .. import units


def run_device_md(atoms, calc, dt, temperature_K, friction, picos,
                  write_frame, loginterval, thermostat="auto", tdamp=None):
    steps = int(picos * 1000 / dt) if picos > 0 else int(-picos)
    dyn = DeviceMD(
        atoms, calc, dt * units.fs, temperature_K=temperature_K,
        friction=friction / units.fs, chunk=max(loginterval, 25),
        thermostat=thermostat,
        tdamp=tdamp * units.fs if tdamp else None,
    )
    done = 0
    while done < steps:
        n = min(max(loginterval, 25), steps - done)
        dyn.run(n)
        write_frame()
        done += n
