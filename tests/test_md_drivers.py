"""MD drivers: thermostat targets, barostat relaxation, EMT config-1 e2e."""

import numpy as np
import pytest

from autoforce_tpu import units
from autoforce_tpu.calculator.emt import EMT
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.md import BerendsenNPT, BerendsenNVT, Langevin
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities


def test_langevin_thermostat_reaches_target():
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s.calc = LennardJones(epsilon=0.15, sigma=2.3, rc=4.5)
    maxwell_boltzmann_velocities(s, 600, seed=0)
    dyn = Langevin(s, 2 * units.fs, temperature_K=300, friction=0.05, seed=1)
    dyn.run(150)
    temps = []

    def rec():
        temps.append(s.get_temperature())

    dyn.attach(rec)
    dyn.run(150)
    T = np.mean(temps)
    assert 200 < T < 420, T


def test_berendsen_nvt():
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s.calc = LennardJones(epsilon=0.15, sigma=2.3, rc=4.5)
    maxwell_boltzmann_velocities(s, 500, seed=2)
    dyn = BerendsenNVT(s, 2 * units.fs, temperature_K=250, taut=50 * units.fs)
    dyn.run(200)
    assert 150 < s.get_temperature() < 400


def test_berendsen_npt_relaxes_pressure():
    # start compressed: positive pressure must expand the cell
    s = bulk_fcc("Cu", 3.45).repeat((2, 2, 2))
    s.calc = LennardJones(epsilon=0.4, sigma=2.3, rc=5.0)
    maxwell_boltzmann_velocities(s, 100, seed=3)
    v0 = s.volume
    p0 = -np.mean(s.get_stress()[:3])
    dyn = BerendsenNPT(
        s, 2 * units.fs, temperature_K=100, pressure_GPa=0.0,
        taut=50 * units.fs, taup=200 * units.fs, compressibility=0.05,
    )
    dyn.run(150)
    p1 = -np.mean(s.get_stress()[:3])
    assert s.volume > v0  # expanded
    assert abs(p1) < abs(p0)  # pressure relaxed toward 0


def test_emt_cu_config1(tmp_path, monkeypatch):
    """BASELINE config 1: EMT Cu fcc 32-atom NVT MD with on-the-fly SGPR."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.calculator.active import ActiveCalculator

    emt = EMT()
    calc = ActiveCalculator(
        covariance=None, calculator=emt, logfile="active.log",
        pckl="model.pckl", tape="model.sgpr",
        kernel_kw=dict(cutoff=4.5, lmax=3, nmax=3),
        ediff=0.01, ediff_tot=0.03, fdiff=0.04, noise_f=0.005, seed=4,
    )
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s.rattle(0.05, seed=5)
    s.calc = calc
    maxwell_boltzmann_velocities(s, 300, seed=6)
    dyn = Langevin(s, 2 * units.fs, temperature_K=300, friction=0.02, seed=7)
    dyn.run(60)
    # the model must have learned EMT to good accuracy
    tmp_s = s.copy()
    tmp_s.calc = emt
    res = calc.calculate(s)
    f_mae = np.abs(res["forces"] - tmp_s.get_forces()).mean()
    e_err = abs(res["energy"] - tmp_s.get_potential_energy()) / len(s)
    assert f_mae < 0.06, f_mae
    assert e_err < 0.01, e_err
    # stress prediction sane
    st_err = np.abs(res["stress"] - tmp_s.get_stress()).max()
    assert st_err < 0.02, st_err


def test_socket_active_learning(tmp_path, monkeypatch):
    """Active learning with the oracle behind the socket protocol
    (ML and 'DFT' as separate processes, reference run.sh pattern)."""
    import threading

    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.calculator.socket import (
        Server,
        SocketCalculator,
        serve_request,
    )

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.0)
    port = 16790
    server = Server("localhost", port, callback=serve_request, args=(lj,))
    t = threading.Thread(target=server.listen, daemon=True)
    t.start()
    sc = SocketCalculator(port=port)
    import time

    for _ in range(50):
        try:
            sc.ping()
            break
        except (ConnectionRefusedError, OSError):
            time.sleep(0.1)

    calc = ActiveCalculator(
        covariance=None, calculator=sc, logfile=None, pckl=None, tape=None,
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2),
        ediff=0.05, fdiff=0.1, seed=8,
    )
    s = bulk_fcc("Cu", 3.6)
    s.rattle(0.04, seed=9)
    s.calc = calc
    maxwell_boltzmann_velocities(s, 200, seed=10)
    Langevin(s, 2 * units.fs, 200, friction=0.02, seed=11).run(10)
    assert calc.size[0] >= 1 and calc.size[1] >= 1
    sc.close()
    t.join(timeout=5)
