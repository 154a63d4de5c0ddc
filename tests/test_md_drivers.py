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
        taut=50 * units.fs, taup=200 * units.fs,  # default beta (1/bar)
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


def test_nose_hoover_nvt_canonical():
    """NHC must give <T>=target AND canonical fluctuations
    Var(T)/<T>^2 ~ 2/dof (Berendsen suppresses them) — VERDICT r1 #6."""
    from autoforce_tpu.md import NoseHooverNVT

    s = bulk_fcc("Ar", 5.26).repeat((3, 3, 3))  # 108 atoms
    s.calc = LennardJones(epsilon=0.0104, sigma=3.4, rc=8.0)
    maxwell_boltzmann_velocities(s, 60, seed=0)
    dyn = NoseHooverNVT(s, 4 * units.fs, temperature_K=60, tdamp=80 * units.fs)
    Ts, Es = [], []
    for _ in range(150):
        dyn.run(10)
        Ts.append(s.get_temperature())
        Es.append(dyn.conserved())
    Ts = np.array(Ts[30:])
    dof = 3 * len(s)
    assert abs(Ts.mean() - 60) < 5, Ts.mean()
    rel = Ts.std() / Ts.mean()
    canonical = np.sqrt(2.0 / dof)
    assert 0.5 * canonical < rel < 2.0 * canonical, (rel, canonical)
    # conserved quantity must be conserved (not with Berendsen-style decay)
    assert abs(Es[-1] - Es[0]) < 5e-3, (Es[0], Es[-1])


def test_mtk_npt_pressure_and_temperature():
    """MTK NPT: <P> -> target pressure, <T> -> target with canonical
    fluctuations, volume responds to pressure (VERDICT r1 'Real NPT')."""
    from autoforce_tpu.md import MTKNPT

    vols = {}
    for P in (0.0, 0.05):
        s = bulk_fcc("Ar", 5.26).repeat((3, 3, 3))
        s.calc = LennardJones(epsilon=0.0104, sigma=3.4, rc=8.0)
        maxwell_boltzmann_velocities(s, 60, seed=1)
        dyn = MTKNPT(s, 4 * units.fs, temperature_K=60, pressure_GPa=P,
                     tdamp=80 * units.fs, pdamp=400 * units.fs)
        Ps, Ts, Vs = [], [], []
        for _ in range(200):
            dyn.run(10)
            st = s.get_stress()
            m = s.get_masses()[:, None]
            v = s.get_velocities()
            pk = (m * v * v).sum() / 3.0 / s.volume
            Ps.append(-(st[0] + st[1] + st[2]) / 3.0 + pk)
            Ts.append(s.get_temperature())
            Vs.append(s.volume)
        Ps = np.array(Ps[70:]) / units.GPa
        Ts = np.array(Ts[70:])
        assert abs(Ps.mean() - P) < 0.02, (P, Ps.mean())
        assert abs(Ts.mean() - 60) < 6, Ts.mean()
        rel = Ts.std() / Ts.mean()
        canonical = np.sqrt(2.0 / (3 * len(s)))
        assert 0.4 * canonical < rel < 2.5 * canonical, (rel, canonical)
        vols[P] = np.mean(Vs[70:])
    assert vols[0.05] < vols[0.0]  # higher pressure -> smaller volume


def test_mtk_npt_mask_and_iso():
    """mask freezes strain components (reference ase NPT mask parity)."""
    from autoforce_tpu.md import MTKNPT

    s = bulk_fcc("Ar", 5.2).repeat((2, 2, 2))
    s.calc = LennardJones(epsilon=0.0104, sigma=3.4, rc=7.0)
    maxwell_boltzmann_velocities(s, 40, seed=2)
    cell0 = np.asarray(s.cell).copy()
    dyn = MTKNPT(s, 4 * units.fs, temperature_K=40, pressure_GPa=0.0,
                 tdamp=80 * units.fs, pdamp=300 * units.fs,
                 mask=np.array([1, 1, 0]))
    dyn.run(300)
    cell1 = np.asarray(s.cell)
    # z-axis frozen, x/y moved
    np.testing.assert_allclose(cell1[2], cell0[2], atol=1e-12)
    assert abs(cell1[0, 0] - cell0[0, 0]) > 1e-3


def test_cl_md_manual_steps_and_nh(tmp_path, monkeypatch):
    """cl.md manual warmup primes the model (rattle + cell scaling single
    points, reference cl/md.py:175-194) and the NPT path runs MTK."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu import cl as cline
    from autoforce_tpu.cl.md import md
    from autoforce_tpu.system import bulk_fcc as bfcc

    (tmp_path / "ARGS").write_text(
        "calculator = 'LJ'\n"
        "kernel_kw = dict(cutoff=4.0, lmax=2, nmax=2)\n"
        "ediff = 0.1\n"
        "fdiff = 0.2\n"
        "logfile = 'active.log'\n"
        "pckl = None\n"
        "tape = None\n"
    )
    cline.refresh()
    s = bfcc("Cu", 3.6).repeat((2, 2, 1))
    md(s, dynamics="NPT", tem=200.0, picos=-8, bulk_modulus=140.0,
       dt=2.0, ml_filter=0.0, eps_pos=0.03, eps_cell=0.03,
       trajectory="md.extxyz", loginterval=4)
    log = open("active.log").read()
    assert "manual steps:" in log
    assert "scale cell: 1.03" in log
    assert (tmp_path / "md.extxyz").exists()
