"""End-to-end on-the-fly learning: LJ-oracle MD (the round-1 minimum slice).

Mirrors the reference's EMT-driven examples (examples/active/) with the
in-repo LJ oracle: an ActiveCalculator learns the PES during Langevin MD
and its predictions converge to the oracle.
"""

import os

import numpy as np
import pytest

from autoforce_tpu import units
from autoforce_tpu.calculator.active import ActiveCalculator
from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.md import Langevin
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities


def make_calc(tmp, **kw):
    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.5)
    kw.setdefault("kernel_kw", dict(cutoff=4.5, lmax=3, nmax=3))
    kw.setdefault("ediff", 0.02)
    kw.setdefault("ediff_tot", 0.05)
    kw.setdefault("fdiff", 0.06)
    kw.setdefault("noise_f", 0.01)
    calc = ActiveCalculator(
        covariance=None,
        calculator=lj,
        logfile=os.path.join(tmp, "active.log"),
        pckl=os.path.join(tmp, "model.pckl"),
        tape=os.path.join(tmp, "model.sgpr"),
        **kw,
    )
    return calc, lj


@pytest.fixture(scope="module")
def otf_run(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("otf"))
    calc, lj = make_calc(tmp)
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))  # 32 atoms
    s.rattle(0.05, seed=0)
    s.calc = calc
    maxwell_boltzmann_velocities(s, 300.0, seed=1)
    dyn = Langevin(s, dt=2 * units.fs, temperature_K=300, friction=0.01, seed=2)
    dyn.run(50)
    return tmp, calc, lj, s


def test_model_grows(otf_run):
    tmp, calc, lj, s = otf_run
    ndata, m = calc.size
    assert ndata >= 1
    assert m >= 2
    assert os.path.isfile(os.path.join(tmp, "active.log"))
    assert os.path.isfile(os.path.join(tmp, "model.sgpr"))
    assert os.path.isdir(os.path.join(tmp, "model.pckl"))


def test_prediction_accuracy(otf_run):
    tmp, calc, lj, s = otf_run
    res = calc.calculate(s)
    tmp_s = s.copy()
    tmp_s.calc = lj
    e_ref = tmp_s.get_potential_energy()
    f_ref = tmp_s.get_forces()
    f_mae = np.abs(res["forces"] - f_ref).mean()
    e_err = abs(res["energy"] - e_ref) / len(s)
    assert f_mae < 0.15, f_mae
    assert e_err < 0.02, e_err


def test_energy_conservation_scale(otf_run):
    """Forces must be the exact gradient of the predicted energy: short NVE
    drift should be tiny."""
    from autoforce_tpu.md import VelocityVerlet

    tmp, calc, lj, s = otf_run
    s2 = s.copy()
    # inference only (no more learning)
    calc2 = ActiveCalculator(
        covariance=os.path.join(tmp, "model.pckl"),
        calculator=None,
        logfile=None,
        pckl=None,
        tape=None,
    )
    s2.calc = calc2
    maxwell_boltzmann_velocities(s2, 150.0, seed=3)
    e0 = s2.get_potential_energy() + s2.get_kinetic_energy()
    dyn = VelocityVerlet(s2, dt=2 * units.fs)
    dyn.run(20)
    e1 = s2.get_potential_energy() + s2.get_kinetic_energy()
    assert abs(e1 - e0) / len(s2) < 5e-3, (e0, e1)


def test_persistence_roundtrip(otf_run):
    tmp, calc, lj, s = otf_run
    from autoforce_tpu.io.model_io import load_model, save_model

    folder = os.path.join(tmp, "model2.pckl")
    save_model(calc.model, folder)
    model2 = load_model(folder)
    assert model2.size == calc.model.size
    np.testing.assert_allclose(model2.M, calc.model.M, atol=1e-8)
    np.testing.assert_allclose(model2.mu, calc.model.mu, atol=1e-8)
    calc2 = ActiveCalculator(
        covariance=model2, calculator=None, logfile=None, pckl=None, tape=None
    )
    res2 = calc2.calculate(s.copy())
    res1 = calc.calculate(s.copy())
    np.testing.assert_allclose(res2["energy"], res1["energy"], rtol=1e-6)
    np.testing.assert_allclose(res2["forces"], res1["forces"], atol=1e-6)


def test_tape_rebuild(otf_run):
    """cl.build analog: reconstruct a model from the .sgpr tape."""
    tmp, calc, lj, s = otf_run
    calc2 = ActiveCalculator(
        covariance=None,
        calculator=None,
        logfile=None,
        pckl=None,
        tape=os.path.join(tmp, "model.sgpr"),
        kernel_kw=dict(cutoff=4.5, lmax=3, nmax=3),
    )
    calc2.build()
    assert calc2.size[1] > 0
    assert calc2.size[0] >= 1
    res2 = calc2.calculate(s.copy())
    tmp_s = s.copy()
    tmp_s.calc = lj
    f_ref = tmp_s.get_forces()
    assert np.abs(res2["forces"] - f_ref).mean() < 0.3


def test_switch():
    from autoforce_tpu.calculator.active import Switch

    s = Switch([0.01, 1.0, 0.05, 3.0, 0.1])
    assert s(0.5) == 0.01
    assert s(2.0) == 0.05
    assert s(5.0) == 0.1
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        Switch([0.1, 3.0, 0.2, 1.0, 0.3])  # unordered switch points


def test_filter_deltas_smooths_updates(otf_run):
    from autoforce_tpu.calculator.active import FilterDeltas

    tmp, calc, lj, s = otf_run
    filt = FilterDeltas(calc, shrink=0.9)
    s2 = s.copy()
    res = filt.calculate(s2)
    assert np.isfinite(res["forces"]).all()
    # without model updates the filter decays to a passthrough
    calc.deltas = {"forces": np.ones_like(res["forces"]), "stress": np.zeros(6)}
    r1 = filt.calculate(s2)
    calc.deltas = None
    prev = np.abs(filt.f).max()
    for _ in range(5):
        filt.calculate(s2)
        cur = np.abs(filt.f).max()
        assert cur <= prev + 1e-12
        prev = cur


def test_veto(otf_run):
    tmp, calc, lj, s = otf_run
    calc._veto = {"forces": 1e-9}
    calc.results = {"forces": np.ones((len(s), 3))}
    if calc.size[0] < 2:
        # guard: with <2 data the update is never vetoed (active.py:538-540)
        assert calc.veto() is False
        calc.model.data.append(calc.model.data[0])  # fake second record
        try:
            assert calc.veto() is True
        finally:
            calc.model.data.pop()
    else:
        assert calc.veto() is True
    calc._veto = {}
    assert calc.veto() is False


def test_pimd_first_bead_sampling(tmp_path, monkeypatch):
    """nbeads > 1: only the first bead of each ring-polymer step triggers
    sampling (reference active.py:477-491)."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.calculator.oracles import LennardJones
    from autoforce_tpu.system import bulk_fcc

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=4.0)
    calls = {"n": 0}

    class Counting(ActiveCalculator):
        def update(self, **kw):
            calls["n"] += 1
            return super().update(**kw)

    calc = Counting(
        covariance=None, calculator=lj, logfile=None, pckl=None, tape=None,
        kernel_kw=dict(cutoff=4.0, lmax=2, nmax=2), nbeads=4, seed=0,
    )
    s = bulk_fcc("Cu", 3.6)
    s.rattle(0.04, seed=1)
    rng = np.random.default_rng(2)
    for k in range(8):  # 8 "bead" evaluations = 2 ring-polymer steps
        t = s.copy()
        t.positions = t.positions + rng.normal(0, 0.01, t.positions.shape)
        calc.calculate(t)
    # beads 1, 5 are first beads (step+1) % 4 == 1 -> 2 update calls
    assert calls["n"] == 2, calls


def test_kpad_min_floor(tmp_path):
    """kpad_min pre-sizes the neighbor bucket (rounded to the 16-slot
    grid) and the first config honors it — mid-run bucket growth in
    drift-prone runs costs a recompile, so the floor must stick."""
    from autoforce_tpu.system import bulk_fcc

    calc, lj = make_calc(str(tmp_path), kpad_min=100)
    assert calc._kpad == 112  # rounded up to the bucket grid
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s.calc = calc
    s.get_potential_energy()
    assert calc.cfg.nbr_idx.shape[1] >= 112


def test_inference_mode_beta_without_cov(tmp_path):
    """Inference-only predict skips the covariance fetch and serves beta
    from the device (packed-transfer path); covloss logging and the
    uncertain-save trigger still work."""
    from autoforce_tpu.system import bulk_fcc

    tmp = str(tmp_path)
    calc, lj = make_calc(tmp)
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s.rattle(0.05, seed=0)
    s.calc = calc
    s.get_potential_energy()  # learn a bit
    # reload as inference-only (no oracle)
    calc2 = ActiveCalculator(
        covariance=os.path.join(tmp, "model.pckl"), calculator=None,
        logfile=None, pckl=None, tape=None,
        kernel_kw=dict(cutoff=4.5, lmax=3, nmax=3),
    )
    assert not calc2.active
    s2 = s.copy()
    s2.calc = calc2
    e = s2.get_potential_energy()
    assert np.isfinite(e)
    assert calc2._cov is None  # skipped the (N x M) fetch
    beta = calc2._host_beta()
    assert len(beta) == len(s2)
    assert np.isfinite(beta).all() or np.isinf(beta).any()  # well-formed
    # covlog got a number
    assert calc2.covlog != ""
    # active path still fetches cov
    res = calc.calculate(s)
    assert calc._cov is not None
    np.testing.assert_allclose(res["energy"], e, atol=1e-8)


def test_incremental_covloss_matches_full(otf_run):
    """update_inducing's rank-1 covloss update (c += (cov @ choli[-1])^2
    / alpha after a bordered fast commit) must equal the full O(N m^2)
    recompute — the flagship sampling loop relies on this equivalence."""
    tmp, calc, lj, s = otf_run
    calc.calculate(s)  # active step -> host cov is fresh
    model = calc.model
    assert calc._cov is not None and calc._cov.shape[1] == model.m
    c0 = calc._host_c()
    # force a bordered commit of the highest-covloss atom
    beta = calc._beta_from_c(c0)
    k = int(np.argmax(beta))
    env = calc.extract_env(k)
    m0 = model.m
    # the seminormal fast path only engages at production m (default 128);
    # lower the floor so the 32-atom fixture exercises the bordered commit
    model.fast_trial_min_m = 2
    added, _de = model.add_1inducing(env, np.finfo(np.float64).eps)
    if added == 0 or model.m != m0 + 1:
        pytest.skip("candidate rejected (near-duplicate) — nothing to check")
    if getattr(model, "_bordered_sv", None) != model.state_version:
        pytest.skip("commit took the exact (non-bordered) path")
    calc._extend_cov(model.X[-1])
    bn = calc._cov @ model.choli[-1]
    c_inc = c0 + bn * bn / calc._host_alpha()
    c_full = calc._host_c()
    np.testing.assert_allclose(c_inc, c_full, rtol=1e-9, atol=1e-12)
    model.pop_1inducing()  # leave shared fixture state unchanged
    calc._cov = calc._cov[:, :m0]


def test_host_delta_prediction_matches_device(otf_run):
    """add_1atoms_fast computes its accept/reject Δ host-side from the
    new record's own Ke/Kf rows; those must equal the device predict
    (_fast_ef) on the same configuration, and a rejected trial add must
    restore the solve exactly (snapshot path == re-solve path)."""
    tmp, calc, lj, s = otf_run
    model = calc.model
    calc.system = s
    calc._make_cfg(s)
    e_dev, f_dev = calc._fast_ef()
    rec = calc.snapshot(fake=True)
    mu1 = np.asarray(model.mu, dtype=np.float64)
    snap = model.solve_snapshot()
    model.add_data(rec)
    nf = 3 * rec.natoms
    ke_row = np.asarray(model.Ke[-1], dtype=np.float64)
    kf_rows = np.asarray(model.Kf[-nf:], dtype=np.float64)
    # host row-based prediction == device predict (f64 CPU: exact-ish)
    np.testing.assert_allclose(float(ke_row @ mu1), e_dev,
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(kf_rows @ mu1,
                               np.asarray(f_dev).reshape(-1),
                               rtol=1e-7, atol=1e-8)
    # snapshot restore after pop == the re-solve the old path did
    model.pop_1data(remake=False)
    model.restore_solve(snap)
    mu_restored = np.array(model.mu, copy=True)
    choli_restored = np.array(model.choli, copy=True)
    stats_restored = dict(model.stats)
    model.make_munu()
    np.testing.assert_allclose(mu_restored, model.mu, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(choli_restored, model.choli,
                               rtol=1e-9, atol=1e-11)
    for k, v in stats_restored.items():
        np.testing.assert_allclose(v, model.stats[k], rtol=1e-7, atol=1e-10)
