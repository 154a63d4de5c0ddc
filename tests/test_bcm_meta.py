"""ActiveMeta fused into the COMMITTEE device chunks (VERDICT r3 item
#9): the uncertainty-seeking bias is defined on the committee covloss
floor — BCM's own uncertainty measure (reference get_covloss_total,
active_bcm.py:885-894) — where the reference's host ActiveMeta
(active.py:1170-1186) only ever sees the current expert.

Own module: committee chunks are among the heaviest XLA:CPU compiles in
the suite (see test_bcm_mesh.py header).
"""

import numpy as np

import jax.numpy as jnp

from autoforce_tpu import units
from autoforce_tpu.calculator.meta import ActiveMeta
from autoforce_tpu.system import bulk_fcc, maxwell_boltzmann_velocities

from test_bcm_multitask import _trained_bcm


def test_committee_meta_bias_is_floor_formula(tmp_path, monkeypatch):
    """The fused committee bias equals -scale * sum_i min_k beta_ki
    computed independently from each expert's HOST covloss (all species
    seen here, so the sampling vscale and the meta vscale coincide)."""
    monkeypatch.chdir(tmp_path)
    import jax

    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.md.device_md import (DeviceMD, _committee_e,
                                            committee_models,
                                            committee_stack)

    calc, s0 = _trained_bcm(tmp_path, pckl="bcmmeta.pckl")
    calc._calc = None
    # evaluate at a strongly rattled config: at the training positions
    # every env is in span (c -> 1, beta -> 0) and the check would only
    # compare clip-floor noise; here the floor is O(1e-2) per atom
    s = s0.copy()
    s.rattle(0.15, seed=33)
    s.calc = calc
    calc.calculate(s)  # builds calc.cfg at these positions
    cfg = calc.cfg
    eng = calc.engine
    models = committee_models(calc)
    assert len(models) >= 2
    ma, vs_c, mean_e = committee_stack(calc, s, models, cfg,
                                       {"mcap": 0, "cache": {}})
    meta_vs = np.where(vs_c >= DeviceMD._VS_UNSEEN, 0.0, vs_c)
    chem_z, mixL = eng.chem_args()
    scale = 0.05

    def e_of(p, meta_scale=None, mvs=None):
        return _committee_e(
            p, cfg.cell, cfg, ma, eng.radii_table(), eng.znum_table(),
            jnp.asarray(vs_c), jnp.asarray(mean_e), eng.params,
            eng.exponent, eng.pair_terms, chem_z, mixL, eng.kernel_kind,
            meta_scale=meta_scale, meta_vs=mvs,
        )[0]

    e_plain = float(e_of(cfg.positions))
    e_meta = float(e_of(cfg.positions, jnp.asarray(scale),
                        jnp.asarray(meta_vs)))

    # independent host floor: per-expert ActiveCalculator covloss
    betas = []
    for m in models:
        ac = ActiveCalculator(covariance=m, calculator=None, logfile=None,
                              pckl=None, tape=None)
        ac.calculate(s.copy())
        betas.append(ac._host_beta())
    floor = np.stack(betas).min(axis=0)
    expected = -scale * floor.sum()
    assert expected < -1e-4  # non-trivial floor at this config
    # atol: the fused bias floors 1-c at 1e-12 (sqrt'(0) = inf would
    # NaN forces) where the host trigger floors at 0; near-span envs
    # then differ by sqrt(|1-c| noise) ~ 1e-4 in beta
    np.testing.assert_allclose(e_meta - e_plain, expected,
                               rtol=1e-3, atol=2e-5)

    # bias forces are finite (the 1e-12 clip floor does its job even
    # for in-span environments where 1 - c underflows)
    g = jax.grad(lambda p: e_of(p, jnp.asarray(scale),
                                jnp.asarray(meta_vs)))(cfg.positions)
    assert np.isfinite(np.asarray(g)).all()


def test_committee_of_identical_experts_matches_single_model(
    tmp_path, monkeypatch
):
    """A committee of two IDENTICAL experts + meta must reproduce the
    single-model fused-meta trajectory exactly (floor == that model's
    bias beta, weights 0.5/0.5 over identical surfaces) — end-to-end
    wiring check of DeviceMD's committee meta path against the
    already-host-verified single-model path."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.calculator.bcm import BCMActiveCalculator
    from autoforce_tpu.md.device_md import DeviceMD, committee_models

    calc, s = _trained_bcm(tmp_path, pckl="bcmmeta2.pckl")
    calc._calc = None
    # the live model is freshly spawned (empty) after the second expert
    # froze; the committee is the frozen experts — use one of those
    model = next(iter(calc.experts.values()))
    assert model.m > 0

    def run(c):
        c.meta = ActiveMeta(scale=0.05)
        try:
            dev = s.copy()
            maxwell_boltzmann_velocities(dev, 300, seed=9)
            dev.calc = c
            dyn = DeviceMD(dev, c, dt=2 * units.fs, chunk=3,
                           check_beta=False, thermostat="none",
                           device_rebuild=False)
            dyn.run(8)
            return dev.positions.copy()
        finally:
            c.meta = None

    # committee of the same expert twice (the empty live model is
    # excluded by committee_models)
    calc.experts = {"e1": model, "e2": model}
    assert len(committee_models(calc)) == 2
    pos_committee = run(calc)

    from autoforce_tpu.calculator.active import ActiveCalculator

    single = ActiveCalculator(covariance=model, calculator=None,
                              logfile=None, pckl=None, tape=None)
    pos_single = run(single)
    np.testing.assert_allclose(pos_committee, pos_single, atol=1e-9)
    # and the bias actually bends the trajectory
    calc.meta = None
    dev = s.copy()
    maxwell_boltzmann_velocities(dev, 300, seed=9)
    dev.calc = calc
    DeviceMD(dev, calc, dt=2 * units.fs, chunk=3, check_beta=False,
             thermostat="none", device_rebuild=False).run(8)
    assert np.abs(dev.positions - pos_committee).max() > 1e-6


def test_committee_meta_mesh_matches_single_device(tmp_path, monkeypatch):
    """BCM + ActiveMeta over the ('data','model') mesh == single-device
    committee+meta trajectory (lifts the last cell of the
    driver x mesh x committee x meta matrix)."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu.md.device_md import DeviceMD
    from autoforce_tpu.parallel.mesh import make_mesh

    calc, s = _trained_bcm(tmp_path, pckl="bcmmeta3.pckl")
    calc._calc = None
    calc.meta = ActiveMeta(scale=0.05)
    try:
        out = {}
        for mesh in (None, make_mesh(n_data=4, n_model=2)):
            calc.engine.mesh = mesh
            dev = s.copy()
            maxwell_boltzmann_velocities(dev, 300, seed=9)
            dev.calc = calc
            dyn = DeviceMD(dev, calc, dt=2 * units.fs, chunk=3,
                           check_beta=False, thermostat="none",
                           device_rebuild=False)
            dyn.run(8)
            out[mesh is None] = dev.positions.copy()
    finally:
        calc.meta = None
        calc.engine.mesh = None
    # reduction-order tolerance rationale: test_bcm_mesh.py
    np.testing.assert_allclose(out[False], out[True], atol=1e-6)
