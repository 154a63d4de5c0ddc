"""2-body pair kernels composed with the SOAP kernel."""

import numpy as np
import pytest

from autoforce_tpu.descriptor.soap import SoapParams
from autoforce_tpu.engine import Engine
from autoforce_tpu.pairkernels import PairTerm, pair_kernel_envs_np
from autoforce_tpu.regression.sgpr import DataRecord, SgprModel
from autoforce_tpu.system import bulk_fcc

from test_engine import env_from_system, make_system

TERM = PairTerm(a=29, b=29, kind="rbf", lengthscale=0.5, signal=0.3,
                factor="polycut", rc=3.2)


def make_pair_engine():
    return Engine(
        params=SoapParams(lmax=2, nmax=2, rc=3.2),
        exponent=4,
        species=[29],
        pair_terms=(TERM,),
    )


def test_ke_matches_host_env_sum():
    """Device Ke vs host: sum over config LCEs of the env-env kernel."""
    eng = make_pair_engine()
    s = make_system(seed=0)
    model = SgprModel(eng)
    env = env_from_system(eng, make_system(seed=3), 1)
    model.stage_env(env)
    cfg = eng.make_config(s)
    x_pd, x_pm = eng.env_pair_data(env)
    ke, kf, kv = eng.kernel_col(cfg, env.desc, env.number, env.lone,
                                x_pd=x_pd, x_pm=x_pm)
    # host reference: extract each LCE (with config-side pair dedup) and sum
    # soap + pair kernels -- instead check the pair part via subtraction of
    # the soap-only engine
    eng0 = Engine(params=eng.params, exponent=4, species=[29])
    ke0, *_ = eng0.kernel_col(cfg, env.desc, env.number, env.lone)
    pair_part = float(ke) - float(ke0)
    # host: each physical pair counted once over all LCEs
    from autoforce_tpu.neighbors import displacements, neighbor_table
    from autoforce_tpu.pairkernels import _np_factor, _np_psi, env_pair_list

    t = neighbor_table(s.positions, s.cell, s.pbc, eng.params.rc)
    r = displacements(s.positions, s.cell, t)
    d_all = []
    for i in range(len(s)):
        for k in range(t.idx.shape[1]):
            if not t.mask[i, k]:
                continue
            j = int(t.idx[i, k])
            off = t.off[i, k]
            if j > i or (j == i and (off[np.nonzero(off)[0][0]] > 0
                                     if off.any() else True)):
                d_all.append(np.linalg.norm(r[i, k]))
    d_all = np.array(d_all)
    d2 = env_pair_list(env, TERM)
    k_host = (
        TERM.signal**2
        * (
            np.exp(-((d_all[:, None] - d2[None, :]) ** 2)
                   / (2 * TERM.lengthscale**2))
            * (_np_factor(d_all, TERM)[:, None] * _np_factor(d2, TERM)[None, :])
        ).sum()
    )
    np.testing.assert_allclose(pair_part, k_host, rtol=1e-8)


def test_pair_kf_finite_difference():
    eng = make_pair_engine()
    s = make_system(seed=1)
    env = env_from_system(eng, make_system(seed=4), 2)
    SgprModel(eng).stage_env(env)
    x_pd, x_pm = eng.env_pair_data(env)
    cfg = eng.make_config(s)
    ke, kf, kv = eng.kernel_col(cfg, env.desc, env.number, env.lone,
                                x_pd=x_pd, x_pm=x_pm)
    kf = np.asarray(kf)
    eps = 1e-6
    for (a, b) in [(0, 0), (2, 1)]:
        def kval(delta):
            s2 = s.copy()
            pp = s.positions.copy()
            pp[a, b] += delta
            s2.positions = pp
            c = eng.make_config(s2)
            k, *_ = eng.kernel_col(c, env.desc, env.number, env.lone,
                                   x_pd=x_pd, x_pm=x_pm)
            return float(k)

        fd = (kval(eps) - kval(-eps)) / (2 * eps)
        np.testing.assert_allclose(-kf[a, b], fd, rtol=1e-5, atol=1e-9)


def test_sgpr_with_pair_terms_learns_lj():
    from autoforce_tpu.calculator.oracles import LennardJones

    eng = make_pair_engine()
    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=3.2)
    model = SgprModel(eng)
    systems = []
    for k in range(5):
        s = bulk_fcc("Cu", 3.6)
        s.rattle(0.1, seed=200 + k)
        s.calc = lj
        systems.append(s)
    for k in range(4):
        for i in range(0, 4, 1):
            model.add_inducing(env_from_system(eng, systems[k], i), remake=False)
    for s in systems[:4]:
        model.add_data(DataRecord.from_system(s), remake=False)
    model.make_munu(optimize=True, noise_f=0.005)
    assert model.stats["r2"] > 0.99, model.stats

    # prediction on held-out structure
    s = systems[4]
    cfg = eng.make_config(s)
    ma = model.full_model_arrays()
    vs = model.vscale_for(np.asarray(cfg.numbers))
    e, f, w, cov, beta = eng.predict(cfg, ma, vs)
    f = np.asarray(f)[: len(s)]
    assert np.abs(f - s.get_forces()).mean() < 0.25
    beta = np.asarray(beta)[: len(s)]
    assert np.isfinite(beta).all()
