"""Alchemical (ChemRBF) species similarity."""

import numpy as np
import pytest

from autoforce_tpu.chemical import atom_embeddings, chem_rbf_table, mixing_cholesky
from autoforce_tpu.descriptor.soap import SoapParams
from autoforce_tpu.engine import Engine
from autoforce_tpu.regression.sgpr import DataRecord, SgprModel
from autoforce_tpu.system import bulk_fcc

from test_engine import env_from_system
from test_multispecies import EPS, SIG, BinaryLJ, mixture


def test_chem_table_properties():
    chi = chem_rbf_table()
    assert chi.shape == (119, 119)
    np.testing.assert_allclose(np.diag(chi), 1.0)
    # Cu-Ag (similar metals) more similar than Cu-F
    assert chi[29, 47] > chi[29, 9]
    # PSD on a species subset
    L = mixing_cholesky([29, 47, 8])
    np.testing.assert_allclose(L @ L.T, chi[np.ix_([29, 47, 8], [29, 47, 8])],
                               atol=1e-8)


def make_chem_engine():
    return Engine(params=SoapParams(lmax=2, nmax=2, rc=4.5), exponent=4,
                  species=[29, 47], chemical="rbf")


def test_cross_species_kernel_nonzero():
    """With the alchemical kernel, Cu and Ag environments correlate."""
    eng = make_chem_engine()
    model = SgprModel(eng)
    s = mixture(0)
    i_cu = int(np.flatnonzero(s.numbers == 29)[0])
    i_ag = int(np.flatnonzero(s.numbers == 47)[0])
    e1 = env_from_system(eng, s, i_cu)
    e2 = env_from_system(eng, s, i_ag)
    model.stage_env(e1)
    model.stage_env(e2)
    k = model.kern_env_env(e1, e2)
    assert k > 0.0
    # and the delta-kernel engine gives exactly zero
    eng0 = Engine(params=eng.params, exponent=4, species=[29, 47])
    model0 = SgprModel(eng0)
    model0.stage_env(e1)
    model0.stage_env(e2)
    assert model0.kern_env_env(e1, e2) == 0.0


def test_device_host_consistency():
    """Device Ke with chemical mixing == host env-sum."""
    eng = make_chem_engine()
    model = SgprModel(eng)
    s = mixture(1)
    env = env_from_system(eng, mixture(2), 3)
    model.stage_env(env)
    cfg = eng.make_config(s)
    ke, kf, kv = eng.kernel_col(cfg, env.desc, env.number, env.lone)
    # host: sum over extracted LCEs
    total = 0.0
    for i in range(len(s)):
        ei = env_from_system(eng, s, i)
        model.stage_env(ei)
        total += model.kern_env_env(ei, env)
    np.testing.assert_allclose(float(ke), total, rtol=1e-8)


def test_chemical_learning():
    """A Cu/Ag mixture model with alchemical similarity trains and predicts."""
    eng = make_chem_engine()
    oracle = BinaryLJ(EPS, SIG)
    model = SgprModel(eng)
    systems = [mixture(seed) for seed in range(4)]
    for s in systems:
        s.calc = oracle
    for k in range(3):
        for i in range(0, 32, 6):
            model.add_inducing(env_from_system(eng, systems[k], i), remake=False)
    for s in systems[:3]:
        model.add_data(DataRecord.from_system(s), remake=False)
    model.make_munu(optimize=True, noise_f=0.01)
    # soft species-sharing trades some sharpness for transfer
    assert model.stats["r2"] > 0.85, model.stats
    # prediction with covloss normalized by the non-unit diagonal
    s = systems[3]
    cfg = eng.make_config(s)
    ma = model.full_model_arrays()
    vs = model.vscale_for(np.asarray(cfg.numbers))
    e, f, w, cov, beta = eng.predict(cfg, ma, vs)
    f = np.asarray(f)[: len(s)]
    assert np.abs(f - s.get_forces()).mean() < 0.35
    b = np.asarray(beta)[: len(s)]
    assert np.isfinite(b).all() and (b >= 0).all()


def test_kernel_kinds():
    """Base-kernel variants (DotProd**zeta / RBF / Normed) stay consistent
    between the device and host paths and keep exact gradients."""
    from autoforce_tpu.regression.sgpr import SgprModel
    import jax

    for kind in ("rbf", "normed"):
        eng = Engine(params=SoapParams(lmax=2, nmax=2, rc=4.0), exponent=4,
                     species=[29])
        eng.kernel_kind = kind
        model = SgprModel(eng)
        s = bulk_fcc("Cu", 3.6)
        s.rattle(0.06, seed=1)
        env = env_from_system(eng, s, 1)
        model.stage_env(env)
        cfg = eng.make_config(s)
        ke, kf, kv = eng.kernel_col(cfg, env.desc, env.number, env.lone)
        # host: sum over extracted LCEs
        total = 0.0
        for i in range(len(s)):
            ei = env_from_system(eng, s, i)
            model.stage_env(ei)
            total += model.kern_env_env(ei, env)
        np.testing.assert_allclose(float(ke), total, rtol=1e-8)
        # FD of the kernel gradient
        eps = 1e-6
        pp = s.positions.copy()
        pp[0, 0] += eps
        s2 = s.copy(); s2.positions = pp
        kp, *_ = eng.kernel_col(eng.make_config(s2), env.desc, env.number,
                                env.lone)
        pp[0, 0] -= 2 * eps
        s3 = s.copy(); s3.positions = pp
        km, *_ = eng.kernel_col(eng.make_config(s3), env.desc, env.number,
                                env.lone)
        fd = (float(kp) - float(km)) / (2 * eps)
        np.testing.assert_allclose(-np.asarray(kf)[0, 0], fd, rtol=1e-5,
                                   atol=1e-9)
