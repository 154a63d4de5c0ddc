"""On-device neighbor rebuild: set-equality with the host table (incl.
unwrapped drifted positions), overflow reporting, MIC gating, and
DeviceMD trajectory equivalence with/without device rebuilds."""

import jax.numpy as jnp
import numpy as np

from autoforce_tpu.neighbors import neighbor_table
from autoforce_tpu.neighbors_device import (
    device_neighbor_table,
    device_rebuild_ok,
)
from autoforce_tpu.system import bulk_fcc


def pair_sets(idx, off, mask):
    out = []
    for i in range(idx.shape[0]):
        out.append(
            {
                (int(j), tuple(int(x) for x in o))
                for j, o in zip(idx[i][mask[i]], off[i][mask[i]])
            }
        )
    return out


def test_matches_host_table():
    s = bulk_fcc("Cu", 3.6).repeat((3, 3, 3))
    s.rattle(0.3, seed=0)
    # unwrapped drift: atoms that diffused whole boxes away
    s.positions[5] += 2 * s.cell[0] + s.cell[1]
    s.positions[50] -= 3 * s.cell[2]
    rc = 5.0
    ht = neighbor_table(s.positions, s.cell, s.pbc, rc)
    n = len(s)
    kpad = int(ht.mask.sum(axis=1).max()) + 8
    idx, off, mask, kmax, off_over = device_neighbor_table(
        jnp.asarray(s.positions), jnp.asarray(s.cell), jnp.ones(n, bool),
        jnp.asarray(rc), kpad,
    )
    idx, off, mask = np.asarray(idx), np.asarray(off), np.asarray(mask)
    assert int(kmax) == int(ht.mask.sum(axis=1).max())
    a = pair_sets(ht.idx, ht.off, ht.mask)
    b = pair_sets(idx, off, mask)
    assert a == b


def test_padded_atoms_excluded():
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    n = len(s)
    npad = n + 7
    pos = np.zeros((npad, 3))
    pos[:n] = s.positions
    amask = np.zeros(npad, bool)
    amask[:n] = True
    idx, off, mask, kmax, off_over = device_neighbor_table(
        jnp.asarray(pos), jnp.asarray(s.cell), jnp.asarray(amask),
        jnp.asarray(4.5), 64,
    )
    mask = np.asarray(mask)
    idx = np.asarray(idx)
    assert not mask[n:].any()  # padded rows have no pairs
    assert (idx[mask] < n).all()  # and are never anyone's neighbor


def test_overflow_reported():
    s = bulk_fcc("Cu", 3.6).repeat((3, 3, 3))
    rc = 5.0
    ht = neighbor_table(s.positions, s.cell, s.pbc, rc)
    true_kmax = int(ht.mask.sum(axis=1).max())
    idx, off, mask, kmax, off_over = device_neighbor_table(
        jnp.asarray(s.positions), jnp.asarray(s.cell),
        jnp.ones(len(s), bool), jnp.asarray(rc), true_kmax - 4,
    )
    assert int(kmax) == true_kmax  # reported even though slots overflowed


def test_rebuild_ok_gate():
    s = bulk_fcc("Cu", 3.6).repeat((3, 3, 3))
    assert device_rebuild_ok(s.cell, s.pbc, 5.0)
    assert not device_rebuild_ok(s.cell, s.pbc, 6.0)  # box < 2*cutoff
    assert not device_rebuild_ok(s.cell, [True, True, False], 5.0)


def test_device_md_rebuild_equivalence(tmp_path, monkeypatch):
    """DeviceMD trajectories with on-device rebuilds == host rebuilds
    (tiny skin forces several breaches)."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu import units
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.calculator.oracles import LennardJones
    from autoforce_tpu.md.device_md import DeviceMD
    from autoforce_tpu.regression.sgpr import DataRecord
    from autoforce_tpu.regression.sgpr import SgprModel
    from autoforce_tpu.system import maxwell_boltzmann_velocities

    from test_engine import env_from_system, make_engine

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=3.2)

    def fresh_model():
        eng = make_engine()
        model = SgprModel(eng)
        for seed in range(3):
            s = bulk_fcc("Cu", 3.6)
            s.rattle(0.08, seed=seed)
            model.add_inducing(env_from_system(eng, s, seed % 4), remake=False)
        for seed in (7, 8):
            s = bulk_fcc("Cu", 3.6)
            s.rattle(0.08, seed=seed)
            s.calc = lj
            model.add_data(DataRecord.from_system(s), remake=False)
        model.make_munu(optimize=True, noise_f=0.01)
        return model

    results = {}
    for dev in (False, True):
        model = fresh_model()
        calc = ActiveCalculator(covariance=model, calculator=None,
                                logfile=None, pckl=None, tape=None, skin=0.10)
        s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
        s.rattle(0.04, seed=1)
        s.calc = calc
        maxwell_boltzmann_velocities(s, 400, seed=2)
        dyn = DeviceMD(s, calc, dt=2 * units.fs, temperature_K=400,
                       friction=0.02, chunk=25, check_beta=False,
                       device_rebuild=dev)
        if dev:
            assert dyn.device_rebuild  # the MIC gate must accept this box
        dyn.run(120)
        results[dev] = (s.positions.copy(), s.get_velocities().copy())
    np.testing.assert_allclose(results[True][0], results[False][0], atol=1e-8)
    np.testing.assert_allclose(results[True][1], results[False][1], atol=1e-8)


def test_reverse_slots_transpose_scatter():
    """rev-gather == scatter-add, on both host and device tables, incl.
    multiple periodic images of the same pair (small cell, rc > L/2)."""
    from autoforce_tpu.neighbors_device import reverse_slots

    for reps, rc in (((2, 2, 2), 4.5), ((1, 1, 2), 6.5)):
        s = bulk_fcc("Cu", 3.6).repeat(reps)
        s.rattle(0.05, seed=0)
        t = neighbor_table(s.positions, s.cell, s.pbc, rc)
        idx, off, mask = t.idx, t.off, t.mask
        N, K = idx.shape
        rev = np.asarray(
            reverse_slots(jnp.asarray(idx), jnp.asarray(off),
                          jnp.asarray(mask))
        )
        assert int((mask & (rev < 0)).sum()) == 0  # symmetric table
        rng = np.random.default_rng(0)
        ct = rng.normal(size=(N, K, 3)) * mask[:, :, None]
        ref = np.zeros((N, 3))
        np.add.at(ref, idx.reshape(-1), ct.reshape(-1, 3))
        good = rev >= 0
        alt = np.where(
            good[:, :, None], ct.reshape(-1, 3)[np.clip(rev, 0, None)], 0.0
        ).sum(axis=1)
        np.testing.assert_allclose(alt, ref, atol=1e-12)


def test_reverse_slots_host_matches_device():
    """numpy sort-match reverse table == the device gather kernel, on
    multi-image tables (small cell), padded rows, and int8 offsets."""
    from autoforce_tpu.neighbors import reverse_slots_host
    from autoforce_tpu.neighbors_device import reverse_slots

    for reps, rc in (((2, 2, 2), 4.5), ((1, 1, 2), 6.5)):
        s = bulk_fcc("Cu", 3.6).repeat(reps)
        s.rattle(0.05, seed=3)
        t = neighbor_table(s.positions, s.cell, s.pbc, rc)
        n = t.idx.shape[0]
        npad = n + 5  # exercise masked padded rows as make_config does
        idx = np.zeros((npad, t.idx.shape[1]), t.idx.dtype)
        off = np.zeros((npad,) + t.off.shape[1:], np.int8)
        mask = np.zeros((npad, t.idx.shape[1]), bool)
        idx[:n], off[:n], mask[:n] = t.idx, t.off, t.mask
        dev = np.asarray(
            reverse_slots(jnp.asarray(idx), jnp.asarray(off),
                          jnp.asarray(mask))
        )
        host = reverse_slots_host(idx, off, mask)
        np.testing.assert_array_equal(host, dev)
        assert int((mask & (host < 0)).sum()) == 0
        # asymmetric table (one slot dropped): host flags it with -1
        mask2 = mask.copy()
        i0, k0 = np.argwhere(mask2)[0]
        mask2[i0, k0] = False
        host2 = reverse_slots_host(idx, off, mask2)
        assert (mask2 & (host2 < 0)).sum() == 1


def test_rev_vjp_forces_match_plain_path():
    """predict with the reverse-slot force VJP == plain scatter path."""
    import jax

    from autoforce_tpu.descriptor.soap import SoapParams
    from autoforce_tpu.engine import Engine, predict_fn

    eng = Engine(params=SoapParams(lmax=3, nmax=3, rc=4.5), exponent=4,
                 species=[29])
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s.rattle(0.08, seed=1)
    cfg = eng.make_config(s)
    assert cfg.nbr_rev is not None
    # tiny synthetic model
    rng = np.random.default_rng(0)
    from autoforce_tpu.regression.sgpr import InducingEnv, SgprModel
    from autoforce_tpu.neighbors import displacements, neighbor_table as nt

    model = SgprModel(eng)
    for seed in range(6):
        ss = bulk_fcc("Cu", 3.6)
        ss.rattle(0.1, seed=seed)
        t = nt(ss.positions, ss.cell, ss.pbc, 4.5)
        r = displacements(ss.positions, ss.cell, t)
        i = seed % len(ss)
        m = t.mask[i]
        model.add_inducing(
            InducingEnv.from_arrays(29, r[i][m], ss.numbers[t.idx[i][m]]),
            remake=False,
        )
    model.mu = rng.normal(size=model.m)
    model.choli = np.linalg.inv(
        np.linalg.cholesky(model.M + 1e-6 * np.eye(model.m))
    )
    model._model_arrays = None
    ma = model.full_model_arrays()
    vs = jnp.ones(cfg.npad, dtype=cfg.positions.dtype)
    e1, f1, w1, cov1, b1 = predict_fn(cfg, ma, eng.radii_table(), vs,
                                      eng.params, eng.exponent,
                                      znum=eng.znum_table())
    cfg_plain = cfg._replace(nbr_rev=None)
    e2, f2, w2, cov2, b2 = predict_fn(cfg_plain, ma, eng.radii_table(), vs,
                                      eng.params, eng.exponent,
                                      znum=eng.znum_table())
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-11)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-11)


def test_device_md_in_loop_rebuild_equivalence(tmp_path, monkeypatch):
    """In-loop rebuilds (breach handled inside the chunk while_loop) give
    the same trajectory as between-chunk device rebuilds, with the same
    step accounting."""
    monkeypatch.chdir(tmp_path)
    from autoforce_tpu import units
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.calculator.oracles import LennardJones
    from autoforce_tpu.md.device_md import DeviceMD
    from autoforce_tpu.regression.sgpr import DataRecord
    from autoforce_tpu.regression.sgpr import SgprModel
    from autoforce_tpu.system import maxwell_boltzmann_velocities

    from test_engine import env_from_system, make_engine

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=3.2)

    def fresh_model():
        eng = make_engine()
        model = SgprModel(eng)
        for seed in range(3):
            s = bulk_fcc("Cu", 3.6)
            s.rattle(0.08, seed=seed)
            model.add_inducing(env_from_system(eng, s, seed % 4), remake=False)
        for seed in (7, 8):
            s = bulk_fcc("Cu", 3.6)
            s.rattle(0.08, seed=seed)
            s.calc = lj
            model.add_data(DataRecord.from_system(s), remake=False)
        model.make_munu(optimize=True, noise_f=0.01)
        return model

    results = {}
    for inloop in (False, True):
        model = fresh_model()
        calc = ActiveCalculator(covariance=model, calculator=None,
                                logfile=None, pckl=None, tape=None, skin=0.10)
        s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
        s.rattle(0.04, seed=1)
        s.calc = calc
        maxwell_boltzmann_velocities(s, 400, seed=2)
        dyn = DeviceMD(s, calc, dt=2 * units.fs, temperature_K=400,
                       friction=0.02, chunk=25, check_beta=False,
                       in_loop_rebuild=inloop)
        assert dyn.device_rebuild  # the MIC gate must accept this box
        assert dyn.in_loop_rebuild is inloop
        dyn.run(120)
        assert dyn.nsteps == 120
        results[inloop] = (s.positions.copy(), s.get_velocities().copy())
    np.testing.assert_allclose(results[True][0], results[False][0], atol=1e-8)
    np.testing.assert_allclose(results[True][1], results[False][1], atol=1e-8)


def test_chunk_loop_in_loop_rebuild_mechanics():
    """_chunk_loop with a rebuild_fn: a skin breach rebuilds in the loop
    and continues; a failed rebuild (ok=False) exits with the LAST GOOD
    table and origin (never a truncated one)."""
    from autoforce_tpu.md.device_md import _chunk_loop

    # one particle drifting at constant velocity (no forces): breaches a
    # skin of 0.5 every 4 steps (dt=1, |v|=0.125; exact binary fractions
    # so the breach steps are fp-exact)
    pos0 = jnp.zeros((1, 3))
    vel = jnp.array([[0.125, 0.0, 0.0]])
    masses = jnp.ones((1, 1))
    amask = jnp.ones((1, 1))

    def forces_fn(pos, tbl):
        e = jnp.zeros(())
        f = jnp.zeros_like(pos)
        return e, f, jnp.zeros(())

    def rebuild_fn(pos):
        # the "table" is the rebuild count, derived from the position
        # (breaches land at x = 0.5, 1.0, 1.5 for skin_half=0.5, |v|=0.1)
        count = jnp.round(pos[0, 0] / 0.5)
        ok = count < 3.0  # third breach (x=1.5) overflows
        return (count,), ok

    out = _chunk_loop(
        forces_fn, pos0, amask, vel, masses, jnp.zeros(2, jnp.uint32),
        pos0, jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(0.0),
        jnp.asarray(0.5), jnp.asarray(np.inf), jnp.asarray(100, jnp.int32),
        "none", False, jnp.ones(3), jnp.ones(()), jnp.zeros(3),
        jnp.zeros(3),
        tbl=(jnp.zeros(()),), rebuild_fn=rebuild_fn,
    )
    pos, v, key, f, e, bmax, vxi, xi, i, tbl, p0 = out
    # breaches at x=0.5 (rebuild ok, tbl=1), 1.0 (ok, tbl=2), 1.5 (fail)
    assert int(i) == 12
    assert float(tbl[0]) == 2.0  # last GOOD table kept on failure
    np.testing.assert_allclose(float(p0[0, 0]), 1.0, atol=1e-9)  # its origin
    np.testing.assert_allclose(float(pos[0, 0]), 1.5, atol=1e-9)


def test_device_md_in_loop_overflow_falls_back_to_host(tmp_path, monkeypatch):
    """When an in-loop chunk exits early without a beta trip (bucket
    overflow), DeviceMD.run drops the chain and rebuilds via the host."""
    monkeypatch.chdir(tmp_path)
    import jax.numpy as jnp

    import autoforce_tpu.md.device_md as dm
    from autoforce_tpu import units
    from autoforce_tpu.calculator.active import ActiveCalculator
    from autoforce_tpu.calculator.oracles import LennardJones
    from autoforce_tpu.md.device_md import DeviceMD
    from autoforce_tpu.system import maxwell_boltzmann_velocities

    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=3.2)
    calc = ActiveCalculator(
        covariance=None, calculator=lj, logfile=None, pckl=None, tape=None,
        kernel_kw=dict(cutoff=3.2, lmax=2, nmax=2),
        ediff=0.2, ediff_tot=0.5, fdiff=0.6, skin=0.3,
    )
    s = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    s.rattle(0.02, seed=3)
    s.calc = calc
    s.get_potential_energy()  # seed the model
    calc._calc = None  # freeze learning
    maxwell_boltzmann_velocities(s, 300, seed=4)

    real = dm.md_chunk
    state = {"faked": 0, "host_cfg": 0}

    def fake(*a, **kw):
        out = real(*a, **kw)
        if kw.get("rebuild") and state["faked"] == 0:
            state["faked"] = 1
            out = list(out)
            out[6] = jnp.asarray(1, jnp.int32)  # pretend early exit @ 1
            out = tuple(out)
        return out

    monkeypatch.setattr(dm, "md_chunk", fake)
    real_make_cfg = calc._make_cfg

    def spy_make_cfg(system):
        state["host_cfg"] += 1
        return real_make_cfg(system)

    monkeypatch.setattr(calc, "_make_cfg", spy_make_cfg)
    dyn = DeviceMD(s, calc, dt=2 * units.fs, temperature_K=300,
                   friction=0.02, chunk=10, check_beta=False,
                   in_loop_rebuild=True)
    assert dyn.in_loop_rebuild
    dyn.run(30)
    assert dyn.nsteps == 30
    assert state["faked"] == 1  # the early exit was injected
    assert state["host_cfg"] >= 1  # ... and resolved through the host path
    assert np.isfinite(s.positions).all()
