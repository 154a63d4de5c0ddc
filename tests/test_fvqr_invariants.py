"""Randomized fv-QR factor-flow invariants (VERDICT r4 item #1).

After EVERY mutation sequence of an SgprModel (append-rows, append-col,
pop-col, retarget, pop_1data, select, fast trials — in randomized
orders), whenever the incremental fv-QR cache claims validity its
factor must reproduce a fresh np.linalg.qr solve of the current stacked
system, and the SERVED solve (make_munu with the seed) must equal the
cache-free solve.  Also pins the two round-4 regression mechanisms:

* near-duplicate (ill-conditioned) column appends must either stay
  accurate or drop the cache — never launder a drifted factor
  (water-dimer regression: served mu 77% off by m=11);
* the pop_1data one-deep undo must validate target CONTENT, not just
  length (expr-kernel regression: stale z laundered as fresh).

Reference semantics preserved: gppotential.py:728-771,888-940.
"""

import numpy as np
import pytest
from scipy.linalg import solve_triangular

from autoforce_tpu.calculator.oracles import LennardJones
from autoforce_tpu.descriptor.soap import SoapParams
from autoforce_tpu.engine import Engine
from autoforce_tpu.neighbors import displacements, neighbor_table
from autoforce_tpu.regression.sgpr import DataRecord, InducingEnv, SgprModel
from autoforce_tpu.system import bulk_fcc

RC = 4.5


def _env_from(s, i):
    t = neighbor_table(s.positions, s.cell, s.pbc, RC)
    r = displacements(s.positions, s.cell, t)
    m = t.mask[i]
    return InducingEnv.from_arrays(s.numbers[i], r[i][m],
                                   s.numbers[t.idx[i][m]])


def check_fvqr(model, label):
    """Invariants of the cached factor vs the current (K, y) system."""
    qr = model._fvqr
    if qr is None:
        return
    K = model._fvqr_K()
    y = model._fv_targets()
    m = model.m
    if qr["R"].shape[1] != m:
        return  # shape-stale: make_munu rebuilds before serving
    if len(qr["y"]) == len(y):
        g_err = np.abs(qr["R"].T @ qr["R"] - K.T @ K).max()
        scale = max(np.abs(K.T @ K).max(), 1.0)
        assert g_err < 1e-6 * scale, (
            f"[{label}] R^T R != K^T K: err={g_err:.3e}")
    if qr["fp"] == model._fv_fingerprint(y):
        assert len(qr["y"]) == len(y), f"[{label}] fp fresh, len differs"
        assert np.abs(qr["y"] - y).max() < 1e-12, (
            f"[{label}] fp fresh but y VALUES differ")


def check_served(model, label):
    """make_munu with the incremental seed == cache-free make_munu."""
    if model.m == 0 or model.ndata == 0 or len(model.mu) != model.m:
        return
    mu_inc = np.array(model.mu)
    qr, sqr = model._fvqr, model._sqr
    st = model._solve_state()
    model._fvqr = None
    model._sqr = None
    model.make_munu()
    mu_ref = np.array(model.mu)
    model._restore_solve_state(st)
    model._fvqr, model._sqr = qr, sqr
    err = np.abs(mu_inc - mu_ref).max()
    ref = max(np.abs(mu_ref).max(), 1.0)
    assert err < 1e-5 * ref, (
        f"[{label}] SERVED mu diverged: err={err:.3e} ref={ref:.3e}")


def _setup(seed):
    rng = np.random.RandomState(seed)
    eng = Engine(params=SoapParams(lmax=3, nmax=3, rc=RC), exponent=4,
                 species=[29])
    model = SgprModel(eng)
    model.fast_trial_min_m = 0
    small = bulk_fcc("Cu", 3.6).repeat((2, 2, 2))
    lj = LennardJones(epsilon=0.15, sigma=2.3, rc=RC)

    def rand_env(scale=None):
        s = small.copy()
        s.rattle((0.03 + 0.1 * rng.rand()) if scale is None else scale,
                 seed=rng.randint(10000))
        return _env_from(s, rng.randint(len(s)))

    def rand_rec(fake=False):
        s = small.copy()
        s.rattle(0.02 + 0.08 * rng.rand(), seed=rng.randint(10000))
        s.calc = lj
        rec = DataRecord.from_system(s)
        if fake:
            rec.e = rec.e + rng.randn()
            rec.f = rec.f + 0.1 * rng.randn(*rec.f.shape)
        return rec

    return rng, model, rand_env, rand_rec


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_randomized_mutation_flows(seed):
    rng, model, rand_env, rand_rec = _setup(seed)
    for _ in range(4):
        model.add_inducing(rand_env(), remake=False)
    for _ in range(2):
        model.add_data(rand_rec(), remake=False)
    model.make_munu(optimize=True, noise_f=0.01)
    check_fvqr(model, "seed")
    ops = []
    for step in range(25):
        choice = rng.randint(10)
        if choice == 0:
            ops.append("add_data")
            model.add_data(rand_rec(), remake=bool(rng.randint(2)))
        elif choice == 1 and model.ndata > 1:
            first = bool(rng.randint(2))
            ops.append(f"pop_1data(first={first})")
            model.pop_1data(remake=bool(rng.randint(2)), first=first)
        elif choice == 2:
            ops.append("add_inducing")
            model.add_inducing(rand_env(), remake=bool(rng.randint(2)))
        elif choice == 3 and model.m > 2:
            first = bool(rng.randint(2))
            ops.append(f"pop_1inducing(first={first})")
            model.pop_1inducing(remake=bool(rng.randint(2)), first=first)
        elif choice == 4:
            if len(model.mu) != model.m:
                model.make_munu()
            ops.append("add_1inducing trial")
            model.add_1inducing(rand_env(), ediff=10 ** -rng.randint(6))
        elif choice == 5:
            if len(model.mu) != model.m:
                model.make_munu()
            ops.append("fast_add_inducing")
            model.fast_add_inducing(rand_env())
            if model.ridge > 0:
                model.pop_1inducing()
        elif choice == 6 and model.ndata:
            ops.append("retarget(head)")
            rec = model.data[-1]
            rec.e = rec.e + 0.1 * rng.randn()
            rec.f = rec.f + 0.01 * rng.randn(*rec.f.shape)
            model.touch_targets()
            model.make_munu()
        elif choice == 7 and model.m > 3:
            keep = sorted(
                rng.choice(model.m, size=model.m - rng.randint(1, 3),
                           replace=False).tolist()
            )
            ops.append(f"select_inducing({len(keep)}/{model.m})")
            model.select_inducing(keep, remake=bool(rng.randint(2)))
        elif choice == 8:
            # the update_data accept/reject flow: add fake, maybe pop
            ops.append("add_data(fake)+maybe_pop")
            model.add_data(rand_rec(fake=True))
            if rng.randint(2):
                model.pop_1data()
            else:
                rec = model.data[-1]
                rec.e = rec.e + 0.5
                rec.f = rec.f + 0.02
                model.touch_targets()
                model.make_munu()
        else:
            ops.append("make_munu(optimize)")
            model.make_munu(optimize=bool(rng.randint(2)), noise_f=0.01)
        check_fvqr(model, f"seed={seed} step={step} op={ops[-1]}")
        if step % 5 == 4 and model.m and model.ndata:
            model.make_munu()
            check_served(model, f"seed={seed} step={step}")


def test_near_duplicate_column_chain_stays_accurate():
    """The round-4 water-dimer mechanism: a chain of NEAR-DUPLICATE
    inducing appends on a single small data record drives kappa(K_fv)
    through the roof; the served solve must still match the cache-free
    solve (the projection either converges or drops the cache)."""
    rng, model, rand_env, rand_rec = _setup(42)
    base = rand_env(scale=0.05)
    model.add_inducing(base, remake=False)
    model.add_data(rand_rec(), remake=False)
    model.make_munu()
    for k in range(14):
        # tiny rattles of the SAME environment: near-dependent columns
        e = rand_env(scale=0.002)
        model.add_inducing(e, remake=True)
        check_served(model, f"near-dup append {k}")


def test_pop1data_undo_validates_content():
    """Targets edited in place between a row append and the pop must
    invalidate the one-deep undo (length alone cannot see the edit)."""
    rng, model, rand_env, rand_rec = _setup(7)
    for _ in range(3):
        model.add_inducing(rand_env(), remake=False)
    model.add_data(rand_rec(), remake=False)
    model.make_munu()
    # append a second structure: undo snapshot saved
    model.add_data(rand_rec(fake=True))
    assert model._fvqr is None or "prev" in model._fvqr
    # edit the FIRST record's targets in place (same lengths!)
    model.data[0].f = model.data[0].f + 0.5
    model.touch_targets()
    # pop the second: the undo snapshot's y no longer matches content
    model.pop_1data()
    check_fvqr(model, "undo-after-inplace-edit")
    check_served(model, "undo-after-inplace-edit")


def test_colcache_survives_pop_add_cycle():
    """The data fingerprint must change across pop+add even when the
    new record reuses the old one's memory (id() collision hazard)."""
    rng, model, rand_env, rand_rec = _setup(11)
    model.add_inducing(rand_env(), remake=False)
    model.add_data(rand_rec(), remake=False)
    fp0 = model._data_fp()
    model.pop_1data(remake=False)
    model.add_data(rand_rec(), remake=False)
    assert model._data_fp() != fp0
    # and a cached block computed pre-mutation must not be served
    env = rand_env()
    model.precompute_column_blocks([env])
    model.pop_1data(remake=False)
    model.add_data(rand_rec(), remake=False)
    assert all(
        entry[1] != model._data_fp() for entry in model._colcache.values()
    )
