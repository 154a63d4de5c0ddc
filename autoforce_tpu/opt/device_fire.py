"""Device-resident structure relaxation: FIRE inside the jitted chunk.

The host optimizers (opt/fire.py, the role of ASE's FIRE in reference
theforce/cl/relax.py:28-60) pay one host<->device round trip per force
evaluation.  Here the WHOLE FIRE loop — forces (SGPR predict), the
velocity-mixing update, the adaptive (dt, alpha) schedule, and the
convergence test — runs inside one ``lax.while_loop``; the host is
re-entered only when

  * the max force drops below the target (converged),
  * the covloss uncertainty trips (active learning samples at the exact
    geometry, reference per-evaluation semantics),
  * the Verlet skin is breached AND the in-loop rebuild cannot serve
    (bucket overflow), or
  * the step budget is exhausted.

The step math is exactly opt/fire.FIRE.step (same branch structure via
jnp.where), so device trajectories equal the host optimizer's to float
rounding; convergence is checked BEFORE each step like Optimizer.run.
Cell relaxation (opt/filters.UnitCellFilter) stays host-path: the
filter mixes strain rows into the coordinate vector on the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..md.device_md import _inloop_table, _sgpr_forces, check_plain_surface


@partial(
    jax.jit,
    static_argnames=("params", "exponent", "pair_terms", "check_beta",
                     "kind", "rebuild"),
)
def fire_chunk(
    cfg,
    model,
    radii,
    znum,
    vscale_atom,
    v,  # (N, 3) FIRE velocity (optimizer state, not physical)
    pos0,  # positions at neighbor-table build time
    dt,  # current adaptive step (scalar, carried across chunks)
    a,  # current mixing alpha
    n_uphill,  # uphill(power>0)-step counter
    skin_half,
    fmax_target,
    beta_thresh,
    nsteps,
    maxstep,
    dtmax,
    nmin,
    finc,
    fdec,
    astart,
    fa,
    chem_z=None,
    mixL=None,
    params=None,
    exponent=4,
    pair_terms=(),
    check_beta=True,
    kind="dot",
    rebuild=False,  # in-loop neighbor rebuild at skin breaches
    rebuild_cut=None,
    sidx_atom=None,
    sidx_ok=None,
):
    """Up to ``nsteps`` FIRE steps on device; early exit on convergence
    (fmax < fmax_target, checked BEFORE stepping like Optimizer.run),
    uncertainty trip, or an unserviceable skin breach.  Returns
    (pos, v, f, e, beta_max, fmax, dt, a, n_uphill, ndone[, tbl, pos0]).
    """
    amask = cfg.atom_mask[:, None]
    cfg_with, tbl0, rebuild_fn = _inloop_table(
        cfg, rebuild, rebuild_cut, sidx_atom, sidx_ok
    )

    def forces_fn(pos, tbl=None):
        return _sgpr_forces(
            pos, cfg_with(tbl), model, radii, znum, vscale_atom, params,
            exponent, pair_terms, chem_z, mixL, kind, check_beta,
        )

    if not rebuild:
        tbl0 = ()

    def fmax_of(f):
        return jnp.sqrt(((f * f) * amask).sum(-1).max())

    def breach(pos, p0):
        return ((pos - p0) ** 2 * amask).sum(-1).max() >= skin_half**2

    def maybe_rebuild(pos, tbl, p0):
        """Rebuild the TABLE iff the skin is breached; forces are NOT
        recomputed inside the branch — a forces evaluation inside
        lax.cond serializes the whole loop on this backend (measured
        21 ms/iter vs 1.8; the MD chunks tolerate it because their step
        has no cross-atom scalar reductions) — the caller re-evaluates
        forces unconditionally with whatever table comes out."""

        def do_rebuild(args):
            pos, tbl, p0 = args
            new_tbl, rok = rebuild_fn(pos)
            tbl2 = jax.tree.map(
                lambda n, o: jnp.where(rok, n, o), new_tbl, tbl
            )
            p0_2 = jnp.where(rok, pos, p0)
            return tbl2, p0_2, rok

        def no_rebuild(args):
            pos, tbl, p0 = args
            return tbl, p0, jnp.ones((), bool)

        return jax.lax.cond(
            breach(pos, p0), do_rebuild, no_rebuild, (pos, tbl, p0)
        )

    def move(pos, v, f, dt, a, n_uphill):
        # exactly opt/fire.FIRE.step, branches as jnp.where (the forces
        # at the new positions are evaluated by the caller)
        vf = ((f * v) * amask).sum()
        up = vf > 0
        fn = jnp.sqrt(((f * f) * amask).sum())
        vn = jnp.sqrt(((v * v) * amask).sum())
        v_mix = (1.0 - a) * v + a * (f / (fn + 1e-30)) * vn
        v = jnp.where(up, v_mix, jnp.zeros_like(v))
        inc = up & (n_uphill > nmin)
        dt = jnp.where(
            inc, jnp.minimum(dt * finc, dtmax), jnp.where(up, dt, dt * fdec)
        )
        a = jnp.where(inc, a * fa, jnp.where(up, a, astart))
        n_uphill = jnp.where(up, n_uphill + 1, jnp.zeros_like(n_uphill))
        v = v + dt * f
        dr = dt * v
        norm = jnp.sqrt((dr * dr).sum(axis=1).max())
        dr = dr * jnp.where(norm > maxstep, maxstep / (norm + 1e-30), 1.0)
        pos = pos + dr * amask
        return pos, v, dt, a, n_uphill

    if rebuild:
        tbl0, p00, ok0 = maybe_rebuild(cfg.positions, tbl0, pos0)
    else:
        p00 = pos0
        ok0 = ~breach(cfg.positions, pos0)
    e0, f0, b0 = forces_fn(cfg.positions, tbl0)
    # the while condition reads SCALARS only (fmax is reduced in the
    # body and carried); see maybe_rebuild for the scheduling rationale
    fm0 = fmax_of(f0)

    def cond(state):
        pos, v, f, e, beta_max, fm, dt, a, nu, i, tbl, p0, ok = state
        go = (i < nsteps) & ok & (fm >= fmax_target)
        if check_beta:
            go = go & (beta_max < beta_thresh)
        return go

    def body(state):
        pos, v, f, e, beta_max, fm, dt, a, nu, i, tbl, p0, ok = state
        pos, v, dt, a, nu = move(pos, v, f, dt, a, nu)
        if rebuild:
            tbl, p0, ok = maybe_rebuild(pos, tbl, p0)
        else:
            ok = ~breach(pos, p0)
        # ONE unconditional forces evaluation per step, always with the
        # freshest table (the rebuild branch never recomputes physics)
        e, f, beta_max = forces_fn(pos, tbl)
        return (pos, v, f, e, beta_max, fmax_of(f), dt, a, nu, i + 1, tbl,
                p0, ok)

    init = (cfg.positions, v, f0, e0, b0, fm0, dt, a, n_uphill,
            jnp.zeros((), jnp.int32), tbl0, p00, ok0)
    (pos, v, f, e, beta_max, fm, dt, a, nu, i, tbl, p0, ok) = (
        jax.lax.while_loop(cond, body, init)
    )
    out = (pos, v, f, e, beta_max, fm, dt, a, nu, i)
    if rebuild:
        return out + (tbl, p0)
    return out


class DeviceFIRE:
    """Chunked on-device FIRE relaxation around an (inference or active)
    calculator — the geometry-optimization sibling of
    :class:`~autoforce_tpu.md.device_md.DeviceMD`.

    Matches opt/fire.FIRE's schedule exactly (same defaults); active
    learning keeps reference semantics: the chunk stops at the exact
    geometry where the covloss threshold trips, the host samples, and
    relaxation resumes on the updated model.  Positions-only (use the
    host FIRE + UnitCellFilter for variable-cell relaxations).
    """

    def __init__(self, system, calc, dt=0.1, maxstep=0.2, dtmax=1.0, nmin=5,
                 finc=1.1, fdec=0.5, astart=0.1, fa=0.99, logfile=None,
                 chunk=50, check_beta=None, in_loop_rebuild=True):
        check_plain_surface(calc, "DeviceFIRE")
        if getattr(calc.engine, "mesh", None) is not None:
            raise NotImplementedError(
                "DeviceFIRE is single-chip; use the host FIRE under a mesh"
            )
        from ..calculator.bcm import BCMActiveCalculator

        if isinstance(calc, BCMActiveCalculator) and calc.experts:
            raise NotImplementedError(
                "DeviceFIRE relaxes on the live SGPR model only; BCM "
                "committees use the host FIRE"
            )
        self.system = system
        self.calc = calc
        self.params = dict(dt=float(dt), maxstep=float(maxstep),
                           dtmax=float(dtmax), nmin=float(nmin),
                           finc=float(finc), fdec=float(fdec),
                           astart=float(astart), fa=float(fa))
        self.logfile = logfile
        self.chunk = int(chunk)
        self.check_beta = (
            check_beta if check_beta is not None else calc.active
        )
        self.in_loop_rebuild = bool(in_loop_rebuild)
        self.nsteps = 0
        # optimizer state (persist across run() calls like opt/fire.FIRE)
        self.dt_cur = float(dt)
        self.a = float(astart)
        self.n_uphill = 0.0
        self._v = None

    def log(self, fmax, e):
        if self.logfile:
            with open(self.logfile, "a") as f:
                f.write(f"DeviceFIRE step {self.nsteps} "
                        f"E={e:.6f} fmax={fmax:.4f}\n")

    def run(self, fmax=0.05, steps=1000):
        """Relax until max|F| < fmax or the step budget runs out; returns
        True on convergence (host Optimizer.run contract)."""
        calc = self.calc
        system = self.system
        eng = calc.engine
        done = 0
        first = True
        need_host = True
        pos_dev = v_dev = None
        chain = None
        converged = False
        while done < steps and not converged:
            if pos_dev is None or need_host or chain is None:
                if pos_dev is not None:
                    system.set_positions(np.asarray(pos_dev)[: len(system)])
                    pos_dev = None
                if first or (self.check_beta and need_host):
                    system.calc = calc
                    system.get_potential_energy()
                    first = False
                else:
                    calc.system = system
                    calc._make_cfg(system)
                model = calc.model
                cfg = calc.cfg
                dtype = cfg.positions.dtype
                from ..md.device_md import DeviceMD

                ma = model.full_model_arrays()
                vs = model.vscale_for(np.asarray(cfg.numbers))
                vs = np.where(np.isfinite(vs), vs, DeviceMD._VS_UNSEEN)
                npad = cfg.positions.shape[0]
                pos0 = np.zeros((npad, 3))
                pos0[: len(system)] = calc._nlcache._pos
                # (re)build the FIRE velocity at the chain's padding: a
                # sampling event can grow npad, so the device copy from
                # the previous chain may be the wrong shape
                varr = np.zeros((npad, 3))
                if self._v is not None:
                    varr[: len(system)] = self._v
                v_dev = jnp.asarray(varr, dtype=dtype)
                beta_thresh = calc.ediff if self.check_beta else np.inf
                from ..neighbors_device import device_rebuild_ok

                rcut = eng.params.rc + calc._nlcache.skin
                inloop = self.in_loop_rebuild and device_rebuild_ok(
                    system.cell, system.pbc, rcut
                )
                sidx_atom = sidx_ok = cut = None
                if inloop:
                    sidx = eng.species_index(np.asarray(cfg.numbers))
                    sidx_atom = jnp.asarray(
                        np.maximum(sidx, 0).astype(np.int32)
                    )
                    sidx_ok = jnp.asarray(sidx >= 0)
                    cut = jnp.asarray(rcut, dtype=dtype)
                chain = dict(
                    inloop=inloop, sidx_atom=sidx_atom, sidx_ok=sidx_ok,
                    cut=cut, cfg=cfg, ma=ma, radii=eng.radii_table(),
                    znum=eng.znum_table(), vs=jnp.asarray(vs, dtype=dtype),
                    pos0=jnp.asarray(pos0, dtype=dtype),
                    skin=jnp.asarray(0.5 * calc._nlcache.skin, dtype=dtype),
                    bthr=jnp.asarray(beta_thresh, dtype=dtype),
                    beta_thresh=beta_thresh,
                )
            else:
                chain["cfg"] = chain["cfg"]._replace(positions=pos_dev)

            n = min(self.chunk, steps - done)
            dtype = chain["cfg"].positions.dtype
            p = self.params
            chem_z, mixL = eng.chem_args()
            inloop_kw = {}
            if chain["inloop"]:
                inloop_kw = dict(rebuild=True, rebuild_cut=chain["cut"],
                                 sidx_atom=chain["sidx_atom"],
                                 sidx_ok=chain["sidx_ok"])
            out = fire_chunk(
                chain["cfg"], chain["ma"], chain["radii"], chain["znum"],
                chain["vs"], v_dev, chain["pos0"],
                jnp.asarray(self.dt_cur, dtype=dtype),
                jnp.asarray(self.a, dtype=dtype),
                jnp.asarray(self.n_uphill, dtype=dtype),
                chain["skin"],
                jnp.asarray(fmax, dtype=dtype), chain["bthr"],
                jnp.asarray(n, dtype=jnp.int32),
                jnp.asarray(p["maxstep"], dtype=dtype),
                jnp.asarray(p["dtmax"], dtype=dtype),
                jnp.asarray(p["nmin"], dtype=dtype),
                jnp.asarray(p["finc"], dtype=dtype),
                jnp.asarray(p["fdec"], dtype=dtype),
                jnp.asarray(p["astart"], dtype=dtype),
                jnp.asarray(p["fa"], dtype=dtype),
                chem_z=chem_z, mixL=mixL,
                params=eng.params, exponent=eng.exponent,
                pair_terms=eng.pair_terms, check_beta=self.check_beta,
                kind=eng.kernel_kind, **inloop_kw,
            )
            if chain["inloop"]:
                (pos, v, f, e, beta_max, fmax_cur, dtc, a, nu, i, tbl,
                 p0) = out
                c = chain["cfg"]
                rv = tbl[4] if c.nbr_rev is not None else None
                chain["cfg"] = c._replace(
                    nbr_idx=tbl[0], nbr_off=tbl[1], nbr_sidx=tbl[2],
                    nbr_mask=tbl[3], nbr_rev=rv,
                )
                chain["pos0"] = p0
            else:
                pos, v, f, e, beta_max, fmax_cur, dtc, a, nu, i = out
            self.dt_cur = float(dtc)
            self.a = float(a)
            self.n_uphill = float(nu)
            ndone = int(i)
            pos_dev, v_dev = pos, v
            self._v = np.asarray(v)[: len(system)]
            fmax_cur = float(fmax_cur)
            self.log(fmax_cur, float(e))
            converged = fmax_cur < fmax
            need_host = (
                self.check_beta and float(beta_max) >= chain["beta_thresh"]
            )
            if converged:
                done += ndone
                self.nsteps += ndone
                break
            if ndone < n and not need_host:
                # unserviceable skin breach (bucket overflow without the
                # in-loop rebuild's growth path): host rebuild next round
                chain = None
            if ndone == 0:
                # no progress: a host visit (sampling or rebuild) should
                # resolve it; if one already failed to — e.g. the device
                # beta stays marginally above threshold while host
                # sampling declines (the DeviceMD stall scenario) —
                # force ONE host FIRE step to move the geometry
                self._stall = getattr(self, "_stall", 0) + 1
                if self._stall >= 2:
                    from .fire import FIRE

                    system.set_positions(np.asarray(pos_dev)[: len(system)])
                    pos_dev = None
                    chain = None
                    system.calc = calc
                    p = self.params
                    opt = FIRE(system, dt=p["dt"], maxstep=p["maxstep"],
                               dtmax=p["dtmax"], nmin=int(p["nmin"]),
                               finc=p["finc"], fdec=p["fdec"],
                               astart=p["astart"], fa=p["fa"])
                    opt.dt = self.dt_cur
                    opt.a = self.a
                    opt.n_uphill = int(self.n_uphill)
                    if self._v is not None:
                        opt.v = self._v.copy()
                    opt.step(system.get_forces())
                    self.dt_cur = opt.dt
                    self.a = opt.a
                    self.n_uphill = float(opt.n_uphill)
                    self._v = opt.v.copy()
                    ndone = 1
                    self._stall = 0
            else:
                self._stall = 0
            done += ndone
            self.nsteps += ndone
        if pos_dev is not None:
            system.set_positions(np.asarray(pos_dev)[: len(system)])
        # refresh calc.results at the final geometry for callers that read
        # energies right after (host Optimizer leaves the calc current)
        system.calc = calc
        system.get_potential_energy()
        return converged
