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

from ..md.device_md import (_committee_e, _inloop_table, _sgpr_forces,
                            check_plain_surface, committee_models,
                            committee_stack)


def _committee_forces(pos, cfg, models, radii, znum, vscale_atoms, mean_e,
                      params, exponent, pair_terms, chem_z, mixL, kind,
                      check_beta):
    """(energy, forces, beta_max) of the weighted committee — the FIRE
    counterpart of md_chunk_committee's physics (device_md._committee_e,
    reference active_bcm.py weight math)."""

    def energy(p):
        return _committee_e(p, cfg.cell, cfg, models, radii, znum,
                            vscale_atoms, mean_e, params, exponent,
                            pair_terms, chem_z, mixL, kind)

    (e, bmax), g = jax.value_and_grad(energy, has_aux=True)(pos)
    f = -g * cfg.atom_mask[:, None]
    if not check_beta:
        bmax = jnp.zeros((), dtype=pos.dtype)
    return e, f, bmax


@partial(
    jax.jit,
    static_argnames=("params", "exponent", "pair_terms", "check_beta",
                     "kind", "rebuild", "committee"),
)
def fire_cell_chunk(
    cfg,
    model,
    radii,
    znum,
    vscale_atom,
    v,  # (N, 3) FIRE velocity of the (undeformed) positions
    v_def,  # (3, 3) FIRE velocity of the scaled deformation rows
    deform,  # (3, 3) current deformation gradient
    cell0,  # (3, 3) reference cell (deform applies to it)
    pos0,  # (N, 3) REAL-coordinate table-build origin
    tbl_cell,  # (3, 3) cell the incoming table was built with
    offmax,  # scalar max Sum|off| of the incoming table
    dt,
    a,
    n_uphill,
    skin_half,
    fmax_target,
    beta_thresh,
    nsteps,
    cell_factor,
    pressure,  # scalar external pressure (eV/A^3)
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
    rebuild=False,
    rebuild_cut=None,
    sidx_atom=None,
    sidx_ok=None,
    committee=False,  # model/vscale carry a leading expert axis
    mean_e=None,  # (E,) per-expert mean energies (committee)
):
    """Variable-cell FIRE on device: the exact opt/filters.UnitCellFilter
    + opt/fire.FIRE composition — positions in the undeformed frame plus
    3 scaled deformation rows form ONE optimization vector; the strain
    rows' forces are -vol*(stress + P*I)/cell_factor, with the stress
    tensor from the SAME backward pass as the forces
    (md/device_npt._sgpr_forces_virial, aniso).  Table validity under
    the moving cell uses the NPT chunk's displacement + image-drift
    metric (moving_cell_breach).  cfg.positions are REAL coordinates
    (pos_und @ deform.T).  Returns (pos_real, v, v_def, deform, f, e,
    beta_max, fmax, dt, a, n_uphill, ndone[, tbl, pos0, tbl_cell,
    offmax])."""
    amask = cfg.atom_mask[:, None]
    cfg_with, tbl0, rebuild_fn = _inloop_table(
        cfg, rebuild, rebuild_cut, sidx_atom, sidx_ok
    )
    if not rebuild:
        tbl0 = ()

    def forces_fn(pos, cell, tbl=None):
        # e, f (real frame), deps = vol*stress tensor, beta
        if committee:
            from ..md.device_npt import _committee_forces_virial

            return _committee_forces_virial(
                pos, cell, cfg_with(tbl), model, radii, znum,
                vscale_atom, mean_e, params, exponent, pair_terms,
                chem_z, mixL, kind, check_beta, aniso=True,
            )
        from ..md.device_npt import _sgpr_forces_virial

        return _sgpr_forces_virial(
            pos, cell, cfg_with(tbl), model, radii, znum, vscale_atom,
            params, exponent, pair_terms, chem_z, mixL, kind, check_beta,
            aniso=True,
        )

    return _fire_cell_loop(
        forces_fn, cfg.positions, amask, v, v_def, deform, cell0, pos0,
        tbl_cell, offmax, dt, a, n_uphill, skin_half, fmax_target,
        beta_thresh, nsteps, cell_factor, pressure, maxstep, dtmax, nmin,
        finc, fdec, astart, fa, check_beta,
        tbl0=tbl0, rebuild_fn=rebuild_fn, rebuild_cut=rebuild_cut,
    )


def _fire_cell_loop(forces_fn, positions, amask, v, v_def, deform, cell0,
                    pos0, tbl_cell, offmax, dt, a, n_uphill, skin_half,
                    fmax_target, beta_thresh, nsteps, cell_factor,
                    pressure, maxstep, dtmax, nmin, finc, fdec, astart,
                    fa, check_beta, tbl0=(), rebuild_fn=None,
                    rebuild_cut=None, omax_of=None):
    """The variable-cell FIRE while-loop, shared by the single-device/
    committee chunk (:func:`fire_cell_chunk`) and the mesh-sharded chunk
    (parallel/mesh.sharded_fire_cell_chunk).  ``forces_fn(pos, cell,
    tbl) -> (e, f_real, deps=vol*stress, beta_max)``; ``rebuild_fn(pos,
    cell) -> (tbl, ok)`` enables in-loop table rebuilds; ``omax_of``
    overrides the rebuilt-table lever-arm reduction (mesh: pmax'd).
    Returns fire_cell_chunk's tuple contract."""
    from ..kernels import precise_sum
    from ..md.device_npt import (_min_perp_width, moving_cell_breach,
                                 offsum_max)

    rebuild = rebuild_fn is not None
    omax_of = omax_of or offsum_max
    dtype = positions.dtype
    eye = jnp.eye(3, dtype=dtype)

    def breach(pos, p0, cell, tcell, omax):
        return moving_cell_breach(pos, p0, cell, tcell, omax, amask,
                                  skin_half)

    def maybe_rebuild(pos, cell, tbl, p0, tcell, omax):
        def do_rebuild(args):
            pos, cell, tbl, p0, tcell, omax = args
            new_tbl, rok = rebuild_fn(pos, cell)
            rok = rok & (_min_perp_width(cell) >= 2.0 * rebuild_cut)
            tbl2 = jax.tree.map(
                lambda n, o: jnp.where(rok, n, o), new_tbl, tbl
            )
            return (tbl2, jnp.where(rok, pos, p0),
                    jnp.where(rok, cell, tcell),
                    jnp.where(rok,
                              omax_of(new_tbl[1], new_tbl[3], dtype),
                              omax), rok)

        def no_rebuild(args):
            pos, cell, tbl, p0, tcell, omax = args
            return tbl, p0, tcell, omax, jnp.ones((), bool)

        return jax.lax.cond(
            breach(pos, p0, cell, tcell, omax), do_rebuild, no_rebuild,
            (pos, cell, tbl, p0, tcell, omax),
        )

    def eval_all(pos_und, deform, tbl):
        pos = pos_und @ deform.T * amask
        cell = cell0 @ deform.T
        e, f, deps, beta_max = forces_fn(pos, cell, tbl)
        vol = jnp.abs(jnp.linalg.det(cell))
        f_und = (f @ deform) * amask
        f_def = (-deps - pressure * vol * eye) / cell_factor
        return pos, cell, e, f_und, f_def, beta_max

    def fmax_of(f_und, f_def):
        fa_ = ((f_und * f_und) * amask).sum(-1).max()
        fd_ = (f_def * f_def).sum(-1).max()
        return jnp.sqrt(jnp.maximum(fa_, fd_))

    def move(pos_und, defc, v, v_def, f_und, f_def, dt, a, n_uphill):
        # FIRE over the stacked (positions + scaled-deform) vector;
        # defc = deform * cell_factor (the filter's x rows).  f_und is a
        # matmul product (f @ deform): its reductions go through
        # precise_sum per the reduce-of-dot rule (CLAUDE.md; measured a
        # null on the current backend for this minor-dim-3 shape, but
        # the barrier costs nothing and the rule is load-bearing)
        vf = (precise_sum((f_und * v) * amask)
              + precise_sum(f_def * v_def))
        up = vf > 0
        fn = jnp.sqrt(precise_sum((f_und**2) * amask)
                      + precise_sum(f_def**2))
        vn = jnp.sqrt(((v**2) * amask).sum() + (v_def**2).sum())
        mixs = a * vn / (fn + 1e-30)
        v = jnp.where(up, (1.0 - a) * v + mixs * f_und, jnp.zeros_like(v))
        v_def = jnp.where(up, (1.0 - a) * v_def + mixs * f_def,
                          jnp.zeros_like(v_def))
        inc = up & (n_uphill > nmin)
        dt = jnp.where(
            inc, jnp.minimum(dt * finc, dtmax), jnp.where(up, dt, dt * fdec)
        )
        a = jnp.where(inc, a * fa, jnp.where(up, a, astart))
        n_uphill = jnp.where(up, n_uphill + 1, jnp.zeros_like(n_uphill))
        v = v + dt * f_und
        v_def = v_def + dt * f_def
        dr = dt * v
        dr_def = dt * v_def
        norm2 = jnp.maximum(((dr * dr) * amask).sum(-1).max(),
                            (dr_def * dr_def).sum(-1).max())
        norm = jnp.sqrt(norm2)
        sc = jnp.where(norm > maxstep, maxstep / (norm + 1e-30), 1.0)
        pos_und = pos_und + sc * dr * amask
        defc = defc + sc * dr_def
        return pos_und, defc, v, v_def, dt, a, n_uphill

    # initial state: real positions -> undeformed frame
    pos_und0 = jnp.linalg.solve(deform.T, positions.T).T * amask
    defc0 = deform * cell_factor
    if rebuild:
        tbl0, p00, tcell0, omax0, ok0 = maybe_rebuild(
            positions, cell0 @ deform.T, tbl0, pos0, tbl_cell, offmax
        )
    else:
        p00, tcell0, omax0 = pos0, tbl_cell, offmax
        ok0 = ~breach(positions, pos0, cell0 @ deform.T, tbl_cell,
                      offmax)
    _, _, e0, fu0, fd0, b0 = eval_all(pos_und0, deform, tbl0)
    fm0 = fmax_of(fu0, fd0)

    def cond(state):
        (pu, defc, v, vd, fu, fd, e, bm, fm, dt, a, nu, i, tbl, p0,
         tcell, omax, ok) = state
        go = (i < nsteps) & ok & (fm >= fmax_target)
        if check_beta:
            go = go & (bm < beta_thresh)
        return go

    def body(state):
        (pu, defc, v, vd, fu, fd, e, bm, fm, dt, a, nu, i, tbl, p0,
         tcell, omax, ok) = state
        pu, defc, v, vd, dt, a, nu = move(pu, defc, v, vd, fu, fd, dt,
                                          a, nu)
        deform_i = defc / cell_factor
        pos = pu @ deform_i.T * amask
        cell = cell0 @ deform_i.T
        if rebuild:
            tbl, p0, tcell, omax, ok = maybe_rebuild(
                pos, cell, tbl, p0, tcell, omax
            )
        else:
            ok = ~breach(pos, p0, cell, tcell, omax)
        _, _, e, fu, fd, bm = eval_all(pu, deform_i, tbl)
        return (pu, defc, v, vd, fu, fd, e, bm, fmax_of(fu, fd), dt, a,
                nu, i + 1, tbl, p0, tcell, omax, ok)

    init = (pos_und0, defc0, v, v_def, fu0, fd0, e0, b0, fm0, dt, a,
            n_uphill, jnp.zeros((), jnp.int32), tbl0, p00, tcell0,
            omax0, ok0)
    (pu, defc, v, vd, fu, fd, e, bm, fm, dt, a, nu, i, tbl, p0, tcell,
     omax, ok) = jax.lax.while_loop(cond, body, init)
    deform_f = defc / cell_factor
    pos_real = pu @ deform_f.T * amask
    out = (pos_real, v, vd, deform_f, fu, e, bm, fm, dt, a, nu, i)
    if rebuild:
        return out + (tbl, p0, tcell, omax)
    return out


@partial(
    jax.jit,
    static_argnames=("params", "exponent", "pair_terms", "check_beta",
                     "kind", "rebuild", "committee"),
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
    committee=False,  # model/vscale carry a leading expert axis
    mean_e=None,  # (E,) per-expert mean energies (committee)
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
        if committee:
            return _committee_forces(
                pos, cfg_with(tbl), model, radii, znum, vscale_atom,
                mean_e, params, exponent, pair_terms, chem_z, mixL,
                kind, check_beta,
            )
        return _sgpr_forces(
            pos, cfg_with(tbl), model, radii, znum, vscale_atom, params,
            exponent, pair_terms, chem_z, mixL, kind, check_beta,
        )

    if not rebuild:
        tbl0 = ()
    return _fire_loop(
        forces_fn, cfg.positions, amask, v, pos0, dt, a, n_uphill,
        skin_half, fmax_target, beta_thresh, nsteps, maxstep, dtmax,
        nmin, finc, fdec, astart, fa, check_beta,
        tbl0=tbl0, rebuild_fn=rebuild_fn,
    )


def _fire_loop(forces_fn, positions, amask, v, pos0, dt, a, n_uphill,
               skin_half, fmax_target, beta_thresh, nsteps, maxstep,
               dtmax, nmin, finc, fdec, astart, fa, check_beta,
               tbl0=(), rebuild_fn=None):
    """The FIRE while-loop, shared by the single-device/committee chunk
    (fire_chunk) and the mesh-sharded chunk
    (parallel/mesh.sharded_fire_chunk).  ``forces_fn(pos, tbl) ->
    (e, f, beta_max)``; ``rebuild_fn(pos) -> (tbl, ok)`` enables in-loop
    table rebuilds.  Returns fire_chunk's tuple contract."""
    rebuild = rebuild_fn is not None

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
        tbl0, p00, ok0 = maybe_rebuild(positions, tbl0, pos0)
    else:
        p00 = pos0
        ok0 = ~breach(positions, pos0)
    e0, f0, b0 = forces_fn(positions, tbl0)
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

    init = (positions, v, f0, e0, b0, fm0, dt, a, n_uphill,
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
    relaxation resumes on the updated model.  ``cell=True`` relaxes the
    cell too — the exact opt/filters.UnitCellFilter composition runs
    on-chip, with the strain rows' forces (-vol*(stress + P*I)/
    cell_factor) taken from the same backward pass as the atom forces.
    BCM committees are served on-device (the weighted committee energy
    of device_md._committee_e, with forces/virial from its gradient).
    """

    def __init__(self, system, calc, dt=0.1, maxstep=0.2, dtmax=1.0, nmin=5,
                 finc=1.1, fdec=0.5, astart=0.1, fa=0.99, logfile=None,
                 chunk=50, check_beta=None, in_loop_rebuild=True,
                 cell=False, scalar_pressure=0.0, cell_factor=None):
        check_plain_surface(calc, "DeviceFIRE")
        # under a mesh the whole FIRE loop runs SPMD
        # (parallel/mesh.sharded_fire_chunk / sharded_fire_cell_chunk)
        self.mesh = getattr(calc.engine, "mesh", None)
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
        # variable-cell mode: the opt/filters.UnitCellFilter composition
        # on-chip — positions (undeformed frame) + 3 scaled deformation
        # rows form one FIRE vector; strain forces come from the same
        # backward pass as the atom forces
        self.cell = bool(cell)
        self.pressure = float(scalar_pressure)
        self.cell_factor = float(cell_factor or len(system))
        self.cell0 = np.asarray(system.cell).copy()
        self.deform = np.eye(3)
        self._v_def = np.zeros((3, 3))
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
                    if self.cell:
                        system.set_cell(self.cell0 @ self.deform.T)
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

                committee = committee_models(calc)
                if committee:
                    if not hasattr(self, "_committee_state"):
                        self._committee_state = {}
                    ma, vs, mean_e = committee_stack(
                        calc, system, committee, cfg,
                        self._committee_state,
                    )
                else:
                    mean_e = None
                    ma = model.full_model_arrays()
                    vs = model.vscale_for(np.asarray(cfg.numbers))
                    vs = np.where(np.isfinite(vs), vs, DeviceMD._VS_UNSEEN)
                oidx = gmask = vsj = None
                if self.mesh is not None:
                    from ..parallel.mesh import pad_for_mesh

                    cfg, ma, oidx, vsj, gmask = pad_for_mesh(
                        cfg, ma, vs, self.mesh, dtype,
                        committee=bool(committee),
                    )
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
                inloop = (
                    self.in_loop_rebuild
                    and device_rebuild_ok(system.cell, system.pbc, rcut)
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
                    znum=eng.znum_table(),
                    vs=(vsj if self.mesh is not None
                        else jnp.asarray(vs, dtype=dtype)),
                    oidx=oidx, gmask=gmask,
                    mean_e=(None if mean_e is None
                            else jnp.asarray(mean_e, dtype=dtype)),
                    pos0=jnp.asarray(pos0, dtype=dtype),
                    skin=jnp.asarray(0.5 * calc._nlcache.skin, dtype=dtype),
                    bthr=jnp.asarray(beta_thresh, dtype=dtype),
                    beta_thresh=beta_thresh,
                )
                if self.cell:
                    off = np.abs(np.asarray(cfg.nbr_off,
                                            dtype=np.int64)).sum(-1)
                    msk = np.asarray(cfg.nbr_mask)
                    chain["offmax"] = jnp.asarray(
                        float(off[msk].max()) if msk.any() else 0.0,
                        dtype=dtype,
                    )
                    # the table was just built with the system's cell
                    chain["tbl_cell"] = jnp.asarray(
                        np.asarray(system.cell), dtype=dtype
                    )
                    chain["cell0"] = jnp.asarray(self.cell0, dtype=dtype)
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
            fire_consts = (
                jnp.asarray(p["maxstep"], dtype=dtype),
                jnp.asarray(p["dtmax"], dtype=dtype),
                jnp.asarray(p["nmin"], dtype=dtype),
                jnp.asarray(p["finc"], dtype=dtype),
                jnp.asarray(p["fdec"], dtype=dtype),
                jnp.asarray(p["astart"], dtype=dtype),
                jnp.asarray(p["fa"], dtype=dtype),
            )
            common_kw = dict(
                chem_z=chem_z, mixL=mixL,
                params=eng.params, exponent=eng.exponent,
                pair_terms=eng.pair_terms, check_beta=self.check_beta,
                kind=eng.kernel_kind,
                committee=chain["mean_e"] is not None,
                mean_e=chain["mean_e"],
                **inloop_kw,
            )
            def graft(tbl, p0):
                # rebuilt table back onto the chain (device arrays)
                c = chain["cfg"]
                rv = tbl[4] if c.nbr_rev is not None else None
                chain["cfg"] = c._replace(
                    nbr_idx=tbl[0], nbr_off=tbl[1], nbr_sidx=tbl[2],
                    nbr_mask=tbl[3], nbr_rev=rv,
                )
                chain["pos0"] = p0

            if self.cell and self.mesh is not None:
                from ..parallel.mesh import sharded_fire_cell_chunk

                out = sharded_fire_cell_chunk(
                    chain["cfg"], chain["ma"], chain["radii"],
                    chain["znum"], chain["vs"], chain["gmask"], v_dev,
                    jnp.asarray(self._v_def, dtype=dtype),
                    jnp.asarray(self.deform, dtype=dtype),
                    chain["cell0"], chain["pos0"],
                    jnp.asarray(self.dt_cur, dtype=dtype),
                    jnp.asarray(self.a, dtype=dtype),
                    jnp.asarray(self.n_uphill, dtype=dtype),
                    chain["skin"],
                    jnp.asarray(fmax, dtype=dtype), chain["bthr"],
                    jnp.asarray(n, dtype=jnp.int32),
                    jnp.asarray(self.cell_factor, dtype=dtype),
                    jnp.asarray(self.pressure, dtype=dtype),
                    *fire_consts,
                    chain["oidx"], mesh=self.mesh,
                    chem_z=chem_z, mixL=mixL,
                    params=eng.params, exponent=eng.exponent,
                    pair_terms=eng.pair_terms,
                    check_beta=self.check_beta,
                    kind=eng.kernel_kind,
                    committee=chain["mean_e"] is not None,
                    mean_e=chain["mean_e"],
                    tbl_cell=chain["tbl_cell"],
                    offmax=chain["offmax"],
                    **inloop_kw,
                )
                if chain["inloop"]:
                    (pos, v, vd, deform, f, e, beta_max, fmax_cur, dtc,
                     a, nu, i, tbl, p0, tcell, omax) = out
                    graft(tbl, p0)
                    chain["tbl_cell"] = tcell
                    chain["offmax"] = omax
                else:
                    (pos, v, vd, deform, f, e, beta_max, fmax_cur, dtc,
                     a, nu, i) = out
                self.deform = np.asarray(deform)
                self._v_def = np.asarray(vd)
            elif self.cell:
                out = fire_cell_chunk(
                    chain["cfg"], chain["ma"], chain["radii"],
                    chain["znum"], chain["vs"], v_dev,
                    jnp.asarray(self._v_def, dtype=dtype),
                    jnp.asarray(self.deform, dtype=dtype),
                    chain["cell0"], chain["pos0"],
                    chain["tbl_cell"], chain["offmax"],
                    jnp.asarray(self.dt_cur, dtype=dtype),
                    jnp.asarray(self.a, dtype=dtype),
                    jnp.asarray(self.n_uphill, dtype=dtype),
                    chain["skin"],
                    jnp.asarray(fmax, dtype=dtype), chain["bthr"],
                    jnp.asarray(n, dtype=jnp.int32),
                    jnp.asarray(self.cell_factor, dtype=dtype),
                    jnp.asarray(self.pressure, dtype=dtype),
                    *fire_consts,
                    **common_kw,
                )
                if chain["inloop"]:
                    (pos, v, vd, deform, f, e, beta_max, fmax_cur, dtc,
                     a, nu, i, tbl, p0, tcell, omax) = out
                    graft(tbl, p0)
                    chain["tbl_cell"] = tcell
                    chain["offmax"] = omax
                else:
                    (pos, v, vd, deform, f, e, beta_max, fmax_cur, dtc,
                     a, nu, i) = out
                self.deform = np.asarray(deform)
                self._v_def = np.asarray(vd)
            elif self.mesh is not None:
                from ..parallel.mesh import sharded_fire_chunk

                out = sharded_fire_chunk(
                    chain["cfg"], chain["ma"], chain["radii"],
                    chain["znum"], chain["vs"], chain["gmask"], v_dev,
                    chain["pos0"],
                    jnp.asarray(self.dt_cur, dtype=dtype),
                    jnp.asarray(self.a, dtype=dtype),
                    jnp.asarray(self.n_uphill, dtype=dtype),
                    chain["skin"],
                    jnp.asarray(fmax, dtype=dtype), chain["bthr"],
                    jnp.asarray(n, dtype=jnp.int32),
                    *fire_consts,
                    chain["oidx"], mesh=self.mesh,
                    chem_z=chem_z, mixL=mixL,
                    params=eng.params, exponent=eng.exponent,
                    pair_terms=eng.pair_terms,
                    check_beta=self.check_beta,
                    kind=eng.kernel_kind,
                    committee=chain["mean_e"] is not None,
                    mean_e=chain["mean_e"],
                    **inloop_kw,
                )
                if chain["inloop"]:
                    (pos, v, f, e, beta_max, fmax_cur, dtc, a, nu, i,
                     tbl, p0) = out
                    graft(tbl, p0)
                else:
                    pos, v, f, e, beta_max, fmax_cur, dtc, a, nu, i = out
            else:
                out = fire_chunk(
                    chain["cfg"], chain["ma"], chain["radii"],
                    chain["znum"], chain["vs"], v_dev, chain["pos0"],
                    jnp.asarray(self.dt_cur, dtype=dtype),
                    jnp.asarray(self.a, dtype=dtype),
                    jnp.asarray(self.n_uphill, dtype=dtype),
                    chain["skin"],
                    jnp.asarray(fmax, dtype=dtype), chain["bthr"],
                    jnp.asarray(n, dtype=jnp.int32),
                    *fire_consts,
                    **common_kw,
                )
                if chain["inloop"]:
                    (pos, v, f, e, beta_max, fmax_cur, dtc, a, nu, i, tbl,
                     p0) = out
                    graft(tbl, p0)
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

                    if self.cell:
                        system.set_cell(self.cell0 @ self.deform.T)
                    system.set_positions(np.asarray(pos_dev)[: len(system)])
                    pos_dev = None
                    chain = None
                    system.calc = calc
                    p = self.params
                    if self.cell:
                        from .filters import UnitCellFilter

                        target = UnitCellFilter(
                            system, scalar_pressure=self.pressure,
                            cell_factor=self.cell_factor,
                        )
                        target.cell0 = self.cell0.copy()
                        target.deform = self.deform.copy()
                    else:
                        target = system
                    opt = FIRE(target, dt=p["dt"], maxstep=p["maxstep"],
                               dtmax=p["dtmax"], nmin=int(p["nmin"]),
                               finc=p["finc"], fdec=p["fdec"],
                               astart=p["astart"], fa=p["fa"])
                    opt.dt = self.dt_cur
                    opt.a = self.a
                    opt.n_uphill = int(self.n_uphill)
                    if self._v is not None:
                        opt.v = (
                            np.concatenate([self._v, self._v_def])
                            if self.cell
                            else self._v.copy()
                        )
                    opt.step(target.get_forces())
                    self.dt_cur = opt.dt
                    self.a = opt.a
                    self.n_uphill = float(opt.n_uphill)
                    if self.cell:
                        self._v = opt.v[:-3].copy()
                        self._v_def = opt.v[-3:].copy()
                        self.deform = target.deform.copy()
                    else:
                        self._v = opt.v.copy()
                    ndone = 1
                    self._stall = 0
            else:
                self._stall = 0
            done += ndone
            self.nsteps += ndone
        if pos_dev is not None:
            if self.cell:
                system.set_cell(self.cell0 @ self.deform.T)
            system.set_positions(np.asarray(pos_dev)[: len(system)])
        # refresh calc.results at the final geometry for callers that read
        # energies right after (host Optimizer leaves the calc current)
        system.calc = calc
        system.get_potential_energy()
        return converged
