"""Device-resident NEB: the whole band relaxes inside one jitted loop.

The host path (opt/neb.py NEB + FIRE, the role of ase.mep.NEB in
reference theforce/cl/neb.py) pays one host<->device round trip per
image per iteration — a 7-image band costs 7 dispatches per FIRE step.
Here ALL images' forces are one vmapped evaluation (the replica layout
of md/device_md.md_chunk_replicas), the improved-tangent projection
(Henkelman-Jonsson, JCP 113, 9978 (2000)), the spring forces, the
optional climbing image (JCP 113, 9901 (2000)), and the band FIRE
update run inside one ``lax.while_loop``.

Host re-entry: band convergence, an uncertainty trip on ANY image
(active learning samples at the exact band geometry — every image is
then re-evaluated through the full calculator, exactly what the host
NEB's _compute does), a Verlet-skin breach on any image (between-chunk
table rebuild, like ReplicaMD), or the step budget.

The math is exactly opt/neb.NEB.get_forces + opt/fire.FIRE.step over
the stacked interior coordinates, so device bands equal the host
optimizer's to float rounding while no FIRE branch sits on an fp knife
edge (see tests/test_device_neb.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..md.device_md import _sgpr_forces, check_plain_surface


@partial(
    jax.jit,
    static_argnames=("params", "exponent", "pair_terms", "check_beta",
                     "kind", "climb", "committee"),
)
def neb_chunk(
    cfgs,  # ConfigArrays, every leaf with a leading image axis R
    model,
    radii,
    znum,
    vscale_atom,  # (N,) shared across images ((E, N) for committees)
    v,  # (R, N, 3) band FIRE velocity (zeros on endpoints)
    pos0,  # (R, N, 3) table-build origins
    dt,
    a,
    n_uphill,
    skin_half,
    fmax_target,
    beta_thresh,
    nsteps,
    k_spring,
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
    climb=False,
    committee=False,  # model/vscale carry a leading expert axis
    mean_e=None,  # (E,) per-expert mean energies (committee)
):
    """Up to ``nsteps`` band-FIRE iterations on device; early exit on
    band convergence (max interior |F_neb| < fmax_target, checked BEFORE
    the step like Optimizer.run), an uncertainty trip on any image, or a
    skin breach on any image.  ``committee=True`` relaxes the band on a
    weighted BCM committee (device_md._committee_e, reference
    active_bcm.py:589-633 weight math); the trip scalar is then the
    committee covloss floor maxed over images.  Returns (pos, v, f_neb,
    e (R,), beta_max, fmax, dt, a, n_uphill, ndone)."""
    amask = cfgs.atom_mask[0][:, None]  # (N, 1): images share the system

    if committee:
        from ..md.device_md import _committee_e

        def forces_one(pos, cfg):
            def energy(p):
                return _committee_e(
                    p, cfg.cell, cfg, model, radii, znum, vscale_atom,
                    mean_e, params, exponent, pair_terms, chem_z, mixL,
                    kind,
                )

            (e, bmax), g = jax.value_and_grad(energy, has_aux=True)(pos)
            if not check_beta:
                bmax = jnp.zeros((), dtype=pos.dtype)
            return e, -g * amask, bmax

    else:

        def forces_one(pos, cfg):
            return _sgpr_forces(
                pos, cfg, model, radii, znum, vscale_atom, params,
                exponent, pair_terms, chem_z, mixL, kind, check_beta,
            )

    forces_v = jax.vmap(forces_one, in_axes=(0, 0))

    def forces_all(pos):
        e, f, beta = forces_v(pos, cfgs)  # (R,), (R,N,3), (R,)
        bmax = beta.max() if check_beta else jnp.zeros((), pos.dtype)
        return e, f, bmax

    return _neb_loop(
        forces_all, cfgs.positions, amask, v, pos0, dt, a, n_uphill,
        skin_half, fmax_target, beta_thresh, nsteps, k_spring, maxstep,
        dtmax, nmin, finc, fdec, astart, fa, check_beta, climb,
    )


def _neb_loop(forces_all, positions, amask, v, pos0, dt, a, n_uphill,
              skin_half, fmax_target, beta_thresh, nsteps, k_spring,
              maxstep, dtmax, nmin, finc, fdec, astart, fa, check_beta,
              climb):
    """The band while-loop shared by the single-device/committee chunk
    (:func:`neb_chunk`) and the mesh-sharded chunk
    (parallel/mesh.sharded_neb_chunk).  ``forces_all(pos (R,N,3)) ->
    (e (R,), f (R,N,3), beta_max scalar)`` returns the raw per-image
    energies/forces with the trip scalar already fully reduced; the
    improved-tangent projection, springs, climbing image, and the band
    FIRE update live here.  Returns neb_chunk's tuple contract."""
    R = positions.shape[0]
    # interior-image mask for the FIRE reductions / position updates
    imask = jnp.arange(R)
    imask = ((imask > 0) & (imask < R - 1)).astype(positions.dtype)
    imask3 = imask[:, None, None]

    def neb_forces(pos):
        """Energies + NEB-projected forces (opt/neb.NEB.get_forces with
        the improved tangent, vectorized over interior images)."""
        e, f, beta_max = forces_all(pos)  # (R,), (R,N,3), ()
        Em, E0, Ep = e[:-2], e[1:-1], e[2:]  # neighbors of interior i
        tp = (pos[2:] - pos[1:-1]) * amask  # (R-2, N, 3)
        tm = (pos[1:-1] - pos[:-2]) * amask
        dE_p = jnp.abs(Ep - E0)
        dE_m = jnp.abs(Em - E0)
        dEmax = jnp.maximum(dE_p, dE_m)[:, None, None]
        dEmin = jnp.minimum(dE_p, dE_m)[:, None, None]
        up = ((Ep > E0) & (E0 > Em))[:, None, None]
        dn = ((Ep < E0) & (E0 < Em))[:, None, None]
        hi = (Ep > Em)[:, None, None]
        t = jnp.where(
            up, tp,
            jnp.where(
                dn, tm,
                jnp.where(hi, tp * dEmax + tm * dEmin,
                          tp * dEmin + tm * dEmax),
            ),
        )
        tnorm = jnp.sqrt((t * t).sum(axis=(1, 2), keepdims=True))
        t = t / (tnorm + 1e-30)
        fi = f[1:-1]
        f_par = (fi * t).sum(axis=(1, 2), keepdims=True) * t
        f_perp = fi - f_par
        dp = jnp.sqrt((tp * tp).sum(axis=(1, 2), keepdims=True))
        dm = jnp.sqrt((tm * tm).sum(axis=(1, 2), keepdims=True))
        f_spring = k_spring * (dp - dm) * t
        f_neb = f_perp + f_spring
        if climb:
            imax = jnp.argmax(e)  # over ALL images (host NEB)
            is_climb = (jnp.arange(1, R - 1) == imax)[:, None, None]
            f_neb = jnp.where(is_climb, fi - 2.0 * f_par, f_neb)
        f_out = jnp.concatenate(
            [jnp.zeros_like(f[:1]), f_neb, jnp.zeros_like(f[:1])], axis=0
        )
        return e, f_out, beta_max

    def fmax_of(f):
        return jnp.sqrt(((f * f) * amask).sum(-1).max())

    def breach(pos):
        return (
            ((pos - pos0) ** 2 * amask).sum(-1).max() >= skin_half**2
        )

    def move(pos, v, f, dt, a, n_uphill):
        # opt/fire.FIRE.step over the stacked interior coordinates (the
        # host optimizer sees the band as ONE (R_int*n, 3) vector)
        m = imask3 * amask
        vf = ((f * v) * m).sum()
        up = vf > 0
        fn = jnp.sqrt(((f * f) * m).sum())
        vn = jnp.sqrt(((v * v) * m).sum())
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
        norm = jnp.sqrt(((dr * dr) * m).sum(axis=-1).max())
        dr = dr * jnp.where(norm > maxstep, maxstep / (norm + 1e-30), 1.0)
        pos = pos + dr * m
        return pos, v, dt, a, n_uphill

    e0, f0, b0 = neb_forces(positions)
    fm0 = fmax_of(f0)
    ok0 = ~breach(positions)

    def cond(state):
        pos, v, f, e, beta_max, fm, dt, a, nu, i, ok = state
        go = (i < nsteps) & ok & (fm >= fmax_target)
        if check_beta:
            go = go & (beta_max < beta_thresh)
        return go

    def body(state):
        pos, v, f, e, beta_max, fm, dt, a, nu, i, ok = state
        pos, v, dt, a, nu = move(pos, v, f, dt, a, nu)
        ok = ~breach(pos)
        e, f, beta_max = neb_forces(pos)
        return pos, v, f, e, beta_max, fmax_of(f), dt, a, nu, i + 1, ok

    init = (positions, v, f0, e0, b0, fm0, dt, a, n_uphill,
            jnp.zeros((), jnp.int32), ok0)
    pos, v, f, e, beta_max, fm, dt, a, nu, i, ok = jax.lax.while_loop(
        cond, body, init
    )
    return pos, v, f, e, beta_max, fm, dt, a, nu, i


class DeviceNEB:
    """Chunked on-device NEB relaxation: the band's images are one
    replica-batched device program; the whole improved-tangent NEB +
    FIRE loop runs on-chip.

    ``run(fmax, steps)`` relaxes the interior images in place (host
    Optimizer.run contract) and returns True on convergence;
    ``barrier()`` then evaluates max(E) - E[0] through the calculator.
    """

    def __init__(self, images, calc, k=0.1, climb=False, dt=0.05,
                 maxstep=0.1, dtmax=1.0, nmin=5, finc=1.1, fdec=0.5,
                 astart=0.1, fa=0.99, chunk=50, check_beta=None):
        check_plain_surface(calc, "DeviceNEB")
        # under a mesh the whole band loop runs SPMD
        # (parallel/mesh.sharded_neb_chunk); BCM committees are served
        # on-device via device_md._committee_e (single-chip, like the
        # other committee chunks)
        self.mesh = getattr(calc.engine, "mesh", None)
        n0 = len(images[0])
        for im in images:
            if len(im) != n0 or not np.array_equal(
                np.asarray(im.numbers), np.asarray(images[0].numbers)
            ):
                raise ValueError("NEB images must share atom count/species")
        self.images = images
        self.calc = calc
        self.k = float(k)
        self.climb = bool(climb)
        self.params = dict(dt=float(dt), maxstep=float(maxstep),
                           dtmax=float(dtmax), nmin=float(nmin),
                           finc=float(finc), fdec=float(fdec),
                           astart=float(astart), fa=float(fa))
        self.chunk = int(chunk)
        self.check_beta = (
            check_beta if check_beta is not None else calc.active
        )
        self.nsteps = 0
        self.dt_cur = float(dt)
        self.a = float(astart)
        self.n_uphill = 0.0
        self._v = None  # (R, n, 3) host copy of the band FIRE velocity
        self._npad = 0
        self._kpad = 0

    def _host_eval(self):
        """Evaluate every image through the full calculator (host NEB
        _compute semantics: sampling can trigger on any image)."""
        for im in self.images:
            im.calc = self.calc
            im.get_potential_energy()

    def _build_chain(self):
        from ..neighbors import neighbor_table, round_up

        calc = self.calc
        eng = calc.engine
        cutoff = eng.params.rc + calc._nlcache.skin
        tables = [
            neighbor_table(s.positions, s.cell, s.pbc, cutoff)
            for s in self.images
        ]
        n0 = len(self.images[0])
        self._npad = max(self._npad, round_up(n0, 16))
        kmax = max(t.kmax for t in tables)
        self._kpad = max(self._kpad, round_up(int(kmax * 1.2) + 4, 16))
        cfgs = [
            eng.make_config(s, npad=self._npad, kpad=self._kpad,
                            table=t.pad_to(self._kpad))
            for s, t in zip(self.images, tables)
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cfgs)
        model = calc.model
        dtype = stacked.positions.dtype
        from ..md.device_md import (DeviceMD, committee_models,
                                    committee_stack)

        committee = committee_models(calc)
        if committee:
            if not hasattr(self, "_committee_state"):
                self._committee_state = {}
            cfg0 = jax.tree.map(lambda x: x[0], stacked)
            ma, vs, mean_e = committee_stack(
                calc, self.images[0], committee, cfg0,
                self._committee_state,
            )
        else:
            mean_e = None
            ma = model.full_model_arrays()
            vs = model.vscale_for(self.images[0].numbers)
            vs = np.where(np.isfinite(vs), vs, DeviceMD._VS_UNSEEN)
            vs = np.concatenate([vs, np.zeros(self._npad - n0)])
        oidx = gmask = None
        if self.mesh is not None:
            from ..parallel.mesh import pad_images_for_mesh

            stacked, ma, oidx, vs, gmask = pad_images_for_mesh(
                stacked, ma, vs, self.mesh, dtype,
                committee=bool(committee),
            )
        npad = stacked.positions.shape[1]
        R = len(self.images)
        varr = np.zeros((R, npad, 3))
        if self._v is not None:
            varr[:, :n0] = self._v
        beta_thresh = calc.ediff if self.check_beta else np.inf
        return dict(
            cfgs=stacked,
            ma=ma,
            radii=eng.radii_table(),
            znum=eng.znum_table(),
            vs=(vs if self.mesh is not None
                else jnp.asarray(vs, dtype=dtype)),
            oidx=oidx,
            gmask=gmask,
            mean_e=(None if mean_e is None
                    else jnp.asarray(mean_e, dtype=dtype)),
            v=jnp.asarray(varr, dtype=dtype),
            pos0=stacked.positions,
            skin=jnp.asarray(0.5 * calc._nlcache.skin, dtype=dtype),
            bthr=jnp.asarray(beta_thresh, dtype=dtype),
            beta_thresh=beta_thresh,
            dtype=dtype,
        )

    def _sync_host(self, pos):
        n0 = len(self.images[0])
        arr = np.asarray(pos)
        for r, im in enumerate(self.images):
            im.set_positions(arr[r, :n0])

    def run(self, fmax=0.05, steps=500):
        calc = self.calc
        eng = calc.engine
        done = 0
        first = True
        need_host = True
        chain = None
        pos_dev = v_dev = None
        converged = False
        while done < steps and not converged:
            if chain is None or need_host:
                if pos_dev is not None:
                    self._sync_host(pos_dev)
                    pos_dev = None
                if first or need_host:
                    # full calculator pass over every image (sampling can
                    # trigger on any of them, host NEB _compute semantics)
                    self._host_eval()
                    first = False
                # breach-only rebuilds skip it: _build_chain derives the
                # fresh tables directly (no R force evaluations)
                chain = self._build_chain()
                v_dev = chain["v"]
            else:
                chain["cfgs"] = chain["cfgs"]._replace(positions=pos_dev)
            n = min(self.chunk, steps - done)
            dtype = chain["dtype"]
            p = self.params
            chem_z, mixL = eng.chem_args()
            band_args = (
                jnp.asarray(self.dt_cur, dtype=dtype),
                jnp.asarray(self.a, dtype=dtype),
                jnp.asarray(self.n_uphill, dtype=dtype),
                chain["skin"],
                jnp.asarray(fmax, dtype=dtype), chain["bthr"],
                jnp.asarray(n, dtype=jnp.int32),
                jnp.asarray(self.k, dtype=dtype),
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
                kind=eng.kernel_kind, climb=self.climb,
            )
            if self.mesh is not None:
                from ..parallel.mesh import sharded_neb_chunk

                (pos, v, f, e, beta_max, fm, dtc, a, nu, i) = (
                    sharded_neb_chunk(
                        chain["cfgs"], chain["ma"], chain["radii"],
                        chain["znum"], chain["vs"], chain["gmask"],
                        v_dev, chain["pos0"], *band_args,
                        chain["oidx"], mesh=self.mesh,
                        committee=chain["mean_e"] is not None,
                        mean_e=chain["mean_e"], **common_kw,
                    )
                )
            else:
                (pos, v, f, e, beta_max, fm, dtc, a, nu, i) = neb_chunk(
                    chain["cfgs"], chain["ma"], chain["radii"],
                    chain["znum"], chain["vs"], v_dev, chain["pos0"],
                    *band_args,
                    committee=chain["mean_e"] is not None,
                    mean_e=chain["mean_e"], **common_kw,
                )
            self.dt_cur = float(dtc)
            self.a = float(a)
            self.n_uphill = float(nu)
            ndone = int(i)
            pos_dev, v_dev = pos, v
            n0 = len(self.images[0])
            self._v = np.asarray(v)[:, :n0]
            converged = float(fm) < fmax
            need_host = (
                self.check_beta and float(beta_max) >= chain["beta_thresh"]
            )
            if converged:
                done += ndone
                self.nsteps += ndone
                break
            if ndone < n and not need_host:
                chain = None  # skin breach on some image: rebuild tables
            if ndone == 0:
                # no progress: if a host visit already failed to unstick
                # the loop (sampling vetoed while a device beta stays
                # above threshold), force ONE host band-FIRE step
                self._stall = getattr(self, "_stall", 0) + 1
                if self._stall >= 2:
                    from .fire import FIRE
                    from .neb import NEB

                    self._sync_host(pos_dev)
                    pos_dev = None
                    chain = None
                    for im in self.images:
                        im.calc = calc
                    band = NEB(self.images, k=self.k, climb=self.climb)
                    p = self.params
                    opt = FIRE(band, dt=p["dt"], maxstep=p["maxstep"],
                               dtmax=p["dtmax"], nmin=int(p["nmin"]),
                               finc=p["finc"], fdec=p["fdec"],
                               astart=p["astart"], fa=p["fa"])
                    opt.dt = self.dt_cur
                    opt.a = self.a
                    opt.n_uphill = int(self.n_uphill)
                    if self._v is not None:
                        opt.v = np.concatenate(self._v[1:-1], axis=0)
                    opt.step(band.get_forces())
                    self.dt_cur = opt.dt
                    self.a = opt.a
                    self.n_uphill = float(opt.n_uphill)
                    n0 = len(self.images[0])
                    R = len(self.images)
                    vv = np.zeros((R, n0, 3))
                    vv[1:-1] = opt.v.reshape(R - 2, n0, 3)
                    self._v = vv
                    ndone = 1
                    self._stall = 0
            else:
                self._stall = 0
            done += ndone
            self.nsteps += ndone
        if pos_dev is not None:
            self._sync_host(pos_dev)
        self._host_eval()  # leave every image's results current
        return converged

    def barrier(self):
        es = [im.get_potential_energy() for im in self.images]
        return max(es) - es[0]
