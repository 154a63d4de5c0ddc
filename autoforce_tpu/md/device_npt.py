"""Device-resident MTK NPT (isotropic or flexible-cell): the barostat
lives on the TPU.

The host MTKNPT driver (md/nose_hoover.py, the canonical-ensemble
counterpart of the reference's ase.md.npt.NPT usage in
theforce/cl/md.py:82-107) pays one host<->device round trip per MD step
plus a separate virial fetch.  Here the WHOLE isotropic NPT step —
particle + cell Nose-Hoover chains, barostat velocity, the MTK
position/cell drift, and the SGPR forces WITH the virial trace — runs
inside one jitted ``lax.while_loop``.  The virial trace comes from the
same backward pass as the forces (the energy is differentiated w.r.t. an
isotropic strain of positions AND cell simultaneously — no separate
virial pass).  Measured on v5e at 1008 atoms: 182 steps/s vs 325 for the
NVT NHC chunk (the 1.78x is the second thermostat chain + barostat
scalar math, not the forces) and 2.3x over the host-rebuild NPT path
(the breathing cell trips the Verlet skin often, so in-loop rebuilds
matter more here than in NVT — BASELINE.md round-3).

Early exit: Verlet-skin breach — the validity metric under a MOVING
cell is 2*max|dpos| + max_pairs|off @ (cell - tbl_cell)| < skin, i.e.
the periodic-image drift consumes skin budget alongside atomic
displacement (shear or straining a box the atoms do not fill moves
images without moving atoms; the host VerletNeighborCache has the same
guard) — or an uncertainty trip (active learning).  Between chunks only
scalars cross the tunnel; the positions/velocities/cell chain on-device
exactly like md/device_md.py.

Deterministic (no Langevin noise): device trajectories are
equality-tested against the host MTKNPT driver.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import units
from ..engine import ConfigArrays, ModelArrays, _total_cov, precise_sum
from ..kernels import covloss_beta
from .device_md import (_committee_e, _inloop_table, _nhc_half,
                        check_plain_surface, committee_models,
                        committee_stack)


def offsum_max(off, msk, dtype):
    """Max Sum|off| over the valid slots of a neighbor table — the
    periodic-image lever arm of the moving-cell Verlet bound."""
    s = jnp.abs(off.astype(jnp.int32)).sum(-1)
    return jnp.where(msk, s, 0).max().astype(dtype)


def moving_cell_breach(pos, p0, cell, tcell, omax, amask, skin_half):
    """Verlet validity under a MOVING cell: a pair's relative motion is
    bounded by 2*max|dpos| + |off @ (cell - tbl_cell)|; the image term
    is NOT covered by atomic displacements (shear, or strain of a box
    the atoms do not fill), so it consumes skin budget too — the device
    counterpart of VerletNeighborCache's cell guard.  Shared by the NPT
    and variable-cell FIRE chunks."""
    disp = jnp.sqrt(((pos - p0) ** 2 * amask).sum(-1).max())
    d = cell - tcell
    drift = omax * jnp.sqrt((d * d).sum(-1)).max()
    return disp + 0.5 * drift >= skin_half


def _min_perp_width(cell):
    """Smallest perpendicular width of a cell (rows = lattice vectors):
    the in-loop MIC validity measure — the device rebuild is a
    single-image minimum-image build, valid iff every width >= 2*cutoff
    (neighbors_device.device_rebuild_ok, evaluated on the CURRENT cell
    because the barostat moves it mid-chunk)."""
    vol = jnp.abs(jnp.linalg.det(cell))
    areas = jnp.stack([
        jnp.linalg.norm(jnp.cross(cell[1], cell[2])),
        jnp.linalg.norm(jnp.cross(cell[2], cell[0])),
        jnp.linalg.norm(jnp.cross(cell[0], cell[1])),
    ])
    return vol / jnp.max(areas)


def _sgpr_forces_virial(pos, cell, cfg, model, radii, znum, vscale_atom,
                        params, exponent, pair_terms, chem_z, mixL, kind,
                        check_beta, aniso=False):
    """(energy, forces, dE/deps, beta_max) with eps a strain of positions
    and cell together, from ONE backward pass shared with the forces.

    ``aniso=False``: eps is an isotropic scalar, dE/deps = vol*tr(stress)
    (the potential-pressure numerator).  ``aniso=True``: eps is a full
    3x3 strain (rows transform as x -> x @ (I+eps)^T), dE/deps symmetrized
    = vol * stress tensor — the flexible-cell MTK barostat's input,
    still no separate virial pass."""

    def energy(p, eps):
        if aniso:
            sc = jnp.eye(3, dtype=p.dtype) + eps
            p_s, cell_s = p @ sc.T, cell @ sc.T
        else:
            p_s, cell_s = p * (1.0 + eps), cell * (1.0 + eps)
        cov, lone, alpha = _total_cov(
            p_s, cell_s, cfg, model.X_desc, model.X_num, model.X_lone,
            radii, znum, params, exponent, pair_terms,
            model.pair_d, model.pair_mask, chem_z=chem_z, mixL=mixL,
            kind=kind, use_rev=True,
        )
        cov = cov * (cfg.atom_mask[:, None] & model.m_mask[None, :])
        return precise_sum(cov @ model.mu), (cov, alpha)

    zero = jnp.zeros((3, 3) if aniso else (), dtype=pos.dtype)
    (e, (cov, alpha)), (g, deps) = jax.value_and_grad(
        energy, argnums=(0, 1), has_aux=True
    )(pos, zero)
    if aniso:
        deps = 0.5 * (deps + deps.T)
    f = -g * cfg.atom_mask[:, None]
    if check_beta:
        beta = covloss_beta(model.choli, cov, vscale_atom, model.m_mask,
                            alpha=alpha)
        beta_max = jnp.max(jnp.where(cfg.atom_mask, beta, -jnp.inf))
    else:
        beta_max = jnp.zeros((), dtype=pos.dtype)
    return e, f, deps, beta_max


def _committee_forces_virial(pos, cell, cfg, models, radii, znum,
                             vscale_atoms, mean_e, params, exponent,
                             pair_terms, chem_z, mixL, kind, check_beta,
                             aniso=False):
    """Committee counterpart of :func:`_sgpr_forces_virial`: the weighted
    committee energy (device_md._committee_e, reference weight math) is
    differentiated w.r.t. (positions, strain) jointly, so one backward
    yields the committee forces AND virial — matching the host BCM
    combination, which applies the same scalar weights to the per-expert
    virials (calculator/bcm.py:_predict)."""

    def energy(p, eps):
        if aniso:
            sc = jnp.eye(3, dtype=p.dtype) + eps
            p_s, cell_s = p @ sc.T, cell @ sc.T
        else:
            p_s, cell_s = p * (1.0 + eps), cell * (1.0 + eps)
        e_tot, bmax = _committee_e(
            p_s, cell_s, cfg, models, radii, znum, vscale_atoms, mean_e,
            params, exponent, pair_terms, chem_z, mixL, kind,
        )
        return e_tot, bmax

    zero = jnp.zeros((3, 3) if aniso else (), dtype=pos.dtype)
    (e, bmax), (g, deps) = jax.value_and_grad(
        energy, argnums=(0, 1), has_aux=True
    )(pos, zero)
    if aniso:
        deps = 0.5 * (deps + deps.T)
    f = -g * cfg.atom_mask[:, None]
    if not check_beta:
        bmax = jnp.zeros((), dtype=pos.dtype)
    return e, f, deps, bmax


@partial(
    jax.jit,
    static_argnames=("params", "exponent", "pair_terms", "check_beta",
                     "kind", "rebuild", "aniso", "committee"),
)
def md_chunk_npt(
    cfg: ConfigArrays,
    model: ModelArrays,
    radii,
    znum,
    vscale_atom,
    velocities,  # (N, 3)
    masses,  # (N, 1)
    pos0,  # positions at neighbor-table build time
    cell0,  # (3, 3) current cell (cfg.cell is the table-build cell)
    dt,
    kT,
    p_ext,  # external pressure, eV/A^3
    W,  # barostat inertia
    skin_half,
    beta_thresh,
    nsteps,
    nhc_Q,  # (3,) particle-chain masses
    nhc_dof,  # 3 * n_real
    nhc_vxi,
    nhc_xi,
    bch_Q,  # (3,) cell-chain masses (dof = 1 isotropic / ncell aniso)
    bch_vxi,
    bch_xi,
    vg,  # strain rate: scalar (isotropic) or (3, 3) symmetric (aniso)
    chem_z=None,
    mixL=None,
    params=None,
    exponent=4,
    pair_terms=(),
    check_beta=True,
    kind="dot",
    rebuild=False,  # in-loop neighbor rebuild at skin breaches
    rebuild_cut=None,  # scalar rc + skin (traced; required when rebuild)
    sidx_atom=None,  # (N,) i32 species-table index per atom
    sidx_ok=None,  # (N,) bool: species known to the engine table
    aniso=False,  # flexible-cell MTK (vg/mask are 3x3)
    mask=None,  # (3, 3) strain-component mask (aniso; 1 = free)
    bch_dof=None,  # scalar cell-chain dof (aniso: count_nonzero(mask))
    tbl_cell=None,  # (3, 3) cell the incoming table was built with
    offmax=None,  # scalar max Sum|off| of the incoming table
    committee=False,  # model/vscale carry a leading expert axis
    mean_e=None,  # (E,) per-expert constant mean energies (committee)
):
    """Up to ``nsteps`` MTK NPT steps on device; early exit on skin
    breach or uncertainty trip.  The exact Trotter splitting of
    md/nose_hoover.MTKNPT.step — isotropic by default, full flexible-cell
    MTK with ``aniso=True`` (vg is the 3x3 symmetric strain rate, cell
    propagation via eigendecomposition expm, strain components gated by
    ``mask``; the virial TENSOR still comes from the forces' backward
    pass).  Loops unrolled at trace time.  Returns (pos, vel, cell, f,
    e, beta_max, ndone, nhc_vxi, nhc_xi, bch_vxi, bch_xi, vg).

    With ``rebuild=True`` a skin breach rebuilds the neighbor table IN
    the loop from the current positions AND cell (the device MIC builder
    takes the cell as an argument), so diffusive constant-pressure runs
    never pay chunk-exit round trips — same economics as md_chunk.  The
    in-loop validity gate additionally requires every perpendicular
    width of the CURRENT cell >= 2*rebuild_cut (the barostat may shrink
    the box below the minimum-image bound the host checked at entry).
    Early exit then means uncertainty trip, bucket overflow, or MIC
    violation; the return gains ``(tbl, pos0)`` for chaining.
    """
    dtype = cfg.positions.dtype
    amask = cfg.atom_mask[:, None]
    cfg_with, tbl0, rebuild_fn = _inloop_table(
        cfg, rebuild, rebuild_cut, sidx_atom, sidx_ok
    )

    def forces_fn(pos, cell, tbl=None):
        if committee:
            return _committee_forces_virial(
                pos, cell, cfg_with(tbl), model, radii, znum,
                vscale_atom, mean_e, params, exponent, pair_terms,
                chem_z, mixL, kind, check_beta, aniso=aniso,
            )
        return _sgpr_forces_virial(
            pos, cell, cfg_with(tbl), model, radii, znum, vscale_atom,
            params, exponent, pair_terms, chem_z, mixL, kind, check_beta,
            aniso=aniso,
        )

    if not rebuild:
        tbl0 = ()

    if tbl_cell is None:
        tbl_cell = cfg.cell  # host build: cfg.cell IS the table cell
    if offmax is None:
        offmax = offsum_max(cfg.nbr_off, cfg.nbr_mask, dtype)

    return _npt_loop(
        forces_fn, cfg.positions, amask, velocities, masses, pos0, cell0,
        dt, kT, p_ext, W, skin_half, beta_thresh, nsteps,
        nhc_Q, nhc_dof, nhc_vxi, nhc_xi, bch_Q, bch_dof, bch_vxi, bch_xi,
        vg, aniso, mask, check_beta, dtype, tbl_cell, offmax,
        tbl0=tbl0, rebuild_fn=rebuild_fn, rebuild_cut=rebuild_cut,
    )


def _npt_loop(forces_fn, positions, amask, velocities, masses, pos0,
              cell0, dt, kT, p_ext, W, skin_half, beta_thresh, nsteps,
              nhc_Q, nhc_dof, nhc_vxi, nhc_xi, bch_Q, bch_dof, bch_vxi,
              bch_xi, vg, aniso, mask, check_beta, dtype, tbl_cell,
              offmax, tbl0=(), rebuild_fn=None, rebuild_cut=None,
              omax_of=None):
    """The MTK NPT integrator while-loop, shared by the single-device /
    committee chunk (md_chunk_npt) and the mesh-sharded chunk
    (parallel/mesh.sharded_npt_chunk).  ``forces_fn(pos, cell, tbl) ->
    (e, f, deps, beta_max)`` supplies the physics (tbl is ignored by
    callers without in-loop rebuilds); ``rebuild_fn(pos, cell) ->
    (tbl, ok)`` enables in-loop table rebuilds under the moving cell.
    ``omax_of(off, msk, dtype)`` computes the rebuilt table's image
    lever arm — the mesh chunk overrides it with a 'data'-pmax'd
    offsum_max (the sharded table's max must be global).
    Returns the final loop state (see md_chunk_npt's return contract).
    """
    rebuild = rebuild_fn is not None
    omax_of = omax_of or offsum_max
    one = jnp.ones((), dtype=dtype)
    eye = jnp.eye(3, dtype=dtype)

    def breach(pos, p0, cell, tcell, omax):
        return moving_cell_breach(pos, p0, cell, tcell, omax, amask,
                                  skin_half)

    def maybe_rebuild(pos, cell, tbl, p0, tcell, omax, e, f, deps,
                      beta_max):
        """Rebuild + recompute forces iff the skin is breached; on a
        failed rebuild (bucket overflow / MIC violation for the current
        cell) keep the last good table and drop ok — the host takes
        over.  Mirrors device_md._chunk_loop.maybe_rebuild with the cell
        threaded through."""

        def do_rebuild(args):
            pos, cell, tbl, p0, tcell, omax, e, f, deps, beta_max = args
            new_tbl, rok = rebuild_fn(pos, cell)
            rok = rok & (_min_perp_width(cell) >= 2.0 * rebuild_cut)
            tbl2 = jax.tree.map(
                lambda n, o: jnp.where(rok, n, o), new_tbl, tbl
            )
            p0_2 = jnp.where(rok, pos, p0)
            tcell2 = jnp.where(rok, cell, tcell)
            # new_tbl = (idx, off, sidx, mask[, rev])
            omax2 = jnp.where(
                rok, omax_of(new_tbl[1], new_tbl[3], dtype), omax
            )
            e2, f2, d2, b2 = forces_fn(pos, cell, tbl2)
            return tbl2, p0_2, tcell2, omax2, rok, e2, f2, d2, b2

        def no_rebuild(args):
            pos, cell, tbl, p0, tcell, omax, e, f, deps, beta_max = args
            return (tbl, p0, tcell, omax, jnp.ones((), bool), e, f, deps,
                    beta_max)

        return jax.lax.cond(
            breach(pos, p0, cell, tcell, omax), do_rebuild, no_rebuild,
            (pos, cell, tbl, p0, tcell, omax, e, f, deps, beta_max),
        )

    def ke2(vel):
        return (masses * vel * vel * amask).sum()

    # the particle and cell thermostat chains are independent within a
    # half-step (the host driver just happens to run them sequentially):
    # batch the two serial scalar chains into ONE vmapped _nhc_half so
    # the chain latency is paid once, not twice (the NHC scalar math is
    # the bulk of the NPT-over-NVT step cost — BASELINE.md round-3)
    _nhc_pair = jax.vmap(_nhc_half, in_axes=(0, 0, 0, 0, None, 0, None))
    Q2 = jnp.stack([nhc_Q, bch_Q])
    dof2 = jnp.stack([nhc_dof, one if bch_dof is None else bch_dof])

    def bke2(vg):
        # barostat "kinetic" input: W * sum(vg^2); the isotropic scalar
        # stands for diag(vg) so the sum is 3 vg^2 (host _vg_half)
        return W * (vg * vg).sum() if aniso else W * 3.0 * vg * vg

    def chains_half(vel, vg, vxi, xi, bvxi, bxi):
        ke_pair = jnp.stack([ke2(vel), bke2(vg)])
        s2, _, vxi2, xi2 = _nhc_pair(
            ke_pair, jnp.stack([vxi, bvxi]), jnp.stack([xi, bxi]),
            Q2, kT, dof2, dt
        )
        return (s2[0], s2[1], vxi2[0], xi2[0], vxi2[1], xi2[1])

    def expm_sym(A):
        # exp of a symmetric 3x3 via eigendecomposition (host _expm_sym)
        w, V = jnp.linalg.eigh(A)
        return (V * jnp.exp(w)) @ V.T

    def vg_half(vel, vg, cell, deps):
        """Barostat velocity half-step (host MTKNPT._vg_half).  The
        potential stress tensor is deps/vol (deps = vol * stress from the
        shared backward); P = -stress + kinetic."""
        vol = jnp.abs(jnp.linalg.det(cell))
        KE2 = ke2(vel)
        if aniso:
            P = (-deps + ((masses * vel) * amask).T @ (vel * amask)) / vol
            G = (vol * (P - p_ext * eye) + KE2 / nhc_dof * eye) / W
            G = 0.5 * (G + G.T) * mask
            return (vg + 0.5 * dt * G) * mask
        # isotropic: p = tr(P)/3, tr(deps) already contracted by the
        # scalar-strain gradient
        p = (-deps + KE2) / (3.0 * vol)
        G = (3.0 * vol * (p - p_ext) + KE2 / nhc_dof * 3.0) / W
        return vg + 0.5 * dt * G / 3.0

    def step(pos, vel, cell, f, e, deps, beta_max, vxi, xi, bvxi, bxi, vg,
             tbl):
        # thermostats (particles + cell) half-step, batched chains
        s, sb, vxi, xi, bvxi, bxi = chains_half(vel, vg, vxi, xi, bvxi, bxi)
        vel = vel * s
        vg = vg * sb
        # barostat velocity half-step (uses current forces' virial)
        vg = vg_half(vel, vg, cell, deps)
        if aniso:
            # particle velocity half-step with box coupling
            A = vg + (jnp.trace(vg) / nhc_dof) * eye
            Em = expm_sym(-0.5 * dt * A)
            vel = vel @ Em.T
            vel = vel + 0.5 * dt * f / masses
            # position + cell drift (full step)
            E = expm_sym(dt * vg)
            E2 = expm_sym(0.5 * dt * vg)
            pos = pos @ E.T + dt * (vel @ E2.T)
            cell = cell @ E.T
        else:
            em = jnp.exp(-0.5 * dt * vg * (1.0 + 3.0 / nhc_dof))
            vel = vel * em
            vel = vel + 0.5 * dt * f / masses
            E = jnp.exp(dt * vg)
            E2 = jnp.exp(0.5 * dt * vg)
            pos = pos * E + dt * vel * E2
            cell = cell * E
        # second half
        e, f, deps, beta_max = forces_fn(pos, cell, tbl)
        vel = vel + 0.5 * dt * f / masses
        vel = vel @ Em.T if aniso else vel * em
        vg = vg_half(vel, vg, cell, deps)
        s, sb, vxi, xi, bvxi, bxi = chains_half(vel, vg, vxi, xi, bvxi, bxi)
        vg = vg * sb
        vel = vel * s
        return pos, vel, cell, f, e, deps, beta_max, vxi, xi, bvxi, bxi, vg

    e0, f0, deps0, b0 = forces_fn(positions, cell0, tbl0)
    if rebuild:
        (tbl0, p00, tcell0, omax0, ok0, e0, f0, deps0, b0) = maybe_rebuild(
            positions, cell0, tbl0, pos0, tbl_cell, offmax,
            e0, f0, deps0, b0
        )
    else:
        p00, tcell0, omax0 = pos0, tbl_cell, offmax
        ok0 = ~breach(positions, pos0, cell0, tbl_cell, offmax)

    def cond(state):
        (pos, vel, cell, f, e, deps, beta_max, vxi, xi, bvxi, bxi, vg,
         i, tbl, p0, tcell, omax, ok) = state
        go = (i < nsteps) & ok
        if check_beta:
            go = go & (beta_max < beta_thresh)
        return go

    def body(state):
        (pos, vel, cell, f, e, deps, beta_max, vxi, xi, bvxi, bxi, vg,
         i, tbl, p0, tcell, omax, ok) = state
        (pos, vel, cell, f, e, deps, beta_max, vxi, xi, bvxi, bxi,
         vg) = step(pos, vel, cell, f, e, deps, beta_max, vxi, xi, bvxi,
                    bxi, vg, tbl)
        if rebuild:
            (tbl, p0, tcell, omax, ok, e, f, deps, beta_max) = (
                maybe_rebuild(pos, cell, tbl, p0, tcell, omax, e, f,
                              deps, beta_max)
            )
        else:
            ok = ~breach(pos, p0, cell, tcell, omax)
        return (pos, vel, cell, f, e, deps, beta_max, vxi, xi, bvxi, bxi,
                vg, i + 1, tbl, p0, tcell, omax, ok)

    init = (positions, velocities, cell0, f0, e0, deps0, b0,
            nhc_vxi, nhc_xi, bch_vxi, bch_xi, vg,
            jnp.zeros((), jnp.int32), tbl0, p00, tcell0, omax0, ok0)
    (pos, vel, cell, f, e, deps, beta_max, vxi, xi, bvxi, bxi, vg, i,
     tbl, p0, tcell, omax, ok) = jax.lax.while_loop(cond, body, init)
    if rebuild:
        return (pos, vel, cell, f, e, beta_max, i, vxi, xi, bvxi, bxi,
                vg, tbl, p0, tcell, omax)
    return pos, vel, cell, f, e, beta_max, i, vxi, xi, bvxi, bxi, vg


class DeviceNPT:
    """Chunked on-device MTK NPT (isotropic or flexible-cell) around an
    (inference or active) calculator — the NPT sibling of
    :class:`DeviceMD`.

    Under a mesh the whole barostat loop runs SPMD
    (parallel/mesh.sharded_npt_chunk: forces AND virial globally reduced
    by differentiating through the psum; rebuilds through the host);
    BCM committees are served on-device — the weighted committee energy
    AND virial come from one backward pass (the host combination applies
    the same scalar weights to per-expert virials).  Skin breaches under
    the moving
    cell are rebuilt INSIDE the chunk by default (``in_loop_rebuild``,
    device MIC build from the current positions AND cell); host re-entry
    happens on uncertainty trips (sampling at the exact step, reference
    semantics), bucket overflows, and MIC violations.

    Args mirror md/nose_hoover.MTKNPT, including the default
    ``isotropic=False`` (full flexible-cell MTK barostat: cell shape
    moves; ``mask`` gates strain components like the reference's ase
    NPT mask, theforce/cl/md.py:82-107); ``isotropic=True`` couples
    only the mean pressure.
    """

    def __init__(self, system, calc, dt, temperature_K, pressure_GPa=0.0,
                 tdamp=None, pdamp=None, bulk_modulus_GPa=None, chunk=50,
                 check_beta=None, tchain=3, in_loop_rebuild=True,
                 isotropic=False, mask=None):
        check_plain_surface(calc, "DeviceNPT")
        # under a mesh the whole NPT loop runs SPMD
        # (parallel/mesh.sharded_npt_chunk), including in-loop rebuilds
        # (each device rebuilds its own rows, _sharded_inloop)
        self.mesh = getattr(calc.engine, "mesh", None)
        if tchain != 3:
            raise NotImplementedError(
                "the device NHC is fixed at chain length 3 (the host "
                "MTKNPT default)"
            )
        self.system = system
        self.calc = calc
        self.dt = float(dt)
        self.kT = units.kB * float(temperature_K)
        self.p_ext = float(pressure_GPa) * units.GPa
        self.tdamp = float(tdamp) if tdamp else 100.0 * self.dt
        self.pdamp = float(pdamp) if pdamp else 1000.0 * self.dt
        n = len(system)
        self.dof = 3.0 * n
        if bulk_modulus_GPa:
            # cl/md.py pfactor convention: W = pdamp^2 * B * V0
            self.W = (
                self.pdamp**2 * float(bulk_modulus_GPa) * units.GPa
                * system.volume
            )
        else:
            # MTK canonical choice
            self.W = (self.dof + 3.0) * self.kT * self.pdamp**2 / 3.0
        self.chunk = int(chunk)
        self.check_beta = (
            check_beta if check_beta is not None else calc.active
        )
        # in-loop rebuild: skin breaches under the moving cell are handled
        # INSIDE the chunk (device MIC build from current pos+cell, gated
        # in-loop on the current cell's perpendicular widths); the host
        # gate below only needs the ENTRY cell — the in-loop width check
        # covers barostat shrinkage
        self.in_loop_rebuild = bool(in_loop_rebuild)
        self.isotropic = bool(isotropic)
        from .nose_hoover import _as_mask

        self.mask = _as_mask(mask)
        self.ncell = (
            1.0 if self.isotropic else float(np.count_nonzero(self.mask))
        )
        self.nsteps = 0
        # chain state (host copies; chained on device between chunks)
        self.nhc_vxi = np.zeros(3)
        self.nhc_xi = np.zeros(3)
        self.bch_vxi = np.zeros(3)
        self.bch_xi = np.zeros(3)
        self.vg = 0.0 if self.isotropic else np.zeros((3, 3))

    def _chain_masses(self):
        Q = np.full(3, self.kT * self.tdamp**2)
        Q[0] *= self.dof
        # cell chain: dof = 1 (isotropic) / count_nonzero(mask) (aniso)
        Qb = np.full(3, self.kT * self.pdamp**2)
        Qb[0] *= self.ncell
        return Q, Qb

    def run(self, steps):
        calc = self.calc
        system = self.system
        eng = calc.engine
        done = 0
        first = True
        need_host = True
        pos_dev = vel_dev = cell_dev = None
        chain = None
        while done < steps:
            if pos_dev is None or need_host or chain is None:
                if pos_dev is not None:
                    system.set_positions(np.asarray(pos_dev)[: len(system)])
                    system.set_velocities(np.asarray(vel_dev)[: len(system)])
                    system.set_cell(np.asarray(cell_dev))
                    pos_dev = vel_dev = cell_dev = None
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
                from .device_md import DeviceMD

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
                oidx = gmask = None
                if self.mesh is not None:
                    from ..parallel.mesh import pad_for_mesh

                    cfg, ma, oidx, vsj, gmask = pad_for_mesh(
                        cfg, ma, vs, self.mesh, dtype,
                        committee=bool(committee),
                    )
                npad = cfg.positions.shape[0]
                vel = np.zeros((npad, 3))
                vel[: len(system)] = system.get_velocities()
                masses = np.ones((npad, 1))
                masses[: len(system), 0] = system.get_masses()
                pos0 = np.zeros((npad, 3))
                pos0[: len(system)] = calc._nlcache._pos
                Q, Qb = self._chain_masses()
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
                    inloop=inloop,
                    sidx_atom=sidx_atom,
                    sidx_ok=sidx_ok,
                    cut=cut,
                    tbl_cell=None,  # host build: derived from cfg.cell
                    offmax=None,
                    oidx=oidx,
                    gmask=gmask,
                    cfg=cfg,
                    ma=ma,
                    mean_e=(None if mean_e is None
                            else jnp.asarray(mean_e, dtype=dtype)),
                    radii=eng.radii_table(),
                    znum=eng.znum_table(),
                    vs=(vsj if self.mesh is not None
                        else jnp.asarray(vs, dtype=dtype)),
                    vel=jnp.asarray(vel, dtype=dtype),
                    masses=jnp.asarray(masses, dtype=dtype),
                    pos0=jnp.asarray(pos0, dtype=dtype),
                    cell=jnp.asarray(np.asarray(system.cell), dtype=dtype),
                    dt=jnp.asarray(self.dt, dtype=dtype),
                    kT=jnp.asarray(self.kT, dtype=dtype),
                    p_ext=jnp.asarray(self.p_ext, dtype=dtype),
                    W=jnp.asarray(self.W, dtype=dtype),
                    skin=jnp.asarray(0.5 * calc._nlcache.skin, dtype=dtype),
                    bthr=jnp.asarray(beta_thresh, dtype=dtype),
                    beta_thresh=beta_thresh,
                    Q=jnp.asarray(Q, dtype=dtype),
                    Qb=jnp.asarray(Qb, dtype=dtype),
                    dof=jnp.asarray(self.dof, dtype=dtype),
                    mask=(None if self.isotropic
                          else jnp.asarray(self.mask, dtype=dtype)),
                    bch_dof=(None if self.isotropic
                             else jnp.asarray(self.ncell, dtype=dtype)),
                )
            else:
                chain["cfg"] = chain["cfg"]._replace(positions=pos_dev)
                chain["vel"] = vel_dev
                chain["cell"] = cell_dev

            n = min(self.chunk, steps - done)
            dtype = chain["cfg"].positions.dtype
            chem_z, mixL = eng.chem_args()
            inloop_kw = {}
            if chain["inloop"]:
                inloop_kw = dict(
                    rebuild=True,
                    rebuild_cut=chain["cut"],
                    sidx_atom=chain["sidx_atom"],
                    sidx_ok=chain["sidx_ok"],
                )
            if self.mesh is not None:
                from ..parallel.mesh import sharded_npt_chunk

                out = sharded_npt_chunk(
                    chain["cfg"], chain["ma"], chain["radii"],
                    chain["znum"], chain["vs"], chain["gmask"],
                    chain["vel"], chain["masses"], chain["pos0"],
                    chain["cell"],
                    chain["dt"], chain["kT"], chain["p_ext"], chain["W"],
                    chain["skin"], chain["bthr"],
                    jnp.asarray(n, dtype=jnp.int32),
                    chain["Q"], chain["dof"],
                    jnp.asarray(self.nhc_vxi, dtype=dtype),
                    jnp.asarray(self.nhc_xi, dtype=dtype),
                    chain["Qb"],
                    (jnp.ones((), dtype=dtype)
                     if chain["bch_dof"] is None else chain["bch_dof"]),
                    jnp.asarray(self.bch_vxi, dtype=dtype),
                    jnp.asarray(self.bch_xi, dtype=dtype),
                    jnp.asarray(self.vg, dtype=dtype),
                    (jnp.ones((3, 3), dtype=dtype)
                     if chain["mask"] is None else chain["mask"]),
                    chain["oidx"], mesh=self.mesh,
                    chem_z=chem_z, mixL=mixL,
                    params=eng.params, exponent=eng.exponent,
                    pair_terms=eng.pair_terms,
                    check_beta=self.check_beta,
                    kind=eng.kernel_kind,
                    aniso=not self.isotropic,
                    committee=chain["mean_e"] is not None,
                    mean_e=chain["mean_e"],
                    tbl_cell=chain["tbl_cell"],
                    offmax=chain["offmax"],
                    **inloop_kw,
                )
            else:
                out = md_chunk_npt(
                    chain["cfg"], chain["ma"], chain["radii"],
                    chain["znum"],
                    chain["vs"], chain["vel"], chain["masses"],
                    chain["pos0"], chain["cell"],
                    chain["dt"], chain["kT"], chain["p_ext"], chain["W"],
                    chain["skin"], chain["bthr"],
                    jnp.asarray(n, dtype=jnp.int32),
                    chain["Q"], chain["dof"],
                    jnp.asarray(self.nhc_vxi, dtype=dtype),
                    jnp.asarray(self.nhc_xi, dtype=dtype),
                    chain["Qb"],
                    jnp.asarray(self.bch_vxi, dtype=dtype),
                    jnp.asarray(self.bch_xi, dtype=dtype),
                    jnp.asarray(self.vg, dtype=dtype),
                    chem_z=chem_z,
                    mixL=mixL,
                    params=eng.params,
                    exponent=eng.exponent,
                    pair_terms=eng.pair_terms,
                    check_beta=self.check_beta,
                    kind=eng.kernel_kind,
                    aniso=not self.isotropic,
                    mask=chain["mask"],
                    bch_dof=chain["bch_dof"],
                    tbl_cell=chain["tbl_cell"],
                    offmax=chain["offmax"],
                    committee=chain["mean_e"] is not None,
                    mean_e=chain["mean_e"],
                    **inloop_kw,
                )
            if chain["inloop"]:
                (pos, vel, cell, f, e, beta_max, i, vxi, xi, bvxi, bxi,
                 vg, tbl, p0, tcell, omax) = out
                c = chain["cfg"]
                rv = tbl[4] if c.nbr_rev is not None else None
                chain["cfg"] = c._replace(
                    nbr_idx=tbl[0], nbr_off=tbl[1], nbr_sidx=tbl[2],
                    nbr_mask=tbl[3], nbr_rev=rv,
                )
                chain["pos0"] = p0
                chain["tbl_cell"] = tcell
                chain["offmax"] = omax
            else:
                (pos, vel, cell, f, e, beta_max, i, vxi, xi, bvxi, bxi,
                 vg) = out
            self.nhc_vxi = np.asarray(vxi)
            self.nhc_xi = np.asarray(xi)
            self.bch_vxi = np.asarray(bvxi)
            self.bch_xi = np.asarray(bxi)
            self.vg = float(vg) if self.isotropic else np.asarray(vg)
            ndone = int(i)
            pos_dev, vel_dev, cell_dev = pos, vel, cell
            need_host = (
                self.check_beta and float(beta_max) >= chain["beta_thresh"]
            )
            if ndone < n and not need_host:
                # without the in-loop rebuild: skin breach -> host rebuild
                # next round (the cell changed, so the table + MIC gate
                # are re-derived there).  With it: neighbor-bucket
                # overflow or a MIC violation for the shrunken cell — the
                # host grows the bucket / re-gates.
                chain = None
            if ndone == 0:
                # no progress even after a host visit: one host MTK step
                # to unstick (e.g. sampling vetoed while beta stays high)
                self._stall = getattr(self, "_stall", 0) + 1
                if self._stall >= 2:
                    from .nose_hoover import MTKNPT

                    system.set_positions(np.asarray(pos_dev)[: len(system)])
                    system.set_velocities(np.asarray(vel_dev)[: len(system)])
                    system.set_cell(np.asarray(cell_dev))
                    pos_dev = vel_dev = cell_dev = None
                    chain = None
                    drv = MTKNPT(
                        system, self.dt, temperature_K=self.kT / units.kB,
                        pressure_GPa=self.p_ext / units.GPa,
                        tdamp=self.tdamp, pdamp=self.pdamp,
                        isotropic=self.isotropic,
                        mask=None if self.isotropic else self.mask,
                    )
                    drv.W = self.W
                    drv.chain.vxi = self.nhc_vxi.copy()
                    drv.chain.xi = self.nhc_xi.copy()
                    drv.bchain.vxi = self.bch_vxi.copy()
                    drv.bchain.xi = self.bch_xi.copy()
                    drv.vg = (
                        self.vg * np.eye(3)
                        if self.isotropic
                        else np.asarray(self.vg).copy()
                    )
                    drv.step()
                    self.nhc_vxi = drv.chain.vxi.copy()
                    self.nhc_xi = drv.chain.xi.copy()
                    self.bch_vxi = drv.bchain.vxi.copy()
                    self.bch_xi = drv.bchain.xi.copy()
                    self.vg = (
                        float(np.trace(drv.vg) / 3.0)
                        if self.isotropic
                        else drv.vg.copy()
                    )
                    ndone = 1
                    self._stall = 0
            else:
                self._stall = 0
            done += ndone
            self.nsteps += ndone
        if pos_dev is not None:
            system.set_positions(np.asarray(pos_dev)[: len(system)])
            system.set_velocities(np.asarray(vel_dev)[: len(system)])
            system.set_cell(np.asarray(cell_dev))
        return True
