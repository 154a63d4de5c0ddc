"""Device-resident isotropic MTK NPT: the barostat lives on the TPU.

The host MTKNPT driver (md/nose_hoover.py, the canonical-ensemble
counterpart of the reference's ase.md.npt.NPT usage in
theforce/cl/md.py:82-107) pays one host<->device round trip per MD step
plus a separate virial fetch.  Here the WHOLE isotropic NPT step —
particle + cell Nose-Hoover chains, barostat velocity, the MTK
position/cell drift, and the SGPR forces WITH the virial trace — runs
inside one jitted ``lax.while_loop``.  The virial trace comes from the
same backward pass as the forces (the energy is differentiated w.r.t. an
isotropic strain of positions AND cell simultaneously), so NPT costs
essentially the same per step as NVT.

Early exit: Verlet-skin breach (affine cell motion counts as atomic
displacement, so the fixed neighbor table stays a valid superset until
the bound trips — the same guarantee as NVT), or an uncertainty trip
(active learning).  Between chunks only scalars cross the tunnel; the
positions/velocities/cell chain on-device exactly like md/device_md.py.

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
from .device_md import _nhc_half, check_plain_surface


def _sgpr_forces_virial(pos, cell, cfg, model, radii, znum, vscale_atom,
                        params, exponent, pair_terms, chem_z, mixL, kind,
                        check_beta):
    """(energy, forces, dE/deps, beta_max) with eps an isotropic strain of
    positions and cell together: dE/deps = 3 * volume * trace(stress)/3,
    i.e. the potential-pressure numerator, from ONE backward pass shared
    with the forces."""

    def energy(p, eps):
        sc = 1.0 + eps
        cov, lone, alpha = _total_cov(
            p * sc, cell * sc, cfg, model.X_desc, model.X_num, model.X_lone,
            radii, znum, params, exponent, pair_terms,
            model.pair_d, model.pair_mask, chem_z=chem_z, mixL=mixL,
            kind=kind, use_rev=True,
        )
        cov = cov * (cfg.atom_mask[:, None] & model.m_mask[None, :])
        return precise_sum(cov @ model.mu), (cov, alpha)

    zero = jnp.zeros((), dtype=pos.dtype)
    (e, (cov, alpha)), (g, deps) = jax.value_and_grad(
        energy, argnums=(0, 1), has_aux=True
    )(pos, zero)
    f = -g * cfg.atom_mask[:, None]
    if check_beta:
        beta = covloss_beta(model.choli, cov, vscale_atom, model.m_mask,
                            alpha=alpha)
        beta_max = jnp.max(jnp.where(cfg.atom_mask, beta, -jnp.inf))
    else:
        beta_max = jnp.zeros((), dtype=pos.dtype)
    return e, f, deps, beta_max


@partial(
    jax.jit,
    static_argnames=("params", "exponent", "pair_terms", "check_beta",
                     "kind"),
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
    bch_Q,  # (3,) cell-chain masses (dof = 1)
    bch_vxi,
    bch_xi,
    vg,  # scalar isotropic strain rate
    chem_z=None,
    mixL=None,
    params=None,
    exponent=4,
    pair_terms=(),
    check_beta=True,
    kind="dot",
):
    """Up to ``nsteps`` isotropic MTK NPT steps on device; early exit on
    skin breach or uncertainty trip.  The exact Trotter splitting of
    md/nose_hoover.MTKNPT.step (isotropic=True), loops unrolled at trace
    time.  Returns (pos, vel, cell, f, e, beta_max, ndone, nhc_vxi,
    nhc_xi, bch_vxi, bch_xi, vg)."""
    dtype = cfg.positions.dtype
    amask = cfg.atom_mask[:, None]
    one = jnp.ones((), dtype=dtype)

    def forces_fn(pos, cell):
        return _sgpr_forces_virial(
            pos, cell, cfg, model, radii, znum, vscale_atom, params,
            exponent, pair_terms, chem_z, mixL, kind, check_beta,
        )

    def ke2(vel):
        return (masses * vel * vel * amask).sum()

    def vg_half(vel, vg, cell, deps):
        # _vg_half (isotropic): p = tr(P)/3 with P = virial + mv^T v / vol
        vol = jnp.abs(jnp.linalg.det(cell))
        KE2 = ke2(vel)
        # potential pressure: tr(stress) = deps / vol -> p_pot = -deps/(3 vol)
        p = (-deps + KE2) / (3.0 * vol)
        G = (3.0 * vol * (p - p_ext) + KE2 / nhc_dof * 3.0) / W
        return vg + 0.5 * dt * G / 3.0

    def step(pos, vel, cell, f, e, deps, beta_max, vxi, xi, bvxi, bxi, vg):
        # thermostats (particles + cell) half-step
        s, _, vxi, xi = _nhc_half(ke2(vel), vxi, xi, nhc_Q, kT, nhc_dof, dt)
        vel = vel * s
        sb, _, bvxi, bxi = _nhc_half(
            W * 3.0 * vg * vg, bvxi, bxi, bch_Q, kT, one, dt
        )
        vg = vg * sb
        # barostat velocity half-step (uses current forces' virial)
        vg = vg_half(vel, vg, cell, deps)
        # particle velocity half-step with box coupling
        em = jnp.exp(-0.5 * dt * vg * (1.0 + 3.0 / nhc_dof))
        vel = vel * em
        vel = vel + 0.5 * dt * f / masses
        # position + cell drift (full step)
        E = jnp.exp(dt * vg)
        E2 = jnp.exp(0.5 * dt * vg)
        pos = pos * E + dt * vel * E2
        cell = cell * E
        # second half
        e, f, deps, beta_max = forces_fn(pos, cell)
        vel = vel + 0.5 * dt * f / masses
        vel = vel * em
        vg = vg_half(vel, vg, cell, deps)
        sb, _, bvxi, bxi = _nhc_half(
            W * 3.0 * vg * vg, bvxi, bxi, bch_Q, kT, one, dt
        )
        vg = vg * sb
        s, _, vxi, xi = _nhc_half(ke2(vel), vxi, xi, nhc_Q, kT, nhc_dof, dt)
        vel = vel * s
        return pos, vel, cell, f, e, deps, beta_max, vxi, xi, bvxi, bxi, vg

    e0, f0, deps0, b0 = forces_fn(cfg.positions, cell0)

    def cond(state):
        (pos, vel, cell, f, e, deps, beta_max, vxi, xi, bvxi, bxi, vg,
         i) = state
        disp2 = ((pos - pos0) ** 2 * amask).sum(-1).max()
        ok = disp2 < skin_half**2
        if check_beta:
            ok = ok & (beta_max < beta_thresh)
        return (i < nsteps) & ok

    def body(state):
        (pos, vel, cell, f, e, deps, beta_max, vxi, xi, bvxi, bxi, vg,
         i) = state
        out = step(pos, vel, cell, f, e, deps, beta_max, vxi, xi, bvxi,
                   bxi, vg)
        return out + (i + 1,)

    init = (cfg.positions, velocities, cell0, f0, e0, deps0, b0,
            nhc_vxi, nhc_xi, bch_vxi, bch_xi, vg,
            jnp.zeros((), jnp.int32))
    (pos, vel, cell, f, e, deps, beta_max, vxi, xi, bvxi, bxi, vg, i) = (
        jax.lax.while_loop(cond, body, init)
    )
    return pos, vel, cell, f, e, beta_max, i, vxi, xi, bvxi, bxi, vg


class DeviceNPT:
    """Chunked on-device isotropic MTK NPT around an (inference or
    active) calculator — the NPT sibling of :class:`DeviceMD`.

    Single-model, single-chip (no committee/mesh/replica variants; the
    host MTKNPT driver covers those).  Host re-entry happens on skin
    breaches (neighbor table + cell refresh) and uncertainty trips
    (sampling at the exact step, reference semantics).

    Args mirror md/nose_hoover.MTKNPT with isotropic=True: pressure_GPa,
    tdamp/pdamp time constants, optional bulk_modulus_GPa for an
    ASE-NPT-style cell inertia.
    """

    def __init__(self, system, calc, dt, temperature_K, pressure_GPa=0.0,
                 tdamp=None, pdamp=None, bulk_modulus_GPa=None, chunk=50,
                 check_beta=None, tchain=3):
        check_plain_surface(calc, "DeviceNPT")
        if getattr(calc.engine, "mesh", None) is not None:
            raise NotImplementedError(
                "DeviceNPT is single-chip; use the host MTKNPT driver "
                "under a mesh"
            )
        from ..calculator.bcm import BCMActiveCalculator

        if isinstance(calc, BCMActiveCalculator) and calc.experts:
            raise NotImplementedError(
                "DeviceNPT integrates the live SGPR model only; BCM "
                "committees must use the host MTKNPT driver"
            )
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
        self.nsteps = 0
        # chain state (host copies; chained on device between chunks)
        self.nhc_vxi = np.zeros(3)
        self.nhc_xi = np.zeros(3)
        self.bch_vxi = np.zeros(3)
        self.bch_xi = np.zeros(3)
        self.vg = 0.0

    def _chain_masses(self):
        Q = np.full(3, self.kT * self.tdamp**2)
        Q[0] *= self.dof
        Qb = np.full(3, self.kT * self.pdamp**2)  # cell chain: dof = 1
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
                ma = model.full_model_arrays()
                vs = model.vscale_for(np.asarray(cfg.numbers))
                vs = np.where(np.isfinite(vs), vs, 1e8)
                npad = cfg.positions.shape[0]
                vel = np.zeros((npad, 3))
                vel[: len(system)] = system.get_velocities()
                masses = np.ones((npad, 1))
                masses[: len(system), 0] = system.get_masses()
                pos0 = np.zeros((npad, 3))
                pos0[: len(system)] = calc._nlcache._pos
                Q, Qb = self._chain_masses()
                beta_thresh = calc.ediff if self.check_beta else np.inf
                chain = dict(
                    cfg=cfg,
                    ma=ma,
                    radii=eng.radii_table(),
                    znum=eng.znum_table(),
                    vs=jnp.asarray(vs, dtype=dtype),
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
                )
            else:
                chain["cfg"] = chain["cfg"]._replace(positions=pos_dev)
                chain["vel"] = vel_dev
                chain["cell"] = cell_dev

            n = min(self.chunk, steps - done)
            dtype = chain["cfg"].positions.dtype
            chem_z, mixL = eng.chem_args()
            (pos, vel, cell, f, e, beta_max, i, vxi, xi, bvxi, bxi, vg) = (
                md_chunk_npt(
                    chain["cfg"], chain["ma"], chain["radii"], chain["znum"],
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
                )
            )
            self.nhc_vxi = np.asarray(vxi)
            self.nhc_xi = np.asarray(xi)
            self.bch_vxi = np.asarray(bvxi)
            self.bch_xi = np.asarray(bxi)
            self.vg = float(vg)
            ndone = int(i)
            pos_dev, vel_dev, cell_dev = pos, vel, cell
            need_host = (
                self.check_beta and float(beta_max) >= chain["beta_thresh"]
            )
            if ndone < n and not need_host:
                # skin breach: host rebuild next round (the cell changed,
                # so the table + MIC gate are re-derived there)
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
                        tdamp=self.tdamp, pdamp=self.pdamp, isotropic=True,
                    )
                    drv.W = self.W
                    drv.chain.vxi = self.nhc_vxi.copy()
                    drv.chain.xi = self.nhc_xi.copy()
                    drv.bchain.vxi = self.bch_vxi.copy()
                    drv.bchain.xi = self.bch_xi.copy()
                    drv.vg = self.vg * np.eye(3)
                    drv.step()
                    self.nhc_vxi = drv.chain.vxi.copy()
                    self.nhc_xi = drv.chain.xi.copy()
                    self.bch_vxi = drv.bchain.vxi.copy()
                    self.bch_xi = drv.bchain.xi.copy()
                    self.vg = float(np.trace(drv.vg) / 3.0)
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
