"""Ensemble of device-resident MD walkers batched on one chip.

R independent replicas (ensemble MD, PIMD-style beads, committee
sampling walkers) share one SGPR model and step in lockstep inside ONE
jitted chunk (:func:`autoforce_tpu.md.device_md.md_chunk_replicas`).
This is a CAPABILITY, not a throughput multiplier: the measured
aggregate steps/s is roughly flat in R (per-walker neighbor gathers and
HBM traffic dominate; only the m x D model read amortizes —
BASELINE.md "Replica batching").  What it buys over the reference's
strictly sequential beads/experts (active.py:275,
active_bcm.py:589-633) is ONE dispatch per ensemble step, lockstep
on-device rebuilds, and ensemble active learning with a shared model.
The chunk is a single-chip program; an `engine.mesh` is ignored here
(scale-out shards atoms of ONE system, `parallel/mesh.py`).

Active learning: the chunk early-exits when any walker trips the
covloss threshold; that walker gets full ActiveCalculator semantics
(predict → sample → solve) on host and the updated model is pushed back
to the whole ensemble — on-the-fly learning from an ensemble of
trajectories, which samples configuration space faster than one walker.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import units
from ..neighbors import neighbor_table, round_up
from .device_md import md_chunk_replicas


class ReplicaMD:
    """Drive R systems with one shared (Active)Calculator.

    Args:
        systems: list of System, same atom count and species layout
            (an ensemble: same system at different phase-space points).
        calc: ActiveCalculator (trained model; sampling allowed).
        dt, temperature_K, friction, thermostat: as DeviceMD.
        chunk: traced step bound per device dispatch.
    """

    def __init__(self, systems, calc, dt, temperature_K=None, friction=0.01,
                 chunk=100, seed=0, check_beta=None, thermostat="auto",
                 tdamp=None, device_rebuild=True):
        self.systems = list(systems)
        if not self.systems:
            raise ValueError("need at least one replica")
        s0 = self.systems[0]
        n0 = len(s0)
        for s in self.systems[1:]:
            if len(s) != n0 or (s.numbers != s0.numbers).any():
                raise ValueError("replicas must share the species layout")
            if not (
                np.allclose(s.cell, s0.cell) and (s.pbc == s0.pbc).all()
            ):
                # shared masses/vscale and the single MIC-validity check
                # assume one ensemble box
                raise ValueError("replicas must share the cell and pbc")
        from ..calculator.bcm import BCMActiveCalculator

        if isinstance(calc, BCMActiveCalculator) and calc.experts:
            raise NotImplementedError(
                "ReplicaMD integrates the live SGPR model only; BCM "
                "committees with frozen experts must use DeviceMD "
                "(md_chunk_committee) or the host drivers"
            )
        from .device_md import check_plain_surface

        check_plain_surface(calc, "ReplicaMD")
        self.calc = calc
        self.dt = float(dt)
        self.kT = units.kB * temperature_K if temperature_K else 0.0
        self.friction = float(friction)
        self.chunk = int(chunk)
        self.check_beta = check_beta if check_beta is not None else calc.active
        if thermostat == "auto":
            thermostat = "langevin" if self.kT > 0 else "none"
        self.thermostat = thermostat
        self.tdamp = float(tdamp) if tdamp else 100.0 * self.dt
        R = len(self.systems)
        self.keys = jax.random.split(jax.random.PRNGKey(seed), R)
        self.nhc_vxi = np.zeros((R, 3))
        self.nhc_xi = np.zeros((R, 3))
        self.nsteps = 0
        self._npad = 0
        self._kpad = getattr(calc, "_kpad", 0)
        # on-device rebuild of ALL replica tables at a skin breach: the
        # lockstep exit fires at the EARLIEST breach over R walkers, so
        # host rebuilds (R tables + uploads) would dominate wall time —
        # measured r3: host-rebuild ensembles plateaued at ~260 aggregate
        # steps/s regardless of R
        from ..neighbors_device import device_rebuild_ok

        s0 = self.systems[0]
        self.device_rebuild = device_rebuild and device_rebuild_ok(
            s0.cell, s0.pbc, calc.engine.params.rc + calc._nlcache.skin
        )

    # ------------------------------------------------------------ internals
    def _build_chain(self):
        """Stack per-replica ConfigArrays (shared npad/kpad buckets) +
        shared model arrays into one device-ready dict."""
        calc = self.calc
        eng = calc.engine
        cutoff = eng.params.rc + calc._nlcache.skin
        tables = [
            neighbor_table(s.positions, s.cell, s.pbc, cutoff)
            for s in self.systems
        ]
        n0 = len(self.systems[0])
        self._npad = max(self._npad, round_up(n0, 16))
        kmax = max(t.kmax for t in tables)
        self._kpad = max(self._kpad, round_up(int(kmax * 1.2) + 4, 16))
        cfgs = [
            eng.make_config(s, npad=self._npad, kpad=self._kpad,
                            table=t.pad_to(self._kpad))
            for s, t in zip(self.systems, tables)
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *cfgs)
        model = calc.model
        ma = model.full_model_arrays()
        dtype = stacked.positions.dtype
        from .device_md import DeviceMD

        vs = model.vscale_for(self.systems[0].numbers)
        # host-inf semantics for unseen species (see DeviceMD._VS_UNSEEN)
        vs = np.where(np.isfinite(vs), vs, DeviceMD._VS_UNSEEN)
        vs = np.concatenate([vs, np.zeros(self._npad - n0)])
        vel = np.zeros((len(self.systems), self._npad, 3))
        for r, s in enumerate(self.systems):
            vel[r, :n0] = s.get_velocities()
        masses = np.ones((self._npad, 1))
        masses[:n0, 0] = self.systems[0].get_masses()
        beta_thresh = calc.ediff if self.check_beta else np.inf
        return dict(
            cfgs=stacked,
            ma=ma,
            radii=eng.radii_table(),
            znum=eng.znum_table(),
            vs=jnp.asarray(vs, dtype=dtype),
            vel=jnp.asarray(vel, dtype=dtype),
            masses=jnp.asarray(masses, dtype=dtype),
            pos0=stacked.positions,
            dt=jnp.asarray(self.dt, dtype=dtype),
            kT=jnp.asarray(self.kT, dtype=dtype),
            fric=jnp.asarray(self.friction, dtype=dtype),
            skin=jnp.asarray(0.5 * calc._nlcache.skin, dtype=dtype),
            bthr=jnp.asarray(beta_thresh, dtype=dtype),
            beta_thresh=beta_thresh,
            dtype=dtype,
        )

    def _rebuild_on_device(self, chain, pos_dev):
        """Rebuild every replica's neighbor table from device positions
        (vmapped MIC brute force; one scalar fetch for the overflow
        check).  False -> caller falls back to the host path."""
        from ..neighbors_device import device_neighbor_table, reverse_slots

        cfgs = chain["cfgs"]
        calc = self.calc
        kpad = cfgs.nbr_idx.shape[-1]
        cutoff = calc.engine.params.rc + calc._nlcache.skin
        dtype = pos_dev.dtype

        idx, off, mask, kmax, over = jax.vmap(
            lambda p, c, m: device_neighbor_table(
                p, c, m, jnp.asarray(cutoff, dtype=dtype), kpad
            )
        )(pos_dev, cfgs.cell, cfgs.atom_mask)
        if int(jnp.max(kmax)) > kpad or bool(jnp.any(over)):
            return False
        if chain.get("sidx_atom") is None:
            sidx = calc.engine.species_index(
                np.asarray(cfgs.numbers[0])
            )
            chain["sidx_atom"] = jnp.asarray(
                np.maximum(sidx, 0).astype(np.int32)
            )
            chain["sidx_ok"] = jnp.asarray(sidx >= 0)
        nbr_sidx = chain["sidx_atom"][idx]
        mask = mask & chain["sidx_ok"][idx]
        if cfgs.nbr_off.dtype != off.dtype:
            off = off.astype(cfgs.nbr_off.dtype)
        rev = None
        if cfgs.nbr_rev is not None:
            rev = jax.vmap(reverse_slots)(idx, off, mask)
            if bool(jnp.any(mask & (rev < 0))):
                # asymmetric table: the reverse-slot VJP would silently
                # drop forces — let the host path rebuild instead
                return False
        chain["cfgs"] = cfgs._replace(
            positions=pos_dev, nbr_idx=idx, nbr_off=off, nbr_sidx=nbr_sidx,
            nbr_mask=mask, nbr_rev=rev,
        )
        chain["pos0"] = pos_dev
        return True

    def _sync_host(self, chain, pos_dev, vel_dev):
        n0 = len(self.systems[0])
        pos = np.asarray(pos_dev)
        vel = np.asarray(vel_dev)
        for r, s in enumerate(self.systems):
            s.set_positions(pos[r, :n0])
            s.set_velocities(vel[r, :n0])

    # ---------------------------------------------------------------- run
    def run(self, steps):
        """Advance every replica by ``steps`` steps."""
        calc = self.calc
        done = 0
        chain = None
        pos_dev = vel_dev = None
        while done < steps:
            if chain is None:
                chain = self._build_chain()
            else:
                chain["cfgs"] = chain["cfgs"]._replace(positions=pos_dev)
                chain["vel"] = vel_dev
            n = min(self.chunk, steps - done)
            dtype = chain["dtype"]
            if self.thermostat == "nhc":
                Q = np.full(3, self.kT * self.tdamp**2)
                Q[0] *= 3.0 * len(self.systems[0])
                nhc_kw = dict(
                    nhc_Q=jnp.asarray(Q, dtype=dtype),
                    nhc_dof=jnp.asarray(3.0 * len(self.systems[0]),
                                        dtype=dtype),
                    nhc_vxi=jnp.asarray(self.nhc_vxi, dtype=dtype),
                    nhc_xi=jnp.asarray(self.nhc_xi, dtype=dtype),
                )
            else:
                nhc_kw = {}
            eng = calc.engine
            pos, vel, self.keys, f, e, bmax, i, vxi, xi = md_chunk_replicas(
                chain["cfgs"], chain["ma"], chain["radii"], chain["znum"],
                chain["vs"], chain["vel"], chain["masses"], chain["pos0"],
                self.keys, chain["dt"], chain["kT"], chain["fric"],
                chain["skin"], chain["bthr"], jnp.asarray(n, jnp.int32),
                *eng.chem_args(), params=eng.params, exponent=eng.exponent,
                pair_terms=eng.pair_terms, check_beta=self.check_beta,
                thermostat=self.thermostat, kind=eng.kernel_kind, **nhc_kw,
            )
            if self.thermostat == "nhc":
                self.nhc_vxi = np.asarray(vxi)
                self.nhc_xi = np.asarray(xi)
            ndone = int(i)
            pos_dev, vel_dev = pos, vel
            done += ndone
            self.nsteps += ndone
            if ndone > 0:
                self._stall = 0
            if ndone < n:
                bmax_np = np.asarray(bmax)
                beta_tripped = (
                    self.check_beta
                    and float(bmax_np.max()) >= chain["beta_thresh"]
                )
                if not beta_tripped:
                    # pure skin breach: rebuild ALL tables on device (no
                    # host sync/upload); fall through to a host rebuild
                    # only if a bucket overflowed
                    if self.device_rebuild and self._rebuild_on_device(
                        chain, pos_dev
                    ):
                        continue
                    self._sync_host(chain, pos_dev, vel_dev)
                    pos_dev = vel_dev = None
                    chain = None
                    continue
                self._sync_host(chain, pos_dev, vel_dev)
                pos_dev = vel_dev = None
                # uncertainty tripped: give the most-uncertain walker
                # full ActiveCalculator semantics (sample + re-solve);
                # the updated model then serves the whole ensemble
                r = int(bmax_np.argmax())
                s = self.systems[r]
                s.calc = calc
                s.get_potential_energy()
                if ndone == 0:
                    # sampling was vetoed/rejected while beta stays
                    # above threshold.  Match DeviceMD's grace rule: only
                    # force progress after a host visit already failed to
                    # unstick the chunk — and then host-step EVERY walker
                    # so the ensemble stays in lockstep (stepping one
                    # walker would silently desynchronize trajectory and
                    # step accounting across replicas).
                    self._stall = getattr(self, "_stall", 0) + 1
                    if self._stall >= 2:
                        from .langevin import Langevin
                        from .verlet import VelocityVerlet

                        for w in self.systems:
                            w.calc = calc
                            if self.thermostat == "langevin" and self.kT > 0:
                                Langevin(w, self.dt, self.kT / units.kB,
                                         self.friction).step()
                            else:
                                VelocityVerlet(w, self.dt).step()
                        done += 1
                        self.nsteps += 1
                        self._stall = 0
                chain = None
        if pos_dev is not None:
            self._sync_host(chain, pos_dev, vel_dev)
        return True
