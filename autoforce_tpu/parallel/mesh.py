"""Multi-chip SPMD execution over a device mesh.

Replaces the reference's MPI layer (theforce/distributed.py,
util/parallel.py — SURVEY.md §2.1/2.2) with XLA collectives over ICI:

  * the **atom axis** is sharded over mesh axis ``"data"`` — the analog of
    the reference's per-rank atom ownership (`TorchAtoms.index_distribute`,
    atoms.py:321-341); each device builds descriptors and covariance rows
    for its block of LCEs, and energies/forces are ``psum``-reduced
    (reference all_reduce, active.py:557-611).
  * the **inducing axis** is sharded over mesh axis ``"model"`` — the
    tensor-parallel analog of the reference's row-split Gram matrices
    (`method_forker`, util/parallel.py:101-143); the per-atom uncertainty
    needs full kernel rows, obtained with one ``all_gather`` over "model".

Model state (mu, choli) is replicated, matching the reference's
rank-0-solve + broadcast idiom (gppotential.py:548-605).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..descriptor.soap import sesoap_descriptors
from ..kernels import gram


def make_mesh(n_data=None, n_model=1, devices=None):
    """Create a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n_data = n_data if n_data is not None else len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


@partial(jax.jit, static_argnames=("mesh", "params", "exponent"))
def sharded_predict(
    positions,  # (N, 3) replicated
    cell,  # (3, 3) replicated
    numbers,  # (N,) replicated
    atom_mask,  # (N,) sharded over 'data'
    own_idx,  # (N,) global row index of each padded atom, sharded 'data'
    nbr_idx,  # (N, K) sharded 'data'
    nbr_off,  # (N, K, 3) sharded 'data'
    nbr_sidx,  # (N, K) sharded 'data'
    nbr_mask,  # (N, K) sharded 'data'
    X_desc,  # (M, D) sharded over 'model'
    X_num,  # (M,) sharded 'model'
    X_lone,  # (M,) sharded 'model'
    m_mask,  # (M,) sharded 'model'
    mu,  # (M,) sharded 'model'
    choli,  # (M, M) replicated
    radii,  # (S,) replicated
    vscale_atom,  # (N,) sharded 'data'
    mesh,
    params,
    exponent,
):
    """Fused sharded MD step.

    Returns (E, forces(N,3), virial(3,3), beta(N,), cov(N,M)); the pair-
    kernel terms are currently single-device only (compose them on the
    replicated path or extend block_fn analogously).
    """

    def block_fn(
        pos, cell, numbers, amask, oidx, nidx, noff, nsidx, nmask,
        Xd, Xn, Xl, mm, mub, chol, rad, vsc,
    ):
        def global_energy(p_all, eps):
            one = jnp.eye(3, dtype=p_all.dtype) + eps
            posd = p_all @ one
            celld = cell @ one
            rvec = posd[nidx] - posd[oidx][:, None, :] + noff.astype(p_all.dtype) @ celld
            mask = nmask & amask[:, None]
            p = sesoap_descriptors(rvec, nsidx, mask, rad, params)
            lone = amask & ~mask.any(axis=1)
            cov = gram(p, numbers[oidx], lone, Xd, Xn, Xl, exponent)
            cov = cov * (amask[:, None] & mm[None, :])
            # the psum (reference all_reduce) is differentiated through, so
            # gradients of the replicated inputs come out globally reduced
            e = jax.lax.psum((cov @ mub).sum(), ("data", "model"))
            return e, cov

        eps0 = jnp.zeros((3, 3), dtype=pos.dtype)
        (e, cov_blk), (dpos, deps) = jax.value_and_grad(
            global_energy, argnums=(0, 1), has_aux=True
        )(pos, eps0)
        forces = -dpos
        virial = 0.5 * (deps + deps.T)
        # uncertainty needs full kernel rows: gather over the model axis
        cov_full = jax.lax.all_gather(cov_blk, "model", axis=1, tiled=True)
        cov_full = jax.lax.pmean(cov_full, "model")  # provably replicated
        b = chol @ cov_full.T
        c = (b * b).sum(axis=0)
        beta = jnp.sqrt(jnp.clip(1.0 - c, 0.0, None)) * jnp.sqrt(vsc)
        beta = jnp.where(amask, beta, -jnp.inf)
        return e, forces, virial, beta, cov_full

    fn = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P("data"), P("data"), P("data"), P("data"),
            P("data"), P("data"),
            P("model"), P("model"), P("model"), P("model"), P("model"),
            P(), P(), P("data"),
        ),
        out_specs=(P(), P(), P(), P("data"), P("data")),
    )
    return fn(
        positions, cell, numbers, atom_mask, own_idx, nbr_idx, nbr_off,
        nbr_sidx, nbr_mask, X_desc, X_num, X_lone, m_mask, mu, choli,
        radii, vscale_atom,
    )


def sharded_inputs_from(cfg, model, radii, vscale_atom, mesh):
    """Pad a (ConfigArrays, ModelArrays) pair to mesh-divisible sizes and
    return the argument tuple for :func:`sharded_predict`."""
    nd = mesh.shape["data"]
    nm = mesh.shape["model"]
    npad = cfg.positions.shape[0]
    mpad = model.mu.shape[0]

    def pad_to(x, size, axis=0):
        extra = size - x.shape[axis]
        if extra <= 0:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, extra)
        return jnp.pad(x, widths)

    n2 = -(-npad // nd) * nd
    m2 = -(-mpad // nm) * nm
    own_idx = jnp.arange(n2, dtype=jnp.int32)
    args = (
        pad_to(cfg.positions, n2),
        cfg.cell,
        pad_to(cfg.numbers, n2),
        pad_to(cfg.atom_mask, n2),
        own_idx,
        pad_to(cfg.nbr_idx, n2),
        pad_to(cfg.nbr_off, n2),
        pad_to(cfg.nbr_sidx, n2),
        pad_to(cfg.nbr_mask, n2),
        pad_to(model.X_desc, m2),
        pad_to(model.X_num, m2),
        pad_to(model.X_lone, m2),
        pad_to(model.m_mask, m2),
        pad_to(model.mu, m2),
        pad_to(pad_to(model.choli, m2, 0), m2, 1),
        radii,
        pad_to(jnp.asarray(vscale_atom, dtype=cfg.positions.dtype), n2),
    )
    return args
