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
    (`method_forker`, util/parallel.py:101-143); full kernel rows are
    obtained with one ``all_gather`` over "model".

Both the PREDICT path (:func:`sharded_predict`) and the TRAINING
covariance path (:func:`sharded_kernel_block`, the `method_forker` analog
applied at similarity/similarity.py:17-35) are built on the same engine
internals (`engine._total_cov`), so every kernel configuration — pair
terms, alchemical similarity, rbf/normed base kinds — is covered
uniformly, like the reference's MPI row split.

Model state (mu, choli) is replicated, matching the reference's
rank-0-solve + broadcast idiom (gppotential.py:548-605).  Positions stay
globally replicated (neighbors cross shard boundaries); the per-atom
neighbor tables are sharded, with ``own_idx`` mapping table rows to
global atom indices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..descriptor.soap import sesoap_descriptors
from ..engine import (
    ConfigArrays,
    ModelArrays,
    _col_energy,
    _config_descriptors,
    _env_rvec,
    _total_cov,
    precise_sum,
)


def make_mesh(n_data=None, n_model=1, devices=None, *, data=None, model=None):
    """Create a ('data', 'model') mesh over the available devices.

    ``data``/``model`` are accepted as aliases for ``n_data``/``n_model``
    (the short forms ARGS files and the user manuals use)."""
    if data is not None:
        n_data = data
    if model is not None:
        n_model = model
    devices = devices if devices is not None else jax.devices()
    n_data = n_data if n_data is not None else len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)} ({devices[0].platform})"
        )
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, ("data", "model"))


def _gathered_cov_c(choli, cov, alpha):
    """(cov_full, c) from a 'model'-axis sharded covariance block: the
    model-axis gather + the normalized squared-projection c that both the
    covloss trigger and the ActiveMeta bias derive their betas from.  The
    b*b reduction must stay in true f32 (engine.precise_sum): c feeds
    threshold comparisons near c = 1 and a bf16-folded sum adds a ~0.02
    noise floor (CLAUDE.md reduce-of-dot note)."""
    cov_full = jax.lax.all_gather(cov, "model", axis=1, tiled=True)
    cov_full = jax.lax.pmean(cov_full, "model")  # provably replicated
    b = choli @ cov_full.T
    c = precise_sum(b * b, axis=0) / alpha
    return cov_full, c


def _gathered_beta(choli, cov, alpha, vscale_atom, atom_mask):
    """Covloss beta from a 'model'-axis sharded covariance block — the ONE
    definition shared by sharded_predict and sharded_md_chunk (formula:
    kernels.covloss_beta; this adds the model-axis gather).

    Returns (cov_full (n, M) replicated over 'model', beta (n,))."""
    cov_full, c = _gathered_cov_c(choli, cov, alpha)
    beta = jnp.sqrt(jnp.clip(1.0 - c, 0.0, None)) * jnp.sqrt(vscale_atom)
    return cov_full, jnp.where(atom_mask, beta, -jnp.inf)


def _psum_energy(cfg_l, model_l, rad, oidx, znum, params, exponent,
                 pair_terms, chem_z, mixL, kind, meta_scale=None,
                 meta_vs=None):
    """Build the sharded energy closure used by every sharded_*_chunk:
    ``energy(p, cell) -> (E, (cov, alpha))`` with the masked covariance
    from `_total_cov` (this device's atom rows x inducing columns) and
    the energy psum'd over BOTH mesh axes INSIDE the closure — so
    differentiating it yields globally reduced position/strain
    gradients (full forces and virial on every device).

    ``meta_scale``/``meta_vs`` fuse the ActiveMeta uncertainty-seeking
    bias ``E -= scale * sum_i beta_i sqrt(meta_vs_i)`` INTO the closure
    (the exact host math of engine.meta_covloss_fn, reference
    active.py:1170-1186) — the bias needs the FULL covariance row, so
    it all_gathers over 'model' (differentiable, unlike pmax) and
    psums the local bias over 'data' only (it is already replicated
    over 'model' after the gather)."""

    def energy(p, cell):
        cov, lone, alpha = _total_cov(
            p, cell, cfg_l, model_l.X_desc, model_l.X_num,
            model_l.X_lone, rad, znum, params, exponent, pair_terms,
            model_l.pair_d, model_l.pair_mask, chem_z=chem_z, mixL=mixL,
            kind=kind, oidx=oidx,
        )
        cov = cov * (cfg_l.atom_mask[:, None] & model_l.m_mask[None, :])
        e = jax.lax.psum(precise_sum(cov @ model_l.mu), ("data", "model"))
        if meta_scale is not None:
            cov_full = jax.lax.all_gather(cov, "model", axis=1, tiled=True)
            cov_full = jax.lax.pmean(cov_full, "model")
            b = model_l.choli @ cov_full.T
            # reduce-of-dot rule (CLAUDE.md): b*b rides a matmul product
            # and c sits next to 1 — same guard as _gathered_beta
            c = precise_sum(b * b, axis=0)
            beta = jnp.sqrt(jnp.clip(1.0 - c, 1e-12, None))
            bias = jax.lax.psum(
                precise_sum(beta * jnp.sqrt(meta_vs) * cfg_l.atom_mask),
                "data",
            )
            e = e - meta_scale * bias
        return e, (cov, alpha)

    return energy


def _sharded_beta_max(model_l, cov, alpha, vs_l, cfg_l, check_beta, dtype):
    """Committee-free covloss trigger for the sharded chunks: beta from
    the model-axis-gathered covariance, maxed over this shard's atoms
    and pmax'd over 'data'."""
    if not check_beta:
        return jnp.zeros((), dtype=dtype)
    _, beta = _gathered_beta(
        model_l.choli, cov, alpha, vs_l, cfg_l.atom_mask
    )
    return jax.lax.pmax(jnp.max(beta), "data")


def _cfg_spec():
    """Per-leaf partition specs of a sharded ConfigArrays: positions/cell
    replicated (neighbors cross shards), per-atom tables over 'data'."""
    return ConfigArrays(
        positions=P(),
        cell=P(),
        numbers=P("data"),
        atom_mask=P("data"),
        nbr_idx=P("data"),
        nbr_off=P("data"),
        nbr_sidx=P("data"),
        nbr_mask=P("data"),
    )


def _model_spec(model: ModelArrays):
    """Per-leaf partition specs of a sharded ModelArrays: inducing axis
    over 'model', choli replicated (needed whole for covloss)."""
    return ModelArrays(
        X_desc=P("model"),
        X_num=P("model"),
        X_lone=P("model"),
        m_mask=P("model"),
        mu=P("model"),
        choli=P(),
        pair_d=None if model.pair_d is None else P(None, "model"),
        pair_mask=None if model.pair_mask is None else P(None, "model"),
    )


def _model_spec_committee(models: ModelArrays):
    """_model_spec for an expert-stacked committee ModelArrays (leading
    expert axis E, device_md.committee_stack layout): the expert axis is
    a local vmapped axis on every device; the inducing axis shards over
    'model' exactly like the single-model spec."""
    return ModelArrays(
        X_desc=P(None, "model"),
        X_num=P(None, "model"),
        X_lone=P(None, "model"),
        m_mask=P(None, "model"),
        mu=P(None, "model"),
        choli=P(),
        pair_d=None if models.pair_d is None else P(None, None, "model"),
        pair_mask=(
            None if models.pair_mask is None else P(None, None, "model")
        ),
    )


def _psum_committee_energy(cfg_l, models_l, rad, oidx, znum, params,
                           exponent, pair_terms, chem_z, mixL, kind,
                           vs_l, mean_e, meta_scale=None, meta_vs=None):
    """Committee counterpart of :func:`_psum_energy`: ``energy(p, cell)
    -> (E_committee, beta_floor_max)`` — the weighted BCM committee
    energy (device_md._committee_e math, reference active_bcm.py:589-633)
    with every expert evaluated on THIS device's atom shard under one
    vmap.  Per-expert energies are psum'd over both mesh axes inside the
    closure (globally reduced forces/virial on differentiation); the
    covloss weights use the per-expert GLOBAL covmax (shard max pmax'd
    over 'data'), and the aux trip scalar is the committee covloss floor
    ``max_atoms min_k beta_k``, also globally reduced.  The weights are
    constants w.r.t. positions/strain (stop_gradient), exactly like the
    host combination.

    ``meta_scale``/``meta_vs`` ((E, n_loc), inf -> 0 host convention)
    fuse the ActiveMeta bias on the COMMITTEE covloss floor (reference
    get_covloss_total, active_bcm.py:885-894):
    ``E -= scale * sum_i min_k beta_ki sqrt(meta_vs_ki)``.  The bias is
    differentiated (its atom sum rides a psum over 'data' — linear, has
    a transpose rule; the expert min is a local vmap axis), so it is
    added BEFORE the stop-gradient cut that protects the weights."""
    nexp = mean_e.shape[0]

    def energy(p, cell):
        def one(mdl, vs):
            cov, lone, alpha = _total_cov(
                p, cell, cfg_l, mdl.X_desc, mdl.X_num, mdl.X_lone, rad,
                znum, params, exponent, pair_terms, mdl.pair_d,
                mdl.pair_mask, chem_z=chem_z, mixL=mixL, kind=kind,
                oidx=oidx,
            )
            cov = cov * (cfg_l.atom_mask[:, None] & mdl.m_mask[None, :])
            e = jax.lax.psum(
                precise_sum(cov @ mdl.mu), ("data", "model")
            )
            _, c = _gathered_cov_c(mdl.choli, cov, alpha)
            beta = jnp.sqrt(jnp.clip(1.0 - c, 0.0, None)) * jnp.sqrt(vs)
            beta = jnp.where(cfg_l.atom_mask, beta, -jnp.inf)
            return e, beta, c

        e_k, betas, c_k = jax.vmap(one)(models_l, vs_l)  # (E,), (E, n_loc)
        e_bias = 0.0
        if meta_scale is not None:
            # 1e-12 floor: sqrt'(0) = inf would NaN the bias forces
            bias_b = jnp.sqrt(jnp.clip(1.0 - c_k, 1e-12, None)) * jnp.sqrt(
                meta_vs
            )
            floor = bias_b.min(axis=0)  # (n_loc,) committee floor
            e_bias = meta_scale * jax.lax.psum(
                precise_sum(jnp.where(cfg_l.atom_mask, floor, 0.0)),
                "data",
            )
        # weights and the trip scalar are constants w.r.t. positions/
        # strain (host semantics) — and pmax has no differentiation
        # rule, so the cut must come BEFORE the collective
        betas = jax.lax.stop_gradient(betas)
        covmax = jnp.clip(
            jax.lax.pmax(betas.max(axis=1), "data"), 1e-12, 1.0
        )
        scale = jnp.where(covmax < 1.0, -jnp.log(covmax), 0.0) / covmax
        tot = scale.sum()
        w = jnp.where(
            tot > 0,
            scale / jnp.where(tot > 0, tot, 1.0),
            jnp.ones_like(scale) / nexp,
        )
        e_tot = precise_sum(w * (e_k + mean_e)) - e_bias
        bmax = jax.lax.pmax(betas.min(axis=0).max(), "data")
        return e_tot, bmax

    return energy


def _sharded_inloop(cfg_l, oidx, amask, rebuild, rebuild_cut, sidx_atom,
                    sidx_ok):
    """In-loop rebuild plumbing for the SHARDED chunks — the shard_map
    counterpart of device_md._inloop_table.  Each device rebuilds the
    table rows for ITS OWN atoms (``row_ids=oidx``) from the replicated
    positions (neighbors_device.device_neighbor_table); validity
    (bucket overflow / int8 offsets) is pmax'd over 'data' so every
    device takes the same keep-or-replace select.  Mesh tables carry no
    reverse-slot plane (the oidx/psum energy uses the plain scatter
    VJP).  Returns (cfg_with, tbl0, rebuild_fn)."""

    def cfg_with(tbl):
        if not rebuild or tbl is None:
            return cfg_l
        idx, off, sx, mk = tbl
        return cfg_l._replace(nbr_idx=idx, nbr_off=off, nbr_sidx=sx,
                              nbr_mask=mk)

    if not rebuild:
        return cfg_with, None, None

    from ..neighbors_device import device_neighbor_table

    kpad = cfg_l.nbr_idx.shape[1]
    off_dtype = cfg_l.nbr_off.dtype
    cand_mask = amask[:, 0].astype(bool)  # replicated global (N,)

    def rebuild_fn(pos, cell=None):
        idx, off, mask, kmax, off_over = device_neighbor_table(
            pos, cfg_l.cell if cell is None else cell, cand_mask,
            rebuild_cut, kpad, row_ids=oidx, row_mask=cfg_l.atom_mask,
        )
        off = off.astype(off_dtype)
        sx = sidx_atom[idx]
        mask = mask & sidx_ok[idx]
        bad = (kmax > kpad) | off_over
        bad = jax.lax.pmax(bad.astype(jnp.int32), "data") > 0
        return (idx, off, sx, mask), ~bad

    tbl0 = (cfg_l.nbr_idx, cfg_l.nbr_off, cfg_l.nbr_sidx, cfg_l.nbr_mask)
    return cfg_with, tbl0, rebuild_fn


def _sharded_forces_fn(cfg_l, model_l, rad, vs_l, oidx, amask, znum,
                       params, exponent, pair_terms, chem_z, mixL, kind,
                       check_beta, committee, mean_e, meta_scale=None,
                       meta_vs=None, cfg_with=None):
    """``(e, f, beta_max)`` closure shared by the position-only sharded
    chunks (MD / FIRE / per-image NEB): single-model psum energy or the
    weighted committee energy, forces from its gradient, the trip scalar
    fully reduced over the mesh.  ``cfg_with(tbl)`` grafts an in-loop
    rebuilt table before the energy closure is built."""
    if cfg_with is None:
        def cfg_with(tbl):  # noqa: E306
            return cfg_l

    if committee:

        def forces_fn(pos, tbl=None):
            c = cfg_with(tbl)
            energy_c = _psum_committee_energy(
                c, model_l, rad, oidx, znum, params, exponent,
                pair_terms, chem_z, mixL, kind, vs_l, mean_e,
                meta_scale=meta_scale, meta_vs=meta_vs,
            )
            (e, bmax), g = jax.value_and_grad(
                lambda p: energy_c(p, c.cell), has_aux=True
            )(pos)
            f = -g * amask
            if not check_beta:
                bmax = jnp.zeros((), dtype=pos.dtype)
            return e, f, bmax

        return forces_fn

    def forces_fn(pos, tbl=None):
        c = cfg_with(tbl)
        energy_g = _psum_energy(c, model_l, rad, oidx, znum, params,
                                exponent, pair_terms, chem_z, mixL, kind,
                                meta_scale=meta_scale, meta_vs=meta_vs)
        (e, (cov, alpha)), g = jax.value_and_grad(
            lambda p: energy_g(p, c.cell), has_aux=True
        )(pos)
        f = -g * amask
        beta_max = _sharded_beta_max(model_l, cov, alpha, vs_l, c,
                                     check_beta, pos.dtype)
        return e, f, beta_max

    return forces_fn


def _sharded_forces_virial_fn(cfg_l, model_l, rad, vs_l, oidx, amask,
                              znum, params, exponent, pair_terms, chem_z,
                              mixL, kind, check_beta, committee, mean_e,
                              aniso, cfg_with=None):
    """``(e, f, deps, beta_max)`` closure shared by the strain-carrying
    sharded chunks (NPT / variable-cell FIRE): the energy — single-model
    or committee — is differentiated w.r.t. (positions, strain) jointly,
    so the forces AND the virial (trace or tensor) come out globally
    reduced on every device.  ``cfg_with(tbl)`` grafts an in-loop
    rebuilt table before the energy closure is built."""
    dtype = cfg_l.positions.dtype
    eye = jnp.eye(3, dtype=dtype)
    if cfg_with is None:
        def cfg_with(tbl):  # noqa: E306
            return cfg_l

    def forces_fn(pos, cell, tbl=None):
        c = cfg_with(tbl)
        if committee:
            energy_raw = _psum_committee_energy(
                c, model_l, rad, oidx, znum, params, exponent,
                pair_terms, chem_z, mixL, kind, vs_l, mean_e,
            )
        else:
            energy_raw = _psum_energy(c, model_l, rad, oidx, znum,
                                      params, exponent, pair_terms,
                                      chem_z, mixL, kind)

        def energy(p, eps):
            # psum inside the differentiated function: position AND
            # strain gradients come out globally reduced (the
            # sharded_md_chunk idiom, extended to the virial)
            if aniso:
                sc = eye + eps
                return energy_raw(p @ sc.T, cell @ sc.T)
            return energy_raw(p * (1.0 + eps), cell * (1.0 + eps))

        zero = jnp.zeros((3, 3) if aniso else (), dtype=dtype)
        (e, aux), (g, deps) = jax.value_and_grad(
            energy, argnums=(0, 1), has_aux=True
        )(pos, zero)
        if aniso:
            deps = 0.5 * (deps + deps.T)
        f = -g * amask
        if committee:
            beta_max = aux
            if not check_beta:
                beta_max = jnp.zeros((), dtype=dtype)
        else:
            cov, alpha = aux
            beta_max = _sharded_beta_max(model_l, cov, alpha, vs_l,
                                         c, check_beta, dtype)
        return e, f, deps, beta_max

    return forces_fn


def _pad_to(x, size, axis=0):
    extra = size - x.shape[axis]
    if extra <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, extra)
    return jnp.pad(x, widths)


def _pad_cfg(cfg: ConfigArrays, n2, axis=0):
    """Pad a config's atom axis to ``n2``.  ``axis=1`` handles the
    image-stacked layout ((R, N, ...) leaves, DeviceNEB bands).  The
    reverse-slot table is dropped: padding invalidates its flat i*K+k
    indexing, and the mesh paths use the oidx/psum energy (no rev VJP)."""
    return ConfigArrays(
        positions=_pad_to(cfg.positions, n2, axis),
        cell=cfg.cell,
        numbers=_pad_to(cfg.numbers, n2, axis),
        atom_mask=_pad_to(cfg.atom_mask, n2, axis),
        nbr_idx=_pad_to(cfg.nbr_idx, n2, axis),
        nbr_off=_pad_to(cfg.nbr_off, n2, axis),
        nbr_sidx=_pad_to(cfg.nbr_sidx, n2, axis),
        nbr_mask=_pad_to(cfg.nbr_mask, n2, axis),
    )


def _pad_model(model: ModelArrays, m2, lead=0):
    """Pad the inducing axis to ``m2``.  ``lead=1`` handles the
    expert-stacked committee layout ((E, m, ...) leaves)."""
    ax = lead
    return ModelArrays(
        X_desc=_pad_to(model.X_desc, m2, ax),
        X_num=_pad_to(model.X_num, m2, ax),
        X_lone=_pad_to(model.X_lone, m2, ax),
        m_mask=_pad_to(model.m_mask, m2, ax),
        mu=_pad_to(model.mu, m2, ax),
        choli=_pad_to(_pad_to(model.choli, m2, ax), m2, ax + 1),
        pair_d=(
            None if model.pair_d is None
            else _pad_to(model.pair_d, m2, ax + 1)
        ),
        pair_mask=(
            None if model.pair_mask is None
            else _pad_to(model.pair_mask, m2, ax + 1)
        ),
    )


def mesh_pad(cfg: ConfigArrays, model: ModelArrays, vscale_atom, mesh,
             dtype=None):
    """Pad a (ConfigArrays, ModelArrays) pair to mesh-divisible sizes.

    Returns (cfg2, model2, own_idx, vscale2); slice outputs back with the
    original npad / mcap.
    """
    nd = mesh.shape["data"]
    nm = mesh.shape["model"]
    npad = cfg.positions.shape[0]
    mpad = model.mu.shape[0]
    n2 = -(-npad // nd) * nd
    m2 = -(-mpad // nm) * nm
    own_idx = jnp.arange(n2, dtype=jnp.int32)
    cfg2 = _pad_cfg(cfg, n2)
    model2 = _pad_model(model, m2)
    vs = jnp.asarray(vscale_atom, dtype=dtype or cfg.positions.dtype)
    return cfg2, model2, own_idx, _pad_to(vs, n2)


def pad_for_mesh(cfg, model, vscale_atom, mesh, dtype, committee=False):
    """mesh_pad plus the replicated global atom-mask column the sharded
    chunk loops consume — the one-call driver-side entry used by
    DeviceMD/DeviceNPT/DeviceFIRE when engine.mesh is set.

    ``committee=True``: ``model`` leaves carry a leading expert axis E
    (device_md.committee_stack layout) and ``vscale_atom`` is (E, N)."""
    if committee:
        nd = mesh.shape["data"]
        nm = mesh.shape["model"]
        npad = cfg.positions.shape[0]
        mpad = model.mu.shape[1]
        n2 = -(-npad // nd) * nd
        m2 = -(-mpad // nm) * nm
        own_idx = jnp.arange(n2, dtype=jnp.int32)
        cfg2 = _pad_cfg(cfg, n2)
        ma2 = _pad_model(model, m2, lead=1)
        vsj = _pad_to(jnp.asarray(vscale_atom, dtype=dtype), n2, axis=1)
    else:
        cfg2, ma2, own_idx, vsj = mesh_pad(cfg, model, vscale_atom, mesh,
                                           dtype=dtype)
    gmask = jnp.asarray(
        np.asarray(cfg2.atom_mask)[:, None], dtype=dtype
    )
    return cfg2, ma2, own_idx, vsj, gmask


def _cfg_spec_images():
    """_cfg_spec for an image-stacked ConfigArrays (leading band axis R,
    DeviceNEB): positions/cell replicated, per-atom tables sharded over
    'data' on the ATOM axis (axis 1) — images are a local vmapped axis
    on every device."""
    return ConfigArrays(
        positions=P(),
        cell=P(),
        numbers=P(None, "data"),
        atom_mask=P(None, "data"),
        nbr_idx=P(None, "data"),
        nbr_off=P(None, "data"),
        nbr_sidx=P(None, "data"),
        nbr_mask=P(None, "data"),
    )


def pad_images_for_mesh(cfgs, model, vscale_atom, mesh, dtype,
                        committee=False):
    """pad_for_mesh for an image-stacked ConfigArrays (DeviceNEB bands):
    pads the ATOM axis (axis 1 of every per-atom leaf) to a
    mesh-divisible size.  Returns (cfgs2, model2, own_idx, vscale2,
    gmask) with gmask the replicated (N, 1) global atom-mask column of
    the shared system (images share atom count/species).
    ``committee=True``: expert-stacked model leaves / (E, N) vscale."""
    nd = mesh.shape["data"]
    nm = mesh.shape["model"]
    lead = 1 if committee else 0
    npad = cfgs.positions.shape[1]
    mpad = model.mu.shape[lead]
    n2 = -(-npad // nd) * nd
    m2 = -(-mpad // nm) * nm
    own_idx = jnp.arange(n2, dtype=jnp.int32)
    cfgs2 = _pad_cfg(cfgs, n2, axis=1)
    model2 = _pad_model(model, m2, lead=lead)
    vs = _pad_to(jnp.asarray(vscale_atom, dtype=dtype), n2, axis=lead)
    gmask = jnp.asarray(
        np.asarray(cfgs2.atom_mask[0])[:, None], dtype=dtype
    )
    return cfgs2, model2, own_idx, vs, gmask


@partial(
    jax.jit,
    static_argnames=("mesh", "params", "exponent", "pair_terms", "kind"),
)
def sharded_predict(cfg: ConfigArrays, model: ModelArrays, radii, vscale_atom,
                    own_idx, mesh, params, exponent, znum=None, pair_terms=(),
                    chem_z=None, mixL=None, kind="dot"):
    """Fused sharded MD step (same contract as engine.predict_fn).

    Returns (E, forces(N,3), virial(3,3), cov(N,M), beta(N,)); every
    kernel configuration of the replicated path (pair terms, chemical,
    rbf/normed kinds) is supported — the covariance block comes from the
    same `_total_cov` the single-device path uses.
    """

    def block_fn(cfg_l, model_l, rad, vs, oidx):
        def global_energy(pos, eps):
            one = jnp.eye(3, dtype=pos.dtype) + eps
            posd = pos @ one
            celld = cfg_l.cell @ one
            cov, lone, alpha = _total_cov(
                posd, celld, cfg_l, model_l.X_desc, model_l.X_num,
                model_l.X_lone, rad, znum, params, exponent, pair_terms,
                model_l.pair_d, model_l.pair_mask, chem_z=chem_z, mixL=mixL,
                kind=kind, oidx=oidx,
            )
            cov = cov * (cfg_l.atom_mask[:, None] & model_l.m_mask[None, :])
            # the psum (reference all_reduce) is differentiated through, so
            # gradients of the replicated inputs come out globally reduced
            e = jax.lax.psum(precise_sum(cov @ model_l.mu), ("data", "model"))
            return e, (cov, alpha)

        eps0 = jnp.zeros((3, 3), dtype=cfg_l.positions.dtype)
        (e, (cov_blk, alpha)), (dpos, deps) = jax.value_and_grad(
            global_energy, argnums=(0, 1), has_aux=True
        )(cfg_l.positions, eps0)
        forces = -dpos
        virial = 0.5 * (deps + deps.T)
        cov_full, beta = _gathered_beta(
            model_l.choli, cov_blk, alpha, vs, cfg_l.atom_mask
        )
        return e, forces, virial, cov_full, beta

    fn = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(_cfg_spec(), _model_spec(model), P(), P("data"), P("data")),
        out_specs=(P(), P(), P(), P("data"), P("data")),
    )
    return fn(cfg, model, radii, vscale_atom, own_idx)


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "params", "exponent", "batch_size", "pair_terms", "kind",
    ),
)
def sharded_kernel_block(cfg: ConfigArrays, model: ModelArrays, radii, own_idx,
                         mesh, params, exponent, batch_size=16, znum=None,
                         pair_terms=(), chem_z=None, mixL=None, kind="dot"):
    """(Ke row, Kf block, Kv block) of a configuration vs the inducing set,
    sharded: inducing columns over 'model', atom rows over 'data'.

    The TPU analog of the reference's row-parallel Gram construction
    during model updates (`method_forker`, util/parallel.py:101-143): each
    device computes its (atom-block x inducing-block) partial VJPs; partial
    Ke/Kf/Kv are psum-reduced over 'data' and the column blocks
    all_gather-ed over 'model', so every device holds the full block
    (reference broadcast reassembly, parallel.py:129-135).

    Same contract as engine.kernel_block_fn: ke (M,), kf (N, 3, M),
    kv (3, 3, M).
    """
    T = len(pair_terms)

    def block_fn(cfg_l, model_l, rad, oidx):
        # mark the differentiated inputs device-varying: otherwise shard_map
        # AD auto-psums the position cotangent over ALL mesh axes (since
        # positions are replicated), double-counting rows and mixing the
        # per-'model'-shard columns.  With pcast-to-varying the VJP stays local and the
        # single explicit psum over 'data' below is the only reduction.
        pos0 = jax.lax.pcast(cfg_l.positions, ("data", "model"), to="varying")
        eps0 = jax.lax.pcast(
            jnp.zeros((3, 3), dtype=cfg_l.positions.dtype),
            ("data", "model"), to="varying",
        )
        mloc = model_l.mu.shape[0]
        if T:
            pd_all = jnp.moveaxis(model_l.pair_d, 0, 1)  # (Mb, T, KX)
            pm_all = jnp.moveaxis(model_l.pair_mask, 0, 1)
        else:
            pd_all = jnp.zeros((mloc, 0, 0))
            pm_all = jnp.zeros((mloc, 0, 0), dtype=bool)

        def one(x):
            x_desc, x_num, x_lone, x_pd, x_pm = x
            ke, (dpos, deps) = jax.value_and_grad(_col_energy, argnums=(0, 1))(
                pos0, eps0, cfg_l, x_desc, x_num, x_lone, rad,
                params, exponent, znum, pair_terms,
                x_pd if T else None, x_pm if T else None, chem_z, mixL, kind,
                oidx, None,
            )
            return ke, -dpos, 0.5 * (deps + deps.T)

        # local partial sums over this device's atom rows, one VJP per
        # owned inducing column
        ke, kf, kv = jax.lax.map(
            one,
            (model_l.X_desc, model_l.X_num, model_l.X_lone, pd_all, pm_all),
            batch_size=batch_size,
        )
        # reduce partial row sums over 'data' (linear, so summing the
        # stacked per-column VJPs is exact); the column blocks stay sharded
        # over 'model' — the out_specs reassemble the full matrix (the
        # reference's all_gather/broadcast step, parallel.py:129-135, done
        # by XLA's output layout instead of an explicit collective)
        ke, kf, kv = jax.lax.psum((ke, kf, kv), "data")
        # ke: (Mb,), kf: (Mb, N, 3), kv: (Mb, 3, 3) per device
        return ke, jnp.moveaxis(kf, 0, -1), jnp.moveaxis(kv, 0, -1)

    fn = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(_cfg_spec(), _model_spec(model), P(), P("data")),
        out_specs=(
            P("model"),
            P(None, None, "model"),
            P(None, None, "model"),
        ),
    )
    return fn(cfg, model, radii, own_idx)


@partial(
    jax.jit,
    static_argnames=("mesh", "params", "exponent", "chunk"),
)
def sharded_kernel_block_jac(cfg: ConfigArrays, model: ModelArrays, radii,
                             own_idx, mesh, params, exponent, chunk=128):
    """MXU variant of :func:`sharded_kernel_block` for the default SOAP
    kernel: the per-LCE descriptor Jacobian is materialized once per
    'data' shard and every owned inducing column becomes matmuls +
    segment-sums (the sharded port of engine.kernel_block_jac_fn, which
    is ~10-30x faster than the per-column VJP map at large m).

    Same contract: ke (M,), kf (N, 3, M), kv (3, 3, M).
    """

    def block_fn(cfg_l, model_l, rad, oidx):
        pos = cfg_l.positions  # global (replicated)
        cell = cfg_l.cell
        rvec0 = _env_rvec(pos, cell, cfg_l, oidx)
        mask = cfg_l.nbr_mask & cfg_l.atom_mask[:, None]

        def p_of(rv, si, mk):
            return sesoap_descriptors(rv, si, mk, rad, params)

        # per-owned-atom jacobian dp/drvec: (Nb, D, K, 3)
        jac_fn = jax.vmap(jax.jacfwd(p_of), in_axes=(0, 0, 0))
        J = jac_fn(rvec0, cfg_l.nbr_sidx, mask)
        p, lone = _config_descriptors(pos, cell, cfg_l, rad, params, oidx)

        dot = p @ model_l.X_desc.T  # (Nb, Mb)
        same = (
            cfg_l.numbers[:, None] == model_l.X_num[None, :]
        ).astype(p.dtype)
        valid = (
            cfg_l.atom_mask[:, None] & model_l.m_mask[None, :]
        ).astype(p.dtype)
        ke_mat = (
            dot**exponent * same
            + (lone[:, None] & model_l.X_lone[None, :]) * same
        ) * valid
        ke = precise_sum(ke_mat, axis=0)
        W = exponent * dot ** (exponent - 1) * same * valid  # (Nb, Mb)

        nb, k = mask.shape
        nglob = pos.shape[0]
        mloc = model_l.mu.shape[0]
        flat_idx = cfg_l.nbr_idx.reshape(-1)
        rmask = rvec0 * mask[:, :, None]

        def one_chunk(xw):
            Xc, Wc = xw  # (C, D), (Nb, C)
            JXc = jnp.einsum("ndka,cd->nkac", J, Xc)  # (Nb, K, 3, C)
            Gc = Wc[:, None, None, :] * JXc * mask[:, :, None, None]
            # dKe_j/d r_ik = Gc[i,k,:,j]; leftgrad: +G at global nbr_idx,
            # -G at the owned atom's global row
            plus = jax.ops.segment_sum(
                Gc.reshape(nb * k, 3, -1), flat_idx, num_segments=nglob
            )
            minus = jax.ops.segment_sum(
                Gc.sum(axis=1), oidx, num_segments=nglob
            )
            kf_c = -(plus - minus)  # forces_energy = -leftgrad
            kv_c = jnp.einsum("nkac,nkb->abc", Gc, rmask)
            return kf_c, kv_c

        C = min(chunk, mloc)
        nchunks = -(-mloc // C)
        pad_m = nchunks * C
        Xp = jnp.pad(model_l.X_desc, ((0, pad_m - mloc), (0, 0))).reshape(
            nchunks, C, -1
        )
        Wp = jnp.pad(W, ((0, 0), (0, pad_m - mloc))).reshape(nb, nchunks, C)
        kf_chunks, kv_chunks = jax.lax.map(
            one_chunk, (Xp, jnp.moveaxis(Wp, 1, 0))
        )
        kf = jnp.moveaxis(kf_chunks, 0, -2).reshape(nglob, 3, pad_m)[..., :mloc]
        kv = jnp.moveaxis(kv_chunks, 0, -2).reshape(3, 3, pad_m)[..., :mloc]
        kv = 0.5 * (kv + jnp.swapaxes(kv, 0, 1))
        # reduce the partial row sums over the atom shards
        ke, kf, kv = jax.lax.psum((ke, kf, kv), "data")
        return ke, kf, kv

    fn = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(_cfg_spec(), _model_spec(model), P(), P("data")),
        out_specs=(
            P("model"),
            P(None, None, "model"),
            P(None, None, "model"),
        ),
    )
    return fn(cfg, model, radii, own_idx)


@partial(
    jax.jit,
    static_argnames=("mesh", "params", "exponent", "pair_terms",
                     "check_beta", "thermostat", "kind", "committee",
                     "meta_kind", "rebuild"),
)
def sharded_md_chunk(
    cfg: ConfigArrays,
    model: ModelArrays,
    radii,
    znum,
    vscale_atom,  # (N,) sharded over 'data'
    amask,  # (N, 1) global atom mask, replicated
    velocities,  # (N, 3) replicated
    masses,  # (N, 1) replicated
    pos0,  # (N, 3) positions at table-build time, replicated
    key,
    dt,
    kT,
    friction,
    skin_half,
    beta_thresh,
    nsteps,
    own_idx,
    mesh,
    chem_z=None,
    mixL=None,
    nhc_Q=None,
    nhc_dof=None,
    nhc_vxi=None,
    nhc_xi=None,
    params=None,
    exponent=4,
    pair_terms=(),
    check_beta=True,
    thermostat="langevin",
    kind="dot",
    committee=False,  # model/vscale carry a leading expert axis
    mean_e=None,  # (E,) per-expert mean energies (committee)
    meta_kind=None,  # "covloss" = ActiveMeta bias fused into the step
    meta_scale=None,  # traced bias strength (eV)
    meta_vs=None,  # (N,) vscale with inf -> 0, sharded over 'data'
    rebuild=False,  # in-loop per-shard neighbor rebuild at skin breaches
    rebuild_cut=None,
    sidx_atom=None,  # (N,) replicated species-table index per atom
    sidx_ok=None,  # (N,) replicated
):
    """Device-resident MD over the ('data', 'model') mesh: the ENTIRE
    ``lax.while_loop`` integrator runs inside one ``shard_map``.

    ``rebuild=True`` handles skin breaches INSIDE the loop: each device
    rebuilds ITS OWN table rows from the replicated positions
    (:func:`_sharded_inloop`) — no host round trip, no repartition; the
    chunk only exits early on an uncertainty trip or a (globally
    reduced) bucket overflow.

    ``committee=True`` integrates the weighted BCM committee surface
    (:func:`_psum_committee_energy`; ``model`` leaves expert-stacked,
    ``vscale_atom`` (E, N) sharded on the atom axis) — the reference's
    flagship MPI configuration (committee MD over per-rank atoms,
    active_bcm.py:589-633) as SPMD.  ``meta_kind="covloss"`` fuses the
    ActiveMeta uncertainty bias into the sharded step (see
    :func:`_psum_energy`; single-model only, like md_chunk).

    This is the reference's core scaling promise — more ranks for more
    atoms *during MD* (README.md:89-92; per-rank atom ownership
    atoms.py:321-341) — applied to the flagship throughput path: each
    device computes descriptors and covariance rows for its block of
    atoms (tables sharded over 'data', inducing columns over 'model');
    forces come out globally reduced because the energy ``psum`` is
    differentiated through (same idiom as :func:`sharded_predict`), so
    the replicated position/velocity state steps identically on every
    device and never leaves the chips between host visits.

    Trajectories match the single-device ``md_chunk`` (same integrator,
    same PRNG draws on the replicated state; equality-tested in
    tests/test_parallel.py).

    Returns (pos, vel, key, f, e, beta_max, ndone, nhc_vxi, nhc_xi),
    every output replicated.
    """
    from ..md.device_md import _chunk_loop

    dtype = cfg.positions.dtype
    if nhc_vxi is None:
        nhc_vxi = jnp.zeros(3, dtype=dtype)
        nhc_xi = jnp.zeros(3, dtype=dtype)
        nhc_Q = jnp.ones(3, dtype=dtype)
        nhc_dof = jnp.ones((), dtype=dtype)
    if mean_e is None:
        mean_e = jnp.zeros(1, dtype=dtype)
    meta = meta_kind == "covloss"
    if not meta:
        meta_scale = jnp.zeros((), dtype=dtype)
        # committee meta_vs carries a leading expert axis (E, N)
        vshape = ((mean_e.shape[0], cfg.positions.shape[0]) if committee
                  else (cfg.positions.shape[0],))
        meta_vs = jnp.zeros(vshape, dtype=dtype)
    if not rebuild:
        rebuild_cut = jnp.zeros((), dtype=dtype)
        sidx_atom = jnp.zeros(cfg.positions.shape[0], dtype=jnp.int32)
        sidx_ok = jnp.ones(cfg.positions.shape[0], dtype=bool)

    def block_fn(cfg_l, model_l, rad, vs_l, oidx, amask, vel, masses, pos0,
                 key, dt, kT, friction, skin_half, beta_thresh, nsteps,
                 nhc_Q, nhc_dof, nhc_vxi, nhc_xi, mean_e, meta_scale,
                 meta_vs, rebuild_cut, sidx_atom, sidx_ok):
        cfg_with, tbl0, rebuild_fn = _sharded_inloop(
            cfg_l, oidx, amask, rebuild, rebuild_cut, sidx_atom, sidx_ok
        )
        forces_fn = _sharded_forces_fn(
            cfg_l, model_l, rad, vs_l, oidx, amask, znum, params,
            exponent, pair_terms, chem_z, mixL, kind, check_beta,
            committee, mean_e,
            meta_scale=meta_scale if meta else None,
            meta_vs=meta_vs if meta else None,
            cfg_with=cfg_with,
        )
        out = _chunk_loop(
            forces_fn, cfg_l.positions, amask, vel, masses, key, pos0,
            dt, kT, friction, skin_half, beta_thresh, nsteps,
            thermostat, check_beta, nhc_Q, nhc_dof, nhc_vxi, nhc_xi,
            tbl=tbl0, rebuild_fn=rebuild_fn,
        )
        if rebuild:
            pos, vel, key, f, e, beta_max, vxi, xi, i, tbl, p0 = out
            return pos, vel, key, f, e, beta_max, i, vxi, xi, tbl, p0
        pos, vel, key, f, e, beta_max, vxi, xi, i = out
        return pos, vel, key, f, e, beta_max, i, vxi, xi

    rep = (P(),) * 17
    out_specs = (P(),) * 9
    if rebuild:
        out_specs = out_specs + (P("data"), P())
    fn = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(
            _cfg_spec(),
            _model_spec_committee(model) if committee else _model_spec(model),
            P(),
            P(None, "data") if committee else P("data"),
            P("data"),
        ) + rep + (
            P(None, "data") if committee else P("data"),  # meta_vs
            P(), P(), P(),
        ),
        out_specs=out_specs,
    )
    return fn(cfg, model, radii, vscale_atom, own_idx, amask, velocities,
              masses, pos0, key, dt, kT, friction, skin_half, beta_thresh,
              nsteps, nhc_Q, nhc_dof, nhc_vxi, nhc_xi, mean_e, meta_scale,
              meta_vs, rebuild_cut, sidx_atom, sidx_ok)


@partial(
    jax.jit,
    static_argnames=("mesh", "params", "exponent", "pair_terms",
                     "check_beta", "kind", "aniso", "committee",
                     "rebuild"),
)
def sharded_npt_chunk(
    cfg: ConfigArrays,
    model: ModelArrays,
    radii,
    znum,
    vscale_atom,  # (N,) sharded over 'data'
    amask,  # (N, 1) global atom mask, replicated
    velocities,  # (N, 3) replicated
    masses,  # (N, 1) replicated
    pos0,  # (N, 3) positions at table-build time, replicated
    cell0,  # (3, 3) current cell, replicated
    dt,
    kT,
    p_ext,
    W,
    skin_half,
    beta_thresh,
    nsteps,
    nhc_Q,
    nhc_dof,
    nhc_vxi,
    nhc_xi,
    bch_Q,
    bch_dof,  # scalar cell-chain dof (1.0 isotropic / ncell aniso)
    bch_vxi,
    bch_xi,
    vg,  # scalar (isotropic) or (3, 3) symmetric (aniso)
    strain_mask,  # (3, 3) strain-component mask (ignored when not aniso)
    own_idx,
    mesh,
    chem_z=None,
    mixL=None,
    params=None,
    exponent=4,
    pair_terms=(),
    check_beta=True,
    kind="dot",
    aniso=False,
    committee=False,  # model/vscale carry a leading expert axis
    mean_e=None,  # (E,) per-expert mean energies (committee)
    rebuild=False,  # in-loop per-shard neighbor rebuild (moving cell)
    rebuild_cut=None,
    sidx_atom=None,  # (N,) replicated
    sidx_ok=None,  # (N,) replicated
    tbl_cell=None,  # (3, 3) cell the incoming table was built with
    offmax=None,  # scalar max Sum|off| of the incoming table
):
    """Device-resident MTK NPT over the ('data', 'model') mesh: the
    ENTIRE barostat while-loop (md/device_npt._npt_loop) runs inside
    one ``shard_map`` — constant-pressure MD scales out exactly like
    :func:`sharded_md_chunk`.  ``committee=True`` integrates the
    weighted BCM committee surface with the committee virial from the
    same joint (positions, strain) backward.  ``rebuild=True`` handles
    skin breaches INSIDE the loop (each device rebuilds ITS OWN rows
    from the replicated positions AND the current cell,
    :func:`_sharded_inloop`; the rebuilt table's image lever arm is
    pmax'd over 'data'); the return then gains (tbl, pos0, tbl_cell,
    offmax) for chaining — pass those back on the next call.

    The energy is psum'd over both mesh axes INSIDE the function that is
    differentiated w.r.t. (positions, strain) jointly, so BOTH the
    forces and the virial (trace or tensor) come out globally reduced on
    every device; the replicated integrator state (positions, cell,
    thermostat + barostat chains) then steps identically everywhere.
    Skin breaches exit the chunk (host rebuild re-partitions the sharded
    tables, like the NVT mesh path); the breach metric includes the
    moving-cell image-drift term with the table's offmax pmax'd over
    'data'.

    Trajectories match the single-device ``md_chunk_npt`` (equality-
    tested in tests/test_parallel.py).  Returns the md_chunk_npt
    no-rebuild tuple (pos, vel, cell, f, e, beta_max, ndone, nhc_vxi,
    nhc_xi, bch_vxi, bch_xi, vg), every output replicated.
    """
    from ..md.device_npt import _npt_loop, offsum_max

    dtype = cfg.positions.dtype
    if mean_e is None:
        mean_e = jnp.zeros(1, dtype=dtype)
    if not rebuild:
        rebuild_cut = jnp.zeros((), dtype=dtype)
        sidx_atom = jnp.zeros(cfg.positions.shape[0], dtype=jnp.int32)
        sidx_ok = jnp.ones(cfg.positions.shape[0], dtype=bool)
    if tbl_cell is None:
        # host build: cfg.cell IS the table cell (the image-drift
        # baseline is the TABLE-BUILD cell, the md_chunk_npt contract —
        # NOT the chunk-entry cell0: on chained chunks the table
        # persists while cell0 has moved)
        tbl_cell = cfg.cell
    if offmax is None:
        # a jnp reduction over the sharded array outside shard_map is
        # already global — no pmax needed
        offmax = offsum_max(cfg.nbr_off, cfg.nbr_mask, dtype)

    def omax_pmax(off, msk, dt_):
        return jax.lax.pmax(offsum_max(off, msk, dt_), "data")

    def block_fn(cfg_l, model_l, rad, vs_l, oidx, amask, vel, masses,
                 pos0, cell0, dt, kT, p_ext, W, skin_half, beta_thresh,
                 nsteps, nhc_Q, nhc_dof, nhc_vxi, nhc_xi, bch_Q, bch_dof,
                 bch_vxi, bch_xi, vg, strain_mask, mean_e, rebuild_cut,
                 sidx_atom, sidx_ok, tbl_cell, offmax):
        cfg_with, tbl0, rebuild_fn = _sharded_inloop(
            cfg_l, oidx, amask, rebuild, rebuild_cut, sidx_atom, sidx_ok
        )
        forces_fn = _sharded_forces_virial_fn(
            cfg_l, model_l, rad, vs_l, oidx, amask, znum, params,
            exponent, pair_terms, chem_z, mixL, kind, check_beta,
            committee, mean_e, aniso, cfg_with=cfg_with,
        )
        if not rebuild:
            tbl0 = ()
        return _npt_loop(
            forces_fn, cfg_l.positions, amask, vel, masses, pos0, cell0,
            dt, kT, p_ext, W, skin_half, beta_thresh, nsteps, nhc_Q,
            nhc_dof, nhc_vxi, nhc_xi, bch_Q, bch_dof, bch_vxi, bch_xi,
            vg, aniso, strain_mask, check_beta, dtype, tbl_cell, offmax,
            tbl0=tbl0, rebuild_fn=rebuild_fn, rebuild_cut=rebuild_cut,
            omax_of=omax_pmax,
        )

    rep = (P(),) * 28
    out_specs = (P(),) * 12
    if rebuild:
        out_specs = out_specs + (P("data"), P(), P(), P())
    fn = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(
            _cfg_spec(),
            _model_spec_committee(model) if committee else _model_spec(model),
            P(),
            P(None, "data") if committee else P("data"),
            P("data"),
        ) + rep,
        out_specs=out_specs,
    )
    return fn(cfg, model, radii, vscale_atom, own_idx, amask, velocities,
              masses, pos0, cell0, dt, kT, p_ext, W, skin_half,
              beta_thresh, nsteps, nhc_Q, nhc_dof, nhc_vxi, nhc_xi,
              bch_Q, bch_dof, bch_vxi, bch_xi, vg, strain_mask, mean_e,
              rebuild_cut, sidx_atom, sidx_ok, tbl_cell, offmax)


@partial(
    jax.jit,
    static_argnames=("mesh", "params", "exponent", "pair_terms",
                     "check_beta", "kind", "committee", "rebuild"),
)
def sharded_fire_chunk(
    cfg: ConfigArrays,
    model: ModelArrays,
    radii,
    znum,
    vscale_atom,  # (N,) sharded over 'data'
    amask,  # (N, 1) global atom mask, replicated
    v,  # (N, 3) FIRE velocity, replicated
    pos0,  # (N, 3) table-build origin, replicated
    dt,
    a,
    n_uphill,
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
    own_idx,
    mesh,
    chem_z=None,
    mixL=None,
    params=None,
    exponent=4,
    pair_terms=(),
    check_beta=True,
    kind="dot",
    committee=False,  # model/vscale carry a leading expert axis
    mean_e=None,  # (E,) per-expert mean energies (committee)
    rebuild=False,  # in-loop per-shard neighbor rebuild at skin breaches
    rebuild_cut=None,
    sidx_atom=None,  # (N,) replicated
    sidx_ok=None,  # (N,) replicated
):
    """Device-resident FIRE relaxation over the ('data', 'model') mesh:
    the whole optimizer while-loop (opt/device_fire._fire_loop) runs
    inside one ``shard_map`` — structure relaxation scales out exactly
    like :func:`sharded_md_chunk` (forces globally reduced by
    differentiating through the psum; the replicated FIRE state steps
    identically everywhere; ``committee=True`` relaxes the weighted BCM
    committee surface).  ``rebuild=True`` handles skin breaches INSIDE
    the loop (:func:`_sharded_inloop`; the return then gains (tbl,
    pos0)); otherwise breaches exit the chunk for a host rebuild.
    Returns fire_chunk's tuple (pos, v, f, e, beta_max, fmax, dt, a,
    n_uphill, ndone[, tbl, pos0]), state outputs replicated."""
    from ..opt.device_fire import _fire_loop

    dtype = cfg.positions.dtype
    if mean_e is None:
        mean_e = jnp.zeros(1, dtype=dtype)
    if not rebuild:
        rebuild_cut = jnp.zeros((), dtype=dtype)
        sidx_atom = jnp.zeros(cfg.positions.shape[0], dtype=jnp.int32)
        sidx_ok = jnp.ones(cfg.positions.shape[0], dtype=bool)

    def block_fn(cfg_l, model_l, rad, vs_l, oidx, amask, v, pos0, dt, a,
                 n_uphill, skin_half, fmax_target, beta_thresh, nsteps,
                 maxstep, dtmax, nmin, finc, fdec, astart, fa, mean_e,
                 rebuild_cut, sidx_atom, sidx_ok):
        cfg_with, tbl0, rebuild_fn = _sharded_inloop(
            cfg_l, oidx, amask, rebuild, rebuild_cut, sidx_atom, sidx_ok
        )
        forces_fn = _sharded_forces_fn(
            cfg_l, model_l, rad, vs_l, oidx, amask, znum, params,
            exponent, pair_terms, chem_z, mixL, kind, check_beta,
            committee, mean_e, cfg_with=cfg_with,
        )
        if not rebuild:
            tbl0 = ()
        return _fire_loop(
            forces_fn, cfg_l.positions, amask, v, pos0, dt, a, n_uphill,
            skin_half, fmax_target, beta_thresh, nsteps, maxstep, dtmax,
            nmin, finc, fdec, astart, fa, check_beta,
            tbl0=tbl0, rebuild_fn=rebuild_fn,
        )

    rep = (P(),) * 21
    out_specs = (P(),) * 10
    if rebuild:
        out_specs = out_specs + (P("data"), P())
    fn = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(
            _cfg_spec(),
            _model_spec_committee(model) if committee else _model_spec(model),
            P(),
            P(None, "data") if committee else P("data"),
            P("data"),
        ) + rep,
        out_specs=out_specs,
    )
    return fn(cfg, model, radii, vscale_atom, own_idx, amask, v, pos0,
              dt, a, n_uphill, skin_half, fmax_target, beta_thresh,
              nsteps, maxstep, dtmax, nmin, finc, fdec, astart, fa,
              mean_e, rebuild_cut, sidx_atom, sidx_ok)


@partial(
    jax.jit,
    static_argnames=("mesh", "params", "exponent", "pair_terms",
                     "check_beta", "kind", "climb", "committee"),
)
def sharded_neb_chunk(
    cfgs,  # ConfigArrays, leading image axis R; atom tables over 'data'
    model: ModelArrays,
    radii,
    znum,
    vscale_atom,  # (N,) sharded over 'data', shared across images
    amask,  # (N, 1) global atom mask, replicated
    v,  # (R, N, 3) band FIRE velocity, replicated
    pos0,  # (R, N, 3) table-build origins, replicated
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
    own_idx,
    mesh,
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
    """Device-resident NEB over the ('data', 'model') mesh: the whole
    band while-loop (opt/device_neb._neb_loop) runs inside one
    ``shard_map``.  Each device evaluates EVERY image (a local vmapped
    axis) on ITS shard of atoms; per-image energies and forces come out
    globally reduced because the per-image energy ``psum`` is vmapped
    and differentiated through, so the replicated band state (positions,
    FIRE velocity, tangent/spring projection, climbing image) steps
    identically everywhere.  ``committee=True`` relaxes the band on the
    weighted BCM committee surface.  This is the reference's MPI-scaled
    saddle search (cl/neb.py over per-rank atoms, README.md:89-92) as
    SPMD.

    Trajectories match the single-device ``neb_chunk`` (equality-tested
    in tests/test_parallel.py).  Returns neb_chunk's tuple (pos, v,
    f_neb, e (R,), beta_max, fmax, dt, a, n_uphill, ndone), every
    output replicated."""
    from ..opt.device_neb import _neb_loop

    if mean_e is None:
        mean_e = jnp.zeros(1, dtype=cfgs.positions.dtype)

    def block_fn(cfgs_l, model_l, rad, vs_l, oidx, amask, v, pos0, dt, a,
                 n_uphill, skin_half, fmax_target, beta_thresh, nsteps,
                 k_spring, maxstep, dtmax, nmin, finc, fdec, astart, fa,
                 mean_e):
        def forces_one(pos, cfg_l):
            fn_ = _sharded_forces_fn(
                cfg_l, model_l, rad, vs_l, oidx, amask, znum, params,
                exponent, pair_terms, chem_z, mixL, kind, check_beta,
                committee, mean_e,
            )
            return fn_(pos)

        forces_v = jax.vmap(forces_one, in_axes=(0, 0))

        def forces_all(pos):
            e, f, beta = forces_v(pos, cfgs_l)
            bmax = (beta.max() if check_beta
                    else jnp.zeros((), pos.dtype))
            return e, f, bmax

        return _neb_loop(
            forces_all, cfgs_l.positions, amask, v, pos0, dt, a,
            n_uphill, skin_half, fmax_target, beta_thresh, nsteps,
            k_spring, maxstep, dtmax, nmin, finc, fdec, astart, fa,
            check_beta, climb,
        )

    rep = (P(),) * 19
    fn = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(
            _cfg_spec_images(),
            _model_spec_committee(model) if committee else _model_spec(model),
            P(),
            P(None, "data") if committee else P("data"),
            P("data"),
        ) + rep,
        out_specs=(P(),) * 10,
    )
    return fn(cfgs, model, radii, vscale_atom, own_idx, amask, v, pos0,
              dt, a, n_uphill, skin_half, fmax_target, beta_thresh,
              nsteps, k_spring, maxstep, dtmax, nmin, finc, fdec,
              astart, fa, mean_e)


@partial(
    jax.jit,
    static_argnames=("mesh", "params", "exponent", "pair_terms",
                     "check_beta", "kind", "committee", "rebuild"),
)
def sharded_fire_cell_chunk(
    cfg: ConfigArrays,
    model: ModelArrays,
    radii,
    znum,
    vscale_atom,  # (N,) sharded over 'data'
    amask,  # (N, 1) global atom mask, replicated
    v,  # (N, 3) FIRE velocity of the undeformed positions, replicated
    v_def,  # (3, 3) FIRE velocity of the scaled deformation rows
    deform,  # (3, 3) current deformation gradient
    cell0,  # (3, 3) reference cell (deform applies to it)
    pos0,  # (N, 3) REAL-coordinate table-build origin, replicated
    dt,
    a,
    n_uphill,
    skin_half,
    fmax_target,
    beta_thresh,
    nsteps,
    cell_factor,
    pressure,
    maxstep,
    dtmax,
    nmin,
    finc,
    fdec,
    astart,
    fa,
    own_idx,
    mesh,
    chem_z=None,
    mixL=None,
    params=None,
    exponent=4,
    pair_terms=(),
    check_beta=True,
    kind="dot",
    committee=False,  # model/vscale carry a leading expert axis
    mean_e=None,  # (E,) per-expert mean energies (committee)
    rebuild=False,  # in-loop per-shard neighbor rebuild (moving cell)
    rebuild_cut=None,
    sidx_atom=None,  # (N,) replicated
    sidx_ok=None,  # (N,) replicated
    tbl_cell=None,  # (3, 3) cell the incoming table was built with
    offmax=None,  # scalar max Sum|off| of the incoming table
):
    """Variable-cell FIRE over the ('data', 'model') mesh: the whole
    UnitCellFilter + FIRE while-loop (opt/device_fire._fire_cell_loop)
    runs inside one ``shard_map``.  The energy — single-model or the
    weighted BCM committee (``committee=True``) — is psum'd over both
    mesh axes INSIDE the function differentiated w.r.t. (positions,
    strain) jointly — the sharded_npt_chunk idiom — so the forces AND
    the stress tensor driving the three deformation rows come out
    globally reduced on every device.  Table validity under the moving
    cell uses the NPT chunk's displacement + image-drift metric against
    the TABLE-BUILD cell.  ``rebuild=True`` handles skin breaches
    INSIDE the loop (:func:`_sharded_inloop`, moving-cell variant; the
    return then gains (tbl, pos0, tbl_cell, offmax) for chaining);
    otherwise breaches exit the chunk for a host rebuild.  Returns
    fire_cell_chunk's tuple (pos_real, v, v_def, deform, f_und, e,
    beta_max, fmax, dt, a, n_uphill, ndone[, tbl, pos0, tbl_cell,
    offmax]), state outputs replicated."""
    from ..md.device_npt import offsum_max
    from ..opt.device_fire import _fire_cell_loop

    dtype = cfg.positions.dtype
    if mean_e is None:
        mean_e = jnp.zeros(1, dtype=dtype)
    if not rebuild:
        rebuild_cut = jnp.zeros((), dtype=dtype)
        sidx_atom = jnp.zeros(cfg.positions.shape[0], dtype=jnp.int32)
        sidx_ok = jnp.ones(cfg.positions.shape[0], dtype=bool)
    if tbl_cell is None:
        tbl_cell = cfg.cell  # host build (driver only replaces positions)
    if offmax is None:
        # global reduction over the sharded array, outside shard_map
        offmax = offsum_max(cfg.nbr_off, cfg.nbr_mask, dtype)

    def omax_pmax(off, msk, dt_):
        return jax.lax.pmax(offsum_max(off, msk, dt_), "data")

    def block_fn(cfg_l, model_l, rad, vs_l, oidx, amask, v, v_def,
                 deform, cell0, pos0, dt, a, n_uphill, skin_half,
                 fmax_target, beta_thresh, nsteps, cell_factor, pressure,
                 maxstep, dtmax, nmin, finc, fdec, astart, fa, mean_e,
                 rebuild_cut, sidx_atom, sidx_ok, tbl_cell, offmax):
        cfg_with, tbl0, rebuild_fn = _sharded_inloop(
            cfg_l, oidx, amask, rebuild, rebuild_cut, sidx_atom, sidx_ok
        )
        forces_fn = _sharded_forces_virial_fn(
            cfg_l, model_l, rad, vs_l, oidx, amask, znum, params,
            exponent, pair_terms, chem_z, mixL, kind, check_beta,
            committee, mean_e, aniso=True, cfg_with=cfg_with,
        )
        if not rebuild:
            tbl0 = ()
        return _fire_cell_loop(
            forces_fn, cfg_l.positions, amask, v, v_def, deform, cell0,
            pos0, tbl_cell, offmax, dt, a, n_uphill, skin_half,
            fmax_target, beta_thresh, nsteps, cell_factor, pressure,
            maxstep, dtmax, nmin, finc, fdec, astart, fa, check_beta,
            tbl0=tbl0, rebuild_fn=rebuild_fn, rebuild_cut=rebuild_cut,
            omax_of=omax_pmax,
        )

    rep = (P(),) * 28
    out_specs = (P(),) * 12
    if rebuild:
        out_specs = out_specs + (P("data"), P(), P(), P())
    fn = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(
            _cfg_spec(),
            _model_spec_committee(model) if committee else _model_spec(model),
            P(),
            P(None, "data") if committee else P("data"),
            P("data"),
        ) + rep,
        out_specs=out_specs,
    )
    return fn(cfg, model, radii, vscale_atom, own_idx, amask, v, v_def,
              deform, cell0, pos0, dt, a, n_uphill, skin_half,
              fmax_target, beta_thresh, nsteps, cell_factor, pressure,
              maxstep, dtmax, nmin, finc, fdec, astart, fa, mean_e,
              rebuild_cut, sidx_atom, sidx_ok, tbl_cell, offmax)
