"""SOAP descriptor: invariances, gradients, species semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoforce_tpu.descriptor.soap import SoapParams, sesoap_descriptors


def random_env(rng, nnbr=10, nspecies=2, kpad=16, rc=4.0):
    rvec = rng.uniform(-1, 1, (kpad, 3)) * rc * 0.45
    rvec += np.sign(rvec) * 0.5  # keep away from origin
    sidx = rng.integers(0, nspecies, kpad)
    mask = np.zeros(kpad, bool)
    mask[:nnbr] = True
    return jnp.asarray(rvec), jnp.asarray(sidx), jnp.asarray(mask)


PARAMS = SoapParams(lmax=3, nmax=3, rc=4.0)
RADII = jnp.asarray([1.0, 1.2])


def test_norm_and_shape():
    rng = np.random.default_rng(0)
    rvec, sidx, mask = random_env(rng)
    p = sesoap_descriptors(rvec, sidx, mask, RADII, PARAMS)
    assert p.shape == (PARAMS.dim(2),)
    np.testing.assert_allclose(float(jnp.linalg.norm(p)), 1.0, rtol=1e-10)


def test_rotation_invariance():
    rng = np.random.default_rng(1)
    rvec, sidx, mask = random_env(rng)
    # random rotation via QR
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q *= np.sign(np.diag(r))
    p1 = sesoap_descriptors(rvec, sidx, mask, RADII, PARAMS)
    p2 = sesoap_descriptors(rvec @ jnp.asarray(q.T), sidx, mask, RADII, PARAMS)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-10)


def test_permutation_invariance():
    rng = np.random.default_rng(2)
    rvec, sidx, mask = random_env(rng, nnbr=16)  # all real
    perm = rng.permutation(16)
    p1 = sesoap_descriptors(rvec, sidx, mask, RADII, PARAMS)
    p2 = sesoap_descriptors(rvec[perm], sidx[perm], mask[perm], RADII, PARAMS)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-10)


def test_padding_irrelevance():
    """Masked entries must not affect the descriptor at all."""
    rng = np.random.default_rng(3)
    rvec, sidx, mask = random_env(rng, nnbr=7)
    p1 = sesoap_descriptors(rvec, sidx, mask, RADII, PARAMS)
    rvec2 = np.asarray(rvec).copy()
    rvec2[7:] = rng.normal(size=(9, 3)) * 0.1  # garbage inside cutoff
    p2 = sesoap_descriptors(jnp.asarray(rvec2), sidx, mask, RADII, PARAMS)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=0)


def test_species_orthogonality():
    """Environments made of disjoint species have orthogonal descriptors
    (reference sesoap.py test: non-overlapping)."""
    rng = np.random.default_rng(4)
    radii = jnp.asarray([1.0, 1.2, 0.9, 1.1])
    params = SoapParams(lmax=3, nmax=3, rc=4.0)
    rvec, _, mask = random_env(rng, nnbr=10, nspecies=2)
    s1 = jnp.asarray(rng.integers(0, 2, 16))
    s2 = s1 + 2
    p1 = sesoap_descriptors(rvec, s1, mask, radii, params)
    p2 = sesoap_descriptors(rvec, s2, mask, radii, params)
    assert abs(float(p1 @ p2)) < 1e-12


def test_fixed_table_extension_consistency():
    """Adding unused species to the table embeds the same descriptor
    (fixed-table == wildcard semantics)."""
    rng = np.random.default_rng(5)
    rvec, sidx, mask = random_env(rng, nnbr=9, nspecies=2)
    p_small = sesoap_descriptors(rvec, sidx, mask, RADII, PARAMS)
    radii3 = jnp.asarray([1.0, 1.2, 0.8])
    p_big = sesoap_descriptors(rvec, sidx, mask, radii3, PARAMS)
    # dot products (the only thing the kernel sees) must agree
    np.testing.assert_allclose(float(p_big @ p_big), float(p_small @ p_small), rtol=1e-12)
    # and the non-zero blocks coincide
    assert abs(float(jnp.linalg.norm(p_big)) - 1.0) < 1e-10


def test_gradients_match_finite_difference():
    rng = np.random.default_rng(6)
    rvec, sidx, mask = random_env(rng, nnbr=8)
    v = jnp.asarray(rng.normal(size=PARAMS.dim(2)))

    def f(rv):
        return sesoap_descriptors(rv, sidx, mask, RADII, PARAMS) @ v

    g = jax.grad(f)(rvec)
    eps = 1e-6
    for idx in [(0, 0), (3, 1), (7, 2)]:
        e = jnp.zeros_like(rvec).at[idx].set(eps)
        fd = (f(rvec + e) - f(rvec - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[idx]), float(fd), rtol=1e-6, atol=1e-9)


def test_cutoff_smoothness():
    """A neighbor crossing the cutoff contributes continuously (to zero)."""
    params = SoapParams(lmax=2, nmax=2, rc=3.0)
    radii = jnp.asarray([1.0])
    base = jnp.asarray([[1.0, 0.5, 0.3]])
    sidx = jnp.zeros((2,), int)
    mask = jnp.ones((2,), bool)
    ps = []
    for d in [2.999, 2.9999, 3.0001]:
        rv = jnp.concatenate([base, jnp.asarray([[0.0, 0.0, d]])])
        ps.append(np.asarray(sesoap_descriptors(rv, sidx, mask, radii, params)))
    far = sesoap_descriptors(
        jnp.concatenate([base, jnp.asarray([[0.0, 0.0, 10.0]])]), sidx, mask, radii, params
    )
    np.testing.assert_allclose(ps[2], np.asarray(far), atol=1e-12)
    assert np.linalg.norm(ps[1] - ps[2]) < 1e-4


def test_lone_atom_zero():
    params = SoapParams(lmax=2, nmax=2, rc=3.0)
    rvec = jnp.zeros((4, 3))
    sidx = jnp.zeros((4,), int)
    mask = jnp.zeros((4,), bool)
    p = sesoap_descriptors(rvec, sidx, mask, jnp.asarray([1.0]), params)
    assert float(jnp.abs(p).max()) == 0.0


def test_batched():
    rng = np.random.default_rng(8)
    envs = [random_env(rng) for _ in range(5)]
    rv = jnp.stack([e[0] for e in envs])
    si = jnp.stack([e[1] for e in envs])
    mk = jnp.stack([e[2] for e in envs])
    pb = sesoap_descriptors(rv, si, mk, RADII, PARAMS)
    assert pb.shape == (5, PARAMS.dim(2))
    for i, (a, b, c) in enumerate(envs):
        p = sesoap_descriptors(a, b, c, RADII, PARAMS)
        np.testing.assert_allclose(np.asarray(pb[i]), np.asarray(p), atol=1e-12)
