"""Pallas SOAP kernels (interpret mode on CPU): forward parity with the
jnp implementation and handwritten-VJP parity with jax autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoforce_tpu.descriptor.pallas_soap import (
    sesoap_coefficients_pl,
    sesoap_descriptors_pl,
)
from autoforce_tpu.descriptor.soap import (
    SoapParams,
    sesoap_coefficients,
    sesoap_descriptors,
)

PARAMS = SoapParams(lmax=3, nmax=3, rc=4.0)


def make_batch(n=8, k=16, nspecies=2, seed=0):
    rng = np.random.default_rng(seed)
    rvec = rng.uniform(-1, 1, (n, k, 3)) * 2.2
    rvec += np.sign(rvec) * 0.4
    sidx = rng.integers(0, nspecies, (n, k))
    mask = rng.random((n, k)) < 0.8
    rvec[~mask] = 0.0  # padding convention
    radii = np.array([1.0, 1.2][:nspecies])
    return (jnp.asarray(rvec), jnp.asarray(sidx), jnp.asarray(mask),
            jnp.asarray(radii))


def test_forward_matches_jnp():
    rvec, sidx, mask, radii = make_batch()
    cr, ci = sesoap_coefficients_pl(rvec, sidx, mask, radii, PARAMS,
                                    interpret=True)
    cR, cI = sesoap_coefficients(rvec, sidx, mask, radii, PARAMS)
    n = rvec.shape[0]
    np.testing.assert_allclose(np.asarray(cr).reshape(cR.shape),
                               np.asarray(cR), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ci).reshape(cI.shape),
                               np.asarray(cI), atol=1e-10)


def test_descriptor_matches_jnp():
    rvec, sidx, mask, radii = make_batch(seed=1)
    p1 = sesoap_descriptors_pl(rvec, sidx, mask, radii, PARAMS, interpret=True)
    p2 = sesoap_descriptors(rvec, sidx, mask, radii, PARAMS)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-10)


def test_backward_matches_autodiff():
    rvec, sidx, mask, radii = make_batch(seed=2)
    v = jnp.asarray(
        np.random.default_rng(3).normal(size=PARAMS.dim(2))
    )

    def loss_pl(rv):
        p = sesoap_descriptors_pl(rv, sidx, mask, radii, PARAMS, interpret=True)
        return (p @ v).sum()

    def loss_jnp(rv):
        p = sesoap_descriptors(rv, sidx, mask, radii, PARAMS)
        return (p @ v).sum()

    g1 = jax.grad(loss_pl)(rvec)
    g2 = jax.grad(loss_jnp)(rvec)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-7, atol=1e-10)


def test_single_species():
    rvec, sidx, mask, radii = make_batch(nspecies=1, seed=4)
    params = SoapParams(lmax=2, nmax=2, rc=4.0)
    p1 = sesoap_descriptors_pl(rvec, sidx, mask, radii, params, interpret=True)
    p2 = sesoap_descriptors(rvec, sidx, mask, radii, params)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-10)
