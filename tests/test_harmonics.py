"""Solid harmonics: scipy oracle, autodiff safety, z-axis regularity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import sph_harm_y

from autoforce_tpu.descriptor.harmonics import m_weights, solid_harmonics


def scipy_solid_harmonics(xyz, lmax):
    """r^l * Y_lm via scipy (complex, Condon-Shortley phase)."""
    x, y, z = xyz.T
    r = np.sqrt(x * x + y * y + z * z)
    theta = np.arccos(np.clip(z / r, -1, 1))
    phi = np.arctan2(y, x)
    out = {}
    for l in range(lmax + 1):
        for m in range(l + 1):
            out[(l, m)] = r**l * sph_harm_y(l, m, theta, phi)
    return out


@pytest.mark.parametrize("lmax", [0, 1, 2, 3, 4, 6])
def test_matches_scipy(lmax):
    rng = np.random.default_rng(7)
    xyz = rng.normal(size=(20, 3))
    Yr, Yi = solid_harmonics(jnp.asarray(xyz), lmax)
    ref = scipy_solid_harmonics(xyz, lmax)
    for l in range(lmax + 1):
        for m in range(l + 1):
            got = np.asarray(Yr[:, l, m] + 1j * Yi[:, l, m])
            np.testing.assert_allclose(got, ref[(l, m)], rtol=1e-10, atol=1e-12)


def test_zero_above_diagonal():
    xyz = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)))
    Yr, Yi = solid_harmonics(xyz, 3)
    for l in range(4):
        for m in range(l + 1, 4):
            assert np.all(np.asarray(Yr[:, l, m]) == 0)
            assert np.all(np.asarray(Yi[:, l, m]) == 0)


def test_gradients_on_z_axis():
    """The reference needs a tiny-rotation hack near the z-axis
    (ylm.py:10-23); the polynomial recursion must be exact there."""
    lmax = 4

    def f(v):
        Yr, Yi = solid_harmonics(v, lmax)
        return (Yr.sum() + Yi.sum())

    for v in [
        jnp.array([0.0, 0.0, 1.0]),
        jnp.array([0.0, 0.0, -2.0]),
        jnp.array([1e-12, 0.0, 1.0]),
        jnp.array([0.3, -0.2, 0.9]),
    ]:
        g = jax.grad(f)(v)
        assert np.all(np.isfinite(np.asarray(g)))
        # finite-difference check
        eps = 1e-6
        for k in range(3):
            e = jnp.zeros(3).at[k].set(eps)
            fd = (f(v + e) - f(v - e)) / (2 * eps)
            np.testing.assert_allclose(float(g[k]), float(fd), rtol=1e-5, atol=1e-7)


def test_addition_theorem():
    """sum_m w_m (Yr^2 + Yi^2) = (2l+1)/(4pi) * r^(2l)."""
    rng = np.random.default_rng(3)
    xyz = rng.normal(size=(10, 3))
    lmax = 4
    Yr, Yi = solid_harmonics(jnp.asarray(xyz), lmax)
    w = m_weights(lmax, dtype=jnp.float64)
    s = jnp.einsum("klm,lm->kl", Yr**2 + Yi**2, w)
    r2 = (xyz**2).sum(-1)
    for l in range(lmax + 1):
        expect = (2 * l + 1) / (4 * np.pi) * r2**l
        np.testing.assert_allclose(np.asarray(s[:, l]), expect, rtol=1e-10)
