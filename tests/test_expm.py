"""Tests for the fixed-structure expm and augmented integral kernels."""

import numpy as np
import scipy.linalg
import jax
import jax.numpy as jnp

from misti_tpu.kernels import expm as ke

rng = np.random.default_rng(7)


def test_expm_matches_scipy():
    for n in (3, 8, 44):
        for scale in (0.01, 1.0, 10.0, 200.0):
            a = rng.normal(size=(n, n)) * scale
            ours = np.asarray(ke.expm(jnp.asarray(a)))
            ref = scipy.linalg.expm(a)
            np.testing.assert_allclose(ours, ref, rtol=5e-9, atol=5e-9 * scale)


def test_expm_batched_vmap():
    a = rng.normal(size=(5, 8, 8))
    ours = np.asarray(jax.vmap(ke.expm)(jnp.asarray(a)))
    for i in range(5):
        np.testing.assert_allclose(ours[i], scipy.linalg.expm(a[i]), rtol=1e-8)


def test_expm_zero_matrix():
    np.testing.assert_allclose(np.asarray(ke.expm(jnp.zeros((4, 4)))), np.eye(4))


def test_integral_singular_generator():
    """Occupancy integral must work for singular M (the mu=0 stationary case)."""
    # conservative generator: columns sum to zero -> singular
    q = np.array([[-1.0, 2.0], [1.0, -2.0]])
    t = 0.7
    e, n1 = ke.expm_and_integral(jnp.asarray(q), t)
    # quadrature oracle
    ss = np.linspace(0, t, 20001)
    quad = np.trapezoid(np.stack([scipy.linalg.expm(q * s) for s in ss]), ss, axis=0)
    np.testing.assert_allclose(np.asarray(e), scipy.linalg.expm(q * t), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(n1), quad, rtol=1e-7)


def test_integral_matches_inverse_formula():
    """For invertible M: N1 == M^{-1}(E - I), K == first-moment quadrature."""
    for n in (3, 8):
        m = rng.normal(size=(n, n)) - 3 * np.eye(n)
        t = 0.31
        e, n1, k = ke.expm_integral_moment(jnp.asarray(m), t)
        eref = scipy.linalg.expm(m * t)
        n1ref = np.linalg.solve(m, eref - np.eye(n))
        np.testing.assert_allclose(np.asarray(e), eref, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(n1), n1ref, rtol=1e-8, atol=1e-12)
        ss = np.linspace(0, t, 20001)
        kref = np.trapezoid(
            np.stack([s * scipy.linalg.expm(m * s) for s in ss]), ss, axis=0
        )
        np.testing.assert_allclose(np.asarray(k), kref, rtol=1e-6, atol=1e-10)


def test_expm_differentiable():
    """The correction solver Gauss-Newton needs d(expm)/d(rates)."""

    def f(x):
        # leaky (sub-generator) matrix so the column sums -- and hence the
        # total mass -- genuinely depend on x
        m = jnp.array([[-2.0 * x, 0.3], [x, -0.9]])
        return ke.expm(m * 0.5).sum()

    g = jax.grad(f)(1.2)
    eps = 1e-6
    fd = (f(1.2 + eps) - f(1.2 - eps)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), fd, rtol=1e-5)
