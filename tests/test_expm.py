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


def test_expm_action_pair_matches_materialized():
    """The sub-stepping action kernel (E p0, N1 p0) vs materialised expm,
    over interval lengths spanning 1 to ~100 sub-steps."""
    from misti_tpu.kernels.expm import expm_action_pair, expm_and_integral
    from misti_tpu.model import statespace as ss

    b2 = ss.two_pop_basis()
    kmat = jnp.asarray(np.concatenate(
        [b2.coal[0].T, b2.coal[1].T, b2.migr[0].T, b2.migr[1].T], axis=1))
    norms = np.abs(np.stack(
        [b2.coal[0], b2.coal[1], b2.migr[0], b2.migr[1]])).sum(1).max(1)
    rng = np.random.default_rng(5)
    p0 = rng.random(44)
    p0 /= p0.sum()
    for t in (0.0, 1e-4, 0.02, 0.3, 2.0, 8.0):
        for rates in ([1.3, 0.8, 0.3, 0.05], [4.1, 9.5, 0.0, 0.0]):
            coeffs = jnp.asarray(rates, float)
            m = ss.two_pop_matrix(*rates, b2)
            e, n1 = expm_and_integral(jnp.asarray(m), jnp.asarray(t))
            p1_ref = np.asarray(e) @ p0
            n1p_ref = np.asarray(n1) @ p0
            p1, n1p = expm_action_pair(kmat, coeffs, norms, t, jnp.asarray(p0))
            np.testing.assert_allclose(np.asarray(p1), p1_ref,
                                       rtol=1e-11, atol=1e-13)
            np.testing.assert_allclose(np.asarray(n1p), n1p_ref,
                                       rtol=1e-11, atol=1e-13)
    # beyond the sub-step cap (norm > theta * max_substeps, far past any
    # physical demography) the action kernel poisons its outputs with NaN --
    # the likelihood's positivity mask turns this into llh = -inf instead of
    # letting one runaway Nelder-Mead lane stall the whole lockstep batch
    p1, n1p = expm_action_pair(kmat, jnp.asarray([1e4, 1e4, 0.0, 0.0]),
                               norms, 10.0, jnp.asarray(p0))
    assert np.all(np.isnan(np.asarray(p1)))
    assert np.all(np.isnan(np.asarray(n1p)))


def test_expm_action_pair_batched():
    """vmapped action kernel (the llh_batch layout) == per-lane results."""
    from misti_tpu.kernels.expm import expm_action_pair
    from misti_tpu.model import statespace as ss

    b1 = ss.one_pop_basis()
    kmat = jnp.asarray(b1.coal.T)
    norms = np.abs(b1.coal).sum(0).max(keepdims=True)
    rng = np.random.default_rng(9)
    p0 = rng.random((6, 8))
    lams = jnp.asarray(rng.uniform(0.2, 8.0, size=(6, 1)))
    run = jax.vmap(lambda c, p: expm_action_pair(kmat, c, norms, 0.7, p))
    p1b, n1b = run(lams, jnp.asarray(p0))
    for i in range(6):
        p1, n1p = expm_action_pair(kmat, lams[i], norms, 0.7,
                                   jnp.asarray(p0[i]))
        np.testing.assert_allclose(np.asarray(p1b)[i], np.asarray(p1),
                                   rtol=1e-12, atol=1e-15)
        np.testing.assert_allclose(np.asarray(n1b)[i], np.asarray(n1p),
                                   rtol=1e-12, atol=1e-15)


def test_nc_moments_match_moment_kernel():
    """expm_nc_moments's (N1, J) must equal (N1, K - (t/2) N1) from the
    augmented-matrix moment kernel in f64, including matrices large enough
    to exercise several interval doublings (the stable recurrences
    N1(2h) = 2N1 + Phi N1, J(2h) = 2J + Phi J + (h/2) Phi N1)."""
    for scale_f, t in ((0.02, 1.0), (1.0, 1.0), (7.0, 0.9), (40.0, 1.3)):
        m = (rng.normal(size=(3, 3)) - 2 * np.eye(3)) * scale_f
        e, n1_ref, k_ref = ke.expm_integral_moment(jnp.asarray(m), t)
        j_ref = np.asarray(k_ref) - 0.5 * t * np.asarray(n1_ref)
        n1, j = ke.expm_nc_moments(jnp.asarray(m), t)
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n1_ref),
                                   rtol=1e-10, atol=1e-13)
        np.testing.assert_allclose(np.asarray(j), j_ref, rtol=1e-8,
                                   atol=1e-13)


def test_nc_moments_batched():
    """Batched inputs with heterogeneous norms (per-element doubling counts)."""
    ms = np.stack([
        0.01 * (rng.normal(size=(3, 3)) - 2 * np.eye(3)),
        6.0 * (rng.normal(size=(3, 3)) - 2 * np.eye(3)),
    ])
    t = np.asarray([1.0, 1.0])
    n1, j = ke.expm_nc_moments(jnp.asarray(ms), jnp.asarray(t))
    for i in range(2):
        _, n1r, kr = ke.expm_integral_moment(jnp.asarray(ms[i]), 1.0)
        np.testing.assert_allclose(np.asarray(n1[i]), np.asarray(n1r),
                                   rtol=1e-10, atol=1e-13)
        np.testing.assert_allclose(
            np.asarray(j[i]), np.asarray(kr) - 0.5 * np.asarray(n1r),
            rtol=1e-8, atol=1e-13)


def test_expm_m1_matches_expm_minus_identity():
    """expm_m1 (stable E - I with Phi^2 + 2Phi doubling) == expm - I in
    f64, including matrices needing several doublings; and for TINY norms
    its entries carry full RELATIVE precision where the naive difference
    has none."""
    for scale_f in (1e-6, 0.3, 4.0, 60.0):
        m = (rng.normal(size=(3, 3)) - 2 * np.eye(3)) * scale_f
        phi = np.asarray(ke.expm_m1(jnp.asarray(m), unroll=True))
        ref = scipy.linalg.expm(m) - np.eye(3)
        np.testing.assert_allclose(phi, ref, rtol=1e-10, atol=1e-300 if scale_f < 1e-3 else 1e-13)
    # relative accuracy at tiny norm: Phi ~ m + m^2/2, naive subtraction
    # would leave ~1e-16/1e-12 = 1e-4 relative garbage
    m = (rng.normal(size=(3, 3)) - 2 * np.eye(3)) * 1e-12
    phi = np.asarray(ke.expm_m1(jnp.asarray(m), unroll=True))
    np.testing.assert_allclose(phi, m + (m @ m) / 2, rtol=1e-10)


def test_log_accurate_f32_near_correctly_rounded():
    """kernels/precise.py log_accurate: within ~4 ulp of the f64-exact log
    over the likelihood's input range, vs XLA:TPU's native f32 log which
    errs by hundreds of ulps (the round-5 llh-floor finding).  f64 inputs
    must defer to jnp.log bitwise."""
    from misti_tpu.kernels.precise import log_accurate

    x64 = np.concatenate([
        np.logspace(-6, 6, 4001),
        np.linspace(0.03, 0.3, 1000),  # the jafs range
    ])
    x = x64.astype(np.float32)
    got = np.asarray(jax.jit(log_accurate)(jnp.asarray(x)))
    ref = np.log(x.astype(np.float64))
    err_ulp = np.abs(got.astype(np.float64) - ref) / np.spacing(
        np.abs(ref).astype(np.float32)
    )
    assert err_ulp.max() < 4.0, err_ulp.max()
    # f64 passthrough is bitwise jnp.log
    v = jnp.asarray(x64)
    np.testing.assert_array_equal(np.asarray(log_accurate(v)),
                                  np.asarray(jnp.log(v)))


def test_log_accurate_subnormals_and_edges():
    """Subnormal inputs renormalise from the significand bits (a
    multiply-based rescale flushes to zero under the backends' DAZ/FTZ and
    returned a constant ~4-too-high log); 0/negative/inf/NaN match the
    backend's jnp.log exactly.  Regression: a sub-1.2e-38 category slipping
    through the likelihood's `cats > 0` guard must not inflate the llh."""
    from misti_tpu.kernels.precise import log_accurate

    f = jax.jit(log_accurate)
    sub = np.float32([1.4e-45, 9.8e-45, 1e-40, 1e-38])
    got = np.asarray(f(jnp.asarray(sub)))
    want = np.log(sub.astype(np.float64))
    assert np.abs((got - want) / want).max() < 1e-6
    edges = jnp.float32([0.0, -1.0, np.inf, np.nan, -1e-40])
    np.testing.assert_array_equal(np.asarray(f(edges)),
                                  np.asarray(jax.jit(jnp.log)(edges)))
