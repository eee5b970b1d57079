"""Parity tests: device correction solvers vs reference CorrectLambda oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import load_fixture
from misti_tpu.kernels import correction as kc


def _run_case(lh, T, mu, p0, cpfit):
    fn = jax.jit(kc.solve_lambda_system, static_argnames=("cpfit", "mixture_th"))
    lc, pout = fn(jnp.asarray(lh), float(T), jnp.asarray(mu), jnp.asarray(p0), cpfit)
    return np.asarray(lc), np.asarray(pout)


def _ref_cost(lh, T, mu, p0, cpfit, lc):
    """Least-squares cost of the reference residual system at solution lc.

    The reference's least_squares often stops at a NONZERO-residual minimum
    (the 2-equation system has no exact root); along the flat valley the
    parameters are only determined to ~1e-4, so the correct parity criterion
    is 'our cost <= reference cost (1 + eps)', with tight parameter parity
    reserved for exact-root cases.
    """
    import jax.numpy as jnp

    lc = jnp.asarray(lc)
    lh = jnp.asarray(lh)
    mu = jnp.asarray(mu)
    p0 = jnp.asarray(p0)
    pn = p0 / p0.sum(1, keepdims=True)
    if mu.sum() < 1e-10:
        if cpfit:
            return 0.0  # closed form, no cost
        r = kc._residual_nomig(lc * T, lh * T, pn)
    elif cpfit:
        r = kc._residual_cp(lc * T, mu * T, lh * T, p0)
    else:
        r = kc._residual_coal_time(lc * T, mu * T, lh * T, pn)
    c = float(jnp.sum(r * r))
    # solutions with astronomically large rates (the reference's trf
    # sometimes ends at lambda ~ 1e8 on degenerate systems) overflow the
    # unrolled squaring budget; such endpoints are outside the physically
    # representable range -- treat as +inf cost
    return c if np.isfinite(c) else float("inf")


def test_solve_lambda_system_matches_reference():
    """Parity policy:

    * exact-root systems (the generic case on realistic inputs, and all cpfit
      probability-matching systems): tight parameter + propagated-p parity;
    * unsatisfiable systems (nonzero-residual minima, arising for extreme
      random inputs): the endpoint along the flat valley -- and even its
      sign, which decides the reference's failure flag -- is solver noise,
      so we require our least-squares cost to match-or-beat the reference's
      and track success/failure agreement statistically.
    """
    fx = load_fixture("correction.npz")
    n = fx["lh"].shape[0]
    valley = 0
    sign_mismatch = 0
    for i in range(n):
        if not fx["ok"][i]:
            continue
        lh, T, mu, p0 = (fx["lh"][i], float(fx["T"][i, 0]), fx["mu"][i],
                         fx["p0"][i].reshape(2, 3))
        cpfit = bool(fx["cpfit"][i, 0])
        lc, pout = _run_case(lh, T, mu, p0, cpfit)
        ref_lc = fx["lc"][i]
        ref_p = fx["pout"][i].reshape(2, 3)
        ref_cost = _ref_cost(lh, T, mu, p0, cpfit, ref_lc)
        our_cost = _ref_cost(lh, T, mu, p0, cpfit, lc)
        if np.all(ref_lc > 0) and ref_cost < 1e-16 and our_cost < 1e-16:
            np.testing.assert_allclose(lc, ref_lc, rtol=1e-6, atol=1e-9,
                                       err_msg=f"case {i}")
            np.testing.assert_allclose(pout, ref_p, rtol=1e-5, atol=1e-9,
                                       err_msg=f"case {i}")
        else:
            valley += 1
            assert our_cost <= ref_cost * (1 + 2e-3) + 1e-14, (
                f"case {i}: cost {our_cost} vs ref {ref_cost}")
            if (np.all(ref_lc > 0)) != (np.all(np.asarray(lc) > 0)):
                sign_mismatch += 1
    # success/failure flags can flip on degenerate unsatisfiable systems;
    # they must agree on the (realistic) majority
    assert sign_mismatch <= valley // 2, (valley, sign_mismatch)


def test_fit_single_pop_matches_reference():
    fx = load_fixture("single_pop.npz")
    for i in range(fx["lh"].shape[0]):
        lam = kc.fit_single_pop(
            jnp.asarray(fx["lh"][i]), float(fx["T"][i, 0]), jnp.asarray(fx["w"][i])
        )
        np.testing.assert_allclose(
            float(lam), float(fx["lam"][i, 0]), rtol=2e-5, err_msg=f"case {i}"
        )


def test_fit_single_pop_raw_rate_tail_guard():
    """The reference's ExpectedCoalTimeOnePop tail guard is on the RAW
    rate (``lam > 100``, CorrectLambda.py:68) and FitSinglePop calls it
    with the UNSTRETCHED interval (MigrationInference.py:361-362): a rate
    above 100 on a short interval drops the 1/expm1 tail even though
    lam*T is small, giving ECT = 1/lam exactly.  fit_single_pop must
    reproduce that, not guard on lam*T (regression: round-5 deviation
    form).  Oracle evaluated inline from the reference's formulas; our
    bisection drives the residual to 0 where scipy's least_squares stops
    at its gtol, so compare residuals, not endpoints."""
    from scipy import optimize as sopt

    rng = np.random.default_rng(3)
    for _ in range(20):
        lh = rng.uniform(60.0, 300.0, 2)  # straddle the lam = 100 guard
        T = rng.uniform(0.002, 0.1)       # short interval: lam*T << 100
        w = rng.uniform(0.1, 1.0, 2)
        wn = w / w.sum()

        def ref_ect(lam):
            r = 0.0 if lam > 100.0 else T / (np.exp(lam * T) - 1.0)
            return 1.0 / lam - r

        te = wn[0] * ref_ect(lh[0]) + wn[1] * ref_ect(lh[1])
        ours = float(kc.fit_single_pop(jnp.asarray(lh), float(T),
                                       jnp.asarray(w)))
        # the guard makes the residual jump UP at lam = 100, so it can
        # have a genuine root on EACH side; scipy's basin choice across
        # the discontinuity is a solver artifact (cf. the ECT no-mig
        # stall, CLAUDE.md).  The parity requirement: ours is an exact
        # root of the REFERENCE residual, coinciding with one of its
        # true roots (the pre-fix lam*T guard produced values that were
        # not roots of the reference residual at all).
        f = lambda lam: ref_ect(lam) - te
        lo = 0.01 * lh.min()
        roots = []
        for a, b in ((lo, 100.0 - 1e-9), (100.0 + 1e-9, 1e5)):
            if f(a) * f(b) < 0:
                roots.append(sopt.brentq(f, a, b, xtol=1e-13, rtol=1e-14))
        assert roots, "oracle bracketing failed"
        assert min(abs(ours - r) / r for r in roots) < 5e-9, (lh, T, w,
                                                             ours, roots)
        assert abs(f(ours)) < 1e-11


def test_solver_is_vmappable():
    """vmapped batch solve must agree with per-case solves."""
    fx = load_fixture("correction.npz")
    sel = (fx["ok"][:, 0] > 0) & (fx["cpfit"][:, 0] == 0)
    lh = jnp.asarray(fx["lh"][sel])
    T = jnp.asarray(fx["T"][sel, 0])
    mu = jnp.asarray(fx["mu"][sel])
    p0 = jnp.asarray(fx["p0"][sel].reshape(-1, 2, 3))
    batched = jax.jit(
        jax.vmap(lambda a, b, c, d: kc.solve_lambda_system(a, b, c, d, False))
    )
    lc_b, p_b = batched(lh, T, mu, p0)
    for k in range(int(sel.sum())):
        lc_s, p_s = _run_case(
            np.asarray(lh[k]), float(T[k]), np.asarray(mu[k]), np.asarray(p0[k]),
            False,
        )
        # Different compiled programs (batched vs single) round differently;
        # on non-converging flat-valley cases a 1-ulp flip of an LM
        # accept/reject decision shifts the endpoint along the valley, so
        # parameters agree loosely while the least-squares cost agrees
        # tightly.
        np.testing.assert_allclose(np.asarray(lc_b[k]), lc_s, rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(p_b[k]), p_s, rtol=1e-4, atol=1e-7)
        cb = _ref_cost(np.asarray(lh[k]), float(T[k]), np.asarray(mu[k]),
                       np.asarray(p0[k]), False, np.asarray(lc_b[k]))
        cs = _ref_cost(np.asarray(lh[k]), float(T[k]), np.asarray(mu[k]),
                       np.asarray(p0[k]), False, lc_s)
        assert cb <= cs * (1 + 1e-6) + 1e-20 or abs(cb - cs) < 1e-12


def test_ect_deviation_series_match_direct_formulas():
    """The stable deviation kernels (round-5 ECT reformulation) must agree
    with the raw f64 formulas in the region where BOTH are accurate
    (moderate x), and be continuous across the series/direct switch at
    x = 1.  The raw formulas lose relative accuracy below x ~ 1e-2 even in
    f64 (that is the point of the series), so the comparison floor scales
    like eps/x."""
    import jax.numpy as jnp

    x = np.logspace(np.log10(0.05), 1.2, 200)
    dev = np.asarray(kc._ect_dev(jnp.asarray(x)))
    direct = 1.0 / x - 1.0 / np.expm1(x) - 0.5
    np.testing.assert_allclose(dev, direct, rtol=2e-8)  # series truncation ~6e-9 rel at the x = 1 switch, far below f32 eps
    # continuity at the switch
    lo, hi = np.asarray(kc._ect_dev(jnp.asarray([0.9999999, 1.0000001])))
    assert abs(lo - hi) < 5e-8

    # _ectnc_dev truncates at m = 12: < 1e-9 rel at the x = 1 switch
    q = np.asarray(kc._ectnc_dev(jnp.asarray(x)))
    qdir = (1.0 - np.exp(-x) * (1.0 + x)) / x - 0.5 * (-np.expm1(-x))
    np.testing.assert_allclose(q, qdir, rtol=2e-9)
    lo, hi = np.asarray(kc._ectnc_dev(jnp.asarray([0.9999999, 1.0000001])))
    assert abs(lo - hi) < 5e-8

    # the small-x regime follows the leading Bernoulli terms
    xs = np.logspace(-7, -3, 20)
    np.testing.assert_allclose(np.asarray(kc._ect_dev(jnp.asarray(xs))),
                               -xs / 12.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(kc._ectnc_dev(jnp.asarray(xs))),
                               -xs * xs / 12.0, rtol=1e-3)
