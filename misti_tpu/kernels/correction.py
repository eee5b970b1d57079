"""Per-interval EPS ("lambda") correction as fixed-iteration device solvers.

Re-implements the semantics of the reference CorrectLambda class
(CorrectLambda.py:29-317) in a jit/vmap-compatible form:

* the per-interval 2-unknown nonlinear solve (`SolveLambdaSystem`,
  CorrectLambda.py:266-317) becomes a fixed-iteration Levenberg-Marquardt
  loop with branch-free accept/reject (`where`), keeping the reference's
  T -> 1 "stretch" preconditioning and the closed-form/no-migration branches
  as arithmetic selected by masks instead of Python control flow;
* expected-coalescence-time residuals use the inverse-free first-moment
  kernel (kernels/expm.py) instead of the reference's double matrix inverse
  (CorrectLambda.py:94-110);
* the 1-unknown post-split fit (`FitSinglePop`, CorrectLambda.py:88-92)
  becomes a deterministic bracket-expansion + bisection on the monotone
  expected-coalescence-time equation.

All functions are pure and operate on the current trace dtype (float64 under
x64 for reference parity, float32 on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..model.statespace import correction_matrix
from .expm import expm, expm_m1, expm_nc_moments

_PREC = 1e-10  # reference `prec`: no-migration threshold & solver tolerance
_NORM_EPS = 0.02  # reference `normEps`: near-identical-state merge threshold
_LM_ITERS = 100
_BISECT_ITERS = 60
_EXPAND_ITERS = 40


# -- stable "deviation" forms of the expected-coalescence-time kernels ------
#
# The ECT residuals (reference CorrectLambda.py:151-157, :237-251) compare
# conditional expected coalescence times that ALL approach T/2 as rates -> 0:
# the signal distinguishing rates is O(lam*T) riding on a T/2 baseline, and
# the reference's formulas reach it through catastrophically-cancelling
# differences (1/lam - T/expm1(lam*T) subtracts two ~1/lam-sized values; the
# coalescence probability is formed as 1 - pnc with pnc ~ 1).  In f64 the
# ~1e-16 noise is harmless; in f32 it swamps the signal (llh off by integer
# factors -- the round-4 ACCURACY.md finding).  Every function below computes
# the DEVIATION from the T/2 baseline directly -- Bernoulli/Taylor series
# with no constant term for small arguments, the raw formula (conditioning is
# fine there) for large -- so the residuals subtract only O(lam*T)-sized
# quantities and hold working-precision relative accuracy in f32.  All forms
# are algebraically identical to the reference's (same zeros, same values):
# f64 parity is unchanged.


def _ect_dev(x):
    """ECT(lam, T)/T - 1/2 as a function of x = lam*T (stretched units).

    ECT(lam, T) = 1/lam - T/expm1(lam*T) (reference ExpectedCoalTimeOnePop,
    CorrectLambda.py:67-77, incl. the lam > 100 tail guard).  Series
    1/x - 1/expm1(x) - 1/2 = -x/12 + x^3/720 - x^5/30240 + x^7/1209600
    - x^9/47900160 + O(x^11) (Bernoulli numbers); truncation < 6e-10 at the
    x = 1 switch point.
    """
    x2 = x * x
    ser = x * (
        -1.0 / 12.0
        + x2 * (1.0 / 720.0 + x2 * (-1.0 / 30240.0 + x2 * (
            1.0 / 1209600.0 + x2 * (-1.0 / 47900160.0))))
    )
    hot = x > 100.0
    tail = jnp.where(hot, 0.0, 1.0 / jnp.expm1(jnp.where(hot, 1.0, x)))
    direct = 1.0 / x - tail - 0.5
    return jnp.where(x < 1.0, ser, direct)


def _em1m(x):
    """1 - exp(-x), the per-state coalescence probability (stable expm1)."""
    return -jnp.expm1(-x)


def _ectnc_dev(x):
    """ECTnc(x) - (1 - e^-x)/2: the no-migration branch's numerator term
    with its T/2 baseline removed per unit coalescence probability.

    ECTnc(lam, T)/T = (1 - e^-x (1 + x))/x (reference :79-80, x = lam*T).
    Series sum_{m>=2} (-1)^(m+1) (m-1)/(2 (m+1)!) x^m through m = 12;
    truncation < 1e-10 relative at the x = 1 switch point.
    """
    ser = x * x * (
        -1.0 / 12.0
        + x * (1.0 / 24.0
        + x * (-1.0 / 80.0
        + x * (1.0 / 360.0
        + x * (-1.0 / 2016.0
        + x * (1.0 / 13440.0
        + x * (-1.0 / 103680.0
        + x * (1.0 / 907200.0
        + x * (-1.0 / 8870400.0
        + x * (1.0 / 95800320.0
        + x * (-11.0 / 12454041600.0)))))))))))
    xs = jnp.where(x < 1.0, 1.0, x)
    direct = (1.0 - jnp.exp(-xs) * (1.0 + xs)) / xs - 0.5 * _em1m(xs)
    return jnp.where(x < 1.0, ser, direct)


def _lm(res_fn, x0, lower=None, iters=_LM_ITERS, early_exit=False):
    """Fixed-iteration Levenberg-Marquardt for tiny residual systems.

    res_fn: R^n -> R^m, differentiated with jacfwd.  Branch-free accept /
    reject; optional lower bound enforced by clipping (the reference uses
    scipy trf bounds, whose solutions here are interior).

    ``early_exit=True`` uses a lax.while_loop (stops at convergence --
    lowest latency for single-problem CPU fits); ``False`` uses a masked
    fixed-length scan (cheapest to compile/batch under vmap on TPU, where
    XLA's batched-while transform is expensive).
    """
    n = x0.shape[-1]

    def clip(x):
        return x if lower is None else jnp.maximum(x, lower)

    def res_jac(x):
        """Residual + Jacobian in one primal pass (see correction_pallas
        `_lm2`: linearizing AT the trial point lets one evaluation serve as
        both the acceptance residual and the next iteration's Jacobian --
        one fewer expm-bearing primal per iteration than the classic loop,
        with an identical accept/reject trajectory)."""
        r, lin = jax.linearize(res_fn, x)
        J = jax.vmap(lin)(jnp.eye(n, dtype=x.dtype)).T
        return r, J

    def body(state):
        x, r, J, damp, trust, c, done = state
        jtj = J.T @ J
        g = J.T @ r
        a = jtj + damp * jnp.eye(n, dtype=x.dtype)
        delta = jnp.linalg.solve(a, -g)
        # trust-region step clipping: keeps the iterates in the basin the
        # reference's scipy trf solver explores from x0 (a raw Gauss-Newton
        # step can jump to a far-away nonphysical minimum).
        dn = jnp.linalg.norm(delta)
        delta = delta * jnp.minimum(1.0, trust / jnp.maximum(dn, 1e-300))
        xn = clip(x + delta)
        rn, Jn = res_jac(xn)
        cn = jnp.sum(rn * rn)
        ok = jnp.isfinite(cn) & (cn < c) & ~done
        step = jnp.where(ok, jnp.linalg.norm(xn - x), jnp.inf)
        x = jnp.where(ok, xn, x)
        r = jnp.where(ok, rn, r)
        J = jnp.where(ok, Jn, J)
        c = jnp.where(ok, cn, c)
        damp = jnp.where(
            done, damp, jnp.clip(jnp.where(ok, damp * 0.25, damp * 4.0),
                                 1e-14, 1e10)
        )
        trust = jnp.where(
            done, trust, jnp.clip(jnp.where(ok, trust * 2.0, trust * 0.5),
                                  1e-8, 1e3)
        )
        # converged: tiny cost or tiny accepted step
        done = done | (c < 1e-28) | (step < 1e-13 * (1.0 + jnp.linalg.norm(x)))
        return (x, r, J, damp, trust, c, done)

    x0 = clip(x0)
    trust0 = jnp.maximum(jnp.linalg.norm(x0), 1.0)
    r0, J0 = res_jac(x0)
    state = (x0, r0, J0, jnp.asarray(1e-3, x0.dtype), trust0,
             jnp.sum(r0 * r0), jnp.asarray(False))
    if early_exit:
        it_state = (jnp.asarray(0), state)
        x = jax.lax.while_loop(
            lambda s: (~s[1][-1]) & (s[0] < iters),
            lambda s: (s[0] + 1, body(s[1])),
            it_state,
        )[1][0]
    else:
        (x, _, _, _, _, _, _), _ = jax.lax.scan(
            lambda st, _: (body(st), None), state, None, length=iters,
            unroll=4,
        )
    return x


# ---------------------------------------------------------------------------
# residual systems (stretched units: T == 1)
# ---------------------------------------------------------------------------


def _residual_coal_time(l, mu, lh, p_norm):
    """LambdaSystem (CorrectLambda.py:151-157): match per-genome expected
    coalescence times of the 3-state migration CTMC to the PSMC one-pop
    values.  ``p_norm``: (2,3) per-genome normalised location probabilities.

    Stable form (algebraically identical to the reference's): both
    conditional means approach T/2 = 1/2 as rates -> 0, so the residual is
    formed as a difference of DEVIATIONS from 1/2.  The coalescence
    probability 1 - pnc equals the coal-rate-weighted occupancy integral
    l0 (N1 p)_0 + l1 (N1 p)_1 exactly (the generator's column sums are
    (-l0, -l1, 0)), a positive sum with no cancellation; the numerator's
    T/2 baseline is removed analytically via J = K - (T/2) N1
    (kernels/expm.py `expm_nc_moments`).
    """
    m = correction_matrix(l[0], l[1], mu[0], mu[1])
    n1, j = expm_nc_moments(m, 1.0)
    n1p = p_norm @ n1.T  # (2,3)
    jp = p_norm @ j.T
    denom = l[0] * n1p[:, 0] + l[1] * n1p[:, 1]  # == 1 - pnc
    num = l[0] * jp[:, 0] + l[1] * jp[:, 1]  # == l.Kp - denom/2
    return num / denom - _ect_dev(lh)


def _residual_cp(l, mu, lh, p_raw):
    """LambdaSystem1 (CorrectLambda.py:169-173): match per-genome
    no-coalescence probabilities.  ``p_raw``: (2,3) unnormalised.

    Stable deviation form (round 5, exact): both no-coalescence masses
    approach the total mass s as rates -> 0, so the raw difference
    1'E p - e^-x s cancels in f32.  Subtract s analytically:
    1'E p - s = 1'(E - I)p (cancellation-free via `expm_m1`) and
    e^-x s - s = -s em1m(x), giving  r = 1'(E-I)p + s em1m(x).
    """
    m = correction_matrix(l[0], l[1], mu[0], mu[1])
    phi = expm_m1(m, max_squarings=14, unroll=True)
    s = p_raw.sum(-1)
    return (p_raw @ phi.T).sum(-1) + s * _em1m(lh)


def _residual_nomig(l, lh, pr0):
    """LambdaSystemNoMigration (CorrectLambda.py:237-251), closed form.

    Stable deviation form: 1 - pnc = pr00 (1-e^-l0) + pr01 (1-e^-l1) via
    expm1 (the pr02 component never coalesces), and the numerator's T/2
    baseline is cancelled analytically inside `_ectnc_dev`.
    """
    d0, d1 = _em1m(l[0]), _em1m(l[1])
    q0, q1 = _ectnc_dev(l[0]), _ectnc_dev(l[1])
    denom = pr0[:, 0] * d0 + pr0[:, 1] * d1  # == 1 - pnc
    num = pr0[:, 0] * q0 + pr0[:, 1] * q1
    return num / denom - _ect_dev(lh)


def _nomig_closed_form(lh, T, p0):
    """SolveNoMigration1 (CorrectLambda.py:213-235): cpfit closed form.

    Returns (lc (2,), p_out (2,3)); lc == -1 marks failure (log of <= 0).

    Stable deviation form (round 5, exact): the reference solves the 2x2
    for y_i = exp(-lc_i T) ~ 1 and takes -log(y)/T, which loses the
    O(lam*T) signal in f32.  With x_i = exp(-lh_i T) - c_i rewritten as
    a_i + b_i - em1m(lh_i T) (rows are normalised), the solution satisfies

        y1 - 1 = (a2 em1 - a4 em0) / det,   y2 - 1 = (a3 em0 - a1 em1) / det,

    so lc = -log1p(y - 1)/T at full working precision; the propagation
    decay exp(-lc T) IS y (no round-trip through log/exp).
    """
    s0 = p0[0].sum()
    s1 = p0[1].sum()
    a1, a2 = p0[0, 0] / s0, p0[0, 1] / s0
    a3, a4 = p0[1, 0] / s1, p0[1, 1] / s1
    det = a1 * a4 - a2 * a3
    em0 = _em1m(lh[0] * T)
    em1 = _em1m(lh[1] * T)
    dy1 = (a2 * em1 - a4 * em0) / det
    dy2 = (a3 * em0 - a1 * em1) / det
    good = (dy1 > -1.0) & (dy2 > -1.0)
    lc0 = jnp.where(good, -jnp.log1p(jnp.where(good, dy1, 0.0)) / T, -1.0)
    lc1 = jnp.where(good, -jnp.log1p(jnp.where(good, dy2, 0.0)) / T, -1.0)
    lc = jnp.stack([lc0, lc1])
    decay = jnp.stack([1.0 + dy1, 1.0 + dy2, jnp.ones_like(lc0)])
    p_out = p0 * jnp.where(good, decay, 1.0)[None, :]
    return lc, p_out


def solve_lambda_system(lh, T, mu, p0, cpfit: bool, mixture_th: float = 0.0,
                        static_no_mig: bool = False, x0=None,
                        iters: int = _LM_ITERS, early_exit: bool = False):
    """Device analogue of CorrectLambda.SolveLambdaSystem.

    Args:
      lh: (2,) PSMC mixed coalescence rates for the interval.
      T: scalar interval length.
      mu: (2,) migration rates (may be traced optimiser parameters).
      p0: (2, 3) per-genome lineage-location probabilities entering the
        interval (unnormalised; rows are genomes).
      cpfit: static; match no-coalescence probabilities instead of expected
        coalescence times.
      mixture_th: static mixture threshold (reference SetMixtureTH).

    Returns (lc (2,), p_out (2,3)).  lc <= 0 signals correction failure,
    handled upstream by the validity mask (reference returns False and the
    likelihood becomes -inf, MigrationInference.py:346-348).
    """
    dtype = p0.dtype
    lh = jnp.asarray(lh, dtype)
    mu = jnp.asarray(mu, dtype)
    T_raw = jnp.asarray(T, dtype)
    # zero-length intervals (merged PSMC grids can carry duplicate time
    # points, e.g. --sdate landing exactly on an existing knot): the solve
    # is degenerate (the T -> 1 stretch divides by zero; the reference
    # CRASHES there, MigrationInference.py:305-354 has no pre-split guard).
    # Pin lc = 1 and propagate p0 unchanged -- the reference's own
    # post-split T == 0 rule (:357-359) and the fused grid kernel's padding
    # rule (kernels/correction_pallas.py `_solve_round`).
    T = jnp.where(T_raw == 0, jnp.ones_like(T_raw), T_raw)

    s = p0.sum(-1)  # (2,)
    p_norm = p0 / s[:, None]

    # near-identical-state merge (reference :278-290).  NB: the reference's
    # no-migration branches return *before* this merge and before the
    # stretch, so they see the raw lh.
    norm_v = jnp.sqrt(jnp.sum(p0 * p0, axis=-1))
    norm_d = jnp.sqrt(jnp.sum((p0[0] - p0[1]) ** 2))
    merge = norm_d < _NORM_EPS * jnp.minimum(norm_v[0], norm_v[1])
    lh_eff = jnp.where(merge, 0.5 * (lh[0] + lh[1]), lh)

    # stretched units: T -> 1 (reference :293-298); mathematically neutral
    # (residual zeros are invariant), used for conditioning as upstream does.
    mu_s = mu * T
    lh_s = lh_eff * T
    lh_raw_s = lh * T

    no_mig = (mu[0] + mu[1]) < _PREC
    # warm start (x0 in unstretched rate units): used by the Jacobi outer
    # iteration of the parallel correction sweep -- later outer rounds
    # start at the previous round's solution, so a short LM budget suffices
    start = lh_s if x0 is None else jnp.asarray(x0, dtype) * T
    start_raw = lh_raw_s if x0 is None else jnp.asarray(x0, dtype) * T

    if cpfit:
        lc_nm, p_nm = _nomig_closed_form(lh, T, p0)
    else:
        lower = 0.01 * jnp.minimum(lh_raw_s[0], lh_raw_s[1])
        lc_nm = _lm(lambda l: _residual_nomig(l, lh_raw_s, p_norm), start_raw,
                    lower=lower, iters=iters, early_exit=early_exit) / T
        decay = jnp.stack(
            [jnp.exp(-lc_nm[0] * T), jnp.exp(-lc_nm[1] * T), jnp.ones((), dtype)]
        )
        p_nm = p0 * decay[None, :]

    if static_no_mig:
        # the model is statically migration-free (no fixed bands, no
        # optimised migration parameters): skip the general LM entirely
        lc, p_out = lc_nm, p_nm
    else:
        if cpfit:
            # general branch: probability matching
            lc_gen = _lm(lambda l: _residual_cp(l, mu_s, lh_s, p0), start,
                         iters=iters, early_exit=early_exit) / T
        else:
            lc_gen = _lm(
                lambda l: _residual_coal_time(l, mu_s, lh_s, p_norm), start,
                iters=iters, early_exit=early_exit,
            ) / T
        # general-branch propagation: p' = expm(M(lc, mu) T) p (ref :313-317)
        m = correction_matrix(lc_gen[0], lc_gen[1], mu[0], mu[1])
        e = expm(m * T, max_squarings=20, unroll=True)
        p_gen = p0 @ e.T
        lc = jnp.where(no_mig, lc_nm, lc_gen)
        p_out = jnp.where(no_mig, p_nm, p_gen)

    # mixture early-out (reference :267-272): lc = -1 => upstream failure
    if mixture_th > 0.0:
        mixture = jnp.sqrt(jnp.sum((p_norm[0] - p_norm[1]) ** 2))
        bail = mixture < mixture_th
        lc = jnp.where(bail, jnp.full_like(lc, -1.0), lc)
        p_out = jnp.where(bail, p0, p_out)
    lc = jnp.where(T_raw == 0, jnp.ones_like(lc), lc)
    p_out = jnp.where(T_raw == 0, p0, p_out)
    return lc, p_out


def fit_single_pop(lh, T, weights):
    """FitSinglePop (CorrectLambda.py:88-92): post-split single-population fit.

    weights: (2,) unnormalised genome weights (the reference passes
    P0 = [[w0,0,0],[w1,0,0]]).  Solves ECT(lam) = Te for the weighted target
    Te by deterministic bracket expansion + bisection (ECT is monotone
    decreasing in lam), matching scipy least_squares to ~1e-12 relative.
    """
    dtype = jnp.result_type(T, 0.0)
    lh = jnp.asarray(lh, dtype)
    w = weights / weights.sum()

    # deviation form: ECT(lam, T) = T*(1/2 + _ect_dev(lam*T)), so the T/2
    # baselines and the common factor T cancel analytically -- same root,
    # same sign pattern, f32-stable (see _ect_dev).  The reference's tail
    # guard here is on the RAW rate (``lam > 100`` at CorrectLambda.py:68,
    # called with the UNSTRETCHED interval from MigrationInference.py:361),
    # not on lam*T: a rate above 100 drops the 1/expm1 tail even when
    # lam*T is small, giving ECT = 1/lam exactly.  Reproduce that for f64
    # endpoint parity (_ect_dev's own x > 100 branch agrees wherever the
    # exp would overflow, so the two guards differ only when lam > 100 on
    # a short interval).
    def dev(lam):
        x = lam * T
        return jnp.where(lam > 100.0, 1.0 / x - 0.5, _ect_dev(x))

    te_dev = w[0] * dev(lh[0]) + w[1] * dev(lh[1])
    x0 = w[0] * lh[0] + w[1] * lh[1]
    lower = 0.01 * jnp.minimum(lh[0], lh[1])

    def g(lam):
        return dev(lam) - te_dev  # decreasing in lam (within each branch)

    # expand upper bracket from x0 until g(hi) < 0
    def expand(carry, _):
        hi = carry
        need = g(hi) >= 0
        return jnp.where(need, hi * 2.0, hi), None

    hi0 = jnp.maximum(x0, lower * 2.0)
    hi, _ = jax.lax.scan(expand, hi0, None, length=_EXPAND_ITERS, unroll=8)
    lo = lower

    def bisect(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        gm = g(mid)
        lo = jnp.where(gm >= 0, mid, lo)
        hi = jnp.where(gm >= 0, hi, mid)
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(bisect, (lo, hi), None, length=_BISECT_ITERS,
                               unroll=8)
    return 0.5 * (lo + hi)


def coal_rates(lc, mu, T, p0):
    """CoalRates (CorrectLambda.py:112-122): true EPS -> PSMC-style mixed rates.

    Forward direction used by the TestModel flow (CoalescentRates).
    Returns (lh (2,), p_out (2,3)).
    """
    m = correction_matrix(lc[0], lc[1], mu[0], mu[1])
    e = expm(m * jnp.asarray(T, p0.dtype), max_squarings=20, unroll=True)
    p_out = p0 @ e.T
    nc = p_out.sum(-1) / p0.sum(-1)
    lh = -jnp.log(nc) / T
    return lh, p_out
