"""Fused pre-split correction sweep: one Pallas TPU kernel per likelihood.

The corrected likelihood spends >99% of its TPU time in the lambda-correction
sweep (reference ``CorrectLambdas``, MigrationInference.py:305-354): per
pre-split interval a 2-unknown nonlinear solve whose residuals are built from
3x3 matrix exponentials (CorrectLambda.py:266-317).  The XLA formulation
(engine/likelihood.py `correct_sweep`) already recasts the sequential chain
as a Jacobi fixed point with batched Levenberg-Marquardt inner solves, but on
TPU it is dispatch-bound: thousands of (B, 3, 3)-shaped HLO ops, each moving
a few KB, dominate wall-clock.

This module fuses the ENTIRE sweep -- chain propagation, all Jacobi outer
rounds and every LM iteration -- into a single Pallas kernel that runs on the
VPU with

  * lanes   = optimiser candidates (last dim, 128-wide blocks),
  * sublanes = pre-split time intervals (second-to-last dim),
  * all 3x3 matrix algebra unrolled into register-resident elementwise ops
    (a 3x3 matmul is 27 FMAs over (intervals, lanes) vectors),
  * the per-round chain (p0 propagated through earlier intervals) computed
    as a Hillis-Steele ordered product scan over the sublane axis
    (log2(s) shifted 3x3 matmuls instead of s sequential steps).

The same traced body also runs as plain XLA ops (``mode='xla'``) -- used on
CPU, for f64 validation against the reference-shaped solvers, and as a
fallback -- and under the Pallas interpreter (``interpret=True``) in tests.

Numerics follow kernels/correction.py `solve_lambda_system` exactly: the
T -> 1 stretch preconditioning, the near-identical-state merge, the
no-migration closed form (cpfit) / bounded LM (coal-time), the mixture
threshold bail-out, and the damped trust-region LM schedule are the same
arithmetic, so the fixed point matches the sequential reference sweep
(CorrectLambda.py:266-317) to solver tolerance.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

_PREC = 1e-10  # reference `prec` (CorrectLambda.py): no-migration threshold
_NORM_EPS = 0.02  # reference `normEps`: near-identical-state merge

# 3x3 matrices are flat row-major 9-tuples of (intervals, lanes) arrays.
_EYE = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)


def _m3_mul(a, b):
    """27-FMA elementwise 3x3 matmul over (intervals, lanes) entry arrays."""
    return tuple(
        a[3 * i + 0] * b[0 + j] + a[3 * i + 1] * b[3 + j] + a[3 * i + 2] * b[6 + j]
        for i in range(3)
        for j in range(3)
    )


def _m3_select(c, a, b):
    return tuple(jnp.where(c, x, y) for x, y in zip(a, b))


def _m3_onenorm(a):
    colsum = [abs(a[0 + j]) + abs(a[3 + j]) + abs(a[6 + j]) for j in range(3)]
    return jnp.maximum(jnp.maximum(colsum[0], colsum[1]), colsum[2])


def _corr_mat(l0, l1, m0, m1):
    """3x3 two-lineage location generator (reference CorrectLambda.py:55-56)."""
    z = jnp.zeros_like(l0)
    return (
        -2.0 * m0 - l0, z, m1,
        z, -2.0 * m1 - l1, m0,
        2.0 * m0, 2.0 * m1, -m0 - m1,
    )


def _scaling(a, max_squarings):
    """Per-lane squaring count + scaled matrix (same rule as kernels/expm.py).

    Lanes whose one-norm exceeds ``2^max_squarings`` are NaN-poisoned instead
    of silently clamped (mirroring the `expm_action_pair` cost guard,
    kernels/expm.py): a runaway trial rate would otherwise get an inaccurate
    Taylor-18 expm whose wrong-but-finite lc could pass the lc > 0 validity
    check.  The NaN flows through the final chain into p_after -> nc -> the
    spectrum, where the positivity mask turns the lane's llh into -inf."""
    norm = _m3_onenorm(a)
    s = jnp.maximum(0.0, jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-30))))
    s = jnp.where(jnp.isfinite(norm) & (norm > 0), s, 0.0)
    over = s > float(max_squarings)
    s = jnp.minimum(s, float(max_squarings))
    scale = jnp.where(over, jnp.nan, jnp.exp2(-s))
    return tuple(x * scale for x in a), s, scale


def _ps_powers(b):
    """Paterson-Stockmeyer powers I, b, ..., b^6."""
    p = [_EYE_like(b[0]), b]
    for _ in range(5):
        p.append(_m3_mul(p[-1], b))
    return p


def _EYE_like(x):
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    return (one, zero, zero, zero, one, zero, zero, zero, one)


def _ps_horner(p, coeffs):
    """sum_k coeffs[k] * b^k (k <= 18) in base b^6: 2 extra matmuls."""

    def blk(k0):
        out = tuple(coeffs[k0] * e for e in p[0])
        for j in range(1, 6):
            if k0 + j < len(coeffs):
                out = tuple(o + coeffs[k0 + j] * e for o, e in zip(out, p[j]))
        return out

    b2 = blk(12)
    if len(coeffs) > 18:
        b2 = tuple(o + coeffs[18] * e for o, e in zip(b2, p[6]))
    inner = tuple(x + y for x, y in zip(blk(6), _m3_mul(p[6], b2)))
    return tuple(x + y for x, y in zip(blk(0), _m3_mul(p[6], inner)))


_CE = [1.0 / math.factorial(k) for k in range(19)]
_C1 = [1.0 / math.factorial(k + 1) for k in range(19)]
_CPHI = [0.0] + _CE[1:]  # E - I series (no constant term)
_CJ = [0.0] + [k / (2.0 * math.factorial(k + 2)) for k in range(1, 19)]


def _expm3(a, max_squarings=14, unroll=True):
    """Elementwise scaling-and-squaring Taylor-18 expm of a 3x3 entry-tuple.

    ``unroll=True`` emits the squaring steps inline (fastest through Mosaic:
    loop machinery costs more than the masked matmuls for 3x3 work).
    ``unroll=False`` rolls them into a ``fori_loop`` -- required for the
    plain-XLA CPU validation modes, where unrolling the steps inside the
    jvp-differentiated LM bodies makes XLA:CPU compilation intractable.
    """
    b, s, _ = _scaling(a, max_squarings)
    e = _ps_horner(_ps_powers(b), _CE)
    if unroll:
        for i in range(max_squarings):
            e = _m3_select(float(i) < s, _m3_mul(e, e), e)
        return e

    def body(i, e):
        return _m3_select(i.astype(s.dtype) < s, _m3_mul(e, e), e)

    return jax.lax.fori_loop(0, max_squarings, body, e, unroll=False)


def _expm3_m1(a, max_squarings=14, unroll=True):
    """Phi = e^a - I, cancellation-free (kernels/expm.py `expm_m1`): the
    series has no identity term and doubling is Phi(2h) = Phi^2 + 2 Phi.
    Used by the cpfit residual's deviation form (`res_general`)."""
    b, s, _ = _scaling(a, max_squarings)
    phi = _ps_horner(_ps_powers(b), _CPHI)

    def step(live, phi):
        sq = tuple(pp + 2.0 * ph for pp, ph in zip(_m3_mul(phi, phi), phi))
        return _m3_select(live, sq, phi)

    if unroll:
        for i in range(max_squarings):
            phi = step(float(i) < s, phi)
        return phi

    def body(i, phi):
        return step(i.astype(s.dtype) < s, phi)

    return jax.lax.fori_loop(0, max_squarings, body, phi, unroll=False)


def _expm3_nc_moments(a, max_squarings=14, unroll=True):
    """(N1, J) of the stretched (t=1) generator: N1 = int_0^1 e^{as} ds and
    the CENTERED first moment J = int_0^1 (s - 1/2) e^{as} ds.

    Same construction as kernels/expm.py `expm_nc_moments` (see its docstring
    for the derivation), elementwise on 3x3 entry-tuples: the expected-
    coalescence-time residual (CorrectLambda.py:94-110, :151-157) is formed
    from DEVIATIONS of both conditional means from their shared T/2 baseline,
    so J's Taylor series has no constant term and every quantity holds
    working-precision RELATIVE accuracy in f32 -- the raw (E, K, 1 - pnc)
    formulation loses the O(lam*T) signal to cancellation (ACCURACY.md).
    Doubling carries Phi = E - I (Phi(2h) = Phi^2 + 2 Phi, cancellation-free)
    with N1(2h) = 2 N1 + Phi N1 and J(2h) = 2 J + Phi J + (h/2) Phi N1.
    """
    b, s, scale = _scaling(a, max_squarings)
    p = _ps_powers(b)
    phi1 = _ps_horner(p, _C1)
    phim = _ps_horner(p, _CPHI)  # E - I: no identity term
    h = scale  # current accumulated interval length (starts at 2^-s, ends at 1)
    n1 = tuple(h * x for x in phi1)
    j = tuple(h * h * x for x in _ps_horner(p, _CJ))

    def step(live, phim, n1, j, h):
        tmp = _m3_mul(phim, n1)
        jn = tuple(
            2.0 * jj + pj + 0.5 * h * tm
            for jj, pj, tm in zip(j, _m3_mul(phim, j), tmp)
        )
        n1n = tuple(2.0 * nn + tm for nn, tm in zip(n1, tmp))
        phin = tuple(pp + 2.0 * ph for pp, ph in zip(_m3_mul(phim, phim), phim))
        j = _m3_select(live, jn, j)
        n1 = _m3_select(live, n1n, n1)
        phim = _m3_select(live, phin, phim)
        h = jnp.where(live, 2.0 * h, h)
        return phim, n1, j, h

    if unroll:
        for i in range(max_squarings):
            phim, n1, j, h = step(float(i) < s, phim, n1, j, h)
        return n1, j

    def body(i, st):
        phim, n1, j, h = st
        return step(i.astype(s.dtype) < s, phim, n1, j, h)

    _, n1, j, _ = jax.lax.fori_loop(
        0, max_squarings, body, (phim, n1, j, h), unroll=False
    )
    return n1, j


def _pulse_cols(q0, q1, q2, rate, pop):
    """Pulse-migration map on a location-distribution column (q_p, q_q, q_split)
    (MigrationInference.py:315-323; identity at rate == 0)."""
    if pop == 0:
        qp, qq = q0, q1
    else:
        qp, qq = q1, q0
    np_ = qp * (1.0 - rate) ** 2
    nq = qp * rate**2 + qq + q2 * rate
    n2 = qp * 2.0 * (1.0 - rate) * rate + q2 * (1.0 - rate)
    return (np_, nq, n2) if pop == 0 else (nq, np_, n2)


def _expm1(x):
    """exp(x) - 1 without jnp.expm1: Mosaic has no expm1 lowering
    (NotImplementedError in Pallas TPU lowering), and the naive
    exp(x) - 1 loses the leading digits exactly where this kernel lives
    (stretched rates lam ~ 1e-3..1e-1).  7-term Horner series below 0.5
    (rel err < 3e-7 at the switch point, far below the f32 working
    precision and the LM tolerance), exp(x) - 1 above."""
    small = x < 0.5
    xs = jnp.where(small, x, 0.0)
    ser = xs * (1.0 + xs / 2 * (1.0 + xs / 3 * (1.0 + xs / 4 * (
        1.0 + xs / 5 * (1.0 + xs / 6 * (1.0 + xs / 7))))))
    return jnp.where(small, ser, jnp.exp(x) - 1.0)


def _em1m(x):
    """1 - exp(-x): per-state coalescence probability.  Series below 0.5
    (no expm1 in Mosaic; the naive 1 - exp(-x) loses leading digits exactly
    at the small stretched rates this kernel lives at); direct above, where
    conditioning is fine and the series would not converge in 7 terms."""
    small = x < 0.5
    xs = jnp.where(small, x, 0.0)
    ser = xs * (1.0 - xs / 2 * (1.0 - xs / 3 * (1.0 - xs / 4 * (
        1.0 - xs / 5 * (1.0 - xs / 6 * (1.0 - xs / 7))))))
    return jnp.where(small, ser, 1.0 - jnp.exp(-x))


def _log1p(x):
    """log(1 + x) at working precision without a Mosaic log1p lowering:
    the classic w = 1 + x compensation -- x * log(w)/(w - 1) recovers the
    digits the rounding of w discarded (exact when w rounds to 1)."""
    w = 1.0 + x
    d = w - 1.0
    exact = d == 0.0
    safe_w = jnp.where(exact, 2.0, w)
    safe_d = jnp.where(exact, 1.0, d)
    return jnp.where(exact, x, x * jnp.log(safe_w) / safe_d)


def _ect_dev(x):
    """ECT(lam, T)/T - 1/2 at x = lam*T (kernels/correction.py `_ect_dev`:
    the f32-stable deviation form of CorrectLambda.py:67-77, Bernoulli
    series below 1, direct formula with the lam > 100 tail guard above)."""
    x2 = x * x
    ser = x * (
        -1.0 / 12.0
        + x2 * (1.0 / 720.0 + x2 * (-1.0 / 30240.0 + x2 * (
            1.0 / 1209600.0 + x2 * (-1.0 / 47900160.0))))
    )
    hot = x > 100.0
    tail = jnp.where(hot, 0.0, 1.0 / _expm1(jnp.where(hot, 1.0, x)))
    direct = 1.0 / x - tail - 0.5
    return jnp.where(x < 1.0, ser, direct)


def _ectnc_dev(x):
    """ECTnc(x) - (1 - e^-x)/2 (kernels/correction.py `_ectnc_dev`): the
    no-migration numerator term with its T/2 baseline removed."""
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


def _lm2(res_fn, x0, x1, n_iters, lower0, lower1):
    """Fixed-iteration 2-unknown Levenberg-Marquardt on (intervals, lanes)
    arrays; identical schedule to kernels/correction.py `_lm` (damp 1e-3 start,
    x0.25/x4 update, trust-region step clip, masked accept/convergence)."""

    def clip(a0, a1):
        return jnp.maximum(a0, lower0), jnp.maximum(a1, lower1)

    def lin_at(a0, a1):
        """Residual + 2x2 Jacobian in ONE primal pass: jax.linearize shares
        the expm-bearing primal between the residual and both tangent
        columns (two jax.jvp calls would re-run the primal)."""
        one = jnp.ones_like(a0)
        zero = jnp.zeros_like(a0)
        (r0, r1), lin = jax.linearize(res_fn, a0, a1)
        j00, j10 = lin(one, zero)
        j01, j11 = lin(zero, one)
        return r0, r1, j00, j10, j01, j11

    def body(i, st):
        # NB: `done` is carried as an f32 0/1 mask, not bool -- Mosaic fails
        # to legalize scf.for loops whose carried state mixes i1 vectors with
        # padded-layout f32 vectors (round-1 bench crash: "failed to legalize
        # operation 'scf.for'").  All-f32 carries lower cleanly.
        #
        # The carried (r, J) were computed AT x when x was last accepted, so
        # each iteration needs only ONE linearize -- at the trial point --
        # serving as both the acceptance check and, when accepted, the next
        # iteration's linearization (25% fewer expm passes than the classic
        # "linearize at x, then evaluate cost at trial" loop, with an
        # IDENTICAL accept/reject trajectory).
        x0_, x1_, r0, r1, j00, j10, j01, j11, damp, trust, c, done = st
        doneb = done > 0.5
        a00 = j00 * j00 + j10 * j10 + damp
        a01 = j00 * j01 + j10 * j11
        a11 = j01 * j01 + j11 * j11 + damp
        g0 = j00 * r0 + j10 * r1
        g1 = j01 * r0 + j11 * r1
        det = a00 * a11 - a01 * a01
        det = jnp.where(det == 0, 1.0, det)
        d0 = (a01 * g1 - a11 * g0) / det
        d1 = (a01 * g0 - a00 * g1) / det
        dn = jnp.sqrt(d0 * d0 + d1 * d1)
        shrink = jnp.minimum(1.0, trust / jnp.maximum(dn, 1e-30))
        d0 = d0 * shrink
        d1 = d1 * shrink
        xn0, xn1 = clip(x0_ + d0, x1_ + d1)
        rn0, rn1, jn00, jn10, jn01, jn11 = lin_at(xn0, xn1)
        cn = rn0 * rn0 + rn1 * rn1
        ok = jnp.isfinite(cn) & (cn < c) & ~doneb
        step = jnp.where(
            ok, jnp.sqrt((xn0 - x0_) ** 2 + (xn1 - x1_) ** 2), jnp.inf
        )
        sel = lambda a, b: jnp.where(ok, a, b)
        x0_ = sel(xn0, x0_)
        x1_ = sel(xn1, x1_)
        r0, r1 = sel(rn0, r0), sel(rn1, r1)
        j00, j10 = sel(jn00, j00), sel(jn10, j10)
        j01, j11 = sel(jn01, j01), sel(jn11, j11)
        c = sel(cn, c)
        damp = jnp.where(
            doneb, damp,
            jnp.clip(jnp.where(ok, damp * 0.25, damp * 4.0), 1e-14, 1e10),
        )
        trust = jnp.where(
            doneb, trust,
            jnp.clip(jnp.where(ok, trust * 2.0, trust * 0.5), 1e-8, 1e3),
        )
        doneb = doneb | (c < 1e-28) | (
            step < 1e-13 * (1.0 + jnp.sqrt(x0_ * x0_ + x1_ * x1_))
        )
        done = jnp.where(doneb, 1.0, 0.0).astype(x0_.dtype)
        return (x0_, x1_, r0, r1, j00, j10, j01, j11, damp, trust, c, done)

    x0, x1 = clip(x0, x1)
    trust0 = jnp.maximum(jnp.sqrt(x0 * x0 + x1 * x1), 1.0)
    r0, r1, j00, j10, j01, j11 = lin_at(x0, x1)
    st = (
        x0, x1, r0, r1, j00, j10, j01, j11,
        jnp.full_like(x0, 1e-3),
        trust0,
        r0 * r0 + r1 * r1,
        jnp.zeros_like(x0),
    )
    st = jax.lax.fori_loop(0, n_iters, body, st)
    return st[0], st[1]


def _sweep_body(
    T, lh0, lh1, mi0, mi1, pu0, pu1,
    *,
    cpfit: bool,
    mixture_th: float,
    static_no_mig: bool,
    has_pulse: bool,
    rounds: int,
    iters0: int,
    iters_warm: int,
    unroll: bool,
    shift_fn,
    n_rows: int,
    max_squarings: int = 10,
):
    """The fused sweep on (intervals, lanes) arrays.

    Pure jnp: traced identically under XLA (CPU / fallback), the Pallas
    interpreter, and Mosaic.  Returns (lc0, lc1, p_after 6-tuple) where
    p_after[t] is the per-genome location distribution after interval t
    (reference ``p0`` after `SolveLambdaSystem` propagation).
    """
    dtype = T.dtype
    mu0s = mi0 * T
    mu1s = mi1 * T
    lh_raw_s0 = lh0 * T
    lh_raw_s1 = lh1 * T
    no_mig = (mi0 + mi1) < _PREC

    # Hillis-Steele ordered product over the interval (sublane) axis:
    # C_t = G_t @ ... @ G_0 after ceil(log2(s)) shifted matmul steps.
    def _chain_products(g):
        c = g
        d = 1
        while d < n_rows:
            shifted = shift_fn(c, d, _EYE)
            c = _m3_mul(c, shifted)
            d *= 2
        return c

    def _chain(x0s, x1s):
        """p entering each solve + p after each interval, for STRETCHED rate
        guesses (x0s, x1s) (engine/likelihood.py `_chain` semantics: the
        propagator expm(M(lc, mu) T) == expm(M(lc*T, mu*T)) by linearity of
        the generator in its rates)."""
        # cap 10: the T -> 1 stretch keeps ||M||_1 = O(rates * T) small
        # (typically < 8); 10 squarings cover norm <= 1024 at Taylor-18
        # accuracy, and each masked squaring step is real VPU work
        e = _expm3(_corr_mat(x0s, x1s, mu0s, mu1s),
                   max_squarings=max_squarings, unroll=unroll)
        if has_pulse:
            # pulses act on the state BEFORE the exponential (column
            # convention q_out = E PU1 PU0 q_in): materialise P = PU1 @ PU0
            # by pushing the canonical basis through the pulse maps.
            p_cols = []
            for j in range(3):
                basis = [jnp.full_like(x0s, 1.0 if i == j else 0.0) for i in range(3)]
                q = _pulse_cols(basis[0], basis[1], basis[2], pu0, 0)
                q = _pulse_cols(q[0], q[1], q[2], pu1, 1)
                p_cols.append(q)
            pmat = tuple(p_cols[j][i] for i in range(3) for j in range(3))
            g = _m3_mul(e, pmat)
        else:
            g = e
        c = _chain_products(g)
        s_excl = shift_fn(c, 1, _EYE)  # C_{t-1}, identity at t == 0
        # p entering the solve: pulses applied to the interval-entry state
        def col(m, j):
            return (m[0 + j], m[3 + j], m[6 + j])

        if has_pulse:
            p_in = []
            for gidx in range(2):
                q = col(s_excl, gidx)
                q = _pulse_cols(q[0], q[1], q[2], pu0, 0)
                q = _pulse_cols(q[0], q[1], q[2], pu1, 1)
                p_in.append(q)
        else:
            p_in = [col(s_excl, 0), col(s_excl, 1)]
        p_after = (col(c, 0), col(c, 1))
        return p_in, p_after

    def _solve_round(p_in, x0_init, x1_init, n_iters):
        """One batched LM round from warm start (stretched units), per-lane
        branch selection exactly as kernels/correction.py solve_lambda_system."""
        p00, p01, p02 = p_in[0]
        p10, p11, p12 = p_in[1]
        s0 = p00 + p01 + p02
        s1 = p10 + p11 + p12
        pn00, pn01, pn02 = p00 / s0, p01 / s0, p02 / s0
        pn10, pn11, pn12 = p10 / s1, p11 / s1, p12 / s1
        nv0 = jnp.sqrt(p00 * p00 + p01 * p01 + p02 * p02)
        nv1 = jnp.sqrt(p10 * p10 + p11 * p11 + p12 * p12)
        nd = jnp.sqrt((p00 - p10) ** 2 + (p01 - p11) ** 2 + (p02 - p12) ** 2)
        merge = nd < _NORM_EPS * jnp.minimum(nv0, nv1)
        lh_mid = 0.5 * (lh0 + lh1) * T
        lh_s0 = jnp.where(merge, lh_mid, lh_raw_s0)
        lh_s1 = jnp.where(merge, lh_mid, lh_raw_s1)

        neg_inf = jnp.asarray(-jnp.inf, dtype)

        def res_general(a0, a1):
            if cpfit:
                # stable deviation form (kernels/correction.py
                # `_residual_cp`): both no-coal masses approach the total
                # mass s as rates -> 0; subtract it analytically via
                # Phi = E - I column sums and s*em1m(x)
                phi = _expm3_m1(_corr_mat(a0, a1, mu0s, mu1s),
                                max_squarings=max_squarings, unroll=unroll)
                cs = [phi[0 + j] + phi[3 + j] + phi[6 + j] for j in range(3)]
                r0 = cs[0] * p00 + cs[1] * p01 + cs[2] * p02 + s0 * _em1m(lh_s0)
                r1 = cs[0] * p10 + cs[1] * p11 + cs[2] * p12 + s1 * _em1m(lh_s1)
                return r0, r1
            # f32-stable deviation form (kernels/correction.py
            # `_residual_coal_time`): 1 - pnc == a0 (N1 p)_0 + a1 (N1 p)_1
            # exactly (generator column sums are (-a0, -a1, 0)), and the
            # numerator's T/2 baseline is removed analytically via
            # J = K - N1/2 -- no ~1-sized quantities are ever subtracted.
            n1, jm = _expm3_nc_moments(_corr_mat(a0, a1, mu0s, mu1s),
                                       max_squarings=max_squarings,
                                       unroll=unroll)
            n1p00 = n1[0] * pn00 + n1[1] * pn01 + n1[2] * pn02
            n1p01 = n1[3] * pn00 + n1[4] * pn01 + n1[5] * pn02
            n1p10 = n1[0] * pn10 + n1[1] * pn11 + n1[2] * pn12
            n1p11 = n1[3] * pn10 + n1[4] * pn11 + n1[5] * pn12
            jp00 = jm[0] * pn00 + jm[1] * pn01 + jm[2] * pn02
            jp01 = jm[3] * pn00 + jm[4] * pn01 + jm[5] * pn02
            jp10 = jm[0] * pn10 + jm[1] * pn11 + jm[2] * pn12
            jp11 = jm[3] * pn10 + jm[4] * pn11 + jm[5] * pn12
            den0 = a0 * n1p00 + a1 * n1p01  # == 1 - pnc0
            den1 = a0 * n1p10 + a1 * n1p11
            t2_0 = (a0 * jp00 + a1 * jp01) / den0  # conditional mean - 1/2
            t2_1 = (a0 * jp10 + a1 * jp11) / den1
            return t2_0 - _ect_dev(lh_s0), t2_1 - _ect_dev(lh_s1)

        def res_nomig(a0, a1):
            # stable deviation form (kernels/correction.py `_residual_nomig`)
            d0 = _em1m(a0)
            d1 = _em1m(a1)
            q0 = _ectnc_dev(a0)
            q1 = _ectnc_dev(a1)
            den0 = pn00 * d0 + pn01 * d1  # == 1 - pnc0
            den1 = pn10 * d0 + pn11 * d1
            ct0 = (pn00 * q0 + pn01 * q1) / den0
            ct1 = (pn10 * q0 + pn11 * q1) / den1
            return ct0 - _ect_dev(lh_raw_s0), ct1 - _ect_dev(lh_raw_s1)

        if cpfit:
            # no-migration closed form (CorrectLambda.py:213-235),
            # unstretched, in the stable deviation form of
            # kernels/correction.py `_nomig_closed_form`:
            # y_i - 1 expressed through em1m(lh_i T) and -log1p
            a1c, a2c = pn00, pn01
            a3c, a4c = pn10, pn11
            det = a1c * a4c - a2c * a3c
            det = jnp.where(det == 0, 1.0, det)
            em0 = _em1m(lh0 * T)
            em1v = _em1m(lh1 * T)
            dy1 = (a2c * em1v - a4c * em0) / det
            dy2 = (a3c * em0 - a1c * em1v) / det
            good = (dy1 > -1.0) & (dy2 > -1.0)
            lc_nm0 = jnp.where(
                good, -_log1p(jnp.where(good, dy1, 0.0)) / T, -1.0)
            lc_nm1 = jnp.where(
                good, -_log1p(jnp.where(good, dy2, 0.0)) / T, -1.0)
            if static_no_mig:
                lc0, lc1 = lc_nm0, lc_nm1
            else:
                xg0, xg1 = _lm2(res_general, x0_init, x1_init, n_iters,
                                neg_inf, neg_inf)
                lc0 = jnp.where(no_mig, lc_nm0, xg0 / T)
                lc1 = jnp.where(no_mig, lc_nm1, xg1 / T)
        else:
            lower_nm = 0.01 * jnp.minimum(lh_raw_s0, lh_raw_s1)
            if static_no_mig:
                x0_, x1_ = _lm2(res_nomig, x0_init, x1_init, n_iters,
                                lower_nm, lower_nm)
                lc0, lc1 = x0_ / T, x1_ / T
            else:
                # one combined LM: per-lane residual/bound selection gives
                # each lane exactly its branch's LM trajectory
                def res(a0, a1):
                    g0, g1 = res_general(a0, a1)
                    n0, n1_ = res_nomig(a0, a1)
                    return (jnp.where(no_mig, n0, g0),
                            jnp.where(no_mig, n1_, g1))

                lo = jnp.where(no_mig, lower_nm, neg_inf)
                x0_, x1_ = _lm2(res, x0_init, x1_init, n_iters, lo, lo)
                lc0, lc1 = x0_ / T, x1_ / T

        if mixture_th > 0.0:
            mix = jnp.sqrt(
                (pn00 - pn10) ** 2 + (pn01 - pn11) ** 2 + (pn02 - pn12) ** 2
            )
            bail = mix < mixture_th
            lc0 = jnp.where(bail, -1.0, lc0)
            lc1 = jnp.where(bail, -1.0, lc1)
        # zero-length intervals (grid-sweep padding rows) are exact no-ops in
        # the chain (expm(b*0) = I) but their solve is degenerate: pin lc = 1
        # (the reference's own T == 0 rule, MigrationInference.py:357-359) so
        # a NaN there cannot reach lc*T in the next round's chain.
        lc0 = jnp.where(T == 0, 1.0, lc0)
        lc1 = jnp.where(T == 0, 1.0, lc1)
        return lc0, lc1

    # Jacobi outer rounds: chain from the current guesses, re-solve every
    # interval from warm starts.  Round 0 starts from the PSMC rates with the
    # full LM budget; later rounds contract quadratically on a short budget
    # and run as ONE fori_loop round body (compile size stays O(1) in the
    # round count instead of unrolling the whole sweep per round).
    def _round(x0, x1, n_iters):
        p_in, _ = _chain(x0, x1)
        lc0, lc1 = _solve_round(p_in, x0, x1, n_iters)
        return lc0, lc1

    lc0, lc1 = _round(lh_raw_s0, lh_raw_s1, iters0)

    def warm(_, st):
        lc0, lc1 = st
        return _round(lc0 * T, lc1 * T, iters_warm)

    lc0, lc1 = jax.lax.fori_loop(0, rounds - 1, warm, (lc0, lc1))
    _, p_after = _chain(lc0 * T, lc1 * T)
    return lc0, lc1, p_after[0] + p_after[1]  # 6-tuple


def _shift_down_xla(m3, d, fill):
    """Row shift on the interval axis: out[t] = in[t-d], fill for t < d."""
    out = []
    for x, f in zip(m3, fill):
        fblock = jnp.full_like(x[:d], f)
        out.append(jnp.concatenate([fblock, x[:-d]], axis=0))
    return tuple(out)


def _shift_down_pallas(m3, d, fill):
    from jax.experimental.pallas import tpu as pltpu

    out = []
    rows = None
    for x, f in zip(m3, fill):
        rolled = pltpu.roll(x, shift=d, axis=0)
        if rows is None:
            rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        out.append(jnp.where(rows >= d, rolled, f))
    return tuple(out)


def _round_up(x, m):
    return -(-x // m) * m


def build_fused_correction(
    lh: np.ndarray | None,  # (s, 2) PSMC mixed rates, pre-split intervals
    times: np.ndarray | None,  # (s,) interval lengths
    *,
    cpfit: bool,
    mixture_th: float = 0.0,
    static_no_mig: bool = False,
    has_pulse: bool = True,
    # Jacobi/LM budgets: 2/8/2 for BOTH residual modes, tuned round 5
    # against the f64 oracle on the bench grid (4096 candidates).  The
    # round-4 3/14/4 was tuned on the RAW residuals; the round-5
    # deviation-form residuals converge the trust-region LM in ~half the
    # iterations, and every budget from 3/14/4 down to 2/8/2 sits at the
    # identical accuracy floor with identical -inf masks (cpfit 1.30e-5 --
    # the spectrum/log floor; ECT 7.27e-6), while 3/6/2 (ECT, 1.4e-5) and
    # 1/10/0 (cpfit, 1.43e-5) start to degrade.  Even 2/5/2 held the cpfit
    # floor; 2/8/2 keeps margin for scenarios harder than the probe grid.
    # Measured: cpfit 259.9k -> 291.2k evals/s, ECT 158.7k -> 196.1k.
    # The CPU fused-xla oracle tests pin these same defaults against the
    # reference on every fixture scenario (pulse/sdate/smooth/mth/mig0).
    # max_squarings=8 (chain norm <= 256; typical stretched norms < 8):
    # over-budget lanes NaN-poison to llh=-inf via the _scaling guard
    # rather than silently clamping.
    rounds: int = 2,
    iters0: int = 8,
    iters_warm: int = 2,
    max_squarings: int = 8,
    mode: str = "pallas",  # "pallas" | "xla"
    interpret: bool = False,
    lane_block: int | None = None,
    unroll: bool | None = None,
    n_intervals: int | None = None,
):
    """Build the fused sweep: f(mi, pu) with mi, pu (B, s, 2) returning
    (lc (B, s, 2), p_after (B, s, 2, 3)).

    With ``lh``/``times`` given, the interval tables are baked in (the
    single-model fit path).  With ``lh=times=None`` and ``n_intervals=s``,
    the returned function takes f(mi, pu, lh (B, s, 2), t (B, s)) -- the
    grid-sweep path, where each lane's tables depend on its split index and
    zero-length padding rows are exact no-ops (see the T == 0 rule in
    `_solve_round`).

    The returned function carries a `jax.custom_vmap` rule that flattens any
    additional vmap axes into the lane dimension, so nesting it under
    optimiser/bootstrap vmaps dispatches ONE wide kernel instead of many
    narrow ones.
    """
    dynamic_tables = times is None
    if dynamic_tables:
        s = int(n_intervals)
    else:
        s = int(len(times))
        lh = np.asarray(lh, float)
        times = np.asarray(times, float)
    if lane_block is None:
        # 128 both modes: Mosaic requires the lane dim of a block to be
        # 128-divisible (64-lane blocks only lower when they span the whole
        # array), and the VPU's native tile is (8, 128) anyway.  The ECT
        # mode's larger VMEM appetite is handled via vmem_limit_bytes below.
        lane_block = 128
    if unroll is None:
        # Mosaic wants the 3x3 squaring steps inline (loop machinery costs
        # more than the masked matmuls); XLA:CPU cannot tractably compile the
        # unrolled steps inside the jvp'd LM bodies -- roll them there.
        unroll = mode == "pallas" and not interpret
    static = dict(
        cpfit=cpfit,
        mixture_th=float(mixture_th),
        static_no_mig=static_no_mig,
        has_pulse=has_pulse,
        rounds=rounds,
        iters0=iters0,
        iters_warm=iters_warm,
        unroll=unroll,
        max_squarings=max_squarings,
    )

    def _impl(mi, pu, lh_tab=None, t_tab=None):
        dtype = jnp.result_type(float)
        B = mi.shape[0]
        # fields as (intervals, lanes)
        if dynamic_tables:
            Tf = t_tab.astype(dtype).T
            lh0 = lh_tab[..., 0].astype(dtype).T
            lh1 = lh_tab[..., 1].astype(dtype).T
        else:
            Tf = jnp.broadcast_to(jnp.asarray(times, dtype)[:, None], (s, B))
            lh0 = jnp.broadcast_to(jnp.asarray(lh[:, 0], dtype)[:, None], (s, B))
            lh1 = jnp.broadcast_to(jnp.asarray(lh[:, 1], dtype)[:, None], (s, B))
        mi0 = mi[..., 0].astype(dtype).T
        mi1 = mi[..., 1].astype(dtype).T
        pu0 = pu[..., 0].astype(dtype).T
        pu1 = pu[..., 1].astype(dtype).T

        if mode == "xla":
            out = _sweep_body(
                Tf, lh0, lh1, mi0, mi1, pu0, pu1,
                shift_fn=_shift_down_xla, n_rows=s, **static,
            )
            lc0, lc1, pa = out[0], out[1], out[2]
        else:
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            s_pad = _round_up(s, 8)
            b_pad = _round_up(B, lane_block)

            def pad(x, val):
                return jnp.pad(
                    x, ((0, s_pad - s), (0, b_pad - B)), constant_values=val
                )

            inp = jnp.stack(
                [pad(Tf, 1.0), pad(lh0, 1.0), pad(lh1, 1.0),
                 pad(mi0, 0.0), pad(mi1, 0.0), pad(pu0, 0.0), pad(pu1, 0.0)]
            )

            def kernel(in_ref, out_ref):
                f = [in_ref[i] for i in range(7)]
                lc0, lc1, pa = _sweep_body(
                    f[0], f[1], f[2], f[3], f[4], f[5], f[6],
                    shift_fn=_shift_down_pallas, n_rows=s_pad, **static,
                )
                out_ref[0] = lc0
                out_ref[1] = lc1
                for i in range(6):
                    out_ref[2 + i] = pa[i]

            grid = (b_pad // lane_block,)
            # the expected-coalescence-time residual carries more live state
            # than cpfit's (the (N1, J) moment series + their linearized
            # tangents): measured 18.08 MB peak stack at 128 lanes on v5e,
            # over the compiler's default 16 MB scoped-vmem limit -- raise
            # the cap for that kernel only (v5e VMEM is far larger; the
            # cpfit kernel stays at the default it was tuned under)
            kwargs = {}
            if not cpfit and not interpret:
                kwargs["compiler_params"] = pltpu.CompilerParams(
                    vmem_limit_bytes=32 * 1024 * 1024
                )
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, s_pad, b_pad), dtype),
                grid=grid,
                in_specs=[
                    pl.BlockSpec(
                        (7, s_pad, lane_block),
                        lambda g: (0, 0, g),
                        memory_space=pltpu.VMEM,
                    )
                ],
                out_specs=pl.BlockSpec(
                    (8, s_pad, lane_block),
                    lambda g: (0, 0, g),
                    memory_space=pltpu.VMEM,
                ),
                interpret=interpret,
                **kwargs,
            )(inp)
            lc0 = out[0, :s, :B]
            lc1 = out[1, :s, :B]
            pa = tuple(out[2 + i, :s, :B] for i in range(6))

        lc = jnp.stack([lc0.T, lc1.T], axis=-1)  # (B, s, 2)
        p_after = jnp.stack(
            [jnp.stack([pa[0].T, pa[1].T, pa[2].T], axis=-1),
             jnp.stack([pa[3].T, pa[4].T, pa[5].T], axis=-1)],
            axis=-2,
        )  # (B, s, 2, 3)
        return lc, p_after

    if not dynamic_tables:

        @jax.custom_batching.custom_vmap
        def sweep(mi, pu):
            return _impl(mi, pu)

        @sweep.def_vmap
        def _rule(axis_size, in_batched, mi, pu):
            if not in_batched[0]:
                mi = jnp.broadcast_to(mi[None], (axis_size,) + mi.shape)
            if not in_batched[1]:
                pu = jnp.broadcast_to(pu[None], (axis_size,) + pu.shape)
            lead = mi.shape[:2]
            lc, pa = sweep(
                mi.reshape((-1,) + mi.shape[2:]), pu.reshape((-1,) + pu.shape[2:])
            )
            lc = lc.reshape(lead + lc.shape[1:])
            pa = pa.reshape(lead + pa.shape[1:])
            return (lc, pa), (True, True)

        return sweep

    @jax.custom_batching.custom_vmap
    def sweep_dyn(mi, pu, lh_tab, t_tab):
        return _impl(mi, pu, lh_tab, t_tab)

    @sweep_dyn.def_vmap
    def _rule_dyn(axis_size, in_batched, mi, pu, lh_tab, t_tab):
        args = []
        for batched, a in zip(in_batched, (mi, pu, lh_tab, t_tab)):
            if not batched:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            args.append(a)
        lead = args[0].shape[:2]
        lc, pa = sweep_dyn(*(a.reshape((-1,) + a.shape[2:]) for a in args))
        lc = lc.reshape(lead + lc.shape[1:])
        pa = pa.reshape(lead + pa.shape[1:])
        return (lc, pa), (True, True)

    return sweep_dyn
