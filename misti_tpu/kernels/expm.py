"""Batched matrix exponentials and occupancy integrals for small CTMCs.

Design notes (TPU-first, see SURVEY.md section 7 decisions 2-3):

* The reference computes the per-interval occupancy integral as
  ``M^{-1} (P1 - P0)`` (reference MigrationInference.py:530-540), which forces
  it to delete the 7 stationary states of the 44-state chain whenever
  migration is zero (singular M).  We instead use the augmented block-matrix
  identity

      expm([[M, I], [0, 0]] * T) = [[E, N1], [0, I]],   E = e^{MT},
      N1 = int_0^T e^{Ms} ds,

  which needs no inverse, keeps every shape static (always 44), and removes
  the mu=0 special case entirely.

* The lambda-correction residuals need the first-moment operator
  K = int_0^T s * e^{Ms} ds (expected coalescence time within the interval;
  the reference builds it from two matrix inverses,
  CorrectLambda.py:94-110).  With the deeper augmentation

      expm([[M, I, 0], [0, 0, I], [0, 0, 0]] * T)
          = [[E, N1, N2], [0, I, T*I], [0, 0, I]],
      N2 = int_0^T int_0^s e^{Mu} du ds,

  we get K = T*N1 - N2 (integrate [s<u] over the square), again inverse-free
  and well-behaved as any rate tends to 0.

* expm itself is a fixed-structure scaling-and-squaring TAYLOR evaluation
  (Paterson-Stockmeyer degree 18) rather than `jax.scipy.linalg.expm` or a
  Pade rational: a Pade evaluation ends in a batched linear solve whose
  triangular-inverse custom call blows the 16 MB VMEM scoped limit for
  (B, 88, 88) batches on TPU, while the Taylor form is matmuls only -- no
  `lax.cond` branches, MXU-tileable, differentiable for the Gauss-Newton
  correction solver, and accurate to ~1e-12 relative in f64 (validated
  against scipy in tests/test_expm.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_THETA_TAYLOR = 1.0  # scale so ||A||_1 <= 1: Taylor-18 truncation ~ 2e-16
_TAYLOR_DEGREE = 18

_MAX_SQUARINGS = 30


def expm(a: jax.Array, max_squarings: int = _MAX_SQUARINGS,
         unroll: bool = False) -> jax.Array:
    """Matrix exponential of (batched) square matrices.

    Fixed-iteration scaling-and-squaring + Taylor-18 (Paterson-Stockmeyer):
    matmuls only, no linear solves; fully vmap/jit friendly (the squaring
    loop always runs ``max_squarings`` iterations, with inert iterations
    selected by `where`).  ``unroll=True`` emits the squarings as straight-
    line code -- for tiny (3x3/9x9) matrices the loop machinery costs more
    than the masked matmuls, and the solver differentiates through this, so
    it must stay jvp-compatible (no early-exit while_loop).
    """
    a = jnp.asarray(a)
    norm = jnp.linalg.norm(a, ord=1, axis=(-2, -1))
    # number of squarings: smallest s >= 0 with norm / 2^s <= theta
    s = jnp.maximum(0, jnp.ceil(jnp.log2(norm / _THETA_TAYLOR))).astype(jnp.int32)
    s = jnp.where(jnp.isfinite(norm) & (norm > 0), s, 0)
    s = jnp.minimum(s, max_squarings)
    scale = jnp.exp2(-s.astype(a.dtype))
    a_scaled = a * scale[..., None, None]

    e = _taylor18(a_scaled)

    def body(i, e):
        sq = e @ e
        do = i < s  # per-batch-element predicate
        return jnp.where(do[..., None, None], sq, e)

    if unroll:
        for i in range(max_squarings):
            e = body(i, e)
        return e
    return jax.lax.fori_loop(0, max_squarings, body, e)


def _taylor18(a: jax.Array) -> jax.Array:
    """Degree-18 Taylor polynomial of e^A via Paterson-Stockmeyer.

    sum_{k=0}^{18} A^k / k! evaluated in base A^6: 5 matmuls for the powers
    + 3 block-Horner matmuls = 8 matmuls total.
    """
    n = a.shape[-1]
    ident = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    p = [ident, a]
    for _ in range(5):  # A^2 .. A^6
        p.append(p[-1] @ a)

    import math

    c = [1.0 / math.factorial(k) for k in range(19)]

    def block(k0):  # c[k0]*I + c[k0+1]*A + ... + c[k0+5]*A^5
        out = c[k0] * p[0]
        for j in range(1, 6):
            out = out + c[k0 + j] * p[j]
        return out

    # b0 + A^6 (b1 + A^6 (b2 + A^6 * c18*I... folded into b2's tail))
    b2 = block(12) + c[18] * p[6]
    b1 = block(6)
    b0 = block(0)
    a6 = p[6]
    return b0 + a6 @ (b1 + a6 @ b2)


def expm_m1(a: jax.Array, max_squarings: int = _MAX_SQUARINGS,
            unroll: bool = False) -> jax.Array:
    """Phi = e^A - I WITHOUT cancellation: the Taylor series has no
    identity term (Phi(h) = sum_{k>=1} (Ah)^k / k!) and interval doubling
    uses Phi(2h) = Phi^2 + 2 Phi.  For small ||A|| the naive e^A - I loses
    the leading digits of exactly the O(||A||) signal the cpfit correction
    residual needs (see kernels/correction.py `_residual_cp`)."""
    import math

    a = jnp.asarray(a)
    norm = jnp.linalg.norm(a, ord=1, axis=(-2, -1))
    s = jnp.maximum(0, jnp.ceil(jnp.log2(norm / _THETA_TAYLOR))).astype(jnp.int32)
    s = jnp.where(jnp.isfinite(norm) & (norm > 0), s, 0)
    s = jnp.minimum(s, max_squarings)
    scale = jnp.exp2(-s.astype(a.dtype))
    b = a * scale[..., None, None]

    n = a.shape[-1]
    ident = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    p = [ident, b]
    for _ in range(5):
        p.append(p[-1] @ b)
    c = [0.0] + [1.0 / math.factorial(k) for k in range(1, 19)]

    def blk(k0):
        out = c[k0] * p[0]
        for j in range(1, 6):
            if k0 + j < len(c):
                out = out + c[k0 + j] * p[j]
        return out

    b6 = p[6]
    phi = blk(0) + b6 @ (blk(6) + b6 @ (blk(12) + c[18] * b6))

    def body(i, phi):
        sq = phi @ phi + 2.0 * phi
        do = i < s
        return jnp.where(do[..., None, None], sq, phi)

    if unroll:
        for i in range(max_squarings):
            phi = body(i, phi)
        return phi
    return jax.lax.fori_loop(0, max_squarings, body, phi)


def _taylor18_pair(b: jax.Array):
    """(e, phi1) of a scaled matrix: e = sum b^k/k!, phi1 = sum b^k/(k+1)!.

    Both series share the Paterson-Stockmeyer powers (5 matmuls) and each
    costs 2 block-Horner matmuls -- 9 matmuls total for the pair, versus
    ~8 matmuls on a doubled-size augmented matrix (8x the FLOPs/matmul).
    """
    import math

    n = b.shape[-1]
    ident = jnp.broadcast_to(jnp.eye(n, dtype=b.dtype), b.shape)
    p = [ident, b]
    for _ in range(5):  # b^2 .. b^6
        p.append(p[-1] @ b)
    b6 = p[6]

    def horner(coeffs):
        def blk(k0):
            out = coeffs[k0] * p[0]
            for j in range(1, 6):
                if k0 + j < len(coeffs):
                    out = out + coeffs[k0 + j] * p[j]
            return out

        b2 = blk(12) + (coeffs[18] * p[6] if len(coeffs) > 18 else 0.0)
        return blk(0) + b6 @ (blk(6) + b6 @ b2)

    ce = [1.0 / math.factorial(k) for k in range(19)]
    cp = [1.0 / math.factorial(k + 1) for k in range(19)]
    return horner(ce), horner(cp)


def expm_and_integral(m: jax.Array, t,
                      max_squarings: int = 20) -> tuple[jax.Array, jax.Array]:
    """Return (E, N1) with E = e^{M t} and N1 = int_0^t e^{M s} ds.

    ``m``: (..., n, n); ``t``: scalar or (...,) broadcastable batch of times.

    Inverse-free: on the scaled step h = t/2^s, E_h and N1_h = h*phi1(M h)
    come from twin Taylor series sharing their matrix powers; the interval
    is then doubled s times with

        N1(2h) = N1(h) + E(h) @ N1(h),     E(2h) = E(h)^2,

    which keeps everything matmuls (TPU-friendly) at ~1/5 the FLOPs of an
    augmented doubled-size expm.  Singular M (zero-migration stationary
    states) needs no special-casing.
    """
    m = jnp.asarray(m)
    t = jnp.asarray(t, m.dtype)
    b = m * t[..., None, None]
    norm = jnp.linalg.norm(b, ord=1, axis=(-2, -1))
    s = jnp.maximum(0, jnp.ceil(jnp.log2(norm / _THETA_TAYLOR))).astype(jnp.int32)
    s = jnp.where(jnp.isfinite(norm) & (norm > 0), s, 0)
    s = jnp.minimum(s, max_squarings)
    scale = jnp.exp2(-s.astype(m.dtype))
    e, phi1 = _taylor18_pair(b * scale[..., None, None])
    n1 = (t * scale)[..., None, None] * phi1

    def cond(carry):
        i, _, _ = carry
        return i < jnp.minimum(jnp.max(s), max_squarings)

    def body(carry):
        i, e, n1 = carry
        do = (i < s)[..., None, None]
        n1 = jnp.where(do, n1 + e @ n1, n1)
        e = jnp.where(do, e @ e, e)
        return i + 1, e, n1

    _, e, n1 = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), e, n1))
    return e, n1


def expm_action_pair(kmat: jax.Array, coeffs: jax.Array, basis_norms,
                     t, p0: jax.Array, theta: float = 2.0,
                     degree: int = 20, max_substeps: int = 1024):
    """(E p0, N1 p0) for M = sum_c coeffs[c] * B_c WITHOUT forming E or N1.

    The spectrum sweep only consumes the action of E = e^{Mt} and
    N1 = int_0^t e^{Ms} ds on the carried state vector
    (MigrationInference.py:497-506 `SolveDifEq` + the JSFS projection), so
    materialising (B, 44, 44) exponentials wastes both FLOPs and MXU tiling:
    a batched 44x44 matmul uses ~4% of the systolic array.  Here every
    matvec is one (batch, n) @ (n, c*n) matmul against the STATIC stacked
    basis ``kmat`` = [B_0^T | ... | B_{c-1}^T] (batch fills the MXU rows),
    and the interval is covered by m = ceil(||Mt||_1 / theta) Taylor
    sub-steps of the degree-``degree`` series for (e^b, phi1(b)):

        p_{j+1} = e(b) p_j,   N1 p0 = sum_j h * phi1(b) p_j,   b = M t / m.

    ``basis_norms[c]`` = ||B_c||_1 gives the cheap upper bound
    ||M||_1 <= sum |coeffs[c]| * ||B_c||_1 used to pick m (no matrix is ever
    formed).  Truncation error ~ theta^(degree+1)/(degree+1)! per sub-step
    (4e-14 at theta=2, degree=20).

    The cost is LINEAR in ||M t||_1 (m sub-steps of ``degree`` matvecs), so
    ``max_substeps`` hard-caps it: beyond norm theta*max_substeps (2048 at
    the defaults -- far past any physical demography; e^{-norm} underflows
    f32 there anyway) the result is poisoned with NaN, which the likelihood's
    positivity mask turns into llh = -inf.  Without the cap, a single
    Nelder-Mead runaway lane (expansion steps double the trial rate every
    iteration) makes the whole lockstep batch crawl: the vmapped sub-step
    while_loop runs until the WORST lane finishes.
    """
    n = p0.shape[-1]
    c = coeffs.shape[-1]
    t = jnp.asarray(t, p0.dtype)
    nb = jnp.sum(jnp.abs(coeffs) * jnp.asarray(basis_norms, p0.dtype)) * t
    overflow = ~(nb <= theta * max_substeps)  # catches NaN coeffs too
    m = jnp.maximum(1, jnp.ceil(nb / theta)).astype(jnp.int32)
    m = jnp.clip(m, 1, max_substeps)
    h = t / m.astype(p0.dtype)
    cs = coeffs * h  # scaled rates: b = sum cs[c] * B_c, ||b||_1 <= theta

    def matvec(v):
        y = (v @ kmat).reshape(v.shape[:-1] + (c, n))
        return jnp.sum(cs[..., None] * y, axis=-2)

    def series(p):
        """(e(b) p, phi1(b) p) sharing the Krylov chain term_k = b^k p / k!.

        Unrolled: ``degree`` straight-line matvecs per sub-step -- a rolled
        fori_loop pays per-step loop latency that rivals the matvec cost at
        these tiny widths.
        """

        def kbody(k, st):
            term, ev, pv = st
            term = matvec(term) / k.astype(p.dtype)
            return term, ev + term, pv + term / (k + 1).astype(p.dtype)

        _, ev, pv = jax.lax.fori_loop(1, degree + 1, kbody, (p, p, p),
                                      unroll=True)
        return ev, pv

    def cond(carry):
        j = carry[0]
        return j < m

    def body(carry):
        j, p, acc = carry
        ev, pv = series(p)
        return j + 1, ev, acc + h * pv

    _, p1, n1p = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), p0, jnp.zeros_like(p0))
    )
    bad = jnp.asarray(jnp.nan, p0.dtype)
    return (jnp.where(overflow, bad, p1), jnp.where(overflow, bad, n1p))


def expm_nc_moments(m: jax.Array, t, max_squarings: int = 20):
    """Return (N1, J) with N1 = int_0^t e^{Ms} ds and the CENTERED first
    moment J = K - (t/2) N1 = int_0^t (s - t/2) e^{Ms} ds -- both formed
    without catastrophic cancellation in float32.

    Motivation: the expected-coalescence-time residual (reference
    CorrectLambda.py:151-157) needs E[s | coal in (0,t)] - ECT_onepop, a
    difference of two quantities that both approach t/2 as rates -> 0.
    Forming it from (E, N1, K) loses the signal in f32 (ACCURACY.md): the
    conditional mean is (c^T K p)/(c^T N1 p) ~ t/2 + O(||M|| t^2) and the
    t/2 baselines cancel.  With J the t/2 is removed ANALYTICALLY:

        E[s | coal] - t/2 = (c^T J p) / (c^T N1 p),

    and J's Taylor series has no constant term (int_0^t (s - t/2) ds = 0):

        J(h) = h^2 sum_{k>=1} k/(2 (k+2)!) (M h)^k  (per scaled step),

    so every entry is computed at working-precision RELATIVE accuracy.
    Interval doubling carries Phi = E - I (also cancellation-free:
    Phi(2h) = Phi^2 + 2 Phi) with

        N1(2h) = 2 N1 + Phi N1,
        J(2h)  = 2 J + Phi J + (h/2) Phi N1,

    derived from K(2h) = K + E (K + h N1) and the definition of J.
    Identical (to roundoff) to ``expm_integral_moment``'s t*N1 - N2 in f64;
    the point is the f32 conditioning.
    """
    import math

    m = jnp.asarray(m)
    t = jnp.asarray(t, m.dtype)
    b = m * t[..., None, None]
    norm = jnp.linalg.norm(b, ord=1, axis=(-2, -1))
    s = jnp.maximum(0, jnp.ceil(jnp.log2(norm / _THETA_TAYLOR))).astype(jnp.int32)
    s = jnp.where(jnp.isfinite(norm) & (norm > 0), s, 0)
    s = jnp.minimum(s, max_squarings)
    scale = jnp.exp2(-s.astype(m.dtype))
    bs = b * scale[..., None, None]

    n = m.shape[-1]
    ident = jnp.broadcast_to(jnp.eye(n, dtype=m.dtype), m.shape)
    p = [ident, bs]
    for _ in range(5):  # bs^2 .. bs^6
        p.append(p[-1] @ bs)
    b6 = p[6]

    def horner(coeffs):
        def blk(k0):
            out = coeffs[k0] * p[0]
            for j in range(1, 6):
                if k0 + j < len(coeffs):
                    out = out + coeffs[k0 + j] * p[j]
            return out

        b2 = blk(12) + (coeffs[18] * p[6] if len(coeffs) > 18 else 0.0)
        return blk(0) + b6 @ (blk(6) + b6 @ b2)

    c_phi1 = [1.0 / math.factorial(k + 1) for k in range(19)]
    c_phim = [0.0] + [1.0 / math.factorial(k) for k in range(1, 19)]
    c_j = [0.0] + [k / (2.0 * math.factorial(k + 2)) for k in range(1, 19)]

    h = (t * scale)[..., None, None]
    n1 = h * horner(c_phi1)
    j = h * h * horner(c_j)
    phi = horner(c_phim)  # E - I, no identity term

    def cond(carry):
        i = carry[0]
        return i < jnp.minimum(jnp.max(s), max_squarings)

    def body(carry):
        i, phi, n1, j, h = carry
        do = (i < s)[..., None, None]
        tmp = phi @ n1
        jn = 2.0 * j + phi @ j + 0.5 * h * tmp
        n1n = 2.0 * n1 + tmp
        phin = phi @ phi + 2.0 * phi
        hn = 2.0 * h
        return (
            i + 1,
            jnp.where(do, phin, phi),
            jnp.where(do, n1n, n1),
            jnp.where(do, jn, j),
            jnp.where(do, hn, h),
        )

    _, _, n1, j, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), phi, n1, j, h)
    )
    return n1, j


def expm_integral_moment(m: jax.Array, t) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Return (E, N1, K): exponential, occupancy integral and first moment.

    K = int_0^t s e^{M s} ds = t*N1 - N2 where N2 is the double integral from
    the 3n x 3n augmentation.  All inverse-free.
    """
    n = m.shape[-1]
    dt = jnp.asarray(t, m.dtype)[..., None, None]
    ident = jnp.broadcast_to(jnp.eye(n, dtype=m.dtype), m.shape)
    z = jnp.zeros_like(m)
    row0 = jnp.concatenate([m * dt, ident * dt, z], axis=-1)
    row1 = jnp.concatenate([z, z, ident * dt], axis=-1)
    row2 = jnp.concatenate([z, z, z], axis=-1)
    big = expm(jnp.concatenate([row0, row1, row2], axis=-2), max_squarings=14,
               unroll=True)
    e = big[..., :n, :n]
    n1 = big[..., :n, n : 2 * n]
    n2 = big[..., :n, 2 * n :]
    k = jnp.asarray(t, m.dtype)[..., None, None] * n1 - n2
    return e, n1, k
