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

* expm itself is a fixed-structure scaling-and-squaring Pade-13 evaluation
  (Higham 2005) rather than `jax.scipy.linalg.expm`: no `lax.cond` branches,
  so it vmaps/jits into clean batched matmuls that XLA tiles onto the MXU,
  and it is differentiable for the Gauss-Newton correction solver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Pade-13 coefficients (Higham, "The scaling and squaring method for the
# matrix exponential revisited", SIAM J. Matrix Anal. 2005).
_PADE13 = (
    64764752532480000.0,
    32382376266240000.0,
    7771770303897600.0,
    1187353796428800.0,
    129060195264000.0,
    10559470521600.0,
    670442572800.0,
    33522128640.0,
    1323241920.0,
    40840800.0,
    960960.0,
    16380.0,
    182.0,
    1.0,
)
_THETA13 = 5.371920351148152  # max ||A||_1 for which unscaled Pade-13 is safe

_MAX_SQUARINGS = 16


def expm(a: jax.Array, max_squarings: int = _MAX_SQUARINGS) -> jax.Array:
    """Matrix exponential of (batched) square matrices.

    Fixed-iteration scaling-and-squaring + Pade-13; fully vmap/jit friendly
    (the squaring loop always runs ``max_squarings`` iterations, with inert
    iterations selected by `where`).
    """
    a = jnp.asarray(a)
    norm = jnp.linalg.norm(a, ord=1, axis=(-2, -1))
    # number of squarings: smallest s >= 0 with norm / 2^s <= theta13
    s = jnp.maximum(0, jnp.ceil(jnp.log2(norm / _THETA13))).astype(jnp.int32)
    s = jnp.where(jnp.isfinite(norm) & (norm > 0), s, 0)
    s = jnp.minimum(s, max_squarings)
    scale = jnp.exp2(-s.astype(a.dtype))
    a_scaled = a * scale[..., None, None]

    e = _pade13(a_scaled)

    def body(i, e):
        sq = e @ e
        do = i < s  # per-batch-element predicate
        return jnp.where(do[..., None, None], sq, e)

    return jax.lax.fori_loop(0, max_squarings, body, e)


def _pade13(a: jax.Array) -> jax.Array:
    b = _PADE13
    n = a.shape[-1]
    ident = jnp.eye(n, dtype=a.dtype)
    ident = jnp.broadcast_to(ident, a.shape)
    a2 = a @ a
    a4 = a2 @ a2
    a6 = a4 @ a2
    u = a @ (
        a6 @ (b[13] * a6 + b[11] * a4 + b[9] * a2)
        + b[7] * a6 + b[5] * a4 + b[3] * a2 + b[1] * ident
    )
    v = (
        a6 @ (b[12] * a6 + b[10] * a4 + b[8] * a2)
        + b[6] * a6 + b[4] * a4 + b[2] * a2 + b[0] * ident
    )
    # (V - U)^{-1} (V + U)
    return jnp.linalg.solve(v - u, v + u)


def _augment1(m: jax.Array, t) -> jax.Array:
    """[[M*t, I*t], [0, 0]] for the single-integral augmentation."""
    n = m.shape[-1]
    dt = jnp.asarray(t, m.dtype)[..., None, None]
    ident = jnp.broadcast_to(jnp.eye(n, dtype=m.dtype), m.shape)
    z = jnp.zeros_like(m)
    top = jnp.concatenate([m * dt, ident * dt], axis=-1)
    bot = jnp.concatenate([z, z], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def expm_and_integral(m: jax.Array, t) -> tuple[jax.Array, jax.Array]:
    """Return (E, N1) with E = e^{M t} and N1 = int_0^t e^{M s} ds.

    ``m``: (..., n, n); ``t``: scalar or (...,) broadcastable batch of times.
    """
    n = m.shape[-1]
    big = expm(_augment1(m, t))
    return big[..., :n, :n], big[..., :n, n:]


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
    big = expm(jnp.concatenate([row0, row1, row2], axis=-2))
    e = big[..., :n, :n]
    n1 = big[..., :n, n : 2 * n]
    n2 = big[..., :n, 2 * n :]
    k = jnp.asarray(t, m.dtype)[..., None, None] * n1 - n2
    return e, n1, k
