"""Correctly-rounded-class transcendentals for the f32 accelerator path.

XLA:TPU lowers f32 `log` to a fast polynomial approximation with errors
measured up to ~3.3e-5 RELATIVE on v5e (hundreds of ulps; probed in round 5
-- scripts/accuracy_r05_final.txt context).  That is invisible almost
everywhere, but the multinomial log-likelihood ends in

    llh = const + sum_i d_i * log(jafs_i),     sum_i d_i ~ 2e4,

so a ~3e-5 absolute error on each of the 7 logs becomes ~0.4 absolute llh
error -- which measurement showed to be the ENTIRE on-chip accuracy floor
(the spectrum itself is good to ~3e-6).  `log_accurate` computes f32 log to
a few ulp from exact integer exponent/mantissa extraction plus the atanh
series, using only correctly-rounded add/mul/div:

    x = m 2^e,  m in [sqrt(1/2), sqrt(2)),
    log x = e ln2 + 2 atanh(t),  t = (m-1)/(m+1), |t| <= 0.1716,

with ln2 split hi/lo (fdlibm style) so e*ln2 stays exact.  The series
needs only 5 terms (t^9 coefficient ~ 1.2e-8 at the edge).

Under float64 traces (the CPU reference-parity path) it defers to jnp.log
so f64 results are bitwise unchanged.

Domain: all of f32.  Subnormal inputs are renormalised from their raw
significand bits (log x = log(sig) - 149 ln2) so the exponent-field
extraction stays valid -- without that, a category
that slips through the likelihood's `where(cats > 0, ...)` guard as a
subnormal on a backend that honours subnormals (XLA:CPU f32; TPU flushes
them to zero first) would get a finite log that is ~4 too HIGH
(log(1e-40): -88.0 instead of -92.1), silently inflating a degenerate
candidate's llh instead of sinking it.  0 -> -inf, negatives -> NaN,
inf/NaN -> jnp.log's exact handling, matching jnp.log everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_LN2_HI = np.float32(0.69335938)  # 355/512: exact in 9 bits
_LN2_LO = np.float32(-2.1219444e-4)  # ln2 - LN2_HI


def log_accurate(x: jax.Array) -> jax.Array:
    x = jnp.asarray(x)
    if x.dtype != jnp.float32:
        return jnp.log(x)
    # subnormals: x = sig * 2^-149 with sig the raw 23-bit significand
    # field, so log x = log(sig) - 149 ln2.  Rebuild sig as a float from
    # the BITS (int->float convert, exact below 2^24): float arithmetic on
    # the subnormal itself is flushed to zero on DAZ/FTZ backends
    # (XLA:CPU and TPU both), which a multiply-based rescale trips over.
    xb = jax.lax.bitcast_convert_type(x, jnp.int32)
    tiny = ((xb >> 23) & 0xFF) == 0  # exponent field 0: subnormal or zero
    xn = jnp.where(tiny, (xb & 0x007FFFFF).astype(jnp.float32), x)
    xi = jax.lax.bitcast_convert_type(xn, jnp.int32)
    e = ((xi >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type(
        (xi & 0x007FFFFF) | (np.int32(127) << 23), jnp.float32
    )  # [1, 2)
    big = m > np.float32(1.4142135)
    m = jnp.where(big, m * np.float32(0.5), m)
    e = (e + big.astype(jnp.int32) - 149 * tiny.astype(jnp.int32)
         ).astype(jnp.float32)
    # m - 1 is EXACT for m in [0.5, 2) (Sterbenz); t carries ~1 ulp
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    s = 2.0 * t * (
        1.0 + t2 * (np.float32(1 / 3) + t2 * (np.float32(1 / 5) + t2 * (
            np.float32(1 / 7) + t2 * np.float32(1 / 9))))
    )
    out = e * _LN2_HI + (e * _LN2_LO + s)
    # edge cases exactly as jnp.log: 0 -> -inf, <0 -> NaN, inf/NaN pass
    # through jnp.log's own exact handling
    return jnp.where(
        (x > 0) & jnp.isfinite(x), out,
        jnp.where(x == 0, np.float32(-np.inf), jnp.log(x)))
