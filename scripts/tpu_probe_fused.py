#!/usr/bin/env python3
"""Minimal repro/validation of the fused Pallas correction kernel on TPU.

Round-1 bench crashed in Mosaic while compiling the fused kernel
(BENCH_r01.json). This probe compiles and runs JUST the kernel on the real
chip with the bench's 64-interval shapes, so kernel fixes can be iterated
without paying the full likelihood compile.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MISTI_PLATFORM", "default")

import numpy as np
import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from misti_tpu.config import setup_platform

setup_platform(os.environ["MISTI_PLATFORM"])

from misti_tpu.kernels.correction_pallas import build_fused_correction

s = 28
B = int(os.environ.get("PROBE_B", "256"))
cpfit = os.environ.get("PROBE_CPFIT", "1") == "1"
rng = np.random.default_rng(0)
grid = 0.008 * (1.06 ** np.arange(s + 1)) - 0.008
times = np.diff(grid)
tt = np.cumsum(np.concatenate([[0.0], times]))[:-1]
lh = np.stack(
    [1.0 + 0.5 * np.sin(tt * 12.0) * np.exp(-tt * 3),
     1.1 + 0.4 * np.cos(tt * 9.0) * np.exp(-tt * 2)], axis=1
)

fused = build_fused_correction(
    lh, times, cpfit=cpfit, mixture_th=0.0, static_no_mig=False,
    has_pulse=False, mode=os.environ.get("PROBE_MODE", "pallas"),
)

mi = np.zeros((B, s, 2))
mi[:, 10:, 0] = np.linspace(0.05, 1.2, B)[:, None]
pu = np.zeros((B, s, 2))

print(f"backend={jax.default_backend()} devices={jax.devices()}", file=sys.stderr)
t0 = time.time()
lc, pa = jax.jit(fused)(jnp_mi := jax.numpy.asarray(mi), jax.numpy.asarray(pu))
lc = np.asarray(lc)
pa = np.asarray(pa)
t1 = time.time()
print(f"compile+run: {t1 - t0:.1f}s  lc finite: {np.isfinite(lc).all()}  "
      f"lc>0: {(lc > 0).mean():.3f}", file=sys.stderr)

# compare against the XLA trace of the same body
fused_x = build_fused_correction(
    lh, times, cpfit=cpfit, mixture_th=0.0, static_no_mig=False,
    has_pulse=False, mode="xla",
)
lcx, pax = jax.jit(fused_x)(jax.numpy.asarray(mi), jax.numpy.asarray(pu))
lcx = np.asarray(lcx)
err = np.max(np.abs(lc - lcx) / (np.abs(lcx) + 1e-12))
print(f"max rel diff pallas vs xla: {err:.3e}", file=sys.stderr)

# timing
reps = 20
t0 = time.time()
for _ in range(reps):
    lc, pa = jax.jit(fused)(jax.numpy.asarray(mi), jax.numpy.asarray(pu))
np.asarray(lc)
dt = time.time() - t0
print(f"pallas: {B * reps / dt:.1f} sweeps/s", file=sys.stderr)
print("OK")
