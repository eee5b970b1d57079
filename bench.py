#!/usr/bin/env python3
"""Benchmark: likelihood evaluations per second on the live accelerator.

Workload matches the reference baseline row (BASELINE.md): one full
likelihood evaluation with lambda-correction enabled (cpfit), 64 merged
time intervals, 1 migration band -- the reference does ~5.7 of these per
second on one CPU core.  Here the evaluation is vmapped over a batch of
migration-rate candidates on the accelerator, which is exactly how the
fitting and bootstrap drivers consume it.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_EVALS_PER_S = 5.7  # reference, 1 CPU core (BASELINE.md)


def main() -> int:
    os.environ.setdefault("MISTI_PLATFORM", "default")  # use the accelerator
    import jax

    # persistent compilation cache: the first TPU compile of the fused
    # likelihood takes minutes via the remote-compile tunnel; subsequent
    # bench runs reuse the serialized executable.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from misti_tpu.config import setup_platform

    setup_platform(os.environ["MISTI_PLATFORM"])

    from misti_tpu.engine.likelihood import build_likelihood
    from misti_tpu.engine.spec import build_spec

    # MISTI_BENCH_MODE=trueeps isolates the spectrum cost (skips the
    # correction sweep) for profiling; MISTI_BENCH_MODE=ect runs the
    # reference's DEFAULT residual (no --cpfit; f32-stable since the
    # round-5 deviation-form reformulation).  The reported metric is the
    # default corrected (cpfit) workload unless overridden.
    mode = os.environ.get("MISTI_BENCH_MODE", "")
    true_eps = mode == "trueeps"
    cpfit = mode != "ect"

    numT = 64
    split_t = 28
    rng = np.random.default_rng(11)
    grid = 0.008 * (1.06 ** np.arange(numT)) - 0.008
    times = list(np.diff(grid))
    tt = np.cumsum([0.0] + times)
    lams = np.stack(
        [1.0 + 0.5 * np.sin(tt * 12.0) * np.exp(-tt * 3),
         1.1 + 0.4 * np.cos(tt * 9.0) * np.exp(-tt * 2)], axis=1
    )
    sfs = [0.0, *rng.integers(200, 6000, size=7).astype(float)]
    spec = build_spec(
        times, [list(v) for v in lams], sfs, split_t,
        [[1, 2, split_t, 0.3, 1]], [], unfolded=True, cpfit=cpfit, smooth=False,
        correct=not true_eps,
    )
    lik = build_likelihood(spec)

    # steady-state batch scaling measured on v5e (round 4, PERF_ANALYSIS.md):
    # 212k @ 2048 -> 232k @ 4096 -> 238k @ 8192 evals/s.  4096 is the
    # representative width -- the production sweep's lockstep Nelder-Mead
    # evaluates ~4.8k candidates per iteration (808 cells x 6 simplex
    # points, SWEEPBENCH_r04.json).
    batch = int(os.environ.get("MISTI_BENCH_BATCH", "4096"))
    params = np.linspace(0.05, 1.2, batch)[:, None]

    try:
        out = lik.llh_batch(params)  # compile
        np.asarray(out)
    except Exception as e:  # pragma: no cover - toolchain-dependent
        # If the fused Pallas correction kernel fails to compile (Mosaic
        # regressions are toolchain-version-dependent), fall back to the
        # pure-XLA Jacobi sweep instead of failing the bench outright.
        print(f"# fused kernel failed ({type(e).__name__}); "
              "falling back to scan-jacobi", file=sys.stderr)
        lik = build_likelihood(spec, correction_mode="scan-jacobi")
        out = lik.llh_batch(params)
        np.asarray(out)
    n_ok = int(np.isfinite(np.asarray(out)).sum())

    # time a long enough window for a stable steady-state number (the
    # per-dispatch latency is ~10-20 ms; 5 reps was noise-dominated)
    reps = int(os.environ.get("MISTI_BENCH_REPS", "60"))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = lik.llh_batch(params)
    np.asarray(out)
    dt = time.perf_counter() - t0

    evals_per_s = batch * reps / dt
    print(
        json.dumps(
            {
                "metric": ("llh_evals_per_s_64int_trueeps" if true_eps
                           else "llh_evals_per_s_64int_ect" if not cpfit
                           else "llh_evals_per_s_64int_corrected"),
                "value": round(evals_per_s, 2),
                "unit": "evals/s",
                "vs_baseline": round(evals_per_s / BASELINE_EVALS_PER_S, 2),
            }
        )
    )
    # sanity to stderr only (driver parses stdout json)
    print(
        f"# backend={jax.default_backend()} batch={batch} reps={reps} "
        f"time={dt:.3f}s finite={n_ok}/{batch}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
