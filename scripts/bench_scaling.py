#!/usr/bin/env python3
"""Batch-scaling table for the corrected-likelihood bench workload.

Measures steady-state llh_batch throughput at several batch sizes on the
live accelerator (one compile per batch size, persistent cache).  Writes
scripts/bench_scaling.json and prints a table.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    os.environ.setdefault("MISTI_PLATFORM", "default")
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from misti_tpu.config import setup_platform
    setup_platform(os.environ["MISTI_PLATFORM"])

    from misti_tpu.engine.likelihood import build_likelihood
    from misti_tpu.engine.spec import build_spec

    numT = 64
    split_t = 28
    rng = np.random.default_rng(11)
    grid = 0.008 * (1.06 ** np.arange(numT)) - 0.008
    times = list(np.diff(grid))
    tt = np.cumsum([0.0] + times)
    lams = np.stack(
        [1.0 + 0.5 * np.sin(tt * 12.0) * np.exp(-tt * 3),
         1.1 + 0.4 * np.cos(tt * 9.0) * np.exp(-tt * 2)], axis=1)
    sfs = [0.0, *rng.integers(200, 6000, size=7).astype(float)]
    spec = build_spec(times, [list(v) for v in lams], sfs, split_t,
                      [[1, 2, split_t, 0.3, 1]], [], unfolded=True, cpfit=True,
                      smooth=False)
    mode = os.environ.get("MISTI_CORRECTION", "") or None
    lik = build_likelihood(spec, correction_mode=mode)

    rows = []
    for batch in (128, 256, 512, 1024, 2048, 4096, 8192):
        params = np.linspace(0.05, 1.2, batch)[:, None]
        t0 = time.perf_counter()
        out = np.asarray(lik.llh_batch(params))
        compile_s = time.perf_counter() - t0
        n_ok = int(np.isfinite(out).sum())
        # steady state: time enough reps for >= 2 s wall
        reps = 3
        while True:
            t0 = time.perf_counter()
            for _ in range(reps):
                out = lik.llh_batch(params)
            np.asarray(out)
            dt = time.perf_counter() - t0
            if dt > 2.0 or reps >= 3000:
                break
            reps = int(reps * max(2, min(50, 2.5 / max(dt, 1e-3))))
        evals = batch * reps / dt
        rows.append(dict(batch=batch, evals_per_s=round(evals, 1),
                         ms_per_dispatch=round(1e3 * dt / reps, 3),
                         reps=reps, finite=n_ok,
                         first_call_s=round(compile_s, 1)))
        print(rows[-1], flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_scaling.json")
    with open(out_path, "w") as f:
        json.dump({"backend": jax.default_backend(),
                   "workload": "64 intervals, cpfit corrected, 1 mig band",
                   "rows": rows}, f, indent=1)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
