#!/usr/bin/env python3
"""On-TPU throughput of the bench workload across correction-kernel budgets.

The fused correction kernel's Jacobi/LM budgets (rounds/iters0/iters_warm)
and the chain expm squaring cap set ~2/3 of the corrected per-eval cost.
This measures steady-state evals/s for candidate budgets on the exact
bench.py workload, and f64-validates each candidate against the sequential
CPU oracle separately (see tests/test_correction_fused.py -- budgets are
baked into defaults only if the oracle suite passes with them).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from misti_tpu.config import setup_platform

setup_platform("default")

import jax

from misti_tpu.engine.likelihood import build_likelihood
from misti_tpu.engine.spec import build_spec


def main():
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
                      [[1, 2, split_t, 0.3, 1]], [], unfolded=True,
                      cpfit=True, smooth=False)
    batch = 4096
    params = np.linspace(0.05, 1.2, batch)[:, None]
    reps = 40

    ref_out = None
    for label, opts in [
        ("default (3/14/4 sq8)", dict()),
        ("sq6", dict(max_squarings=6)),
        ("3/12/4 sq8", dict(rounds=3, iters0=12, iters_warm=4)),
        ("2/14/5 sq8", dict(rounds=2, iters0=14, iters_warm=5)),
    ]:
        lik = build_likelihood(spec, correction_mode="fused-pallas",
                               fused_opts=opts)
        out = np.asarray(lik.llh_batch(params))
        if ref_out is None:
            ref_out = out
        dmax = float(np.nanmax(np.abs(out - ref_out)))
        t0 = time.perf_counter()
        for _ in range(reps):
            o = lik.llh_batch(params)
        np.asarray(o)
        dt = time.perf_counter() - t0
        print(f"{label:22s}: {batch*reps/dt:9.0f} evals/s  "
              f"max|dllh| vs default = {dmax:.2e}  "
              f"finite {int(np.isfinite(out).sum())}/{batch}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
