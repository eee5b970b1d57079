#!/usr/bin/env python3
"""Tune the north-star sweep fixture's noise level (CPU, f64).

Round-3's fixture drew every JSFS chunk from ONE multinomial base, so all
101 bootstrap replicates argmaxed the same split index and the Student-t CI
had zero width (SWEEPBENCH_r03.json) -- the CI machinery (the actual
product of the reference's test.bs + bs_conf_int.ipynb) was never
stressed.  This script measures, for candidate (n_seg, dirichlet alpha)
chunk-generation parameters, how bootstrap argmax split indices spread WITH
the migration rate held at truth -- a cheap proxy (no fitting) for the full
sweep's argmax distribution.  Pick parameters giving spread over >= 2-3
adjacent indices, then bake them into make_sweep_fixture.py.
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
FIXDIR = os.path.join(os.path.dirname(HERE), "tests", "fixtures")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from misti_tpu.engine.sweep_fused import build_fused_sweep
from misti_tpu.engine.likelihood import build_likelihood
from misti_tpu.engine.spec import build_spec
from misti_tpu.io import psmc as io_psmc


def main():
    d = io_psmc.read_psmc(os.path.join(FIXDIR, "sweep1.psmc"),
                          os.path.join(FIXDIR, "sweep2.psmc"), 0, -1)
    spec = build_spec(d.times, d.lambdas, [0.0] + [1.0] * 7, 24,
                      [[1, 4, 24, 0.5, 0]], [], unfolded=True, cpfit=True,
                      smooth=False)
    _, aux = build_likelihood(spec).llh_aux(np.zeros(0))
    base = np.asarray(aux["jafs"])
    base = base / base.sum()

    splits = list(range(20, 28))
    fs = build_fused_sweep(d.times, d.lambdas, splits,
                           [[1, 4, "ST", 0.5, 0]], [],
                           cpfit=True, smooth=True, unfolded=True)
    grid = jax.jit(jax.vmap(jax.vmap(fs.llh, in_axes=(0, None, None)),
                            in_axes=(None, None, 0)))
    st_idx = jnp.arange(len(splits))

    n_chunks, n_boot = 200, 60
    for n_seg_mean in (4200, 1000, 400, 150):
        for alpha in (np.inf, 1000.0, 300.0, 100.0):
            rng = np.random.default_rng(7)
            chunks = []
            for _ in range(n_chunks):
                p = base if not np.isfinite(alpha) else rng.dirichlet(alpha * base)
                chunks.append(rng.multinomial(rng.poisson(n_seg_mean), p))
            chunks = np.asarray(chunks, float)
            reps = [chunks.sum(0)]
            for _ in range(n_boot):
                sel = rng.integers(0, n_chunks, n_chunks)
                reps.append(chunks[sel].sum(0))
            reps = np.stack(reps)
            llh = np.asarray(grid(st_idx, np.zeros(0) if fs.n_params == 0
                                  else np.array([0.5]), jnp.asarray(reps)))
            am = llh.argmax(axis=1)
            hist = {splits[i]: int((am == i).sum()) for i in set(am.tolist())}
            gap = np.sort(llh[0])[-1] - np.sort(llh[0])[-2]
            print(f"n_seg={n_seg_mean:5d} alpha={alpha:7.0f}  "
                  f"argmax hist={hist}  full-data gap={gap:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
