#!/usr/bin/env python3
"""Controlled on-TPU timing of the north-star sweep's component programs.

Separates (per shape) trace+compile time from steady-state execution so
stage-schedule decisions are based on real per-iteration costs, not
tunnel-load noise: the fused llh batch, the lockstep-NM start program, and
the NMState-resume program are each timed with in-process repeats.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from misti_tpu.config import setup_platform

setup_platform("default")

import jax
import jax.numpy as jnp

from misti_tpu.engine.bootstrap import make_bootstrap_data
from misti_tpu.engine.optimize import NMState, nelder_mead
from misti_tpu.engine.sweep_fused import build_fused_sweep
from misti_tpu.io import jsfs as io_jsfs
from misti_tpu.io import psmc as io_psmc

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


def timed(fn, *args, reps=3):
    outs = None
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = fn(*args)
        jax.block_until_ready(outs)
        ts.append(time.perf_counter() - t0)
    return outs, ts


def main():
    print("backend:", jax.default_backend(), flush=True)
    d = io_psmc.read_psmc(FIX + "/sweep1.psmc", FIX + "/sweep2.psmc", 0, -1)
    jafs = io_jsfs.read_jafs(FIX + "/sweep.jsfs")
    data = make_bootstrap_data(jafs, 100, seed=0)
    splits = list(range(20, 28))
    fs = build_fused_sweep(d.times, d.lambdas, splits, [[1, 4, "ST", 3, 1]],
                           [], cpfit=True, smooth=True, unfolded=True)
    b = data.shape[0]
    n_cells = len(splits) * b
    st_idx = np.repeat(np.arange(len(splits), dtype=np.int32), b)
    cell_data = np.tile(data, (len(splits), 1)).astype(np.float32)
    x0 = np.tile(fs.init_params, (n_cells, 1)).astype(np.float32)
    print(f"cells={n_cells}", flush=True)

    # 1) raw llh batch at simplex width (6 points per cell)
    wide_st = np.repeat(st_idx, 6)
    wide_p = np.tile(np.linspace(0.2, 3.0, 6, dtype=np.float32)[:, None],
                     (n_cells, 1))
    wide_d = np.repeat(cell_data, 6, axis=0)
    llh_b = jax.jit(jax.vmap(fs.llh))
    t0 = time.perf_counter()
    out = llh_b(wide_st, wide_p, wide_d)
    jax.block_until_ready(out)
    print(f"llh batch {wide_st.shape[0]}: first call {time.perf_counter()-t0:.1f} s",
          flush=True)
    _, ts = timed(llh_b, wide_st, wide_p, wide_d, reps=5)
    print(f"llh batch steady: {['%.3f' % t for t in ts]} s "
          f"-> {wide_st.shape[0]/min(ts):.0f} evals/s", flush=True)

    # 2) start program (cap traced)
    def fit_start(cap, st_i, x0_i, d_i):
        res, st = nelder_mead(lambda p: -fs.llh(st_i, p, d_i), x0_i,
                              xatol=1e-4, fatol=1e-4, maxiter=cap,
                              with_state=True)
        return res.x, -res.fun, res.nfev, res.converged, st

    run_start = jax.jit(jax.vmap(fit_start, in_axes=(None, 0, 0, 0)))
    t0 = time.perf_counter()
    outs = run_start(jnp.asarray(16), st_idx, x0, cell_data)
    jax.block_until_ready(outs)
    print(f"start cap16 w{n_cells}: first call {time.perf_counter()-t0:.1f} s",
          flush=True)
    for cap in (16, 32):
        outs, ts = timed(run_start, jnp.asarray(cap), st_idx, x0, cell_data)
        nconv = int(np.asarray(outs[3]).sum())
        print(f"start cap{cap} w{n_cells} steady: {['%.2f' % t for t in ts]} s "
              f"({min(ts)/cap*1e3:.0f} ms/iter), converged {nconv}", flush=True)
    states = outs[4]

    # 3) resume program at full width (iters 16 -> 32)
    def fit_resume(cap, st_i, d_i, sim, fsim, it, nfev0):
        st = NMState(sim=sim, fsim=fsim, it=it, nfev=nfev0,
                     aux_sum=jnp.zeros(0, sim.dtype))
        res, stn = nelder_mead(lambda p: -fs.llh(st_i, p, d_i),
                               jnp.zeros(fs.n_params, sim.dtype),
                               xatol=1e-4, fatol=1e-4, maxiter=cap,
                               state0=st, with_state=True)
        return res.x, -res.fun, res.nfev, res.converged, stn

    run_resume = jax.jit(jax.vmap(fit_resume, in_axes=(None, 0, 0, 0, 0, 0, 0)))
    outs16, _ = timed(run_start, jnp.asarray(16), st_idx, x0, cell_data, reps=1)
    s16 = outs16[4]
    args = (jnp.asarray(32), st_idx, cell_data, s16.sim, s16.fsim, s16.it,
            s16.nfev)
    t0 = time.perf_counter()
    outs = run_resume(*args)
    jax.block_until_ready(outs)
    print(f"resume 16->32 w{n_cells}: first call {time.perf_counter()-t0:.1f} s",
          flush=True)
    _, ts = timed(run_resume, *args)
    print(f"resume 16->32 w{n_cells} steady: {['%.2f' % t for t in ts]} s "
          f"({min(ts)/16*1e3:.0f} ms/iter)", flush=True)

    # 4) resume at width 32 (the tail shape)
    todo = np.flatnonzero(~np.asarray(outs16[3]))[:32]
    idx = np.concatenate([todo, np.full(32 - todo.size, todo[0], todo.dtype)])
    args32 = (jnp.asarray(1000), st_idx[idx], cell_data[idx],
              np.asarray(s16.sim)[idx], np.asarray(s16.fsim)[idx],
              np.asarray(s16.it)[idx], np.asarray(s16.nfev)[idx])
    t0 = time.perf_counter()
    outs = run_resume(*args32)
    jax.block_until_ready(outs)
    print(f"resume w32 cap1000: first call {time.perf_counter()-t0:.1f} s",
          flush=True)
    _, ts = timed(run_resume, *args32)
    nit = int(np.asarray(outs[4].it).max()) - 16
    print(f"resume w32 cap1000 steady: {['%.2f' % t for t in ts]} s over "
          f"{nit} iters ({min(ts)/max(nit,1)*1e3:.1f} ms/iter)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
