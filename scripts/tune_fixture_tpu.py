#!/usr/bin/env python3
"""Pick the sweep-fixture noise draw whose FITTED bootstrap CI covers the
true split.

The CPU proxy (tune_sweep_fixture.py) holds the migration rate at truth;
with fitted rates the argmax distribution shifts, so the final choice must
be made on the full fitted sweep.  This script builds the fused-sweep
programs ONCE (the dominant cost is tracing, see tpu_probe_sweep.py) and
then scans (alpha, chunk-seed) candidates by swapping data only, running
the exact CLI bootstrap path (make_bootstrap_data, seed 0) and reporting
each candidate's full-data argmax, replicate argmax histogram, and CI.
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

from misti_tpu.engine.bootstrap import (SweepResult, make_bootstrap_data,
                                        split_time_confidence_interval)
from misti_tpu.engine.likelihood import build_likelihood
from misti_tpu.engine.optimize import NMState, nelder_mead
from misti_tpu.engine.spec import build_spec
from misti_tpu.engine.sweep_fused import build_fused_sweep
from misti_tpu.io.data import Jafs
from misti_tpu.io import psmc as io_psmc

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")
TRUE_SPLIT = 24
BS = 100


def make_chunks(base, alpha, seed):
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(200):
        length = int(rng.uniform(0.8, 1.2) * 13_500_000)
        n_seg = rng.poisson(4200)
        counts = rng.multinomial(n_seg, rng.dirichlet(alpha * base))
        rows.append([length, *counts])
    return rows


def make_chunks_split_jitter(split_specs, weights, seed, n_seg_mean=4200,
                             dir_alpha=None):
    """Per-chunk SPLIT heterogeneity: chunk spectra come from the model at
    split index 23/24/25 with probabilities (w, 1-2w, w) -- different
    genomic regions have different realized divergence, which is exactly
    the chunk-level variation the bootstrap resamples.  The mixture is
    symmetric around the true split, so the fitted full-data argmax stays
    at 24 while replicate argmaxes genuinely spread."""
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(200):
        length = int(rng.uniform(0.8, 1.2) * 13_500_000)
        n_seg = rng.poisson(n_seg_mean)
        k = rng.choice(3, p=list(weights))
        p = split_specs[k]
        if dir_alpha is not None:
            p = rng.dirichlet(dir_alpha * p)
        counts = rng.multinomial(n_seg, p)
        rows.append([length, *counts])
    return rows


def make_chunks_rate_jitter(rate_specs, sigma, seed, true_rate=0.5):
    """Model-consistent chunk heterogeneity: each chunk's category
    probabilities come from the GENERATING model at a chunk-specific
    migration rate (local genealogical variation), so the average spectrum
    stays on the model manifold and the fitted split is unbiased --
    unlike Dirichlet noise on the categories, which is misspecification
    the split estimate absorbs as bias."""
    rates, specs = rate_specs
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(200):
        length = int(rng.uniform(0.8, 1.2) * 13_500_000)
        n_seg = rng.poisson(4200)
        r = max(0.0, rng.normal(true_rate, sigma))
        p = specs[np.argmin(np.abs(rates - r))]
        counts = rng.multinomial(n_seg, p)
        rows.append([length, *counts])
    return rows


def main():
    d = io_psmc.read_psmc(FIX + "/sweep1.psmc", FIX + "/sweep2.psmc", 0, -1)
    spec = build_spec(d.times, d.lambdas, [0.0] + [1.0] * 7, TRUE_SPLIT,
                      [[1, 4, TRUE_SPLIT, 0.5, 0]], [], unfolded=True,
                      cpfit=True, smooth=False)
    _, aux = build_likelihood(spec).llh_aux(np.zeros(0))
    base = np.array(aux["jafs"])
    base /= base.sum()

    splits = list(range(20, 28))
    fs = build_fused_sweep(d.times, d.lambdas, splits, [[1, 4, "ST", 3, 1]],
                           [], cpfit=True, smooth=True, unfolded=True)
    n_cells = len(splits) * (BS + 1)
    st_idx = np.repeat(np.arange(len(splits), dtype=np.int32), BS + 1)
    x0 = np.tile(fs.init_params, (n_cells, 1)).astype(np.float32)

    def fit_start(cap, st_i, x0_i, d_i):
        res, st = nelder_mead(lambda p: -fs.llh(st_i, p, d_i), x0_i,
                              xatol=1e-4, fatol=1e-4, maxiter=cap,
                              with_state=True)
        return res.x, -res.fun, res.converged, st

    def fit_resume(cap, st_i, d_i, sim, fsim, it, nfev0):
        st = NMState(sim=sim, fsim=fsim, it=it, nfev=nfev0,
                     aux_sum=jnp.zeros(0, sim.dtype))
        res = nelder_mead(lambda p: -fs.llh(st_i, p, d_i),
                          jnp.zeros(fs.n_params, sim.dtype),
                          xatol=1e-4, fatol=1e-4, maxiter=cap, state0=st)
        return res.x, -res.fun

    run_start = jax.jit(jax.vmap(fit_start, in_axes=(None, 0, 0, 0)))
    run_resume = jax.jit(jax.vmap(fit_resume, in_axes=(None, 0, 0, 0, 0, 0, 0)))
    W_TAIL = 64

    # model spectra over a migration-rate grid (for rate-jitter chunks)
    spec_opt = build_spec(d.times, d.lambdas, [0.0] + [1.0] * 7, TRUE_SPLIT,
                          [[1, 4, TRUE_SPLIT, 0.5, 1]], [], unfolded=True,
                          cpfit=True, smooth=False)
    lik_opt = build_likelihood(spec_opt)
    rate_grid = np.linspace(0.0, 2.0, 81)
    specs = []
    for r in rate_grid:
        _, a = lik_opt.llh_aux(np.array([r]))
        p = np.array(a["jafs"], float)
        specs.append(p / p.sum())
    rate_specs = (rate_grid, np.stack(specs))
    print("# rate-grid spectra ready", flush=True)

    # model spectra at neighbouring split indices (rate fixed at truth)
    split_specs = []
    for s_idx in (TRUE_SPLIT - 1, TRUE_SPLIT, TRUE_SPLIT + 1):
        sp_s = build_spec(d.times, d.lambdas, [0.0] + [1.0] * 7, s_idx,
                          [[1, 4, s_idx, 0.5, 0]], [], unfolded=True,
                          cpfit=True, smooth=False)
        _, a = build_likelihood(sp_s).llh_aux(np.zeros(0))
        p = np.array(a["jafs"], float)
        split_specs.append(p / p.sum())
    split_specs = np.stack(split_specs)

    candidates = [
        ("split", ((0.45, 0.1, 0.45), 600, da), s)
        for da in (100.0, 200.0, 400.0) for s in (7, 11, 13, 17)
    ]
    for mode, alpha, seed in candidates:
        jafs = Jafs()
        mk = (make_chunks(base, alpha, seed) if mode == "dir" else
              make_chunks_rate_jitter(rate_specs, alpha, seed)
              if mode == "jit" else
              make_chunks_split_jitter(split_specs, alpha[0], seed,
                                       n_seg_mean=alpha[1],
                                       dir_alpha=alpha[2]))
        jafs.jafs = [[float(v) for v in r] for r in mk]
        data = make_bootstrap_data(jafs, BS, seed=0)
        cell_data = np.tile(data, (len(splits), 1)).astype(np.float32)
        t0 = time.perf_counter()
        x, llh, conv, states = run_start(jnp.asarray(64), st_idx, x0,
                                         cell_data)
        x = np.array(x)
        llh = np.array(llh)
        conv = np.array(conv)
        todo = np.flatnonzero(~conv)
        sim = np.array(states.sim)
        fsim = np.array(states.fsim)
        itc = np.array(states.it)
        nf = np.array(states.nfev)
        for k in range(0, todo.size, W_TAIL):
            chunk = todo[k : k + W_TAIL]
            idx = np.concatenate([chunk, np.full(W_TAIL - chunk.size,
                                                 chunk[0], chunk.dtype)])
            x2, llh2 = run_resume(jnp.asarray(1000), st_idx[idx],
                                  cell_data[idx], sim[idx], fsim[idx],
                                  itc[idx], nf[idx])
            x[chunk] = np.asarray(x2)[:chunk.size]
            llh[chunk] = np.asarray(llh2)[:chunk.size]
        res = SweepResult(
            split_times=np.asarray(splits, float),
            params=x.reshape(len(splits), BS + 1, -1),
            llh=llh.reshape(len(splits), BS + 1),
            data=data,
        )
        ci = split_time_confidence_interval(res, d.times, d.scale_time)
        am = res.llh.argmax(axis=0)
        hist = {splits[i]: int((am == i).sum())
                for i in sorted(set(am.tolist()))}
        cum = np.concatenate([[0.0], np.cumsum(d.times)])
        true_gens = cum[TRUE_SPLIT] * d.scale_time
        lo, hi = ci["ci"]
        ok = lo <= true_gens <= hi and hi > lo
        print(f"{mode} par={alpha} seed={seed:3d}  full-data "
              f"argmax={splits[am[0]]}  hist={hist}  "
              f"CI=({lo:.1f},{hi:.1f}) true={true_gens:.1f} "
              f"{'OK' if ok else 'no'}  [{time.perf_counter()-t0:.0f} s]",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
