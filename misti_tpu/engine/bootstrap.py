"""Bootstrap x split-time sweep: the test.bs workflow, on-device.

The reference's benchmark suite (test.bs/*.sh) runs 101 bootstrap
replicates x 8-10 split times x one Nelder-Mead fit each as independent
processes (~7e4 likelihood evaluations, ~3.5 core-hours per scenario).
Here one `sweep()` call does the same work as, per split time, a single
vmapped lockstep Nelder-Mead over all replicates, sharded across the device
mesh; per-replicate llh tables come back as one array and the confidence
interval computation (bs_conf_int.ipynb cells 2-3) is a few lines of numpy.
"""

from __future__ import annotations

import dataclasses
import random
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..dist.mesh import make_mesh, pad_to_multiple, shard_replicates
from ..io.data import Jafs
from ..io.jsfs import bootstrap_jafs
from .likelihood import build_likelihood
from .optimize import nelder_mead
from .spec import build_spec


@dataclasses.dataclass
class SweepResult:
    split_times: np.ndarray  # (S,)
    params: np.ndarray  # (S, B, n) fitted parameters
    llh: np.ndarray  # (S, B) fitted log-likelihoods
    data: np.ndarray  # (B, 7) per-replicate spectra (row 0 = full data)
    nfev: np.ndarray = None  # (S, B) likelihood evaluations per cell


def make_bootstrap_data(jafs: Jafs, n_replicates: int, seed: int = 0) -> np.ndarray:
    """(B+1, 7): row 0 is the summed spectrum, rows 1..B are resamples
    (the utils/generateJSFS_bs.py convention)."""
    rows = [jafs.summed()[1:]]
    rng = random.Random(seed)
    for _ in range(n_replicates):
        rows.append(np.asarray(bootstrap_jafs(jafs, rng=rng)[1:], float))
    return np.stack(rows)


def sweep(
    times: Sequence[float],
    lambdas,
    data: np.ndarray,  # (B, 7) replicate spectra
    split_times: Sequence[float],
    mi_template,  # e.g. [[1, 4, "ST", 0.3, 1]] -- "ST" replaced by split index
    pu_template=(),
    *,
    tol: float = 1e-4,
    mesh=None,
    sample_date: int = 0,
    fused: bool = True,
    **spec_flags,
) -> SweepResult:
    """Fit every (replicate, split time) cell.

    ``mi_template``/``pu_template`` rows may use the string "ST" for the
    migration end column to mean "the split index", as the test.bs scripts
    do with their shell variable.

    ``fused=True`` (default) compiles ONE program with the split time as a
    data index and runs the whole (split x replicate) grid as a single
    sharded lockstep Nelder-Mead; ``fused=False`` compiles one program per
    split time (useful for fractional split times, which the fused path
    does not support).
    """
    data = np.asarray(data, float)
    b = data.shape[0]
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size

    if fused and all(float(st) == int(st) for st in split_times):
        return _sweep_fused(times, lambdas, data, [int(v) for v in split_times],
                            mi_template, pu_template, tol=tol, mesh=mesh,
                            sample_date=sample_date, **spec_flags)
    if fused:
        import sys
        import warnings

        msg = (
            "sweep: fractional split times disable the one-compile fused "
            "grid; compiling one program PER split time instead (on TPU "
            "this costs minutes of compile per split). Use integer split "
            "indices for the fused path."
        )
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
        print(f"WARNING: {msg}", file=sys.stderr)

    all_params = []
    all_llh = []
    for st in split_times:
        mi = [[int(r[0]), int(r[1]), int(st) if r[2] == "ST" else int(r[2]),
               float(r[3]), int(r[4])] for r in mi_template]
        pu = [[int(r[0]), int(r[1]), float(r[2]), int(r[3])] for r in pu_template]
        spec = build_spec(
            list(times), lambdas, [0.0, *data[0]], st, mi, pu,
            sample_date=sample_date, **spec_flags,
        )
        lik = build_likelihood(spec)
        n_par = spec.n_params
        x0 = np.tile(spec.init_params, (b, 1))

        if n_par:
            def fit_one(x0_i, data_i):
                return nelder_mead(
                    lambda p: -lik.llh_data(p, data_i), x0_i, xatol=tol, fatol=tol
                )

            run = jax.jit(jax.vmap(fit_one))
        else:
            def fit_one(x0_i, data_i):
                from .optimize import NMResult

                llh = lik.llh_data(jnp.zeros(0), data_i)
                return NMResult(x=jnp.zeros(0), fun=-llh, nit=jnp.asarray(0),
                                converged=jnp.asarray(True))

            run = jax.jit(jax.vmap(fit_one))

        dpad, orig = pad_to_multiple(data, n_dev, fill=1.0)
        xpad, _ = pad_to_multiple(x0, n_dev)
        with mesh:
            res = run(shard_replicates(mesh, xpad), shard_replicates(mesh, dpad))
        all_params.append(np.asarray(res.x)[:orig])
        all_llh.append(-np.asarray(res.fun)[:orig])

    return SweepResult(
        split_times=np.asarray(list(split_times), float),
        params=np.stack(all_params),
        llh=np.stack(all_llh),
        data=data,
    )


def _sweep_fused(times, lambdas, data, splits, mi_template, pu_template, *,
                 tol, mesh, sample_date, phase1_maxiter=64, bucket=256,
                 maxiter=1000, **spec_flags):
    """One-compile grid sweep via engine.sweep_fused, with straggler
    compaction.

    Lockstep fits pay for the SLOWEST lane every iteration: a few
    non-convergent cells (rate running to the boundary at wrong split
    times) hit maxiter=1000 while the p95 cell converges in <30 iterations
    (SWEEPBENCH_r03.json nfev table).  So the sweep runs in two phases:
    phase 1 gives every cell ``phase1_maxiter`` iterations; the unconverged
    cells are then compacted into ``bucket``-wide batches and resumed from
    their exact NMState to ``maxiter``.  Because Nelder-Mead is Markov in
    (simplex, fsim, it), the two-phase trajectory is identical to an
    uninterrupted run (tests/test_sweep_fused.py pins this).  Even when
    MANY cells resume, sequential ``bucket``-wide chunks cost no more than
    the full-width lockstep they replace (per-iteration cost is mostly
    width-independent overhead).
    """
    from .optimize import NMState
    from .sweep_fused import build_fused_sweep

    fs = build_fused_sweep(
        times, lambdas, splits, mi_template, pu_template,
        sample_date=sample_date, **spec_flags,
    )
    b = data.shape[0]
    n_dev = mesh.devices.size
    n_cells = len(splits) * b
    st_idx = np.repeat(np.arange(len(splits), dtype=np.int32), b)
    cell_data = np.tile(data, (len(splits), 1))
    x0 = np.tile(fs.init_params, (n_cells, 1))

    if fs.n_params:
        def fit_phase1(st_i, x0_i, d_i):
            res, st = nelder_mead(
                lambda p: -fs.llh(st_i, p, d_i), x0_i, xatol=tol, fatol=tol,
                maxiter=min(phase1_maxiter, maxiter), with_state=True,
            )
            return res.x, -res.fun, res.nfev, res.converged, st

        def fit_phase2(st_i, d_i, sim, fsim, it, nfev0):
            st = NMState(sim=sim, fsim=fsim, it=it, nfev=nfev0,
                         aux_sum=jnp.zeros(0, sim.dtype))
            res = nelder_mead(
                lambda p: -fs.llh(st_i, p, d_i),
                jnp.zeros(fs.n_params, sim.dtype), xatol=tol, fatol=tol,
                maxiter=maxiter, state0=st,
            )
            return res.x, -res.fun, res.nfev
    else:
        def fit_phase1(st_i, x0_i, d_i):
            llh = fs.llh(st_i, jnp.zeros(0), d_i)
            return (jnp.zeros(0), llh, jnp.asarray(1), jnp.asarray(True),
                    NMState(sim=jnp.zeros((1, 0)), fsim=-llh[None],
                            it=jnp.asarray(0), nfev=jnp.asarray(1),
                            aux_sum=jnp.zeros(0)))

    import sys
    import time

    run1 = jax.jit(jax.vmap(fit_phase1))
    sp, orig = pad_to_multiple(st_idx, n_dev)
    dp, _ = pad_to_multiple(cell_data, n_dev, fill=1.0)
    xp, _ = pad_to_multiple(x0, n_dev)
    t0 = time.perf_counter()
    with mesh:
        x, llh, nfev, conv, states = run1(
            shard_replicates(mesh, sp),
            shard_replicates(mesh, xp),
            shard_replicates(mesh, dp),
        )
    x = np.array(x)[:orig]
    llh = np.array(llh)[:orig]
    nfev = np.array(nfev)[:orig]
    conv = np.asarray(conv)[:orig]

    print(f"# sweep phase 1: {orig} cells, {time.perf_counter() - t0:.1f} s "
          f"(incl any compile), unconverged {int((~conv).sum())}",
          file=sys.stderr)
    t0 = time.perf_counter()

    todo = np.flatnonzero(~conv)
    if fs.n_params and todo.size and phase1_maxiter < maxiter:
        run2 = jax.jit(jax.vmap(fit_phase2))
        sim_all = np.asarray(states.sim)
        fsim_all = np.asarray(states.fsim)
        it_all = np.asarray(states.it)
        nfev_all = np.asarray(states.nfev)
        bucket = max(int(bucket), n_dev)
        bucket = -(-bucket // n_dev) * n_dev
        for k in range(0, todo.size, bucket):
            chunk = todo[k : k + bucket]
            idx = np.concatenate(
                [chunk, np.full(bucket - chunk.size, chunk[0], chunk.dtype)]
            )
            with mesh:
                x2, llh2, nfev2 = run2(
                    shard_replicates(mesh, sp[idx]),
                    shard_replicates(mesh, dp[idx]),
                    shard_replicates(mesh, sim_all[idx]),
                    shard_replicates(mesh, fsim_all[idx]),
                    shard_replicates(mesh, it_all[idx]),
                    shard_replicates(mesh, nfev_all[idx]),
                )
            m = chunk.size
            x[chunk] = np.asarray(x2)[:m]
            llh[chunk] = np.asarray(llh2)[:m]
            nfev[chunk] = np.asarray(nfev2)[:m]
        print(f"# sweep phase 2: {todo.size} resumed cells, "
              f"{time.perf_counter() - t0:.1f} s", file=sys.stderr)

    return SweepResult(
        split_times=np.asarray(splits, float),
        params=x.reshape(len(splits), b, -1),
        llh=llh.reshape(len(splits), b),
        data=data,
        nfev=nfev.reshape(len(splits), b),
    )


def split_time_confidence_interval(
    result: SweepResult, times: Sequence[float], scale_time: float = 1.0,
    level: float = 0.975,
):
    """Argmax-llh split time per replicate -> Student-t CI in generations
    (the bs_conf_int.ipynb computation)."""
    from scipy import stats

    best = result.llh.argmax(axis=0)  # (B,) index into split_times
    st_idx = result.split_times[best]
    cum = np.concatenate([[0.0], np.cumsum(np.asarray(times, float))])
    gens = np.array([cum[int(np.ceil(s))] for s in st_idx]) * scale_time
    mean = gens.mean()
    se = gens.std(ddof=1) / np.sqrt(len(gens)) if len(gens) > 1 else 0.0
    tcrit = stats.t.ppf(level, df=max(len(gens) - 1, 1))
    return {
        "best_split_idx": st_idx,
        "split_gens": gens,
        "mean": mean,
        "ci": (mean - tcrit * se, mean + tcrit * se),
        "level": level,
    }
