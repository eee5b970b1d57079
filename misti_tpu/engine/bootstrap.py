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
import os
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
    stage_caps: Sequence[int] = (16, 32, 64, 128, 256),
    bucket: Optional[int] = None,
    maxiter: int = 1000,
    phase1_maxiter: Optional[int] = None,
    prog_cache: Optional[dict] = None,
    **spec_flags,
) -> SweepResult:
    """Fit every (replicate, split time) cell.

    ``mi_template``/``pu_template`` rows may use the string "ST" for the
    migration end column to mean "the split index", as the test.bs scripts
    do with their shell variable.

    ``fused=True`` (default) compiles ONE program with the split time as a
    data index and runs the whole (split x replicate) grid as a single
    sharded lockstep Nelder-Mead; fractional split times are supported
    (each lane's containing interval is pre-split on the host, the same
    preprocessing as build_spec).  ``fused=False`` compiles one program
    per split time (the validation path).

    ``stage_caps``/``bucket``/``maxiter`` tune the fused path's straggler
    compaction (see `_sweep_fused`); they are explicit parameters (not
    ``spec_flags``) so the per-split fallback never forwards them to
    ``build_spec``.  ``phase1_maxiter`` is the round-3 back-compat alias
    for a single-stage schedule ``(phase1_maxiter,)``.
    """
    data = np.asarray(data, float)
    b = data.shape[0]
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size

    if fused:
        return _sweep_fused(times, lambdas, data,
                            [float(v) for v in split_times],
                            mi_template, pu_template, tol=tol, mesh=mesh,
                            sample_date=sample_date, stage_caps=stage_caps,
                            bucket=bucket, maxiter=maxiter,
                            phase1_maxiter=phase1_maxiter,
                            prog_cache=prog_cache, **spec_flags)

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


def _snap_width(n: int, n_dev: int, width0: int, bucket: Optional[int]) -> int:
    """Launch width for a compaction stage: the smallest power-of-two
    multiple of the device count that fits ``n`` lanes (so distinct widths
    -- and therefore XLA compiles -- stay O(log) across stages and reruns
    hit the persistent compile cache), clamped to the full-grid width and
    to an optional ``bucket`` chunk cap."""
    per_dev = -(-n // n_dev)
    w = n_dev * (1 << max(0, (per_dev - 1).bit_length()))
    w = min(w, -(-width0 // n_dev) * n_dev)
    if bucket is not None:
        w = min(w, max(-(-int(bucket) // n_dev) * n_dev, n_dev))
    return max(w, n_dev)


def _sweep_fused(times, lambdas, data, splits, mi_template, pu_template, *,
                 tol, mesh, sample_date, stage_caps=(16, 32, 64, 128, 256),
                 bucket=None, maxiter=1000, phase1_maxiter=None,
                 prog_cache=None, **spec_flags):
    """One-compile grid sweep via engine.sweep_fused, with MULTI-STAGE
    straggler compaction.

    Lockstep fits pay for the SLOWEST lane every iteration: a few
    non-convergent cells (rate running to the boundary at wrong split
    times) hit maxiter=1000 while the median cell converges in ~21
    iterations (SWEEPBENCH_r03.json nfev table) -- a single full-width
    lockstep run wastes ~98% of its evaluated points on frozen lanes.  So
    the sweep runs a stage schedule: every cell gets ``stage_caps[0]``
    iterations at full width; after each stage the still-unconverged cells
    are compacted into a power-of-two-wide batch (see `_snap_width`) and
    resumed from their exact NMState to the next cap, until the final stage
    runs the surviving stragglers to ``maxiter``.  Because Nelder-Mead is
    Markov in (simplex, fsim, it), the staged trajectory is identical to an
    uninterrupted run (tests/test_sweep_fused.py pins this).  The per-stage
    iteration cap is a TRACED scalar, so all stages of one width share a
    single compiled program.

    ``phase1_maxiter`` (round-3 API) overrides the schedule with the single
    stage ``(phase1_maxiter,)``; ``bucket`` optionally caps the compacted
    launch width (chunks run sequentially).

    On single-process meshes (any device count) the stage programs go
    through the AOT export cache (engine/aot.py): warm CLI reruns of the
    same scenario deserialize the traced programs instead of re-tracing
    them -- tracing is the dominant warm cost (~20-40 s per program shape
    vs ~2 s of device compute for a whole 808-cell grid,
    scripts/tpu_probe_sweep.py).  Disable with ``MISTI_AOT=0``.
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

    if phase1_maxiter is not None:
        stage_caps = (int(phase1_maxiter),)
    caps = sorted({int(c) for c in stage_caps if 0 < int(c) < maxiter})
    caps.append(int(maxiter))

    # the per-scenario tables are TRACED arguments (fs.llh_t): two
    # scenarios whose fs.shape_key match run the SAME compiled program,
    # so a resident scenario matrix (sweep_many) pays tracing/compile once
    if fs.n_params:
        def fit_start(cap, st_i, x0_i, d_i, tables):
            res, st = nelder_mead(
                lambda p: -fs.llh_t(st_i, p, d_i, tables), x0_i,
                xatol=tol, fatol=tol, maxiter=cap, with_state=True,
            )
            return res.x, -res.fun, res.nfev, res.converged, st

        def fit_resume(cap, st_i, d_i, sim, fsim, it, nfev0, tables):
            st = NMState(sim=sim, fsim=fsim, it=it, nfev=nfev0,
                         aux_sum=jnp.zeros(0, sim.dtype))
            res, stn = nelder_mead(
                lambda p: -fs.llh_t(st_i, p, d_i, tables),
                jnp.zeros(fs.n_params, sim.dtype), xatol=tol, fatol=tol,
                maxiter=cap, state0=st, with_state=True,
            )
            return res.x, -res.fun, res.nfev, res.converged, stn
    else:
        def fit_start(cap, st_i, x0_i, d_i, tables):
            llh = fs.llh_t(st_i, jnp.zeros(0), d_i, tables)
            return (jnp.zeros(0), llh, jnp.asarray(1), jnp.asarray(True),
                    NMState(sim=jnp.zeros((1, 0)), fsim=-llh[None],
                            it=jnp.asarray(0), nfev=jnp.asarray(1),
                            aux_sum=jnp.zeros(0)))

    import sys
    import time

    from .aot import CachedProgram, aot_enabled, scenario_key

    # multi-host: the stage scheduler is host logic over the full result
    # tables, so outputs are REPLICATED across processes (every process
    # then takes identical compaction decisions -- collective-safe)
    multiproc = jax.process_count() > 1
    out_shard = None
    if multiproc:
        from jax.sharding import NamedSharding, PartitionSpec

        out_shard = NamedSharding(mesh, PartitionSpec())

    # program reuse: keyed by the fused sweep's static structure (NOT the
    # scenario's numeric tables, which are traced arguments) -- a resident
    # scenario matrix (sweep_many) hits this cache in-process, and the AOT
    # export layer persists the same programs across processes under the
    # same key.  Multi-host AOT stays excluded: exporting works (2-process
    # CPU sweeps export and match bitwise), but warm processes SIGSEGV
    # deserializing the mid-sized modules on XLA:CPU -- the jaxlib
    # roundtrip bug documented in aot.aot_enabled -- and multi-host TPU
    # cannot be exercised here.
    use_aot = aot_enabled() and not multiproc
    skey = scenario_key(fs.shape_key, tol, fs.n_params, n_dev, multiproc)
    cached = None if prog_cache is None else prog_cache.get(skey)
    if cached is not None:
        run_start, run_resume = cached
    else:
        run_start = jax.jit(jax.vmap(fit_start, in_axes=(None, 0, 0, 0, None)),
                            out_shardings=out_shard)
        if use_aot:
            run_start = CachedProgram(run_start, "sweep-start-" + skey,
                                      verbose=True)
        run_resume = None
        if fs.n_params:
            run_resume = jax.jit(
                jax.vmap(fit_resume, in_axes=(None, 0, 0, 0, 0, 0, 0, None)),
                out_shardings=out_shard,
            )
            if use_aot:
                run_resume = CachedProgram(run_resume, "sweep-resume-" + skey,
                                           verbose=True)
        if prog_cache is not None:
            prog_cache[skey] = (run_start, run_resume)
    # host numpy, NOT device_put: jit treats numpy inputs as replicated,
    # which is also the multi-controller-safe convention (a locally
    # committed jax.Array would clash with the global mesh in 2-process
    # sweeps, test_distributed.py)
    tables = dict(fs.tables)
    sp, orig = pad_to_multiple(st_idx, n_dev)
    dp, _ = pad_to_multiple(cell_data, n_dev, fill=1.0)
    xp, _ = pad_to_multiple(x0, n_dev)
    width0 = sp.shape[0]
    t0 = time.perf_counter()
    with mesh:
        x, llh, nfev, conv, states = run_start(
            jnp.asarray(caps[0]),
            shard_replicates(mesh, sp),
            shard_replicates(mesh, xp),
            shard_replicates(mesh, dp),
            tables,
        )
    x = np.array(x)[:orig]
    llh = np.array(llh)[:orig]
    nfev = np.array(nfev)[:orig]
    conv = np.array(conv)[:orig]

    print(f"# sweep stage 1/{len(caps)}: {orig} cells to cap {caps[0]}, "
          f"{time.perf_counter() - t0:.1f} s (incl any compile), "
          f"unconverged {int((~conv).sum())}", file=sys.stderr)

    if fs.n_params and len(caps) > 1:
        sim_all = np.array(states.sim)[:orig]
        fsim_all = np.array(states.fsim)[:orig]
        it_all = np.array(states.it)[:orig]
        nfev_all = np.array(states.nfev)[:orig]
        for si, cap in enumerate(caps[1:], start=2):
            todo = np.flatnonzero(~conv)
            if todo.size == 0:
                break
            t0 = time.perf_counter()
            width = _snap_width(todo.size, n_dev, width0, bucket)
            for k in range(0, todo.size, width):
                chunk = todo[k : k + width]
                idx = np.concatenate(
                    [chunk, np.full(width - chunk.size, chunk[0], chunk.dtype)]
                )
                with mesh:
                    x2, llh2, nfev2, conv2, st2 = run_resume(
                        jnp.asarray(cap),
                        shard_replicates(mesh, sp[idx]),
                        shard_replicates(mesh, dp[idx]),
                        shard_replicates(mesh, sim_all[idx]),
                        shard_replicates(mesh, fsim_all[idx]),
                        shard_replicates(mesh, it_all[idx]),
                        shard_replicates(mesh, nfev_all[idx]),
                        tables,
                    )
                m = chunk.size
                x[chunk] = np.asarray(x2)[:m]
                llh[chunk] = np.asarray(llh2)[:m]
                nfev[chunk] = np.asarray(nfev2)[:m]
                conv[chunk] = np.asarray(conv2)[:m]
                sim_all[chunk] = np.asarray(st2.sim)[:m]
                fsim_all[chunk] = np.asarray(st2.fsim)[:m]
                it_all[chunk] = np.asarray(st2.it)[:m]
                nfev_all[chunk] = np.asarray(st2.nfev)[:m]
            print(f"# sweep stage {si}/{len(caps)}: {todo.size} cells "
                  f"resumed to cap {cap} at width {width}, "
                  f"{time.perf_counter() - t0:.1f} s, "
                  f"unconverged {int((~conv).sum())}", file=sys.stderr)

    return SweepResult(
        split_times=np.asarray(splits, float),
        params=x.reshape(len(splits), b, -1),
        llh=llh.reshape(len(splits), b),
        data=data,
        nfev=nfev.reshape(len(splits), b),
    )


def sweep_many(
    scenarios: Sequence[dict],
    *,
    tol: float = 1e-4,
    mesh=None,
    stage_caps: Sequence[int] = (16, 32, 64, 128, 256),
    bucket: Optional[int] = None,
    maxiter: int = 1000,
    prog_cache: Optional[dict] = None,
) -> dict:
    """Run a MATRIX of sweep scenarios resident in one process.

    The reference's benchmark suite is 16 shell scripts -- 4 genome pairs x
    4 migration scenarios (test.bs/) -- each paying full process + compile
    cost.  Here every scenario's numeric tables (psmc grids, rates, data,
    templates) are TRACED arguments of one shared fused-sweep program
    (engine/sweep_fused.py `llh_t`), so scenarios whose grid SHAPES and
    static flags match (`FusedSweep.shape_key`) reuse the same compiled
    stage programs: the whole matrix pays tracing/compilation once and each
    additional scenario costs only device compute.

    Each ``scenarios`` entry is a dict:
      name: str
      times, lambdas: the merged PSMC grid (io/psmc.py ReadPSMC output)
      data: (B, 7) replicate spectra (make_bootstrap_data)
      splits: sequence of split times
      mi_template / pu_template: as in `sweep` ("ST" placeholders allowed)
      sample_date: int (default 0)
      any further keys are spec flags (cpfit, smooth, unfolded, correct...)

    Returns {name: SweepResult}; pass ``prog_cache={}`` to inspect program
    reuse (one entry per distinct shape signature).
    """
    mesh = mesh or make_mesh()
    if prog_cache is None:
        prog_cache = {}
    results = {}
    for sc in scenarios:
        sc = dict(sc)
        name = sc.pop("name")
        results[name] = sweep(
            sc.pop("times"), sc.pop("lambdas"), np.asarray(sc.pop("data"), float),
            sc.pop("splits"), sc.pop("mi_template", ()),
            sc.pop("pu_template", ()),
            tol=tol, mesh=mesh, sample_date=int(sc.pop("sample_date", 0)),
            stage_caps=stage_caps, bucket=bucket, maxiter=maxiter,
            prog_cache=prog_cache, **sc,
        )
    return results


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
