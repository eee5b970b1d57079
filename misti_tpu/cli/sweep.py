"""Bootstrap x split-time sweep CLI: the on-device test.bs workflow.

One invocation replaces the reference's nested bash loops
(test.bs/han_fre.bs.sh:29-37: `for bs in {0..100}; for st in {10..17}:
MiSTI.py ... -bs $bs` under GNU Parallel, ~3.5 core-hours) with lockstep
vmapped Nelder-Mead fits sharded over the device mesh, and replaces the
grep/awk + notebook post-processing with a results table + Student-t
confidence interval printed directly.

Usage:
    python -m misti_tpu.cli.sweep <fpsmc1> <fpsmc2> <fjafs> \
        --splits 10 17 -bs 100 -mi 1 4 ST 3 1 -uf [--cpfit] -o out.npz

Migration/pulse templates accept the literal ``ST`` for the split index,
like the shell variable in the reference scripts.  Output: the same
greppable per-cell lines (`bs_id = ... splitT = ... llh = ...`), an .npz
results table, and the split-time CI.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Bootstrap x split-time sweep (test.bs workflow on device)."
    )
    p.add_argument("fpsmc1")
    p.add_argument("fpsmc2")
    p.add_argument("fjafs", help="JSFS file with chunk rows (for bootstrap)")
    p.add_argument("--splits", nargs=2, type=float, required=True,
                   metavar=("FIRST", "LAST"),
                   help="inclusive split-time index range")
    p.add_argument("-bs", "--bsSize", type=int, default=100,
                   help="number of bootstrap replicates (plus the full data row)")
    p.add_argument("-mi", nargs=5, action="append", default=None,
                   help="migration template: srcPop start end|ST rate fixed/opt")
    p.add_argument("-pu", nargs=4, action="append", default=None,
                   help="pulse template: srcPop time rate fixed/opt")
    p.add_argument("-tol", type=float, default=1e-4)
    p.add_argument("-uf", action="store_true", help="unfolded spectrum")
    p.add_argument("--cpfit", action="store_true")
    p.add_argument("--nosmooth", action="store_true")
    p.add_argument("--trueEPS", action="store_true")
    p.add_argument("--sdate", type=float, default=0)
    p.add_argument("-rd", type=int, default=-1)
    p.add_argument("--funits", type=str, default="setunits.txt")
    p.add_argument("--seed", type=int, default=0, help="bootstrap seed")
    p.add_argument("-o", "--fout", default="", help="output .npz results table")
    p.add_argument("--platform", default=None, help="cpu | tpu | default")
    p.add_argument("--profile", default="", help="jax profiler trace directory")
    p.add_argument("--stages", nargs="+", type=int, default=None,
                   metavar="CAP",
                   help="straggler-compaction iteration caps (default "
                        "16 32 64 128 256; the final stage always runs to "
                        "--maxiter)")
    p.add_argument("--maxiter", type=int, default=1000,
                   help="Nelder-Mead iteration budget per fit")
    return p


def main(argv=None) -> int:
    clargs = make_parser().parse_args(argv)

    from ..config import setup_platform

    setup_platform(clargs.platform or "default")

    import numpy as np

    from ..engine.bootstrap import (
        make_bootstrap_data,
        split_time_confidence_interval,
        sweep,
    )
    from ..io import jsfs as io_jsfs
    from ..io import psmc as io_psmc
    from ..io.units import Units

    Units.set_units_from_file(clargs.funits)
    Units.print_units()

    data_jafs = io_jsfs.read_jafs(clargs.fjafs)
    input_data = io_psmc.read_psmc(clargs.fpsmc1, clargs.fpsmc2, clargs.sdate,
                                   clargs.rd)

    data = make_bootstrap_data(data_jafs, clargs.bsSize, seed=clargs.seed)
    splits = [float(v) for v in
              np.arange(clargs.splits[0], clargs.splits[1] + 1)]
    mi_t = [list(r) for r in (clargs.mi or [])]
    pu_t = clargs.pu or []

    t0 = time.time()
    ctx = None
    if clargs.profile:
        import jax

        ctx = jax.profiler.trace(clargs.profile)
        ctx.__enter__()
    stage_kw = {} if clargs.stages is None else {
        "stage_caps": tuple(clargs.stages)
    }
    res = sweep(
        input_data.times, input_data.lambdas, data, splits, mi_t, pu_t,
        tol=clargs.tol, sample_date=input_data.sample_date_discr,
        unfolded=clargs.uf, cpfit=clargs.cpfit, smooth=not clargs.nosmooth,
        correct=not clargs.trueEPS, maxiter=clargs.maxiter, **stage_kw,
    )
    if ctx is not None:
        ctx.__exit__(None, None, None)
    dt = time.time() - t0

    # per-cell greppable lines (reference MiSTI.py:240 format)
    for si, st in enumerate(splits):
        tgen = sum(input_data.times[0 : int(np.ceil(st))]) * input_data.scale_time
        for b in range(data.shape[0]):
            params = ", ".join(str(v) for v in res.params[si, b])
            # row 0 is the unresampled spectrum = bs 0, rows 1..N the
            # replicates (utils/generateJSFS_bs.py convention)
            print(
                f"bs_id = {b} \tsplitT = {st} \ttime = {tgen} "
                f"\tmigration rates optim = [{params}] \tllh = {res.llh[si, b]}"
            )

    ci = split_time_confidence_interval(res, input_data.times,
                                        input_data.scale_time)
    n_cells = len(splits) * data.shape[0]
    # per-replicate argmax histogram: the spread the Student-t CI is built
    # from (bs_conf_int.ipynb cell 2's value_counts)
    am = res.llh.argmax(axis=0)
    hist = {str(res.split_times[i]): int((am == i).sum())
            for i in sorted(set(am.tolist()))}
    summary = {
        "cells": n_cells,
        "wallclock_s": round(dt, 3),
        "cells_per_s": round(n_cells / dt, 3),
        "split_mean_gens": float(ci["mean"]),
        "split_ci_gens": [float(ci["ci"][0]), float(ci["ci"][1])],
        "ci_level": ci["level"],
        "argmax_hist": hist,
    }
    if res.nfev is not None:
        # actual likelihood evaluations performed across all lockstep fits
        # (reference COUNT_LLH; the baseline does ~5.7 of these per
        # core-second, BASELINE.md)
        evals = int(res.nfev.sum())
        summary["llh_evals"] = evals
        summary["evals_per_s"] = round(evals / dt, 1)
        summary["vs_baseline_1core"] = round(evals / dt / 5.7, 1)
    print(json.dumps(summary))
    if clargs.fout:
        extra = {} if res.nfev is None else {"nfev": res.nfev}
        np.savez(
            clargs.fout, split_times=res.split_times, params=res.params,
            llh=res.llh, data=res.data,
            times=np.asarray(input_data.times),
            scale_time=input_data.scale_time, **extra,
        )
        print("results table written to", clargs.fout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
