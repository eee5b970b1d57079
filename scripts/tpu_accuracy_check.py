#!/usr/bin/env python3
"""Cross-precision validation: TPU f32 likelihood vs CPU f64 reference path.

The parity test suite runs on the CPU backend in float64 (bit-level
comparison against the reference implementation's oracles).  The TPU path
runs float32 with a different correction strategy (the fused Pallas sweep)
and TPU matmul semantics, so its accuracy must be measured, not assumed
(SURVEY.md section 7, decision 6 -- the declared top correctness risk).

Run in two phases (two processes, because the platform is fixed at jax
import):

    python scripts/tpu_accuracy_check.py tpu   # writes /tmp/misti_acc_tpu.npz
    python scripts/tpu_accuracy_check.py cpu   # computes f64, prints report

The workload is the bench.py scenario (64 merged intervals, one optimised
migration band, cpfit) evaluated on a grid of migration-rate candidates --
the exact fitting workload -- plus the trueEPS spectrum path.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/misti_acc_tpu.npz"


def build(true_eps: bool, cpfit: bool = True):
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
         1.1 + 0.4 * np.cos(tt * 9.0) * np.exp(-tt * 2)], axis=1
    )
    sfs = [0.0, *rng.integers(200, 6000, size=7).astype(float)]
    spec = build_spec(
        times, [list(v) for v in lams], sfs, split_t,
        [[1, 2, split_t, 0.3, 1]], [], unfolded=True, cpfit=cpfit, smooth=False,
        correct=not true_eps,
    )
    return build_likelihood(spec)


PARAMS = np.linspace(0.05, 1.2, 16)[:, None]


def main() -> int:
    phase = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    os.environ["MISTI_PLATFORM"] = "default" if phase == "tpu" else "cpu"
    import jax

    from misti_tpu.config import setup_platform

    setup_platform(os.environ["MISTI_PLATFORM"])

    llh_corr = np.asarray(build(False).llh_batch(PARAMS))
    llh_true = np.asarray(build(True).llh_batch(PARAMS))
    # ECT mode (cpfit=False -- the reference's DEFAULT residual): usable in
    # f32 since the round-5 deviation-form reformulation (kernels/
    # correction.py _ect_dev and friends); measured here like the others
    llh_ect = np.asarray(build(False, cpfit=False).llh_batch(PARAMS))

    if phase == "tpu":
        np.savez(OUT, llh_corr=llh_corr, llh_true=llh_true, llh_ect=llh_ect,
                 backend=jax.default_backend())
        print(f"wrote {OUT} (backend={jax.default_backend()})")
        return 0

    if not os.path.exists(OUT):
        print(f"{OUT} not found -- run the accelerator phase first:\n"
              f"    python {sys.argv[0]} tpu")
        return 1
    ref = np.load(OUT)
    lines = [f"TPU backend recorded: {ref['backend']}"]
    rows = [("corrected", ref["llh_corr"], llh_corr),
            ("trueEPS  ", ref["llh_true"], llh_true)]
    if "llh_ect" in ref:
        rows.append(("ECT-mode ", ref["llh_ect"], llh_ect))
    for name, f32, f64 in rows:
        # -inf llh marks a failed candidate (correction failure / negative
        # rate): the MASKS must agree between precisions; the numeric
        # envelope is over the candidates finite in both
        fin = np.isfinite(f32) & np.isfinite(f64)
        if not np.array_equal(np.isfinite(f32), np.isfinite(f64)):
            lines.append(f"{name}: FINITE MASKS DISAGREE "
                         f"f32={np.isfinite(f32).tolist()} "
                         f"f64={np.isfinite(f64).tolist()}")
        if not fin.any():
            lines.append(f"{name}: NO candidate finite in both precisions")
            continue
        adiff = np.abs(f32[fin] - f64[fin])
        rdiff = adiff / np.maximum(np.abs(f64[fin]), 1e-12)
        lines.append(
            f"{name}: llh f64 range [{f64[fin].min():.3f}, {f64[fin].max():.3f}]  "
            f"max|dllh| = {adiff.max():.3e}  max rel = {rdiff.max():.3e}  "
            f"(finite {int(fin.sum())}/{fin.size}, masks agree: "
            f"{np.array_equal(np.isfinite(f32), np.isfinite(f64))})")
        # the argmax candidate (what the optimiser chases) must agree
        lines.append(f"{name}: argmax f32 = {int(f32.argmax())}  "
                     f"argmax f64 = {int(f64.argmax())}")
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    sys.exit(main())
