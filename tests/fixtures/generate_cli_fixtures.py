#!/usr/bin/env python3
"""Generate end-to-end reference CLI fixtures by RUNNING /root/reference/MiSTI.py.

Covers the operating modes the engine oracles (likelihood.npz) already pin
but no end-to-end CLI invocation exercised (VERDICT round 4, items 5 and 7):

* ref_fit_pu.mi     -- an optimised PULSE migration fit (-pu 2 4 0.2 1)
* ref_fit_sdate.mi  -- an ancient-sample fit (--sdate, with a migration band
                       starting at the sample date)
* ref_debug_stdout.txt -- full reference stdout of the base fit with --debug
                       (the spectrum dump of MigrationInference.py:585-597),
                       for golden-pinning misti_tpu's --debug block.

The inputs are the committed synthetic synth1/2.psmc + synth.jsfs.  No
reference code is copied; the outputs are oracle bytes.

Run from the repo root:  python tests/fixtures/generate_cli_fixtures.py
"""

import os
import subprocess
import sys

REF = os.environ.get("MISTI_REFERENCE", "/root/reference")
OUT = os.path.dirname(os.path.abspath(__file__))


def run_misti(args):
    script = os.path.join(REF, "MiSTI.py")
    prelude = (
        "import sys, runpy, numpy\n"
        "numpy.mat = numpy.asmatrix\n"
        + f"sys.path.insert(0, {REF!r})\n"
        # the reference's own --debug path does `for v in inputData` on the
        # non-iterable InputData (MiSTI.py:199) -- shim an iterator (like the
        # numpy.mat shim) so the run reaches the spectrum dump; the INPUT
        # DATA block bytes are shim-defined and NOT golden-compared
        + "import migrationIO\n"
        + "migrationIO.InputData.__iter__ = "
        + "lambda s: iter(vars(s).items())\n"
        # ... and --debug's PrintErr("Runtime: ", float) crashes joining
        # non-str args (migrationIO.py:179) -- stderr-only, shim it
        + "migrationIO.PrintErr = "
        + "lambda *a, **k: print(*a, file=sys.stderr)\n"
        + f"sys.argv = {[script] + list(args)!r}\n"
        + f"runpy.run_path({script!r}, run_name='__main__')\n"
    )
    res = subprocess.run([sys.executable, "-c", prelude], capture_output=True,
                         cwd=OUT, timeout=1800)
    if res.returncode != 0:
        raise RuntimeError(f"MiSTI.py {args} failed:\n{res.stderr.decode()}")
    return res.stdout


BASE = ["synth1.psmc", "synth2.psmc", "synth.jsfs", "8", "-uf",
        "--funits", "/nonexistent", "-bs", "0"]


def main():
    # optimised pulse into population 2 at interval 4 (start 0.2) PLUS a
    # fixed nonzero pulse into population 1 at interval 6: exercises both
    # the optimised and fixed pulse paths, and the fixed pulse moves the
    # llh away from the no-pulse fit even though the optimised rate fits ~0.
    # --cpfit: in ECT mode the reference's no-migration scipy solve stalls
    # at its START POINT on tiny intervals (gtol fires at the ~1e-8
    # unstretched-residual noise floor; measured on this scenario's
    # interval 7 -- the true root is 11% away), so ECT endpoints there are
    # solver artifacts, not comparable targets (tests/test_correction.py
    # docstrings).  cpfit's closed-form branch is deterministic.
    out = run_misti(BASE + ["-pu", "2", "4", "0.2", "1",
                            "-pu", "1", "6", "0.1", "0", "--cpfit",
                            "-o", "ref_fit_pu.mi"])
    est = [l for l in out.decode().splitlines() if l.startswith("bs_id =")]
    print("pu fit:", est)

    # ancient sample for genome 2: 80 "years" at default units
    # (N0 = 10000, genTime = 1) -> sdResc = 0.004, inserted into the merged
    # grid; the migration band starts AT the sample date index (the reference
    # requires migStart >= sampleDate, MigrationInference.py:242-243)
    out2 = run_misti(["synth1.psmc", "synth2.psmc", "synth.jsfs", "8", "-uf",
                      "--funits", "/nonexistent", "-bs", "0",
                      "--sdate", "80", "-mi", "1", "4", "8", "0.3", "1",
                      "-o", "ref_fit_sdate.mi"])
    est2 = [l for l in out2.decode().splitlines() if l.startswith("bs_id =")]
    print("sdate fit:", est2)

    # --debug stdout with a FIXED migration band (no optimised parameters):
    # the reference prints the spectrum dump (MigrationInference.py:585-597)
    # on every likelihood evaluation, so a 0-parameter fit gives exactly one
    # deterministic dump block to golden-pin
    out3 = run_misti(BASE + ["-mi", "1", "2", "8", "0.3", "0", "--debug"])
    with open(os.path.join(OUT, "ref_debug_stdout.txt"), "wb") as f:
        f.write(out3)
    print("debug stdout:", len(out3), "bytes")


if __name__ == "__main__":
    main()
