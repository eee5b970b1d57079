"""Golden parity for the converter CLIs (reference utils/ scripts).

The goldens in tests/fixtures/tools/ are captured stdout/output-file BYTES
from running the reference scripts on tiny synthetic inputs
(tests/fixtures/generate_tool_fixtures.py).  Each `*_main` here must
byte-match, except the two documented intentional bug-fixes (merge_jsfs,
misti2ms) which are asserted against the reference's evident intent and
the captured reference behaviour.
"""

import contextlib
import io
import os
import random

import numpy as np
import pytest

from misti_tpu.cli import tools

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures",
                   "tools")
BOOTSTRAP_SEED = 20260821  # must match generate_tool_fixtures.py


def golden(name: str) -> str:
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read().decode()


def run_main(fn, argv, cwd=FIX):
    """Run a *_main capturing stdout, from the fixture dir (goldens were
    captured with relative paths)."""
    out = io.StringIO()
    old = os.getcwd()
    os.chdir(cwd)
    try:
        with contextlib.redirect_stdout(out):
            rc = fn(argv)
    finally:
        os.chdir(old)
    assert rc == 0
    return out.getvalue()


def test_angsdsfs_golden():
    """realSFS 3x3 column permutation (reference ANGSDSFS.py:29-38)."""
    assert run_main(tools.angsdsfs_main,
                    ["angsd.sfs", "HAN", "FRE"]) == golden("angsdsfs.golden")


def test_angsdsfs_nopop_golden():
    assert run_main(tools.angsdsfs_main,
                    ["angsd.sfs"]) == golden("angsdsfs_nopop.golden")


def test_ms2jsfs_golden():
    """msHOT-lite stream chunking + genotype->category map
    (reference MS2JSFS.py:30-46,148-164)."""
    assert run_main(tools.ms2jsfs_main,
                    ["mshot.ms", "-p", "HAN", "FRE", "-n", "5"]
                    ) == golden("ms2jsfs.golden")


def test_scrm2jafs_golden():
    assert run_main(tools.scrm2jafs_main,
                    ["scrm.out"]) == golden("scrm2jafs.golden")


def test_ttmethod_golden():
    """TT-method closed form (reference utils/ttmethod.py:40-76)."""
    assert run_main(tools.ttmethod_main,
                    ["chunks_plain.jsfs", "250000000"]
                    ) == golden("ttmethod.golden")


def test_generate_jsfs_bs_golden():
    """Seeded bootstrap rows: identical RNG consumption as the reference
    (global `random.randint` per resampled chunk, migrationIO.py:506-524)."""
    random.seed(BOOTSTRAP_SEED)
    assert run_main(tools.generate_jsfs_bs_main,
                    ["5", "chunks_a.jsfs"]) == golden("generate_jsfs_bs.golden")


def test_msrates_fields():
    """msrates is a DOCUMENTED deviation: the reference MSrates.py prints
    only `<migrationIO.InputData object at 0x...>` (the bare object repr,
    carrying a memory address and no data); ours prints the parsed fields.
    Pin the parsed values against the ms_parse oracle-backed reader."""
    from misti_tpu.io import ms_parse

    cmd = "-n 1 10 -n 2 4.5 -eN 0.025 0.2 -ej 0.045 2 1 -eN 0.175 3"
    out = run_main(tools.msrates_main, [cmd])
    d = ms_parse.read_ms(cmd)
    assert f"divergenceTime   {d.divergence_time}" in out
    assert str(d.times) in out and str(d.lambdas) in out


def test_calc_time_golden():
    assert run_main(
        tools.calc_time_main,
        ["../synth1.psmc", "../synth2.psmc", "--funits", "/nonexistent"]
    ) == golden("calc_time.golden")


def test_mssplit_golden(tmp_path):
    """msHOT-lite 4-haplotype stream split into per-genome pseudo-.ms files
    (reference MSSPLIT.py:24-66)."""
    run_main(tools.mssplit_main, ["mssplit_in.ms", str(tmp_path)])
    for g in ("ms2g1.ms", "ms2g2.ms"):
        with open(tmp_path / g) as f:
            assert f.read() == golden(f"mssplit_{g}.golden")


def test_merge_jsfs_golden():
    """Byte parity with the reference MergeJSFS output.  The reference
    prints only its loop's LAST `jaf` -- but that list accumulates every
    file's rows anyway, because the reference JAFS class uses a shared
    mutable default (`def __init__(self, jafs=[])`, migrationIO.py:38-40):
    every ReadJAFS call appends into the SAME list object.  Ours
    concatenates explicitly (per-instance lists) and lands on identical
    bytes."""
    out = run_main(tools.merge_jsfs_main, ["chunks_a.jsfs", "chunks_b.jsfs"])
    assert out == golden("merge_jsfs_reference.golden")


def test_misti2ms_structure():
    """misti2ms is a DOCUMENTED deviation: the reference MiSTI2MS.py calls a
    nonexistent migrationIO.SetScaling and cannot run; ours derives the
    scaling from Units (its evident intent).  Pin the command structure."""
    fixdir = os.path.dirname(FIX)
    out = run_main(tools.misti2ms_main,
                   [os.path.join(fixdir, "ref_fit.mi"),
                    "--funits", "/nonexistent"], cwd=fixdir)
    ms = out.splitlines()[-1]
    assert ms.startswith(" 4 1000 -t ")
    for flag in (" -r ", " -l ", " -I 2 2 2 ", " -ej ", " -eM "):
        assert flag in ms
    # -ej (the split) must come after every -en (population size changes
    # before the split)
    assert ms.index(" -ej ") > ms.rindex(" -en ")
