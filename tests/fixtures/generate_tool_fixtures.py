#!/usr/bin/env python3
"""Generate golden fixtures for the converter CLIs by RUNNING the reference
utils/ scripts on tiny synthetic inputs.

Inputs and captured stdout/output-files land in tests/fixtures/tools/; the
parity tests (tests/test_tools.py) byte-compare `misti_tpu.cli.tools`
outputs against them.  No reference code is copied -- the goldens are
oracle bytes.

Run from the repo root:  python tests/fixtures/generate_tool_fixtures.py
"""

import os
import subprocess
import sys

REF = os.environ.get("MISTI_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")

BOOTSTRAP_SEED = 20260821


def run_ref(script, args, seed=None, cwd=None):
    """Run a reference utils/ script in a subprocess (numpy.mat shim for
    numpy 2.x; optional global `random` seed for bootstrap scripts) and
    return its stdout bytes."""
    prelude = (
        "import sys, runpy, numpy\n"
        "numpy.mat = numpy.asmatrix\n"
        + (f"import random; random.seed({seed})\n" if seed is not None else "")
        + f"sys.argv = {[script] + list(args)!r}\n"
        + f"runpy.run_path({script!r}, run_name='__main__')\n"
    )
    res = subprocess.run([sys.executable, "-c", prelude], capture_output=True,
                         cwd=cwd or OUT, timeout=300)
    if res.returncode != 0:
        raise RuntimeError(f"{script} {args} failed:\n{res.stderr.decode()}")
    return res.stdout


def write(name, data):
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(os.path.join(OUT, name), mode) as f:
        f.write(data)
    print("wrote", name)


def make_inputs():
    import numpy as np

    rng = np.random.default_rng(42)

    # realSFS 3x3 output: rows of 9 floats (category (2,2) never used)
    lines = []
    for _ in range(3):
        v = np.round(rng.uniform(10.0, 5000.0, size=9), 6)
        lines.append(" ".join(f"{x:.6f}" for x in v))
    write("angsd.sfs", "\n".join(lines) + "\n")

    # msHOT-lite -l stream: ms command line, then per-chromosome
    # @begin/@end blocks of "pos\thap4" lines (MS2JSFS input)
    def hap():
        # derived counts (s0, s1) covering every JSFS category incl fixed
        pairs = [(1, 0), (2, 0), (0, 1), (1, 1), (2, 1), (0, 2), (1, 2),
                 (2, 2), (0, 0)]
        s0, s1 = pairs[rng.integers(0, len(pairs))]
        h = ["0"] * 4
        if s0 >= 1:
            h[0] = "1"
        if s0 == 2:
            h[1] = "1"
        if s1 >= 1:
            h[2] = "1"
        if s1 == 2:
            h[3] = "1"
        return "".join(h)

    chrom_len = 100000
    ms_lines = [f"ms 4 2 -t 3000 -r 600 {chrom_len} -l", "1234 5678 91011", ""]
    for _ in range(2):
        npos = int(rng.integers(30, 50))
        pos = np.sort(rng.choice(np.arange(1, chrom_len), npos, replace=False))
        ms_lines.append("//")
        ms_lines.append(f"@begin {npos}")
        for p in pos:
            ms_lines.append(f"{p}\t{hap()}")
        ms_lines.append("@end")
    write("mshot.ms", "\n".join(ms_lines) + "\n")

    # MSSPLIT input: repeating [2 copied header lines, 1 discarded line,
    # chrom length, "pos\thap" site lines, @end] groups -- the reference's
    # loop copies two lines, holds a third unread in `line`, then takes
    # int(next(f)) as the length (MSSPLIT.py:37-41 structure)
    sp_lines = []
    for c in range(2):
        npos = int(rng.integers(20, 30))
        pos = np.sort(rng.choice(np.arange(1, chrom_len), npos, replace=False))
        sp_lines.append("//")
        sp_lines.append(f"@begin {npos}")
        sp_lines.append(f"segment {c}")
        sp_lines.append(str(chrom_len))
        for p in pos:
            sp_lines.append(f"{p}\t{hap()}")
        sp_lines.append("@end")
    write("mssplit_in.ms", "\n".join(sp_lines) + "\n")

    # scrm output: "positions ..." then 4 haplotype 0/1 lines
    sc_lines = ["scrm 4 2 -t 100", "//"]
    for _ in range(2):
        npos = int(rng.integers(25, 40))
        sc_lines.append("positions " + " ".join(
            f"{x:.6f}" for x in np.sort(rng.uniform(0, 1, npos))))
        haps = np.stack([[int(v) for v in hap()] for _ in range(npos)]).T
        for h in haps:
            sc_lines.append("".join(str(v) for v in h))
    write("scrm.out", "\n".join(sc_lines) + "\n")

    # small chunked JSFS files (for merge/bootstrap/ttmethod)
    def jsfs_text(seed, n_rows, pops=None):
        r = np.random.default_rng(seed)
        out = ["#MiSTI_JSFS version 1.0"]
        if pops:
            out.append(f"#pop1\t{pops[0]}")
            out.append(f"#pop2\t{pops[1]}")
        out.append("total\t0100\t1100\t0001\t0101\t1101\t0011\t0111")
        for _ in range(n_rows):
            counts = r.integers(5, 400, size=7)
            out.append("\t".join(str(int(v))
                                 for v in [counts.sum() * 50, *counts]))
        return "\n".join(out) + "\n"

    write("chunks_a.jsfs", jsfs_text(1, 6, pops=("HAN", "FRE")))
    write("chunks_b.jsfs", jsfs_text(2, 4, pops=("HAN", "FRE")))
    write("chunks_plain.jsfs", jsfs_text(3, 8))


def main():
    os.makedirs(OUT, exist_ok=True)
    make_inputs()
    u = os.path.join(REF, "utils")
    fx = os.path.dirname(OUT)

    write("angsdsfs.golden", run_ref(os.path.join(u, "ANGSDSFS.py"),
                                     ["angsd.sfs", "HAN", "FRE"]))
    write("angsdsfs_nopop.golden", run_ref(os.path.join(u, "ANGSDSFS.py"),
                                           ["angsd.sfs"]))
    write("ms2jsfs.golden", run_ref(os.path.join(u, "MS2JSFS.py"),
                                    ["mshot.ms", "-p", "HAN", "FRE", "-n", "5"]))
    write("scrm2jafs.golden", run_ref(os.path.join(u, "SCRM2JAFS.py"),
                                      ["scrm.out"]))
    write("ttmethod.golden", run_ref(os.path.join(u, "ttmethod.py"),
                                     ["chunks_plain.jsfs", "250000000"]))
    write("generate_jsfs_bs.golden",
          run_ref(os.path.join(u, "generateJSFS_bs.py"),
                  ["5", "chunks_a.jsfs"], seed=BOOTSTRAP_SEED))
    # (no golden for MSrates.py: the reference prints only the bare
    # InputData object repr -- a memory address; tests/test_tools.py pins
    # the parsed fields against the ms_parse oracle reader instead)
    write("calc_time.golden", run_ref(
        os.path.join(u, "calc_time.py"),
        [os.path.join(fx, "synth1.psmc"), os.path.join(fx, "synth2.psmc"),
         "--funits", "/nonexistent"]))

    # MSSPLIT writes two files into a destination dir
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        run_ref(os.path.join(u, "MSSPLIT.py"), ["mssplit_in.ms", td])
        for g in ("ms2g1.ms", "ms2g2.ms"):
            with open(os.path.join(td, g), "rb") as f:
                write(f"mssplit_{g}.golden", f.read())

    # MergeJSFS: the reference prints its loop's last `jaf`, which (only)
    # through the JAFS class's shared mutable default list
    # (migrationIO.py:38-40) has accumulated every file's rows -- so the
    # bytes equal the explicit concatenation our merge_jsfs performs.
    write("merge_jsfs_reference.golden",
          run_ref(os.path.join(u, "MergeJSFS.py"),
                  ["chunks_a.jsfs", "chunks_b.jsfs"]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
