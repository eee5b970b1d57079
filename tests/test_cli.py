"""End-to-end CLI tests against reference CLI outputs captured as fixtures."""

import os
import sys

import numpy as np
import pytest

from conftest import FIXDIR
from misti_tpu.io import mi_format


@pytest.fixture()
def fixture_paths():
    paths = {
        "psmc1": os.path.join(FIXDIR, "synth1.psmc"),
        "psmc2": os.path.join(FIXDIR, "synth2.psmc"),
        "jsfs": os.path.join(FIXDIR, "synth.jsfs"),
        "ref_mi": os.path.join(FIXDIR, "ref_fit.mi"),
    }
    for p in paths.values():
        if not os.path.exists(p):
            pytest.skip("CLI fixtures not generated")
    return paths


def test_misti_cli_end_to_end(fixture_paths, tmp_path, capsys):
    from misti_tpu.cli import misti as cli

    out_mi = tmp_path / "fit.mi"
    rc = cli.main([
        fixture_paths["psmc1"], fixture_paths["psmc2"], fixture_paths["jsfs"],
        "8", "-uf", "-mi", "1", "2", "8", "0.3", "1",
        "-o", str(out_mi), "-bs", "0", "--funits", "/nonexistent",
    ])
    assert rc == 0
    captured = capsys.readouterr().out
    est = [l for l in captured.splitlines() if l.startswith("bs_id =")]
    assert len(est) == 1
    # reference line: bs_id = 0, splitT = 8.0, time = 402.69376, llh ~ -1804.52
    assert "splitT = 8.0" in est[0]
    assert "time = 402.69376" in est[0]

    ours = mi_format.read_migration(str(out_mi))
    ref = mi_format.read_migration(fixture_paths["ref_mi"])
    np.testing.assert_allclose(ours.llh, ref.llh, rtol=2e-6)
    assert ours.split_t == ref.split_t
    np.testing.assert_allclose(ours.jafs, ref.jafs, rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(ours.lambda1, ref.lambda1, rtol=5e-4)
    np.testing.assert_allclose(ours.lambda2, ref.lambda2, rtol=5e-4)
    np.testing.assert_allclose(ours.lambdah1, ref.lambdah1, rtol=1e-12)
    np.testing.assert_allclose(ours.times, ref.times, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.pr11), np.asarray(ref.pr11),
                               rtol=1e-3, atol=1e-6)


def test_testmodel_cli_readme_oracle(tmp_path, capsys):
    from misti_tpu.cli import testmodel as cli

    out_mi = tmp_path / "tm.mi"
    rc = cli.main([
        "-n 1 10 -n 2 4.5 -eN 0.025 0.2 -ej 0.045 2 1 -eN 0.175 3 "
        "-eN 0.625 1.8 -eN 3 3.2 -eN 8 5.5",
        "-uf", "-o", str(out_mi), "--funits", "/nonexistent",
    ])
    assert rc == 1  # reference exits 1 (TestModel.py:127)
    captured = capsys.readouterr().out
    sfs_line = [l for l in captured.splitlines() if l.startswith("Expected SFS")]
    assert len(sfs_line) == 1
    d = mi_format.read_migration(str(out_mi))
    np.testing.assert_allclose(d.llh, -5.6330938966336905, rtol=1e-12)
    np.testing.assert_allclose(
        d.jafs,
        [0.229988, 0.082942, 0.228294, 0.131016, 0.121698, 0.083215, 0.122846],
        atol=1e-6,
    )
