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


@pytest.fixture()
def pu_fixture_paths():
    paths = {
        "psmc1": os.path.join(FIXDIR, "synth1.psmc"),
        "psmc2": os.path.join(FIXDIR, "synth2.psmc"),
        "jsfs": os.path.join(FIXDIR, "synth.jsfs"),
        "ref_pu": os.path.join(FIXDIR, "ref_fit_pu.mi"),
        "ref_sdate": os.path.join(FIXDIR, "ref_fit_sdate.mi"),
        "ref_debug": os.path.join(FIXDIR, "ref_debug_stdout.txt"),
    }
    for p in paths.values():
        if not os.path.exists(p):
            pytest.skip("CLI pulse/sdate fixtures not generated "
                        "(tests/fixtures/generate_cli_fixtures.py)")
    return paths


def test_misti_cli_pulse_fit(pu_fixture_paths, tmp_path, capsys):
    """End-to-end pulse-migration fit vs the reference CLI: one OPTIMISED
    pulse (-pu 2 4 0.2 1, fits to ~0) plus one FIXED nonzero pulse
    (-pu 1 6 0.1 0) that moves the llh away from the no-pulse fit
    (reference MiSTI.py:65-66, MigrationInference.py:259-280).  cpfit mode:
    the reference's ECT no-migration solve stalls at its start point on
    this grid's tiny intervals (gtol at the unstretched residual's ~1e-8
    noise floor), so only cpfit's closed-form endpoints are comparable
    (see generate_cli_fixtures.py and test_correction.py docstrings)."""
    from misti_tpu.cli import misti as cli

    out_mi = tmp_path / "fit_pu.mi"
    rc = cli.main([
        pu_fixture_paths["psmc1"], pu_fixture_paths["psmc2"],
        pu_fixture_paths["jsfs"], "8", "-uf",
        "-pu", "2", "4", "0.2", "1", "-pu", "1", "6", "0.1", "0", "--cpfit",
        "-o", str(out_mi), "-bs", "0", "--funits", "/nonexistent",
    ])
    assert rc == 0
    capsys.readouterr()
    ours = mi_format.read_migration(str(out_mi))
    ref = mi_format.read_migration(pu_fixture_paths["ref_pu"])
    np.testing.assert_allclose(ours.llh, ref.llh, rtol=2e-6)
    assert ours.split_t == ref.split_t
    np.testing.assert_allclose(ours.jafs, ref.jafs, rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(ours.lambda1, ref.lambda1, rtol=5e-4)
    np.testing.assert_allclose(ours.lambda2, ref.lambda2, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(ours.pr11), np.asarray(ref.pr11),
                               rtol=1e-3, atol=1e-6)


def test_misti_cli_sdate_fit(pu_fixture_paths, tmp_path, capsys):
    """End-to-end ancient-sample fit vs the reference CLI: --sdate 80
    inserts the rescaled date into the merged grid (migrationIO.py:244-255)
    and the migration band starts AT the sample-date index."""
    from misti_tpu.cli import misti as cli

    out_mi = tmp_path / "fit_sdate.mi"
    rc = cli.main([
        pu_fixture_paths["psmc1"], pu_fixture_paths["psmc2"],
        pu_fixture_paths["jsfs"], "8", "-uf", "--sdate", "80",
        "-mi", "1", "4", "8", "0.3", "1",
        "-o", str(out_mi), "-bs", "0", "--funits", "/nonexistent",
    ])
    assert rc == 0
    capsys.readouterr()
    ours = mi_format.read_migration(str(out_mi))
    ref = mi_format.read_migration(pu_fixture_paths["ref_sdate"])
    np.testing.assert_allclose(ours.llh, ref.llh, rtol=2e-6)
    assert ours.split_t == ref.split_t
    assert ours.sample_date == ref.sample_date
    np.testing.assert_allclose(ours.jafs, ref.jafs, rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(ours.lambda1, ref.lambda1, rtol=5e-4)
    np.testing.assert_allclose(ours.lambda2, ref.lambda2, rtol=5e-4)


def test_misti_cli_debug_golden(pu_fixture_paths, tmp_path, capsys):
    """--debug stdout vs the captured reference run (ECT mode, one FIXED
    band, zero optimised parameters => exactly one deterministic
    evaluation).  NB the reference CLI never forwards its --debug flag into
    MigrationInference (MiSTI.py:214 passes no debug kwarg), so the class's
    spectrum dump (MigrationInference.py:585-597) is unreachable from the
    CLI -- the golden surfaces are the estimate line, the stdout .mi table
    (no -o), and the Report() counter lines."""
    from misti_tpu.cli import misti as cli

    ref_lines = open(pu_fixture_paths["ref_debug"]).read().splitlines()

    rc = cli.main([
        pu_fixture_paths["psmc1"], pu_fixture_paths["psmc2"],
        pu_fixture_paths["jsfs"], "8", "-uf",
        "-mi", "1", "2", "8", "0.3", "0", "-bs", "0",
        "--funits", "/nonexistent", "--debug",
    ])
    assert rc == 0
    out_lines = capsys.readouterr().out.splitlines()

    def grab(lines, prefix):
        hits = [l for l in lines if l.startswith(prefix)]
        assert hits, f"missing line {prefix!r}"
        return hits[0]

    # estimate line: structure byte-identical, llh numerically equal
    ref_est = grab(ref_lines, "bs_id =")
    our_est = grab(out_lines, "bs_id =")
    assert our_est.rsplit("llh =", 1)[0] == ref_est.rsplit("llh =", 1)[0]
    # rtol 2e-6: ECT-mode correction endpoints carry the documented
    # LM-vs-scipy-trf solver fuzz (lc to ~2e-4, test_correction.py), which
    # propagates to ~1e-6 relative llh -- same bar as the fit e2e test
    np.testing.assert_allclose(float(our_est.rsplit("llh =", 1)[1]),
                               float(ref_est.rsplit("llh =", 1)[1]),
                               rtol=2e-6)

    # Report counters byte-identical (0-param fit: exactly one evaluation
    # ... plus the OutputMigration re-evaluation in BOTH implementations)
    for prefix in ("Total number of likelihood function calls is",
                   "Lambda correction called", "Lambda correction failed"):
        assert grab(out_lines, prefix) == grab(ref_lines, prefix)

    # the stdout .mi table (fout = "" prints it): parse both and compare
    def mi_block(lines):
        i = lines.index("#MiSTI2 ver 0.4")
        j = [k for k, l in enumerate(lines) if l.startswith("RS\t")][-1]
        return "\n".join(lines[i : j + 1]) + "\n"

    ours_p = tmp_path / "ours.mi"
    ref_p = tmp_path / "ref.mi"
    ours_p.write_text(mi_block(out_lines))
    ref_p.write_text(mi_block(ref_lines))
    ours = mi_format.read_migration(str(ours_p))
    ref = mi_format.read_migration(str(ref_p))
    np.testing.assert_allclose(ours.llh, ref.llh, rtol=2e-6)
    np.testing.assert_allclose(ours.jafs, ref.jafs, rtol=5e-5, atol=1e-7)
    np.testing.assert_allclose(ours.times, ref.times, rtol=1e-12)
    np.testing.assert_allclose(ours.lambda1, ref.lambda1, rtol=5e-4)
    np.testing.assert_allclose(ours.lambda2, ref.lambda2, rtol=5e-4)
    np.testing.assert_allclose(ours.lambdah1, ref.lambdah1, rtol=1e-12)
    np.testing.assert_allclose(ours.lambdah2, ref.lambdah2, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ours.pr11), np.asarray(ref.pr11),
                               rtol=1e-4, atol=1e-8)


def test_sweep_cli_scenario_matrix(tmp_path, capsys):
    """--scenarios manifest mode: two same-shape scenarios resident in one
    process (the 16-script test.bs matrix surface, MATRIXBENCH_r05.json).
    Checks per-scenario tagged cell lines, per-scenario JSON summaries,
    per-scenario .npz tables, and the matrix summary's shared-program
    count."""
    import json as _json

    from misti_tpu.cli import sweep as cli

    manifest = [
        {"name": "fwd", "fpsmc1": os.path.join(FIXDIR, "synth1.psmc"),
         "fpsmc2": os.path.join(FIXDIR, "synth2.psmc"),
         "fjafs": os.path.join(FIXDIR, "synth.jsfs"),
         "splits": [7, 8], "mi": [["1", "2", "ST", "0.3", "1"]]},
        {"name": "rev", "fpsmc1": os.path.join(FIXDIR, "synth2.psmc"),
         "fpsmc2": os.path.join(FIXDIR, "synth1.psmc"),
         "fjafs": os.path.join(FIXDIR, "synth.jsfs"),
         "splits": [7, 8], "mi": [["1", "2", "ST", "0.3", "1"]]},
    ]
    mpath = tmp_path / "m.json"
    mpath.write_text(_json.dumps(manifest))
    out = tmp_path / "r.npz"
    rc = cli.main(["--scenarios", str(mpath), "-bs", "1", "-uf", "--cpfit",
                   "--nosmooth", "--funits", "/nonexistent",
                   "--platform", "cpu", "-o", str(out)])
    assert rc == 0
    text = capsys.readouterr().out
    lines = text.splitlines()
    for name in ("fwd", "rev"):
        cells = [l for l in lines if l.startswith(f"scenario = {name} ")]
        assert len(cells) == 2 * 2, cells  # 2 splits x (1 + 1 replicates)
        assert os.path.exists(tmp_path / f"r.{name}.npz")
        summ = [l for l in lines
                if l.startswith("{") and f'"scenario": "{name}"' in l]
        assert len(summ) == 1
    matrix = _json.loads([l for l in lines
                          if '"matrix_scenarios"' in l][0])
    assert matrix["matrix_scenarios"] == 2
    assert matrix["matrix_cells"] == 8
    # same grid shapes + flags => ONE shared compiled program
    assert matrix["shared_programs"] == 1


def test_sweep_cli_scenario_matrix_rejects_duplicate_names(tmp_path, capsys):
    """Results are keyed by scenario name: a manifest with duplicates would
    silently discard all but the last fit, so the CLI must refuse it."""
    import json as _json

    from misti_tpu.cli import sweep as cli

    ent = {"name": "dup", "fpsmc1": os.path.join(FIXDIR, "synth1.psmc"),
           "fpsmc2": os.path.join(FIXDIR, "synth2.psmc"),
           "fjafs": os.path.join(FIXDIR, "synth.jsfs"),
           "splits": [7, 8], "mi": [["1", "2", "ST", "0.3", "1"]]}
    mpath = tmp_path / "m.json"
    mpath.write_text(_json.dumps([ent, dict(ent)]))
    rc = cli.main(["--scenarios", str(mpath), "-bs", "1", "-uf", "--cpfit",
                   "--funits", "/nonexistent", "--platform", "cpu"])
    assert rc == 2
