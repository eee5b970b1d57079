"""Determinism and sweep-CLI end-to-end tests (aux-subsystem requirements).

SURVEY.md section 5: same seed => same bits within one compiled program, and
the sweep driver must reproduce the reference's greppable output contract.
"""

import os

import numpy as np
import pytest

from conftest import FIXDIR


def test_llh_bitwise_deterministic():
    from misti_tpu.engine.likelihood import build_likelihood
    from misti_tpu.engine.spec import build_spec

    grid = 0.02 * (1.2 ** np.arange(8)) - 0.02
    times = list(np.diff(grid))
    lams = [[1.0 + 0.1 * i, 1.2 - 0.05 * i] for i in range(8)]
    spec = build_spec(times, lams, [0, 10, 4, 9, 6, 5, 4, 5], 3,
                      [[1, 0, 3, 0.4, 1]], [], unfolded=True, cpfit=True)
    lik = build_likelihood(spec)
    a = np.asarray(lik.llh_batch(np.linspace(0.1, 0.8, 16)[:, None]))
    b = np.asarray(lik.llh_batch(np.linspace(0.1, 0.8, 16)[:, None]))
    assert np.array_equal(a, b)  # bitwise


def test_bootstrap_reproducible_by_seed():
    from misti_tpu.engine.bootstrap import make_bootstrap_data
    from misti_tpu.io.data import Jafs

    rows = [[100.0 * (i + 1), *range(i, i + 7)] for i in range(4)]
    j = Jafs(jafs=[list(map(float, r)) for r in rows])
    a = make_bootstrap_data(j, 6, seed=9)
    b = make_bootstrap_data(j, 6, seed=9)
    np.testing.assert_array_equal(a, b)


def test_sweep_cli_end_to_end(tmp_path, capsys):
    paths = [os.path.join(FIXDIR, p) for p in ("synth1.psmc", "synth2.psmc",
                                               "synth.jsfs")]
    for p in paths:
        if not os.path.exists(p):
            pytest.skip("CLI fixtures not generated")
    from misti_tpu.cli import sweep as cli

    out = tmp_path / "res.npz"
    rc = cli.main([
        *paths, "--splits", "7", "8", "-bs", "2", "-mi", "1", "2", "ST",
        "0.3", "1", "-uf", "--cpfit", "--nosmooth", "-o", str(out),
        "--funits", "/nonexistent", "--platform", "cpu",
    ])
    assert rc == 0
    text = capsys.readouterr().out
    cells = [l for l in text.splitlines() if l.startswith("bs_id =")]
    assert len(cells) == 2 * 3  # 2 split times x (1 + 2 replicates)
    assert all("llh =" in l for l in cells)
    # row 0 = unresampled data = bs 0, rows 1..N = replicates (the
    # generateJSFS_bs convention): labels must be 0,1,2 per split
    ids = [int(l.split()[2]) for l in cells]
    assert ids == [0, 1, 2, 0, 1, 2], ids
    d = np.load(out)
    assert d["llh"].shape == (2, 3)
    assert np.all(np.isfinite(d["llh"]))
    assert d["nfev"].shape == (2, 3) and np.all(d["nfev"] >= 3)
    # row 0 (full data) at st=8 must match the standalone misti fit setup
    assert d["params"].shape == (2, 3, 1)
