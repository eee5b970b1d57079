"""IO parity tests: psmc merge, ms parsing, JSFS formats, .mi round-trip."""

import io
import json
import os
import random

import numpy as np
import pytest

from conftest import FIXDIR, load_fixture
from misti_tpu.io import jsfs as io_jsfs
from misti_tpu.io import mi_format
from misti_tpu.io import ms_parse
from misti_tpu.io import psmc as io_psmc
from misti_tpu.io.data import Jafs
from misti_tpu.io.units import Units


@pytest.fixture(autouse=True)
def reset_units():
    Units.reset()
    yield
    Units.reset()


def test_read_ms_matches_reference():
    fx = load_fixture("readms.npz")
    with open(os.path.join(FIXDIR, "readms_strings.json")) as f:
        strings = json.load(f)
    for i, s in enumerate(strings):
        d = ms_parse.read_ms(s)
        np.testing.assert_allclose(np.asarray(d.times), fx[f"s{i}_times"], atol=0)
        np.testing.assert_allclose(np.asarray(d.lambdas), fx[f"s{i}_lambdas"], atol=0)
        assert d.divergence_time == int(fx[f"s{i}_split"])
        np.testing.assert_allclose(
            np.asarray(d.mi, dtype=float).reshape(-1, 5), fx[f"s{i}_mi"], atol=0
        )
        np.testing.assert_allclose(
            np.asarray(d.pu, dtype=float).reshape(-1, 4), fx[f"s{i}_pu"], atol=0
        )


def test_read_psmc_matches_reference():
    fx = load_fixture("readpsmc.npz")
    f1 = os.path.join(FIXDIR, "synth1.psmc")
    f2 = os.path.join(FIXDIR, "synth2.psmc")
    for tag, sd in (("sd0", 0.0), ("sd1", 7300.0)):
        d = io_psmc.read_psmc(f1, f2, sd, -1)
        np.testing.assert_allclose(np.asarray(d.times), fx[f"{tag}_times"], atol=0)
        np.testing.assert_allclose(np.asarray(d.lambdas), fx[f"{tag}_lambdas"], atol=0)
        assert d.scale_time == float(fx[f"{tag}_scaleTime"])
        assert d.theta == float(fx[f"{tag}_theta"])
        np.testing.assert_allclose(d.rho, float(fx[f"{tag}_rho"]), rtol=1e-14)
        assert d.sample_date_discr == int(fx[f"{tag}_sdd"])
        np.testing.assert_array_equal(np.asarray(d.t_psmc[0]), fx[f"{tag}_tpsmc0"])
        np.testing.assert_array_equal(np.asarray(d.t_psmc[1]), fx[f"{tag}_tpsmc1"])


def test_read_psmc1_matches_reference():
    fx = load_fixture("readpsmc.npz")
    f1 = os.path.join(FIXDIR, "synth1.psmc")
    f2 = os.path.join(FIXDIR, "synth2.psmc")
    d = io_psmc.read_psmc1(f1, f2, -1, divergence_time=120000.0)
    np.testing.assert_allclose(np.asarray(d.times), fx["pm1_times"], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(d.lambdas), fx["pm1_lambdas"], rtol=1e-9)
    assert d.divergence_time == int(fx["pm1_div"])


def test_read_psmc_round_selection():
    f1 = os.path.join(FIXDIR, "synth1.psmc")
    d_last = io_psmc.read_psmc_file(f1, -1)
    d_round0 = io_psmc.read_psmc_file(f1, 0)
    assert d_last[2] == 20 and d_round0[2] == 0
    assert d_last[3] != d_round0[3]  # different thetas per round


def test_jsfs_write_read_roundtrip(tmp_path):
    rows = [
        [1000.0, 5, 2, 7, 3, 1, 2, 1],
        [2000.0, 8, 3, 9, 4, 2, 3, 2],
    ]
    path = tmp_path / "test.jsfs"
    with open(path, "w") as f:
        io_jsfs.print_jafs_file([list(map(float, r)) for r in rows],
                                pop1="A", pop2="B", file=f)
    back = io_jsfs.read_jafs(str(path))
    assert back.pop1 == "A" and back.pop2 == "B"
    np.testing.assert_allclose(np.asarray(back.jafs), np.asarray(rows, float))
    summed = back.summed()
    np.testing.assert_allclose(summed, np.asarray(rows, float).sum(0))


def test_bootstrap_jafs_reproducible():
    rows = [[100.0 * (i + 1), *range(i, i + 7)] for i in range(5)]
    j = Jafs(jafs=[list(map(float, r)) for r in rows])
    rng = random.Random(42)
    bs1 = io_jsfs.bootstrap_jafs(j, rng=rng)
    assert bs1[0] >= sum(r[0] for r in rows)
    bs2 = io_jsfs.bootstrap_jafs(j, normalize=True, rng=random.Random(1))
    seg = sum(sum(r[1:]) for r in rows)
    np.testing.assert_allclose(sum(bs2[1:]), seg, rtol=1e-12)


def test_mi_format_roundtrip(tmp_path):
    numT, s = 6, 3
    rng = np.random.default_rng(5)
    times = rng.uniform(0.01, 0.1, numT - 1)
    lc = rng.uniform(0.5, 2.0, (numT, 2))
    lh = rng.uniform(0.5, 2.0, (numT, 2))
    mi = np.zeros((numT, 2))
    mi[1:3, 0] = 0.7
    pr = rng.uniform(0, 1, (s + 1, 3, 2))
    jafs = rng.uniform(0, 1, 7)
    jafs /= jafs.sum()
    data = rng.integers(10, 100, 7).astype(float)
    text = mi_format.format_migration(
        llh=-1234.5, split_t=s, sample_date=0, thrh=(0.012, 0.003),
        jafs=jafs, data_jafs=data, times=times, lc=lc, lh=lh, mi=mi, pr=pr,
        scale_time=20000.0, scale_eps=1.0,
    )
    path = tmp_path / "out.mi"
    path.write_text(text)
    d = mi_format.read_migration(str(path))
    assert d.llh == -1234.5 and d.split_t == s and d.sample_date == 0
    np.testing.assert_allclose(d.thrh, [0.012, 0.003])
    np.testing.assert_allclose(d.jafs, jafs, rtol=1e-15)
    np.testing.assert_allclose(
        np.asarray(d.lambda1) * d.scale_eps, lc[:, 0], rtol=1e-15
    )
    np.testing.assert_allclose(np.asarray(d.lambdah2), lh[:, 1], rtol=1e-15)
    np.testing.assert_allclose(np.asarray(d.mu1), mi[:, 0], atol=0)
    cum = np.concatenate([[0], np.cumsum(times)]) * 20000.0
    np.testing.assert_allclose(np.asarray(d.times), cum, rtol=1e-12)
    # pre-split Pr round trip
    np.testing.assert_allclose(np.asarray(d.pr11)[:, :s].T, pr[:s, 0, :], rtol=1e-15)
    np.testing.assert_allclose(np.asarray(d.pr12)[:, :s].T, pr[:s, 2, :], rtol=1e-15)


def test_units_from_file(tmp_path):
    p = tmp_path / "units.txt"
    p.write_text("mutRate=2.5e-8\nbinsize=50\nN0=20000\ngenTime=29\n")
    Units.set_units_from_file(str(p))
    assert Units.mut_rate == 2.5e-8
    assert Units.binsize == 50
    assert Units.n0 == 20000
    assert Units.gen_time == 29
    assert Units.theta() == 4 * 50 * 2.5e-8 * 20000


def test_read_psmc_hetloss_matches_reference():
    """Nonzero -hl: the het-loss theta rescale through ReadPSMC
    (reference migrationIO.py SetHetLoss + :232-233: theta_i /= (1 - hl_i)
    before the time/EPS rescale).  Oracle captured by RUNNING the
    reference with hetloss (0.12, 0.07)."""
    from misti_tpu.io.units import Units

    fx = load_fixture("readpsmc.npz")
    if "hl_times" not in fx:
        import pytest

        pytest.skip("hetloss fixture not generated")
    f1 = os.path.join(FIXDIR, "synth1.psmc")
    f2 = os.path.join(FIXDIR, "synth2.psmc")
    try:
        Units.set_het_loss([float(fx["hl_vals"][0]), float(fx["hl_vals"][1])])
        d = io_psmc.read_psmc(f1, f2, 0.0, -1)
    finally:
        Units.set_het_loss([0.0, 0.0])
    np.testing.assert_allclose(np.asarray(d.times), fx["hl_times"], atol=0)
    np.testing.assert_allclose(np.asarray(d.lambdas), fx["hl_lambdas"], atol=0)
    assert d.scale_time == float(fx["hl_scaleTime"])
    assert d.theta == float(fx["hl_theta"])
    # and it actually differs from the hl=0 read (the rescale is real)
    d0 = io_psmc.read_psmc(f1, f2, 0.0, -1)
    assert not np.allclose(np.asarray(d.lambdas), np.asarray(d0.lambdas))
