"""Bootstrap sweep + replicate sharding tests on the virtual 8-device mesh."""

import numpy as np
import jax
import pytest

from misti_tpu.dist.mesh import make_mesh, pad_to_multiple, shard_replicates
from misti_tpu.engine.bootstrap import (
    make_bootstrap_data,
    split_time_confidence_interval,
    sweep,
)
from misti_tpu.io.data import Jafs


def _toy_model(numT=10):
    grid = 0.02 * (1.15 ** np.arange(numT)) - 0.02
    times = list(np.diff(grid))
    tt = np.cumsum([0.0] + times)
    lams = np.stack(
        [1.0 + 0.3 * np.sin(tt * 10.0), 1.1 + 0.2 * np.cos(tt * 8.0)], axis=1
    )
    return times, [list(v) for v in lams]


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices


def test_pad_to_multiple():
    arr = np.ones((5, 3))
    padded, orig = pad_to_multiple(arr, 4)
    assert padded.shape == (8, 3) and orig == 5


def test_bootstrap_data_row0_is_full():
    rows = [[100.0, 5, 2, 7, 3, 1, 2, 1], [200.0, 8, 3, 9, 4, 2, 3, 2]]
    j = Jafs(jafs=[list(map(float, r)) for r in rows])
    data = make_bootstrap_data(j, 4, seed=1)
    assert data.shape == (5, 7)
    np.testing.assert_allclose(data[0], np.asarray(rows, float)[:, 1:].sum(0))


def test_sweep_matches_per_replicate_fits():
    """Sharded lockstep sweep == independent single fits."""
    times, lams = _toy_model()
    rng = np.random.default_rng(3)
    data = np.abs(rng.normal(2000, 300, size=(5, 7)))
    res = sweep(
        times, lams, data, split_times=[3, 5],
        mi_template=[[1, 0, "ST", 0.3, 1]],
        unfolded=True, cpfit=True, smooth=False, tol=1e-4,
    )
    assert res.llh.shape == (2, 5)
    assert np.all(np.isfinite(res.llh))

    # cross-check one cell against a fresh standalone fit
    from misti_tpu.engine.likelihood import build_likelihood
    from misti_tpu.engine.optimize import solve
    from misti_tpu.engine.spec import build_spec

    spec = build_spec(times, lams, [0.0, *data[2]], 5, [[1, 0, 5, 0.3, 1]], [],
                      unfolded=True, cpfit=True, smooth=False)
    lik = build_likelihood(spec)
    x, llh = solve(lik, tol=1e-4)
    np.testing.assert_allclose(res.llh[1, 2], llh, rtol=1e-9, atol=1e-6)
    np.testing.assert_allclose(res.params[1, 2], x, atol=2e-4)


def test_sweep_sharding_invariance():
    """Same llh table whether run on 1 device or the full 8-device mesh
    (the survey's multi-chip determinism requirement)."""
    times, lams = _toy_model()
    rng = np.random.default_rng(4)
    data = np.abs(rng.normal(2000, 300, size=(8, 7)))
    kw = dict(
        split_times=[4], mi_template=[[1, 0, "ST", 0.25, 1]],
        unfolded=True, cpfit=True, smooth=False, tol=1e-4,
    )
    res8 = sweep(times, lams, data, mesh=make_mesh(), **kw)
    res1 = sweep(times, lams, data, mesh=make_mesh(1), **kw)
    np.testing.assert_allclose(res8.llh, res1.llh, rtol=1e-12)
    np.testing.assert_allclose(res8.params, res1.params, rtol=1e-10, atol=1e-12)


def test_confidence_interval():
    times, _ = _toy_model()
    res_llh = np.array([[1.0, 3.0, 2.0], [2.0, 1.0, 1.0]])  # (S=2, B=3)
    from misti_tpu.engine.bootstrap import SweepResult

    r = SweepResult(
        split_times=np.array([3.0, 5.0]), params=np.zeros((2, 3, 1)),
        llh=res_llh, data=np.zeros((3, 7)),
    )
    ci = split_time_confidence_interval(r, times, scale_time=2e4)
    assert ci["best_split_idx"].tolist() == [5.0, 3.0, 3.0]
    assert ci["ci"][0] <= ci["mean"] <= ci["ci"][1]
