"""AOT export cache (engine/aot.py): warm processes must load serialized
programs instead of re-tracing, with results identical to plain jit."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from misti_tpu.engine.aot import CachedProgram, scenario_key


def test_cached_program_roundtrip_and_no_retrace(tmp_path):
    traces = []

    def fn(c, x):
        traces.append(1)  # Python side effect: runs only while TRACING

        def body(st):
            i, v = st
            return i + 1, v * 1.5 + 1.0

        return jax.lax.while_loop(lambda st: st[0] < c, body, (0, x))

    x = jnp.arange(4.0)
    p1 = CachedProgram(fn, "t1", cache_dir=str(tmp_path))
    out1 = p1(jnp.asarray(3), x)
    assert len(traces) == 1
    files = os.listdir(tmp_path)
    assert len(files) == 1 and files[0].endswith(".jaxexport")

    # a fresh CachedProgram (simulating a new process) must load the export
    # and never trace fn again
    p2 = CachedProgram(fn, "t1", cache_dir=str(tmp_path))
    out2 = p2(jnp.asarray(3), x)
    assert len(traces) == 1
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))
    # traced iteration bound is an ARGUMENT: new cap, same program
    out3 = p2(jnp.asarray(5), x)
    assert len(traces) == 1
    assert int(out3[0]) == 5

    # different key or different shapes -> separate cache entries
    p3 = CachedProgram(fn, "t2", cache_dir=str(tmp_path))
    p3(jnp.asarray(3), x)
    assert len(os.listdir(tmp_path)) == 2
    p2(jnp.asarray(3), jnp.arange(8.0))
    assert len(os.listdir(tmp_path)) == 3


def test_corrupt_export_falls_back_to_tracing(tmp_path):
    def fn(x):
        return x * 2.0

    p1 = CachedProgram(fn, "c", cache_dir=str(tmp_path))
    p1(jnp.ones(3))
    (f,) = os.listdir(tmp_path)
    with open(os.path.join(tmp_path, f), "wb") as fh:
        fh.write(b"garbage")
    p2 = CachedProgram(fn, "c", cache_dir=str(tmp_path))
    with pytest.warns(UserWarning, match="aot cache load failed"):
        out = p2(jnp.ones(3))
    np.testing.assert_array_equal(np.asarray(out), 2.0 * np.ones(3))


def test_scenario_key_stable_and_sensitive():
    a = scenario_key([1.0, 2.0], "x", np.arange(3))
    assert a == scenario_key([1.0, 2.0], "x", np.arange(3))
    assert a != scenario_key([1.0, 2.1], "x", np.arange(3))
    assert a != scenario_key([1.0, 2.0], "y", np.arange(3))


def test_sweep_aot_matches_plain(tmp_path, monkeypatch):
    """The fused sweep through the AOT cache (1-device mesh) equals the
    plain-jit sweep, and a second run loads every program from disk."""
    from misti_tpu.dist.mesh import make_mesh
    from misti_tpu.engine.bootstrap import sweep

    numT = 12
    grid = 0.015 * (1.14 ** np.arange(numT)) - 0.015
    times = list(np.diff(grid))
    tt = np.cumsum([0.0] + times)
    lams = np.stack([1.0 + 0.3 * np.sin(tt * 11.0),
                     1.1 + 0.25 * np.cos(tt * 7.0)], axis=1)
    lams = [list(v) for v in lams]
    rng = np.random.default_rng(3)
    base = np.array([3000.0, 800, 2900, 1500, 1200, 850, 1250])
    data = np.stack([base * rng.uniform(0.9, 1.1, size=7) for _ in range(4)])
    kw = dict(tol=1e-4, cpfit=True, smooth=False, unfolded=True,
              stage_caps=(4, 8), mesh=make_mesh(1))

    monkeypatch.setenv("MISTI_AOT", "0")
    r_plain = sweep(times, lams, data, [4, 7], [[1, 0, "ST", 0.25, 1]], (),
                    **kw)
    monkeypatch.setenv("MISTI_AOT", "1")
    monkeypatch.setenv("MISTI_AOT_DIR", str(tmp_path))
    r_aot = sweep(times, lams, data, [4, 7], [[1, 0, "ST", 0.25, 1]], (), **kw)
    np.testing.assert_array_equal(r_aot.llh, r_plain.llh)
    np.testing.assert_array_equal(r_aot.params, r_plain.params)
    np.testing.assert_array_equal(r_aot.nfev, r_plain.nfev)
    exports = [f for f in os.listdir(tmp_path) if f.endswith(".jaxexport")]
    assert len(exports) >= 2  # start + resume programs

    # warm rerun: same artifacts reused (no new files), same results
    before = set(os.listdir(tmp_path))
    r_warm = sweep(times, lams, data, [4, 7], [[1, 0, "ST", 0.25, 1]], (), **kw)
    assert set(os.listdir(tmp_path)) == before
    np.testing.assert_array_equal(r_warm.llh, r_plain.llh)


def test_sweep_aot_sharded_mesh(tmp_path, monkeypatch):
    """AOT over a MULTI-device mesh: sharded inputs export with their
    NamedShardings recorded (distinct cache entries from the 1-device
    programs), deserialize back onto the same mesh shape, and reproduce
    the plain-jit sweep."""
    from misti_tpu.dist.mesh import make_mesh
    from misti_tpu.engine.bootstrap import sweep

    numT = 12
    grid = 0.015 * (1.14 ** np.arange(numT)) - 0.015
    times = list(np.diff(grid))
    tt = np.cumsum([0.0] + times)
    lams = [list(v) for v in np.stack(
        [1.0 + 0.3 * np.sin(tt * 11.0), 1.1 + 0.25 * np.cos(tt * 7.0)],
        axis=1)]
    rng = np.random.default_rng(3)
    base = np.array([3000.0, 800, 2900, 1500, 1200, 850, 1250])
    data = np.stack([base * rng.uniform(0.9, 1.1, size=7) for _ in range(4)])
    kw = dict(tol=1e-4, cpfit=True, smooth=False, unfolded=True,
              stage_caps=(4, 8), mesh=make_mesh(4))

    monkeypatch.setenv("MISTI_AOT", "0")
    r_plain = sweep(times, lams, data, [4, 7], [[1, 0, "ST", 0.25, 1]], (),
                    **kw)
    monkeypatch.setenv("MISTI_AOT", "1")
    monkeypatch.setenv("MISTI_AOT_DIR", str(tmp_path))
    r_aot = sweep(times, lams, data, [4, 7], [[1, 0, "ST", 0.25, 1]], (), **kw)
    np.testing.assert_array_equal(r_aot.llh, r_plain.llh)
    np.testing.assert_array_equal(r_aot.params, r_plain.params)
    np.testing.assert_array_equal(r_aot.nfev, r_plain.nfev)
    assert len([f for f in os.listdir(tmp_path)
                if f.endswith(".jaxexport")]) >= 2
    before = set(os.listdir(tmp_path))
    r_warm = sweep(times, lams, data, [4, 7], [[1, 0, "ST", 0.25, 1]], (), **kw)
    assert set(os.listdir(tmp_path)) == before
    np.testing.assert_array_equal(r_warm.llh, r_plain.llh)
