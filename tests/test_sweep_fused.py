"""Fused sweep (split time as data index) vs per-split likelihoods."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from misti_tpu.engine.likelihood import build_likelihood
from misti_tpu.engine.spec import build_spec
from misti_tpu.engine.sweep_fused import build_fused_sweep


def _toy(numT=12):
    grid = 0.015 * (1.14 ** np.arange(numT)) - 0.015
    times = list(np.diff(grid))
    tt = np.cumsum([0.0] + times)
    lams = np.stack(
        [1.0 + 0.3 * np.sin(tt * 11.0), 1.1 + 0.25 * np.cos(tt * 7.0)], axis=1
    )
    return times, [list(v) for v in lams]


def test_fused_matches_per_split():
    times, lams = _toy()
    splits = [4, 7]
    data = np.array([3000.0, 800, 2900, 1500, 1200, 850, 1250])
    fused = build_fused_sweep(
        times, lams, splits, [[1, 0, "ST", 0.25, 1]], [],
        cpfit=True, smooth=True, unfolded=True,
    )
    fused_llh = jax.jit(fused.llh)
    for i, st in enumerate(splits):
        spec = build_spec(
            times, lams, [0.0, *data], st, [[1, 0, st, 0.25, 1]], [],
            cpfit=True, smooth=True, unfolded=True,
        )
        lik = build_likelihood(spec, sequential=False)
        for rate in (0.25, 0.6):
            a = float(fused_llh(i, np.array([rate]), data))
            b = float(lik.llh_data(np.array([rate]), jnp.asarray(data)))
            np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-6,
                                       err_msg=f"st={st} rate={rate}")


def test_fused_coaltime_mode_matches():
    """Non-cpfit (expected-coalescence-time) mode through the fused path."""
    times, lams = _toy()
    data = np.array([3000.0, 800, 2900, 1500, 1200, 850, 1250])
    fused = build_fused_sweep(
        times, lams, [5], [[1, 0, "ST", 0.2, 1]], [],
        cpfit=False, smooth=False, unfolded=True,
    )
    spec = build_spec(times, lams, [0.0, *data], 5, [[1, 0, 5, 0.2, 1]], [],
                      cpfit=False, smooth=False, unfolded=True)
    lik = build_likelihood(spec, sequential=False)
    a = float(jax.jit(fused.llh)(0, np.array([0.2]), data))
    b = float(lik.llh_data(np.array([0.2]), jnp.asarray(data)))
    np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-6)


def test_fused_vmaps_over_grid():
    times, lams = _toy()
    splits = [4, 6]
    fused = build_fused_sweep(
        times, lams, splits, [[1, 0, "ST", 0.25, 1]], [],
        cpfit=True, smooth=False, unfolded=True,
    )
    rng = np.random.default_rng(0)
    data = np.abs(rng.normal(2000, 300, size=(3, 7)))
    st_idx, b_idx = np.meshgrid(np.arange(2), np.arange(3), indexing="ij")
    grid_llh = jax.jit(jax.vmap(fused.llh, in_axes=(0, None, 0)))
    out = grid_llh(
        jnp.asarray(st_idx.ravel()),
        np.array([0.3]),
        jnp.asarray(data[b_idx.ravel()]),
    )
    assert out.shape == (6,)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fused_sweep_pallas_correction_trace_matches_scan():
    """The grid sweep's dynamic-table fused correction (per-lane lh/times
    tables, T == 0 padding rows) computes the same cells as the scan-Jacobi
    strategy -- validated through the fused-xla trace of the kernel body."""
    times, lams = _toy()
    splits = [4, 7]
    data = np.array([3000.0, 800, 2900, 1500, 1200, 850, 1250])
    mk = lambda mode: build_fused_sweep(
        times, lams, splits, [[1, 0, "ST", 0.25, 1]], [],
        cpfit=True, smooth=True, unfolded=True, correction_mode=mode,
    )
    f_scan = mk("scan")
    f_fused = mk("fused-xla")
    for i in range(len(splits)):
        for rate in (0.25, 0.6):
            a = float(jax.jit(f_fused.llh)(i, np.array([rate]), data))
            b = float(jax.jit(f_scan.llh)(i, np.array([rate]), data))
            np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-5,
                                       err_msg=f"st={splits[i]} rate={rate}")
    # batched over cells (the production layout): custom_vmap flattening
    cells = [(0, 0.25), (0, 0.6), (1, 0.25), (1, 0.6), (1, 0.9)]
    st_i = jnp.asarray([c[0] for c in cells], jnp.int32)
    ps = jnp.asarray([[c[1]] for c in cells])
    batch = jax.jit(jax.vmap(lambda s, p: f_fused.llh(s, p, data)))(st_i, ps)
    for k, (i, rate) in enumerate(cells):
        b = float(jax.jit(f_scan.llh)(i, np.array([rate]), data))
        np.testing.assert_allclose(float(batch[k]), b, rtol=1e-7, atol=1e-5)


def test_multi_stage_compaction_matches_single_phase():
    """Straggler compaction (staged iteration caps + compacted NMState
    resume) must reproduce the uninterrupted lockstep sweep exactly --
    Nelder-Mead is Markov in (simplex, fsim, it), so pausing and resuming
    cannot change the trajectory, the counters, or which cells converge."""
    from misti_tpu.engine.bootstrap import sweep

    times, lams = _toy()
    rng = np.random.default_rng(3)
    base = np.array([3000.0, 800, 2900, 1500, 1200, 850, 1250])
    data = np.stack([base * rng.uniform(0.9, 1.1, size=7) for _ in range(5)])
    kw = dict(tol=1e-4, cpfit=True, smooth=False, unfolded=True)
    r1 = sweep(times, lams, data, [4, 7], [[1, 0, "ST", 0.25, 1]], (),
               phase1_maxiter=10_000, **kw)
    # round-3 two-phase API: phase1_maxiter=3 forces nearly every cell
    # through the resume path, bucket=4 forces multiple chunks
    r2 = sweep(times, lams, data, [4, 7], [[1, 0, "ST", 0.25, 1]], (),
               phase1_maxiter=3, bucket=4, **kw)
    # multi-stage schedule: several resume rounds at shrinking widths
    r3 = sweep(times, lams, data, [4, 7], [[1, 0, "ST", 0.25, 1]], (),
               stage_caps=(2, 5, 9, 14), **kw)
    for r in (r2, r3):
        np.testing.assert_array_equal(r.llh, r1.llh)
        np.testing.assert_array_equal(r.params, r1.params)
        np.testing.assert_array_equal(r.nfev, r1.nfev)


def test_fused_fractional_split_matches_per_split():
    """Fractional split times through the fused grid: each lane's
    containing interval is pre-split at build time (the build_spec /
    MigrationInference.py:89-99 preprocessing), so st = k + 0.5 must equal
    the dedicated per-split program -- no per-split compile fallback."""
    times, lams = _toy()
    splits = [4.5, 6.0, 6.25]
    data = np.array([3000.0, 800, 2900, 1500, 1200, 850, 1250])
    fused = build_fused_sweep(
        times, lams, splits, [[1, 0, "ST", 0.25, 1]], [],
        cpfit=True, smooth=True, unfolded=True,
    )
    fused_llh = jax.jit(fused.llh)
    for i, st in enumerate(splits):
        spec = build_spec(
            times, lams, [0.0, *data], st, [[1, 0, int(st), 0.25, 1]], [],
            cpfit=True, smooth=True, unfolded=True,
        )
        lik = build_likelihood(spec, sequential=False)
        for rate in (0.25, 0.6):
            a = float(fused_llh(i, np.array([rate]), data))
            b = float(lik.llh_data(np.array([rate]), jnp.asarray(data)))
            np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-6,
                                       err_msg=f"st={st} rate={rate}")


def test_sweep_cli_path_fractional_splits():
    """sweep() keeps the one-compile fused grid for fractional splits."""
    from misti_tpu.engine.bootstrap import sweep

    times, lams = _toy()
    rng = np.random.default_rng(5)
    base = np.array([3000.0, 800, 2900, 1500, 1200, 850, 1250])
    data = np.stack([base * rng.uniform(0.9, 1.1, size=7) for _ in range(3)])
    r = sweep(times, lams, data, [4.5, 6.0], [[1, 0, "ST", 0.25, 1]], (),
              tol=1e-4, cpfit=True, smooth=False, unfolded=True)
    assert r.llh.shape == (2, 3) and np.all(np.isfinite(r.llh))
    # parity with the per-split (fused=False) validation path
    r0 = sweep(times, lams, data, [4.5, 6.0], [[1, 0, "ST", 0.25, 1]], (),
               tol=1e-4, cpfit=True, smooth=False, unfolded=True, fused=False)
    np.testing.assert_allclose(r.llh, r0.llh, rtol=1e-8, atol=1e-6)


def test_fused_sweep_with_pulse_template_matches_per_split():
    """Pulse-migration templates ("ST" time placeholder) through the fused
    grid: padded rows must never fire a pulse, and each cell must equal the
    per-split likelihood."""
    times, lams = _toy()
    splits = [4, 6]
    data = np.array([3000.0, 800, 2900, 1500, 1200, 850, 1250])
    fused = build_fused_sweep(
        times, lams, splits, [[1, 0, "ST", 0.2, 1]], [[2, 2, 0.15, 0]],
        cpfit=True, smooth=False, unfolded=True,
    )
    for i, st in enumerate(splits):
        spec = build_spec(
            times, lams, [0.0, *data], st, [[1, 0, st, 0.2, 1]],
            [[2, 2, 0.15, 0]], cpfit=True, smooth=False, unfolded=True,
        )
        lik = build_likelihood(spec, sequential=False)
        for rate in (0.1, 0.5):
            a = float(jax.jit(fused.llh)(i, np.array([rate]), data))
            b = float(lik.llh_data(np.array([rate]), jnp.asarray(data)))
            np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-6,
                                       err_msg=f"st={st} rate={rate}")


def test_two_band_sweep_matches_per_split_and_compaction():
    """The LIVE han_fre command shape (reference test.bs/han_fre.bs.sh:36):
    TWO optimised migration bands (`-mi 1 4 ST r 1 -mi 2 4 ST r 1 --cpfit`,
    n_params = 2) through the fused grid.  Pins (a) every cell against the
    dedicated per-split likelihood at 2-parameter points, and (b) the
    staged straggler compaction bitwise against the uninterrupted lockstep
    sweep at n_params = 2 (the Markov-resume property must hold for
    2-simplexes exactly as for 1-simplexes)."""
    from misti_tpu.engine.bootstrap import sweep

    times, lams = _toy()
    splits = [4, 7]
    mi_t = [[1, 2, "ST", 0.3, 1], [2, 2, "ST", 0.3, 1]]
    data = np.array([3000.0, 800, 2900, 1500, 1200, 850, 1250])
    fused = build_fused_sweep(times, lams, splits, mi_t, [],
                              cpfit=True, smooth=True, unfolded=True)
    assert fused.n_params == 2
    fused_llh = jax.jit(fused.llh)
    for i, st in enumerate(splits):
        spec = build_spec(
            times, lams, [0.0, *data], st,
            [[1, 2, st, 0.3, 1], [2, 2, st, 0.3, 1]], [],
            cpfit=True, smooth=True, unfolded=True,
        )
        lik = build_likelihood(spec, sequential=False)
        for rates in ((0.3, 0.3), (0.7, 0.1), (0.05, 0.9)):
            a = float(fused_llh(i, np.array(rates), data))
            b = float(lik.llh_data(np.array(rates), jnp.asarray(data)))
            np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-6,
                                       err_msg=f"st={st} rates={rates}")

    rng = np.random.default_rng(7)
    bs = np.stack([data * rng.uniform(0.9, 1.1, size=7) for _ in range(4)])
    kw = dict(tol=1e-4, cpfit=True, smooth=True, unfolded=True)
    r1 = sweep(times, lams, bs, splits, mi_t, (), phase1_maxiter=10_000, **kw)
    r2 = sweep(times, lams, bs, splits, mi_t, (), stage_caps=(3, 8, 15), **kw)
    assert r1.params.shape == (2, 4, 2)
    np.testing.assert_array_equal(r2.llh, r1.llh)
    np.testing.assert_array_equal(r2.params, r1.params)
    np.testing.assert_array_equal(r2.nfev, r1.nfev)


def test_sweep_many_scenario_matrix_reuses_programs():
    """The resident scenario matrix (engine/bootstrap.py `sweep_many`,
    modelling the reference's 16-script test.bs/ suite): scenarios with
    matching grid shapes + static flags must (a) produce results BITWISE
    equal to independent `sweep()` runs, and (b) share ONE compiled stage
    program -- the per-scenario numeric tables are traced arguments of the
    fused sweep (`FusedSweep.llh_t`), not baked constants."""
    from misti_tpu.engine.bootstrap import sweep, sweep_many

    def scen(seed):
        rng = np.random.default_rng(seed)
        grid = 0.015 * (1.14 ** np.arange(12)) - 0.015
        times = list(np.diff(grid))
        tt = np.cumsum([0.0] + times)
        lams = np.stack([1.0 + 0.3 * np.sin(tt * 11.0 + seed),
                         1.1 + 0.25 * np.cos(tt * 7.0)], axis=1)
        base = np.array([3000.0, 800, 2900, 1500, 1200, 850, 1250])
        data = np.stack([base * rng.uniform(0.9, 1.1, size=7)
                         for _ in range(2)])
        return times, [list(v) for v in lams], data

    kw = dict(cpfit=True, smooth=False, unfolded=True)
    t1, l1, d1 = scen(1)
    t2, l2, d2 = scen(2)
    mi = [[1, 0, "ST", 0.25, 1]]
    r1 = sweep(t1, l1, d1, [4, 7], mi, (), tol=1e-4, **kw)
    r2 = sweep(t2, l2, d2, [4, 7], mi, (), tol=1e-4, **kw)
    cache = {}
    res = sweep_many(
        [dict(name="a", times=t1, lambdas=l1, data=d1, splits=[4, 7],
              mi_template=mi, **kw),
         dict(name="b", times=t2, lambdas=l2, data=d2, splits=[4, 7],
              mi_template=mi, **kw)],
        tol=1e-4, prog_cache=cache,
    )
    np.testing.assert_array_equal(res["a"].llh, r1.llh)
    np.testing.assert_array_equal(res["b"].llh, r2.llh)
    np.testing.assert_array_equal(res["a"].params, r1.params)
    np.testing.assert_array_equal(res["b"].params, r2.params)
    np.testing.assert_array_equal(res["a"].nfev, r1.nfev)
    assert len(cache) == 1  # one shared program for the whole matrix
