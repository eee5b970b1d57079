"""Nelder-Mead parity with scipy and the reference full-fit oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import optimize as sopt

from conftest import load_fixture
from misti_tpu.engine.optimize import nelder_mead, solve, solve_batch
from misti_tpu.engine.spec import build_spec
from misti_tpu.engine.likelihood import build_likelihood


@pytest.mark.parametrize(
    "fn,x0",
    [
        (lambda x: (x[0] - 1.3) ** 2 + 2.0 * (x[1] + 0.4) ** 2, [0.0, 0.0]),
        (lambda x: (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2, [-1.2, 1.0]),
        (lambda x: jnp.abs(x[0] - 0.7) + (x[1] * x[2]) ** 2, [0.1, 0.5, -0.5]),
    ],
)
def test_nm_matches_scipy(fn, x0):
    ours = nelder_mead(fn, jnp.asarray(x0), xatol=1e-6, fatol=1e-6, maxiter=2000)
    ref = sopt.minimize(
        lambda x: float(fn(jnp.asarray(x))), np.asarray(x0), method="Nelder-Mead",
        options={"xatol": 1e-6, "fatol": 1e-6, "maxiter": 2000},
    )
    assert bool(ours.converged)
    np.testing.assert_allclose(np.asarray(ours.x), ref.x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(ours.fun), ref.fun, rtol=1e-6, atol=1e-9)


def test_nm_identical_trajectory_quadratic():
    """Same update rules => same iterate count on a smooth problem."""
    fn = lambda x: (x[0] - 2.0) ** 2 + (x[1] - 1.0) ** 2 + x[0] * x[1] * 0.3
    ours = nelder_mead(fn, jnp.asarray([0.3, -0.4]), xatol=1e-4, fatol=1e-4)
    ref = sopt.minimize(
        lambda x: float(fn(jnp.asarray(x))), [0.3, -0.4], method="Nelder-Mead",
        options={"xatol": 1e-4, "fatol": 1e-4, "maxiter": 1000},
    )
    assert int(ours.nit) == ref.nit
    np.testing.assert_allclose(np.asarray(ours.x), ref.x, rtol=0, atol=1e-12)


def test_nm_handles_inf_objective():
    fn = lambda x: jnp.where(x[0] < 0, jnp.inf, (x[0] - 0.5) ** 2)
    res = nelder_mead(fn, jnp.asarray([2.0]), xatol=1e-6, fatol=1e-6)
    assert bool(res.converged)
    np.testing.assert_allclose(float(res.x[0]), 0.5, atol=1e-4)


def test_full_fit_matches_reference_solve():
    """The reference Nelder-Mead fit oracle (solve.npz): 1 migration param."""
    fx = load_fixture("solve.npz")
    spec = build_spec(
        list(fx["times"]), [list(v) for v in fx["lams"]], list(fx["sfs"]),
        float(fx["splitT"]), [list(v) for v in fx["mi"]], [],
        unfolded=True, smooth=False,
    )
    lik = build_likelihood(spec)
    x, llh = solve(lik, tol=1e-4)
    # optimum is at the x >= 0 boundary; llh is the meaningful comparison
    np.testing.assert_allclose(llh, float(fx["llh"]), rtol=1e-7, atol=2e-4)
    assert abs(float(x[0]) - float(fx["x"][0])) < 1e-3


def test_solve_batch_lockstep():
    fx = load_fixture("solve.npz")
    spec = build_spec(
        list(fx["times"]), [list(v) for v in fx["lams"]], list(fx["sfs"]),
        float(fx["splitT"]), [list(v) for v in fx["mi"]], [],
        unfolded=True, smooth=False,
    )
    lik = build_likelihood(spec)
    # NB: starts must be in the finite-llh region -- from a start whose whole
    # initial simplex has llh = -inf (e.g. x0 >= ~0.9 here, where the lambda
    # correction fails), Nelder-Mead shrinks in place forever, exactly like
    # scipy on an all-inf simplex.
    res = solve_batch(lik, np.array([[0.5], [0.1], [0.35]]), tol=1e-4)
    # all starts converge to the same boundary optimum (x -> 0); with a
    # nonzero gradient at the boundary, xatol=1e-4 termination leaves an
    # O(grad * xatol) spread in the objective
    x = np.asarray(res.x)
    np.testing.assert_allclose(x, 0.0, atol=2e-3)
    f = -np.asarray(res.fun)
    np.testing.assert_allclose(f, f[0], atol=2e-2)


class _FakeSpec:
    n_params = 2
    init_params = [0.45, 0.0]


class _FakeLik:
    """Duck-typed Likelihood over an asymmetric double-well: the local
    minimum near x=+0.5 traps plain NM from the init; the global minimum is
    near x=-0.5 (reference basinhopping semantics, MigrationInference.py:724)."""

    spec = _FakeSpec()

    @staticmethod
    def _f(p):
        return (4.0 * p[0] ** 2 - 1.0) ** 2 + 0.3 * p[0] + p[1] ** 2

    def llh_flags(self, p):
        return -self._f(p), jnp.zeros(2, jnp.result_type(float))

    def llh(self, p):
        return -self._f(p)


def test_basinhopping_escapes_local_minimum():
    lik = _FakeLik()
    x_loc, llh_loc = solve(lik, tol=1e-6)  # plain NM: trapped near +0.5
    assert abs(float(x_loc[0]) - 0.5) < 0.1
    x_glob, llh_glob = solve(lik, tol=1e-6, global_opt=True, seed=0, n_hops=25)
    assert abs(float(x_glob[0]) + 0.5) < 0.1  # global well found
    assert llh_glob > llh_loc
    # scipy basinhopping (the reference's optimizer) lands in the same well
    ref = sopt.basinhopping(
        lambda x: float(_FakeLik._f(x)), [0.45, 0.0], T=0.5, seed=0,
        minimizer_kwargs=dict(method="Nelder-Mead"),
    )
    np.testing.assert_allclose(np.asarray(x_glob), ref.x, atol=1e-2)
    np.testing.assert_allclose(-llh_glob, ref.fun, atol=1e-5)


def test_report_counters():
    """solve() returns the reference Report() counters in a SolveResult
    record (MigrationInference.py:36-38): nfev counts every evaluated
    candidate, corr_called every eval past the negative-rate guard
    (CorrectLambdas increments CORRECTION_CALLED at its top even under
    trueEPS, MigrationInference.py:306,325), corr_failed every eval whose
    corrected rates went non-positive."""
    fx = load_fixture("solve.npz")
    spec = build_spec(
        list(fx["times"]), [list(v) for v in fx["lams"]], list(fx["sfs"]),
        float(fx["splitT"]), [list(v) for v in fx["mi"]], [],
        unfolded=True, smooth=False,
    )
    lik = build_likelihood(spec)
    sol = solve(lik, tol=1e-4)
    x, llh = sol  # unpacks like the reference's [params, llh]
    assert llh == sol.llh and np.array_equal(x, sol.x)
    n = 1
    assert sol.nfev >= (n + 1) + sol.nit - 1
    assert 0 < sol.corr_called <= sol.nfev
    assert 0 <= sol.corr_failed <= sol.corr_called
    # trueEPS: CorrectLambdas is still CALLED once per guarded eval (it just
    # skips the solves), and can never fail
    spec_t = build_spec(
        list(fx["times"]), [list(v) for v in fx["lams"]], list(fx["sfs"]),
        float(fx["splitT"]), [list(v) for v in fx["mi"]], [],
        unfolded=True, smooth=False, correct=False,
    )
    sol_t = solve(build_likelihood(spec_t), tol=1e-4)
    assert 0 < sol_t.corr_called <= sol_t.nfev
    assert sol_t.corr_failed == 0


def test_solve_trace_gated_off_accelerator(monkeypatch, capsys):
    """trace=True must be ignored on non-CPU backends: jax.debug.print
    needs host send/recv callbacks, which the axon TPU plugin does not
    implement (UNIMPLEMENTED at runtime) -- an accelerator single fit
    runs quiet and prints only the scipy-style solver summary."""
    fx = load_fixture("solve.npz")
    spec = build_spec(
        list(fx["times"]), [list(v) for v in fx["lams"]], list(fx["sfs"]),
        float(fx["splitT"]), [list(v) for v in fx["mi"]], [],
        unfolded=True, smooth=False,
    )
    lik = build_likelihood(spec)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    sol = solve(lik, tol=1e-4, trace=True)
    out = capsys.readouterr().out.strip().splitlines()
    # only the 4 scipy disp-style summary lines -- no per-eval trace lines
    assert len(out) == 4 and out[0].startswith("Optimization terminated")
    np.testing.assert_allclose(sol.llh, float(fx["llh"]), rtol=1e-7, atol=2e-4)
