"""Optimisers: device Nelder-Mead (scipy-semantics) and basin-hopping wrapper.

The reference fits 1-4 migration/pulse parameters with
``scipy.optimize.minimize(method='Nelder-Mead', xatol=fatol=tol,
maxiter=1000)`` (MigrationInference.py:718-731).  This module provides a
branch-free Nelder-Mead with identical update rules and termination
semantics, expressed with `lax.while_loop` + `where` selections so it jits
and vmaps: a batch of B fits runs in lockstep, turning every simplex step
into one (4+n)*B-wide batched likelihood evaluation -- the TPU replacement
for GNU-Parallel process fan-out.

Infinite objectives (llh = -inf failures) are handled like scipy: they are
ordinary comparably-large values; termination additionally requires a finite
best vertex.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_RHO = 1.0  # reflection
_CHI = 2.0  # expansion
_PSI = 0.5  # contraction
_SIGMA = 0.5  # shrink
_NONZDELT = 0.05
_ZDELT = 0.00025


class NMResult(NamedTuple):
    x: jax.Array  # (n,) best vertex
    fun: jax.Array  # scalar best objective
    nit: jax.Array  # iterations used
    converged: jax.Array  # bool
    # Backend-neutral defaults: concrete jnp defaults would initialise the
    # JAX backend at import time, before config.setup_platform() can force
    # CPU (the sitecustomize pins the axon platform; see CLAUDE.md).
    nfev: "jax.Array | int" = 0  # objective evaluations performed
    aux_sum: "jax.Array | None" = None  # accumulated per-eval aux counters


class NMState(NamedTuple):
    """Resumable Nelder-Mead state: the optimisation is Markov in
    (simplex, objective values, iteration counter), so a fit paused at
    ``maxiter`` and resumed via ``state0`` follows the identical trajectory
    as an uninterrupted run (used for straggler compaction in sweeps)."""

    sim: jax.Array  # (n+1, n)
    fsim: jax.Array  # (n+1,)
    it: jax.Array
    nfev: jax.Array
    aux_sum: jax.Array


def _initial_simplex(x0):
    n = x0.shape[-1]
    pert = jnp.where(x0 != 0.0, x0 * (1.0 + _NONZDELT), _ZDELT)
    sim = jnp.broadcast_to(x0, (n + 1, n))
    sim = sim.at[1:].set(jnp.where(jnp.eye(n, dtype=bool), pert, x0))
    return sim


def nelder_mead(
    fun: Callable,
    x0,
    xatol: float = 1e-4,
    fatol: float = 1e-4,
    maxiter: int = 1000,
    naux: int = 0,
    state0: NMState | None = None,
    with_state: bool = False,
):
    """Minimise ``fun`` with scipy-compatible Nelder-Mead update rules.

    ``fun``: R^n -> scalar; evaluated on traced inputs, so under `vmap` every
    simplex trial point of every batched problem evaluates in one batch.

    ``naux > 0``: ``fun`` returns (scalar, aux (naux,)); the aux vectors are
    summed over every evaluated point into ``NMResult.aux_sum`` (used for the
    reference's per-eval correction counters, MigrationInference.py:36-38).

    ``state0`` resumes a previous run's NMState (same trajectory as an
    uninterrupted run); ``with_state=True`` returns (NMResult, NMState).
    """
    x0 = jnp.atleast_1d(jnp.asarray(x0))
    n = x0.shape[-1]

    def fun2(p):
        out = fun(p)
        return out if naux else (out, jnp.zeros(0, x0.dtype))

    if n == 0:
        f, aux = fun2(x0)
        res = NMResult(x=x0, fun=f, nit=jnp.asarray(0),
                       converged=jnp.asarray(True), nfev=jnp.asarray(1),
                       aux_sum=aux)
        if with_state:
            return res, NMState(sim=x0[None], fsim=f[None], it=res.nit,
                                nfev=res.nfev, aux_sum=aux)
        return res

    if state0 is None:
        sim = _initial_simplex(x0)
        fsim, aux0 = jax.vmap(fun2)(sim)
        aux_sum0 = aux0.sum(axis=0)
        it0 = jnp.asarray(0)
        nfev0 = jnp.asarray(n + 1)
    else:
        sim, fsim = state0.sim, state0.fsim
        aux_sum0 = state0.aux_sum
        it0 = state0.it
        nfev0 = state0.nfev

    def order(sim, fsim):
        idx = jnp.argsort(fsim)
        return sim[idx], fsim[idx]

    sim, fsim = order(sim, fsim)

    def converged(sim, fsim):
        xconv = jnp.max(jnp.abs(sim[1:] - sim[0])) <= xatol
        fconv = jnp.max(jnp.abs(fsim[0] - fsim[1:])) <= fatol
        # inf - inf = nan: treat as not converged, like scipy
        fconv = jnp.where(jnp.isnan(fconv), False, fconv)
        return xconv & fconv & jnp.isfinite(fsim[0])

    def cond(state):
        sim, fsim, it, _ = state
        return (~converged(sim, fsim)) & (it < maxiter)

    def body(state):
        # NB: under vmap this body runs for every lane until ALL lanes are
        # done; `halt` freezes converged lanes so batched fits are identical
        # to standalone fits.
        sim, fsim, it, counters = state
        nfev, aux_sum = counters
        halt = converged(sim, fsim)
        xbar = jnp.mean(sim[:-1], axis=0)
        xr = (1 + _RHO) * xbar - _RHO * sim[-1]
        xe = (1 + _RHO * _CHI) * xbar - _RHO * _CHI * sim[-1]
        xc = (1 + _PSI * _RHO) * xbar - _PSI * _RHO * sim[-1]
        xcc = (1 - _PSI) * xbar + _PSI * sim[-1]
        # shrink candidates, evaluated in the same batch
        shrunk = sim[0] + _SIGMA * (sim - sim[0])
        # ONE vmapped objective call per iteration: keeps the compiled graph
        # small (the objective is traced once, not 4+n times) and turns the
        # whole simplex step into a single batched likelihood evaluation.
        points = jnp.concatenate([jnp.stack([xr, xe, xc, xcc]), shrunk], axis=0)
        fall, auxall = jax.vmap(fun2)(points)
        nfev = nfev + jnp.where(halt, 0, points.shape[0])
        aux_sum = aux_sum + jnp.where(halt, 0.0, 1.0) * auxall.sum(axis=0)
        fxr, fxe, fxc, fxcc = fall[0], fall[1], fall[2], fall[3]
        fshrunk = fall[4:]

        # decision tree (scipy _minimize_neldermead), as selections
        take_xe = (fxr < fsim[0]) & (fxe < fxr)
        take_xr = ((fxr < fsim[0]) & ~(fxe < fxr)) | (
            (fxr >= fsim[0]) & (fxr < fsim[-2])
        )
        inside = (fxr >= fsim[0]) & (fxr >= fsim[-2])
        take_xc = inside & (fxr < fsim[-1]) & (fxc <= fxr)
        take_xcc = inside & (fxr >= fsim[-1]) & (fxcc < fsim[-1])
        doshrink = inside & (
            ((fxr < fsim[-1]) & ~(fxc <= fxr))
            | ((fxr >= fsim[-1]) & ~(fxcc < fsim[-1]))
        )

        new_last = jnp.where(
            take_xe[..., None], xe,
            jnp.where(take_xr[..., None], xr,
                      jnp.where(take_xc[..., None], xc,
                                jnp.where(take_xcc[..., None], xcc, sim[-1]))),
        )
        new_flast = jnp.where(
            take_xe, fxe,
            jnp.where(take_xr, fxr,
                      jnp.where(take_xc, fxc,
                                jnp.where(take_xcc, fxcc, fsim[-1]))),
        )
        sim1 = sim.at[-1].set(new_last)
        fsim1 = fsim.at[-1].set(new_flast)

        # shrink step (selected when needed)
        sim1 = jnp.where(doshrink, shrunk.at[0].set(sim[0]), sim1)
        fsim1 = jnp.where(doshrink, fshrunk.at[0].set(fsim[0]), fsim1)

        sim1, fsim1 = order(sim1, fsim1)
        sim1 = jnp.where(halt, sim, sim1)
        fsim1 = jnp.where(halt, fsim, fsim1)
        return sim1, fsim1, it + jnp.where(halt, 0, 1), (nfev, aux_sum)

    sim, fsim, it, counters = jax.lax.while_loop(
        cond, body, (sim, fsim, it0, (nfev0, aux_sum0))
    )
    # scipy reports nit = 1 + number of simplex updates
    res = NMResult(x=sim[0], fun=fsim[0], nit=it + 1,
                   converged=converged(sim, fsim), nfev=counters[0],
                   aux_sum=counters[1])
    if with_state:
        return res, NMState(sim=sim, fsim=fsim, it=it, nfev=counters[0],
                            aux_sum=counters[1])
    return res


class SolveResult:
    """Fit result that unpacks like the reference's ``[params, llh]`` pair
    but also carries the run's Report() counters
    (MigrationInference.py:36-38, 735-739) as a reentrant record."""

    def __init__(self, x, llh, nit=0, nfev=0, corr_called=0, corr_failed=0):
        self.x = np.asarray(x)
        self.llh = float(llh)
        self.nit = int(nit)
        self.nfev = int(nfev)
        self.corr_called = int(corr_called)
        self.corr_failed = int(corr_failed)

    def __iter__(self):
        return iter((self.x, self.llh))

    def __getitem__(self, i):
        return (self.x, self.llh)[i]

    def __len__(self):
        return 2

    def __repr__(self):
        # print(sol) must render exactly like the reference's [params, llh]
        # list (MiSTI.py:215) for drop-in stdout parity
        return repr([self.x, self.llh])


def solve(lik, tol: float = 1e-4, global_opt: bool = False, seed: int = 0,
          trace: bool = False, n_hops: int = 100,
          aot_key: "str | None" = None) -> SolveResult:
    """Reference ``Solve`` (MigrationInference.py:718-733): maximise the llh.

    Returns a :class:`SolveResult` that unpacks like the reference's
    ``[params, llh]`` and carries the Report() counters (``nit``/``nfev``/
    ``corr_called``/``corr_failed``).  With no optimised parameters,
    evaluates once.  ``global_opt`` runs a basin-hopping outer loop (T=0.5,
    Nelder-Mead local minimiser) on the host around the device NM, like the
    reference's scipy.optimize.basinhopping call.  ``trace`` prints every
    evaluated (mu, -llh) like the reference's ObjectiveFunction
    (MigrationInference.py:713-716).

    ``aot_key`` (with ``trace=False``) routes the fit program through the
    AOT export cache (engine/aot.py): warm processes deserialize the
    traced program instead of re-tracing it -- tracing dominates a warm
    single-fit CLI invocation (~15 of 18 s measured).  Per-eval trace
    printing uses a host callback that cannot cross the export boundary,
    so the two options are exclusive.

    Trace printing is CPU-backend-only: ``jax.debug.print`` needs host
    send/recv callbacks, which the axon TPU plugin does not implement
    (UNIMPLEMENTED at runtime), and a per-eval device->host print would
    serialize an accelerator fit regardless.  ``MISTI_PLATFORM=tpu``
    single fits therefore run quiet and print only the solver summary.
    """
    spec = lik.spec
    init = spec.init_params
    if trace and jax.default_backend() != "cpu":
        trace = False
    if spec.n_params == 0:
        llh, flags = jax.jit(lik.llh_flags)(np.zeros(0))
        return SolveResult(np.zeros(0), float(llh), nfev=1,
                           corr_called=int(flags[0]),
                           corr_failed=int(flags[1]))

    def obj(p):
        llh, flags = lik.llh_flags(p)
        if trace:
            jax.debug.print("{} {}", p, -llh)
        return -llh, flags

    nm = jax.jit(lambda x0: nelder_mead(obj, x0, xatol=tol, fatol=tol, naux=2))
    if aot_key and not trace:
        from .aot import CachedProgram

        nm = CachedProgram(nm, "fit-" + aot_key, verbose=True)

    def record(x, f, res_list):
        return SolveResult(
            x, -f,
            nit=sum(int(r.nit) for r in res_list),
            nfev=sum(int(r.nfev) for r in res_list),
            corr_called=sum(int(r.aux_sum[0]) for r in res_list),
            corr_failed=sum(int(r.aux_sum[1]) for r in res_list),
        )

    if not global_opt:
        res = nm(jnp.asarray(init, jnp.result_type(float)))
        # scipy disp-style summary (the reference passes disp=True)
        if bool(res.converged):
            print("Optimization terminated successfully.")
        else:
            print("Maximum number of iterations has been exceeded.")
        print(f"         Current function value: {float(res.fun):f}")
        print(f"         Iterations: {int(res.nit)}")
        print(f"         Function evaluations: {int(res.nfev)}")
        return record(np.asarray(res.x), float(res.fun), [res])

    # basin-hopping: random displacement + Metropolis accept at T=0.5, with
    # scipy's AdaptiveStepsize schedule (interval=50, factor=0.9, target
    # accept rate 0.5 -- the stepsize grows when hops keep being accepted,
    # which is what lets the walker escape wide basins)
    rng = np.random.default_rng(seed)
    temp = 0.5
    stepsize = 0.5
    interval, factor, target_accept = 50, 0.9, 0.5
    naccept = 0
    x = np.asarray(init, float)
    res = nm(jnp.asarray(x))
    all_res = [res]
    best_x, best_f = np.asarray(res.x), float(res.fun)
    cur_x, cur_f = best_x, best_f
    for step in range(1, n_hops + 1):
        if step % interval == 0:
            stepsize = (stepsize / factor if naccept / step > target_accept
                        else stepsize * factor)
        trial = cur_x + rng.uniform(-stepsize, stepsize, size=cur_x.shape)
        r = nm(jnp.asarray(trial))
        all_res.append(r)
        fx = float(r.fun)
        if fx < best_f:
            best_x, best_f = np.asarray(r.x), fx
        if fx <= cur_f or rng.random() < np.exp(-(fx - cur_f) / temp):
            cur_x, cur_f = np.asarray(r.x), fx
            naccept += 1
    return record(best_x, best_f, all_res)


def solve_batch(lik, x0_batch, tol: float = 1e-4):
    """Batched fits in lockstep: one compiled program, vmapped simplexes.

    x0_batch: (B, n) initial parameter vectors -> NMResult of batch shape B.
    """
    obj = lambda p: -lik.llh(p)
    run = jax.jit(jax.vmap(lambda x0: nelder_mead(obj, x0, xatol=tol, fatol=tol)))
    return run(jnp.asarray(x0_batch, jnp.result_type(float)))
