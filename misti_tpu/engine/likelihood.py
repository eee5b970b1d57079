"""Fused device likelihood: correction sweep -> JSFS spectrum -> multinomial llh.

The reference evaluates one likelihood with two sequential Python loops over
time intervals (MigrationInference.py:305-378 `CorrectLambdas` and :467-506
`JAFSpectrum`), rebuilding dense rate matrices in pure Python per interval.
Here both sweeps are `lax.scan`s over precomputed static per-interval inputs,
each step doing a handful of small batched matmuls (the augmented expm), so
the whole evaluation jits into one XLA program that can be vmapped over
optimiser candidates and sharded over bootstrap replicates.

Failure semantics follow the reference: negative parameters or a failed
lambda correction (any corrected rate <= 0 pre-split) yield -inf
(MigrationInference.py:566-578) via a validity mask instead of early returns.
"""

from __future__ import annotations

import dataclasses

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import correction as kc
from ..kernels.expm import expm_action_pair, expm_and_integral
from ..model import statespace as ss
from .spec import ModelSpec


def _pulse_update_3state(p0, rate, pop: int):
    """Closed-form pulse update of the (2,3) correction state
    (MigrationInference.py:315-323).  Identity at rate == 0."""
    p = pop
    q = 1 - pop
    col = lambda c: p0[:, c]
    new_p = col(p) * (1.0 - rate) ** 2
    new_q = col(p) * rate**2 + col(q) + col(2) * rate
    new_2 = col(p) * 2.0 * (1.0 - rate) * rate + col(2) * (1.0 - rate)
    cols = [None, None, None]
    cols[p], cols[q], cols[2] = new_p, new_q, new_2
    return jnp.stack(cols, axis=1)


@dataclasses.dataclass
class Likelihood:
    """Compiled likelihood functions for one ModelSpec."""

    spec: ModelSpec
    llh: Callable  # params (n,) -> scalar llh (-inf on failure)
    llh_aux: Callable  # params -> (llh, dict(jafs, lc, pr, valid))
    llh_batch: Callable  # params (B, n) -> (B,) llh
    llh_data: Callable = None  # (params, data7) -> llh, for bootstrap batching
    llh_flags: Callable = None  # params -> (llh, [corr_called, corr_failed])


def build_likelihood(
    spec: ModelSpec,
    sequential: bool | None = None,
    correction_mode: str | None = None,
    fused_opts: dict | None = None,
) -> Likelihood:
    """Build the compiled likelihood for ``spec``.

    ``correction_mode`` picks the correction-sweep strategy:

    * ``"scan-seq"`` — reference-shaped sequential per-interval solve
      (best single-fit CPU latency, early-exit inner loops);
    * ``"scan-jacobi"`` — Jacobi parallel fixed point with per-interval
      vmapped LM solves as plain XLA ops;
    * ``"fused-pallas"`` — the whole sweep (chain + all Jacobi rounds +
      every LM iteration) in ONE Pallas TPU kernel with lanes = candidates
      (kernels/correction_pallas.py); best batched TPU throughput —
      the scan strategies dispatch thousands of tiny (B, 3, 3) HLO ops;
    * ``"fused-xla"`` / ``"fused-interpret"`` — the same fused trace as
      plain XLA ops / under the Pallas interpreter (CPU validation).

    Default: ``MISTI_CORRECTION`` env var if set, else ``scan-seq`` on the
    CPU backend and ``fused-pallas`` on accelerators.  ``sequential`` is a
    back-compat alias: True = ``scan-seq``, False = ``scan-jacobi``.
    """
    import os as _os

    import jax as _jax

    if correction_mode is None and sequential is not None:
        correction_mode = "scan-seq" if sequential else "scan-jacobi"
    if correction_mode is None:
        correction_mode = _os.environ.get("MISTI_CORRECTION", "")
    if not correction_mode:
        correction_mode = (
            "scan-seq" if _jax.default_backend() == "cpu" else "fused-pallas"
        )
    sequential = correction_mode == "scan-seq"
    b2 = ss.two_pop_basis()
    b1 = ss.one_pop_basis()
    s = spec.splitT
    numT = spec.numT
    sd = spec.sample_date

    # static per-interval inputs
    times = np.asarray(spec.times, dtype=float)  # (numT-1,)
    lh = np.asarray(spec.lh, dtype=float)  # (numT, 2)
    pre_T = times[:s]
    post_T = times[s : numT - 1]
    # category mask: genome-2 categories are zeroed before the ancient sample
    # exists (MigrationInference.py:503-505)
    catmask = np.ones((s, 7))
    catmask[:sd, 2:] = 0.0
    is_sample = np.zeros(s, dtype=bool)
    if sd < s:
        is_sample[sd] = True

    # statically migration-free model: no fixed bands, no optimised rates
    static_no_mig = (len(spec.opt_mi) == 0) and bool(np.all(spec.mi_base == 0))

    mi_any = spec.mi_masks.sum(0) if len(spec.opt_mi) else np.zeros((numT, 2))
    pu_any = spec.pu_masks.sum(0) if len(spec.opt_pu) else np.zeros((numT, 2))
    n_mi = len(spec.opt_mi)
    n_pu = len(spec.opt_pu)
    n_par = n_mi + n_pu

    def map_params(params):
        """MapParameters (MigrationInference.py:291-298): overwrite the
        optimised regions of the fixed-rate tables with the parameters."""
        mi = jnp.asarray(spec.mi_base)
        pu = jnp.asarray(spec.pu_base)
        if n_mi:
            mi = mi * (1.0 - jnp.asarray(mi_any)) + jnp.einsum(
                "k,ktc->tc", params[:n_mi], jnp.asarray(spec.mi_masks)
            )
        if n_pu:
            pu = pu * (1.0 - jnp.asarray(pu_any)) + jnp.einsum(
                "k,ktc->tc", params[n_mi:], jnp.asarray(spec.pu_masks)
            )
        return mi, pu

    # -- correction sweep (CorrectLambdas, MigrationInference.py:305-378) ----
    #
    # The reference solves the per-interval 2-unknown systems SEQUENTIALLY
    # (each interval's solve consumes the p0 propagated through all earlier
    # intervals).  That chain is >99% of the corrected-likelihood runtime on
    # TPU (measured: 239 evals/s with it vs ~30k evals/s spectrum-only).
    # Here the chain is a Jacobi fixed point: given rate guesses for ALL
    # intervals, propagate the cheap closed-form p0 chain in one scan, then
    # solve every interval's system in ONE batched LM; iterate.  The fixed
    # point is exactly the sequential solution (interval t is exact after
    # t+1 outer iterations by induction), and in practice contraction is
    # quadratic-ish: bitwise agreement after ~5 outers on 28-interval
    # models.  K outer iterations replace s sequential solves.
    _PAR_OUTERS = 6

    def _chain(lc_pre, mi_pre, pu_pre):
        """Propagate p0 through all pre-split intervals for given rates.

        Returns (p_solver (s,2,3): post-pulse state entering each solve,
        p_after (s,2,3): state after each interval, p_fin (2,3)).
        The propagation operator expm(M3(lc,mu) T) degenerates exactly to
        the reference's per-component decay formula when mu == 0, so one
        formula covers both reference branches (CorrectLambda.py:233,262,
        315-317).
        """
        p0 = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])

        def body(p, inp):
            lc_t, T_t, mi_t, pu_t = inp
            p = _pulse_update_3state(p, pu_t[0], 0)
            p = _pulse_update_3state(p, pu_t[1], 1)
            p_in = p
            m = ss.correction_matrix(lc_t[0], lc_t[1], mi_t[0], mi_t[1])
            e = kc.expm(m * T_t, max_squarings=20, unroll=True)
            p_next = p @ e.T
            return p_next, (p_in, p_next)

        p_fin, (p_solver, p_after) = jax.lax.scan(
            body, p0, (lc_pre, jnp.asarray(pre_T), mi_pre, pu_pre)
        )
        return p_solver, p_after, p_fin

    def correct_sweep_sequential(mi, pu):
        """Reference-shaped sequential sweep: best single-fit CPU latency
        (per-interval solves exit early; no redundant outer rounds)."""
        p0 = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])

        def body(p, inp):
            lh_t, T_t, mi_t, pu_t = inp
            p = _pulse_update_3state(p, pu_t[0], 0)
            p = _pulse_update_3state(p, pu_t[1], 1)
            lc_t, p_next = kc.solve_lambda_system(
                lh_t, T_t, mi_t, p, spec.cpfit, spec.mixture_th,
                static_no_mig=static_no_mig, early_exit=True,
            )
            return p_next, (lc_t, p_next.T)

        p_fin, (lc_pre, pr_tail) = jax.lax.scan(
            body, p0,
            (jnp.asarray(lh[:s]), jnp.asarray(pre_T), mi[:s], pu[:s]),
        )
        pr = jnp.concatenate([p0.T[None], pr_tail], axis=0)
        nc = p_fin.sum(axis=1)
        valid = jnp.all(lc_pre > 0) if s > 0 else jnp.asarray(True)
        return lc_pre, pr, nc, valid

    _fused_corr = None
    if correction_mode.startswith("fused") and spec.correct and s > 0:
        from ..kernels.correction_pallas import build_fused_correction

        has_pulse = bool(n_pu) or bool(np.any(np.asarray(spec.pu_base)[:s] != 0))
        _fused_corr = build_fused_correction(
            lh[:s],
            pre_T,
            cpfit=spec.cpfit,
            mixture_th=spec.mixture_th,
            static_no_mig=static_no_mig,
            has_pulse=has_pulse,
            mode="xla" if correction_mode == "fused-xla" else "pallas",
            interpret=correction_mode == "fused-interpret",
            **(fused_opts or {}),
        )

    def correct_sweep(mi, pu):
        p0 = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        lh_pre = jnp.asarray(lh[:s])

        if not spec.correct or s == 0:
            # trueEPS: rates pass through; p0 evolves only by pulses
            def body(p, inp):
                pu_t = inp
                p = _pulse_update_3state(p, pu_t[0], 0)
                p = _pulse_update_3state(p, pu_t[1], 1)
                return p, p.T

            p_fin, pr_tail = jax.lax.scan(body, p0, pu[:s])
            lc_pre = lh_pre
            pr = jnp.concatenate([p0.T[None], pr_tail], axis=0)
            nc = p_fin.sum(axis=1)
            valid = jnp.asarray(True)
        elif sequential:
            lc_pre, pr, nc, valid = correct_sweep_sequential(mi, pu)
        elif _fused_corr is not None:
            # one fused kernel for the entire sweep; the custom_vmap rule on
            # the kernel flattens optimiser/bootstrap vmap axes into lanes,
            # so the [None] batch axis costs nothing under llh_batch.
            lc3, pa3 = _fused_corr(mi[None, :s], pu[None, :s])
            lc_pre = lc3[0]
            p_after = pa3[0]  # (s, 2, 3)
            pr = jnp.concatenate(
                [p0.T[None], jnp.swapaxes(p_after, 1, 2)], axis=0
            )
            nc = p_after[-1].sum(axis=1)
            valid = jnp.all(lc_pre > 0)
        else:
            def solve_batch(p_solver, x0, iters):
                return jax.vmap(
                    lambda a, b, c, d, e: kc.solve_lambda_system(
                        a, b, c, d, spec.cpfit, spec.mixture_th,
                        static_no_mig=static_no_mig, x0=e, iters=iters,
                    )
                )(lh_pre, jnp.asarray(pre_T), mi[:s], p_solver, x0)

            # outer 0: full LM budget from the reference's lh start;
            # later outers warm-start at the previous round's solution, so
            # a short budget suffices (the Jacobi fixed point contracts
            # quadratically -- bitwise agreement with the sequential sweep
            # after ~5 rounds on realistic inputs).
            p_solver, _, _ = _chain(lh_pre, mi[:s], pu[:s])
            lc_pre, _ = solve_batch(p_solver, lh_pre, 48)

            def outer(lc_pre, _):
                p_solver, _, _ = _chain(lc_pre, mi[:s], pu[:s])
                lc_new, _ = solve_batch(p_solver, lc_pre, 12)
                return lc_new, None

            lc_pre, _ = jax.lax.scan(outer, lc_pre, None,
                                     length=_PAR_OUTERS - 1)
            # final consistent chain for Pr / nc (and the reference's exact
            # per-branch p_out formulas collapse to this same propagation)
            _, p_after, p_fin = _chain(lc_pre, mi[:s], pu[:s])
            pr = jnp.concatenate(
                [p0.T[None], jnp.swapaxes(p_after, 1, 2)], axis=0
            )
            nc = p_fin.sum(axis=1)
            valid = jnp.all(lc_pre > 0)

        # post-split sweep (:355-370): the nc carry is a prefix sum of
        # -T*lc, so the same Jacobi fixed point applies: given lc guesses,
        # all nc values come from one cumsum and every interval's
        # single-population fit runs in one batched call.
        sequential_post = sequential
        lh_post = jnp.asarray(lh[s : numT - 1])
        t_post = jnp.asarray(post_T)
        t_safe = jnp.where(t_post == 0, 1.0, t_post)

        if spec.cpfit or numT - 1 - s == 0 or sequential_post:
            # cpfit closed form / CPU path: keep the sequential scan
            def post_body(nc, inp):
                lh_t, T_t = inp
                if spec.cpfit:
                    # deviation form of MigrationInference.py:366: pnc ~ 1
                    # as lam*T -> 0, so form pnc - 1 from expm1 masses and
                    # take -log1p -- exact, f32-stable (nc here carries the
                    # reference's probability-valued carry, so the weight
                    # e^(nc1-nc0) is O(1))
                    ed = jnp.exp(nc[1] - nc[0])
                    dpnc = -(
                        -jnp.expm1(-T_t * lh_t[0])
                        + ed * -jnp.expm1(-T_t * lh_t[1])
                    ) / (1.0 + ed)
                    lam = -jnp.log1p(dpnc) / jnp.where(T_t == 0, 1.0, T_t)
                else:
                    # only the weight RATIO matters (fit_single_pop
                    # normalises): shift by max(nc) so the f32 path cannot
                    # underflow exp of the large-negative log no-coal mass
                    # (unshifted, exp(nc) -> 0/0 past nc ~ -87 and the
                    # whole ECT mode returns garbage llh on TPU)
                    m = jnp.maximum(nc[0], nc[1])
                    w = jnp.stack([jnp.exp(nc[0] - m), jnp.exp(nc[1] - m)])
                    lam = kc.fit_single_pop(
                        lh_t, jnp.where(T_t == 0, 1.0, T_t), w
                    )
                lam = jnp.where(T_t == 0, 1.0, lam)  # reference :357-359
                lc_t = jnp.stack([lam, lam])
                return nc - T_t * lc_t, lc_t

            nc_fin, lc_post = jax.lax.scan(post_body, nc, (lh_post, t_post))
        else:
            fit_batch = jax.vmap(kc.fit_single_pop)

            def post_outer(lc_post, _):
                dec = t_post[:, None] * lc_post  # (n_post, 2)
                csum = jnp.cumsum(dec, axis=0)
                nc_t = nc[None, :] - jnp.concatenate(
                    [jnp.zeros((1, 2), dec.dtype), csum[:-1]], axis=0
                )
                # shift by the per-interval max: ratio-invariant, immune to
                # f32 exp underflow of the cumulative log no-coal mass
                w = jnp.exp(nc_t - nc_t.max(axis=1, keepdims=True))
                lam = fit_batch(lh_post, t_safe, w)
                lam = jnp.where(t_post == 0, 1.0, lam)
                return jnp.stack([lam, lam], axis=-1), None

            lc0 = jnp.broadcast_to(
                lh_post.mean(axis=1, keepdims=True), lh_post.shape
            )
            lc_post, _ = jax.lax.scan(post_outer, lc0, None, length=_PAR_OUTERS)
            nc_fin = nc - jnp.sum(t_post[:, None] * lc_post, axis=0)

        # last (infinite) interval: weighted harmonic mean (:371-376);
        # max-shifted exp -- the mean is invariant to the common factor and
        # the raw exp underflows in f32
        m_nc = jnp.maximum(nc_fin[0], nc_fin[1])
        pr0 = jnp.exp(nc_fin[0] - m_nc)
        pr1 = jnp.exp(nc_fin[1] - m_nc)
        lam_last = (pr0 + pr1) / (pr0 / lh[numT - 1, 0] + pr1 / lh[numT - 1, 1])
        lc_last = jnp.stack([lam_last, lam_last])[None]

        if spec.smooth and s > 0:
            w = jnp.asarray(spec.smooth_w)  # (2, s, s)
            lc_pre = jnp.stack(
                [w[0] @ lc_pre[:, 0], w[1] @ lc_pre[:, 1]], axis=1
            )

        lc = jnp.concatenate([lc_pre, lc_post, lc_last], axis=0)  # (numT, 2)
        return lc, pr, valid

    # -- spectrum sweep (JAFSpectrum, MigrationInference.py:467-506) ---------

    ancient = jnp.asarray(b2.ancient)
    collapse = jnp.asarray(b2.collapse)
    jsfs2 = jnp.asarray(b2.jsfs)  # (44, 7)
    jsfs1 = jnp.asarray(b1.jsfs)  # (8, 7)

    # Vector-path spectrum (default): the scan body only ever needs the
    # ACTION of E and N1 on the carried state, so it uses the Taylor
    # sub-stepping action kernel whose matvecs are (batch, 44) @ (44, 176)
    # static-basis matmuls -- the batch fills the MXU rows, versus ~4%
    # systolic-array utilisation for batched (B, 44, 44) matmuls.  Measured
    # on v5e (scripts/bench_scaling.json): the corrected bench workload goes
    # from the matrix path's ~29k evals/s ceiling to the spectrum no longer
    # dominating.  MISTI_SPECTRUM=matrix restores the materialised-expm path.
    spectrum_mode = _os.environ.get("MISTI_SPECTRUM", "vector")
    k2 = jnp.asarray(np.concatenate(
        [b2.coal[0].T, b2.coal[1].T, b2.migr[0].T, b2.migr[1].T], axis=1
    ))  # (44, 176)
    norms2 = np.abs(np.stack(
        [b2.coal[0], b2.coal[1], b2.migr[0], b2.migr[1]]
    )).sum(axis=1).max(axis=1)  # one-norms of the four basis generators
    k1 = jnp.asarray(b1.coal.T)  # (8, 8)
    norms1 = np.abs(b1.coal).sum(axis=0).max(keepdims=True)

    def spectrum(lc, mi, pu):
        p0 = jnp.zeros(44, dtype=lc.dtype).at[2].set(1.0)

        # NOTE on structure: the per-interval exponentials could be batched
        # over intervals OUTSIDE this scan (they don't depend on the carry),
        # but measured on v5e that materialises (B, s, 88, 88) Taylor-power
        # intermediates in HBM and is ~25% SLOWER at production batch sizes
        # than keeping the expm inside the scan, where the working set stays
        # (B, 88, 88) and VMEM-resident.  Keep the expm in the body.
        def pre_body(p0, inp):
            lc_t, T_t, mi_t, pu_t, is_s, cmask = inp
            p0 = jnp.where(is_s, ancient @ p0, p0)
            p0 = ss.pulse_operator(pu_t[0], 0, b2) @ p0
            p0 = ss.pulse_operator(pu_t[1], 1, b2) @ p0
            if spectrum_mode == "vector":
                coeffs = jnp.stack([lc_t[0], lc_t[1], mi_t[0], mi_t[1]])
                p1, n1p = expm_action_pair(k2, coeffs, norms2, T_t, p0)
            else:
                m = ss.two_pop_matrix(lc_t[0], lc_t[1], mi_t[0], mi_t[1], b2)
                e, n1 = expm_and_integral(m, T_t)
                p1, n1p = e @ p0, n1 @ p0
            jafs_t = cmask * (n1p @ jsfs2)
            return p1, jafs_t

        p0, jafs_pre = jax.lax.scan(
            pre_body,
            p0,
            (
                lc[:s],
                jnp.asarray(pre_T),
                mi[:s],
                pu[:s],
                jnp.asarray(is_sample),
                jnp.asarray(catmask),
            ),
        )

        # ancient rebase exactly at the split (sampleDate == splitT) happens
        # before the collapse (reference :480-494 ordering)
        if sd == s:
            p0 = ancient @ p0
        p0 = collapse @ p0  # (8,)

        def post_body(p0, inp):
            lc_t, T_t = inp
            if spectrum_mode == "vector":
                p1, n1p = expm_action_pair(k1, lc_t[:1], norms1, T_t, p0)
            else:
                m = ss.one_pop_matrix(lc_t[0], b1)
                e, n1 = expm_and_integral(m, T_t)
                p1, n1p = e @ p0, n1 @ p0
            return p1, n1p @ jsfs1

        p0, jafs_post = jax.lax.scan(
            post_body, p0, (lc[s : numT - 1], jnp.asarray(post_T))
        )

        # last interval, T = infinity: occupancy = -M^{-1} P0 (:530-540)
        m_last = ss.one_pop_matrix(lc[numT - 1, 0], b1)
        occ_last = jnp.linalg.solve(m_last, -p0)
        jafs_last = occ_last @ jsfs1

        return jafs_pre.sum(0) + jafs_post.sum(0) + jafs_last

    # -- full likelihood -----------------------------------------------------

    def _llh_core(params, data, llh_const):
        params = jnp.asarray(params, jnp.result_type(float)).reshape(n_par)
        nonneg = jnp.all(params >= 0) if n_par else jnp.asarray(True)
        mi, pu = map_params(params)
        lc, pr, valid_corr = correct_sweep(mi, pu)
        jafs_raw = spectrum(lc, mi, pu)
        norm = jafs_raw.sum()
        jafs = jafs_raw / norm
        if spec.unfolded:
            cats = jafs
            dat = data
        else:
            # folded pairing (0,6) (1,5) (2,4) 3 (:600-605)
            cats = jnp.stack(
                [jafs[0] + jafs[6], jafs[1] + jafs[5], jafs[2] + jafs[4], jafs[3]]
            )
            dat = jnp.stack(
                [data[0] + data[6], data[1] + data[5], data[2] + data[4], data[3]]
            )
        pos = jnp.all(cats > 0) & jnp.isfinite(norm) & (norm > 0)
        safe = jnp.where(cats > 0, cats, 1.0)
        # log_accurate: XLA:TPU's coarse f32 log (~3e-5 rel) multiplied by
        # sum(d) ~ 2e4 was the ENTIRE on-chip llh error floor (round 5,
        # kernels/precise.py); f64 traces defer to jnp.log bitwise
        from ..kernels.precise import log_accurate

        llh = llh_const + jnp.sum(dat * log_accurate(safe))
        valid = nonneg & valid_corr & pos
        llh = jnp.where(valid, llh, -jnp.inf)
        # Report() counter semantics (MigrationInference.py:306,336,347,567):
        # CorrectLambdas() increments CORRECTION_CALLED at its top, and it is
        # invoked once per eval that passes the negative-rate guard EVEN when
        # correction is disabled (trueEPS) or splitT == 0 -- so "called"
        # depends only on the guard; "failed" fires when the sweep actually
        # runs and yields any rate <= 0 (valid_corr is True otherwise).
        corr_called = nonneg
        return llh, {"jafs": jafs, "lc": lc, "pr": pr, "valid": valid,
                     "mi": mi, "pu": pu, "corr_called": corr_called,
                     "corr_failed": corr_called & ~valid_corr}

    def llh_aux(params):
        return _llh_core(params, jnp.asarray(spec.data_jafs), spec.llh_const)

    def llh_only(params):
        return llh_aux(params)[0]

    def llh_data(params, data7):
        """Likelihood with the 7-category data spectrum as a traced argument
        (for vmapping over bootstrap replicates).  The multinomial constant
        is recomputed on device via gammaln."""
        data7 = jnp.asarray(data7)
        n = data7.sum()
        if spec.unfolded:
            const = jax.scipy.special.gammaln(n + 1) - jnp.sum(
                jax.scipy.special.gammaln(data7 + 1)
            )
        else:
            pairs = jnp.stack(
                [data7[0] + data7[6], data7[1] + data7[5], data7[2] + data7[4],
                 data7[3]]
            )
            const = jax.scipy.special.gammaln(n + 1) - jnp.sum(
                jax.scipy.special.gammaln(pairs + 1)
            )
        return _llh_core(params, data7, const)[0]

    def llh_flags(params):
        """(llh, counter vector) for the optimiser's Report() accumulation."""
        llh, aux = llh_aux(params)
        flags = jnp.stack([aux["corr_called"], aux["corr_failed"]])
        return llh, flags.astype(jnp.result_type(float))

    return Likelihood(
        spec=spec,
        llh=jax.jit(llh_only),
        llh_aux=jax.jit(llh_aux),
        llh_batch=jax.jit(jax.vmap(llh_only)),
        # jit here too: an eager call would dispatch per-primitive compiles
        # (one per scan) whose device assignment depends on ambient context
        # -- and XLA:CPU has segfaulted compiling such eager scans after
        # sharded multi-device tests ran in the same process
        llh_data=jax.jit(llh_data),
        llh_flags=llh_flags,
    )
