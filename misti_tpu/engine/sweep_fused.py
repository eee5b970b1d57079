"""Fused bootstrap x split-time sweep: split time as a data index.

The per-split `build_likelihood` compiles one XLA program per split time
(the scan lengths are static), which on TPU costs minutes of compile each.
Here the whole sweep is ONE program: every per-split static quantity
(padded interval tables, category masks, smoothing matrices, parameter
masks) is precomputed on the host, stacked over the split axis, and
gathered by a traced split index.  Padding uses zero-length intervals,
which are exact no-ops through the whole pipeline:

* 3-state chain & 44-state spectrum: expm(M*0) = I, occupancy N1 = 0;
* pulse operators at rate 0 are the identity;
* the post-split correction already treats T == 0 as `lc = 1, nc unchanged`
  (the reference's own rule, MigrationInference.py:357-359).

So a (split s, replicate b, params) cell evaluates identically to the
per-split program, but all S x B cells jit into one function that is
vmapped and sharded together -- the entire test.bs scenario becomes one
compile + one lockstep Nelder-Mead.

Correction runs the Jacobi-parallel strategy (see engine/likelihood.py);
smoothing and folded/unfolded semantics match the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import correction as kc
from ..kernels.expm import expm_action_pair, expm_and_integral
from ..model import statespace as ss
from .likelihood import _pulse_update_3state
from .optimize import nelder_mead
from .spec import build_spec


@dataclasses.dataclass
class FusedSweep:
    split_times: np.ndarray  # (S,)
    n_params: int
    init_params: np.ndarray
    llh: callable  # (st_idx, params, data7) -> scalar (this scenario's tables)
    fit_cell: callable  # (st_idx, x0, data7, tol) -> (x, llh)
    # scenario-matrix surface: every per-scenario numeric table is a TRACED
    # argument of `llh_t`, so two scenarios with equal `shape_key` share one
    # XLA program (and one AOT export) -- the compiled sweep depends only on
    # the grid SHAPES and static flags, not on the psmc/jsfs values.
    llh_t: callable = None  # (st_idx, params, data7, tables) -> scalar
    tables: dict = None  # this scenario's stacked tables (host numpy)
    shape_key: str = ""  # equal key => llh_t traces identically


def build_fused_sweep(
    times: Sequence[float],
    lambdas,
    split_times: Sequence[float],
    mi_template=(),
    pu_template=(),
    *,
    sample_date: int = 0,
    correct: bool = True,
    cpfit: bool = False,
    smooth: bool = True,
    unfolded: bool = False,
    mixture_th: float = 0.0,
    correction_mode: str | None = None,
) -> FusedSweep:
    """Build the fused sweep function.

    ``mi_template`` rows may use "ST" for start/end to mean the (floor of
    the) split index (the test.bs convention).  Split times may be
    FRACTIONAL: each lane's spec pre-splits its containing interval on the
    host (the same preprocessing as build_spec / the reference
    MigrationInference.py:89-99), so lanes simply carry different
    per-interval tables -- the kernel shape is unchanged and one compile
    still covers the whole grid.
    """
    splits = [float(v) for v in split_times]
    b2 = ss.two_pop_basis()
    b1 = ss.one_pop_basis()

    # per-split specs (host side; also validates the model per split).
    # "ST" means floor(st): textual substitution happens before the
    # fractional interval insert, exactly like the reference shell scripts.
    specs = []
    for st in splits:
        st_i = int(st)
        mi = [[int(r[0]), st_i if r[1] == "ST" else int(r[1]),
               st_i if r[2] == "ST" else int(r[2]), float(r[3]), int(r[4])]
              for r in mi_template]
        pu = [[int(r[0]), st_i if r[1] == "ST" else int(r[1]), float(r[2]),
               int(r[3])] for r in pu_template]
        specs.append(
            build_spec(
                list(times), [list(v) for v in lambdas], [0.0] + [1.0] * 7,
                st, mi, pu, correct=correct, cpfit=cpfit, smooth=smooth,
                unfolded=unfolded, sample_date=sample_date,
                mixture_th=mixture_th,
            )
        )
    n_par = specs[0].n_params
    # post-fractional-split grid sizes (splitT/numT grow by 1 when st % 1)
    s_of = [sp.splitT for sp in specs]
    s_max = max(s_of)
    n_post = max(sp.numT - 1 - sp.splitT for sp in specs)
    sd = int(sample_date)

    # stacked per-split tables, padded to (s_max / n_post); each spec
    # carries its OWN grid (fractional splits insert an interval)
    S = len(splits)
    t_pre = np.zeros((S, s_max))
    lh_pre = np.ones((S, s_max, 2))
    pad_pre = np.ones((S, s_max), dtype=bool)
    t_post = np.zeros((S, n_post))
    lh_post = np.ones((S, n_post, 2))
    catmask = np.ones((S, s_max, 7))
    is_sample = np.zeros((S, s_max), dtype=bool)
    mi_base = np.zeros((S, s_max, 2))
    pu_base = np.zeros((S, s_max, 2))
    mi_masks = np.zeros((S, max(n_par, 1), s_max, 2))
    lh_last = np.ones((S, 2))
    for i, sp in enumerate(specs):
        st = sp.splitT
        all_t = np.asarray(sp.times)
        all_lh = np.asarray(sp.lh)
        t_pre[i, :st] = all_t[:st]
        lh_pre[i, :st] = all_lh[:st]
        pad_pre[i, :st] = False
        npost_i = sp.numT - 1 - st
        t_post[i, :npost_i] = all_t[st : sp.numT - 1]
        lh_post[i, :npost_i] = all_lh[st : sp.numT - 1]
        catmask[i, :st] = 1.0
        catmask[i, :sd, 2:] = 0.0
        if sd < st:
            is_sample[i, sd] = True
        mi_base[i, :st] = sp.mi_base[:st]
        # pulses at t >= split are never applied by the reference (its loops
        # stop at splitT); only pre-split rows are stacked
        pu_base[i, :st] = sp.pu_base[:st]
        for k in range(len(sp.opt_mi)):
            mi_masks[i, k, :st] = sp.mi_masks[k][:st]
        for k in range(len(sp.opt_pu)):
            mi_masks[i, len(sp.opt_mi) + k, :st] = sp.pu_masks[k][:st]
        lh_last[i] = all_lh[sp.numT - 1]

    smooth_ws = None
    if smooth:
        smooth_ws = np.zeros((S, 2, s_max, s_max))
        for i, (st, sp) in enumerate(zip(s_of, specs)):
            smooth_ws[i, :, :st, :st] = sp.smooth_w
            # identity on padding so padded lc rows pass through
            for g in range(2):
                for k in range(st, s_max):
                    smooth_ws[i, g, k, k] = 1.0

    # every scenario-dependent numeric table, stacked over splits: traced
    # arguments of llh_t (scenario-matrix program reuse, see FusedSweep)
    tables_np = dict(
        t_pre=t_pre, lh_pre=lh_pre, pad_pre=pad_pre, t_post=t_post,
        lh_post=lh_post, catmask=catmask, is_sample=is_sample,
        mi_base=mi_base, pu_base=pu_base, mi_masks=mi_masks,
        lh_last=lh_last, s_of=np.asarray(s_of, np.int32),
    )
    if smooth:
        tables_np["smooth_w"] = smooth_ws

    n_opt_mi = len(specs[0].opt_mi)

    ancient = jnp.asarray(b2.ancient)
    collapse = jnp.asarray(b2.collapse)
    jsfs2 = jnp.asarray(b2.jsfs)
    jsfs1 = jnp.asarray(b1.jsfs)
    static_no_mig = n_opt_mi == 0 and bool(np.all(mi_base == 0))
    _PAR_OUTERS = 6

    # correction strategy: same default rule as build_likelihood (fused
    # Pallas kernel on accelerators, scan strategy on CPU).  The sweep's
    # interval tables depend on the lane's split index, so the kernel is
    # built with dynamic (traced, per-lane) lh/times tables.
    import os as _os

    if correction_mode is None:
        correction_mode = _os.environ.get("MISTI_CORRECTION", "")
    if not correction_mode or correction_mode.startswith("scan"):
        correction_mode = (
            "scan" if (correction_mode.startswith("scan")
                       or jax.default_backend() == "cpu") else "fused-pallas"
        )
    _fused_corr = None
    if correct and correction_mode.startswith("fused"):
        from ..kernels.correction_pallas import build_fused_correction

        has_pulse = bool(pu_template) or bool(np.any(pu_base != 0))
        _fused_corr = build_fused_correction(
            None, None, cpfit=cpfit, mixture_th=mixture_th,
            static_no_mig=static_no_mig, has_pulse=has_pulse,
            mode="xla" if correction_mode == "fused-xla" else "pallas",
            interpret=correction_mode == "fused-interpret",
            n_intervals=s_max,
        )

    # vector-path spectrum constants (see engine/likelihood.py)
    spectrum_mode = _os.environ.get("MISTI_SPECTRUM", "vector")
    k2 = jnp.asarray(np.concatenate(
        [b2.coal[0].T, b2.coal[1].T, b2.migr[0].T, b2.migr[1].T], axis=1))
    norms2 = np.abs(np.stack(
        [b2.coal[0], b2.coal[1], b2.migr[0], b2.migr[1]])).sum(1).max(1)
    k1 = jnp.asarray(b1.coal.T)
    norms1 = np.abs(b1.coal).sum(axis=0).max(keepdims=True)

    def llh_fn(st_idx, params, data7, tables):
        st_idx = jnp.asarray(st_idx, jnp.int32)
        params = jnp.asarray(params, jnp.result_type(float)).reshape(n_par)
        data7 = jnp.asarray(data7)
        take = lambda name: jnp.take(jnp.asarray(tables[name]), st_idx, axis=0)
        tp = take("t_pre")  # (s_max,)
        lhp = take("lh_pre")  # (s_max, 2)
        pad = take("pad_pre")  # (s_max,) bool
        tq = take("t_post")
        lhq = take("lh_post")
        cmask = take("catmask")
        is_s = take("is_sample")
        mib = take("mi_base")  # (s_max, 2): pre-split rows only
        pub = take("pu_base")
        masks = take("mi_masks")  # (n_par, s_max, 2)
        lh_l = take("lh_last")  # (2,)

        # parameter mapping
        if n_par:
            any_mi = masks[:n_opt_mi].sum(0) if n_opt_mi else jnp.zeros_like(mib)
            rates = mib * (1.0 - jnp.minimum(any_mi, 1.0)) + jnp.einsum(
                "k,ktc->tc", params[:n_opt_mi], masks[:n_opt_mi]
            )
            if n_par > n_opt_mi:
                pub = pub * (1.0 - jnp.minimum(masks[n_opt_mi:].sum(0), 1.0)) \
                    + jnp.einsum("k,ktc->tc", params[n_opt_mi:],
                                 masks[n_opt_mi:])
            mib = rates
        mi_pre = mib
        pu_pre = pub

        nonneg = jnp.all(params >= 0) if n_par else jnp.asarray(True)

        # ---- correction sweep (Jacobi parallel, padded) ----
        def chain(lc_pre):
            p0 = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])

            def body(p, inp):
                lc_t, T_t, mi_t, pu_t = inp
                p = _pulse_update_3state(p, pu_t[0], 0)
                p = _pulse_update_3state(p, pu_t[1], 1)
                p_in = p
                m = ss.correction_matrix(lc_t[0], lc_t[1], mi_t[0], mi_t[1])
                e = kc.expm(m * T_t, max_squarings=20, unroll=True)
                return p @ e.T, p_in

            p_fin, p_solver = jax.lax.scan(body, p0, (lc_pre, tp, mi_pre,
                                                      pu_pre))
            return p_solver, p_fin

        if correct and _fused_corr is not None:
            # one fused kernel per cell; the custom_vmap rule flattens the
            # (split x replicate) vmap axis into kernel lanes
            lc3, pa3 = _fused_corr(mi_pre[None], pu_pre[None], lhp[None],
                                   tp[None])
            lc_pre = lc3[0]  # padded rows pinned to 1 by the T == 0 rule
            p_fin = pa3[0][-1]  # (2, 3): padding rows are exact no-ops
            valid = jnp.all(jnp.where(pad[:, None], 1.0, lc_pre) > 0)
        elif correct:
            t_safe = jnp.where(pad, 1.0, tp)

            def solve_all(p_solver, x0, iters):
                lc, _ = jax.vmap(
                    lambda a, b, c, d, e: kc.solve_lambda_system(
                        a, b, c, d, cpfit, mixture_th,
                        static_no_mig=static_no_mig, x0=e, iters=iters,
                    )
                )(lhp, t_safe, mi_pre, p_solver, x0)
                return jnp.where(pad[:, None], 1.0, lc)

            p_solver, _ = chain(lhp)
            lc_pre = solve_all(p_solver, lhp, 48)

            def outer(lc_pre, _):
                p_solver, _ = chain(lc_pre)
                return solve_all(p_solver, lc_pre, 12), None

            lc_pre, _ = jax.lax.scan(outer, lc_pre, None, length=_PAR_OUTERS - 1)
            _, p_fin = chain(lc_pre)
            valid = jnp.all(jnp.where(pad[:, None], 1.0, lc_pre) > 0)
        else:
            lc_pre = lhp
            _, p_fin = chain(lc_pre)
            valid = jnp.asarray(True)
        nc = p_fin.sum(axis=1)

        # ---- post-split correction (padded; T=0 rows are exact no-ops) ----
        tq_safe = jnp.where(tq == 0, 1.0, tq)
        if cpfit:
            def post_body(nc_c, inp):
                lh_t, T_t, Ts = inp
                # deviation form: pnc - 1 from expm1 masses, -log1p
                # (see engine/likelihood.py post_body)
                ed = jnp.exp(nc_c[1] - nc_c[0])
                dpnc = -(
                    -jnp.expm1(-T_t * lh_t[0])
                    + ed * -jnp.expm1(-T_t * lh_t[1])
                ) / (1.0 + ed)
                lam = jnp.where(T_t == 0, 1.0, -jnp.log1p(dpnc) / Ts)
                lc_t = jnp.stack([lam, lam])
                return nc_c - T_t * lc_t, lc_t

            nc_fin, lc_post = jax.lax.scan(post_body, nc, (lhq, tq, tq_safe))
        else:
            fit_b = jax.vmap(kc.fit_single_pop)

            def post_outer(lc_post, _):
                dec = tq[:, None] * lc_post
                csum = jnp.cumsum(dec, axis=0)
                nc_t = nc[None, :] - jnp.concatenate(
                    [jnp.zeros((1, 2), dec.dtype), csum[:-1]], axis=0
                )
                # ratio-invariant max shift: no f32 exp underflow of the
                # cumulative log no-coal mass (see engine/likelihood.py)
                lam = fit_b(lhq, tq_safe,
                            jnp.exp(nc_t - nc_t.max(axis=1, keepdims=True)))
                lam = jnp.where(tq == 0, 1.0, lam)
                return jnp.stack([lam, lam], axis=-1), None

            lc0 = jnp.broadcast_to(lhq.mean(axis=1, keepdims=True), lhq.shape)
            lc_post, _ = jax.lax.scan(post_outer, lc0, None, length=_PAR_OUTERS)
            nc_fin = nc - jnp.sum(tq[:, None] * lc_post, axis=0)

        m_nc = jnp.maximum(nc_fin[0], nc_fin[1])
        pr0 = jnp.exp(nc_fin[0] - m_nc)
        pr1 = jnp.exp(nc_fin[1] - m_nc)
        lam_last = (pr0 + pr1) / (pr0 / lh_l[0] + pr1 / lh_l[1])

        if smooth:
            w = take("smooth_w")  # (2, s_max, s_max)
            lc_pre = jnp.stack([w[0] @ lc_pre[:, 0], w[1] @ lc_pre[:, 1]],
                               axis=1)

        # ---- spectrum (padded) ----
        p0 = jnp.zeros(44, dtype=lc_pre.dtype).at[2].set(1.0)

        def pre_body(p, inp):
            lc_t, T_t, mi_t, pu_t, is_t, cm = inp
            p = jnp.where(is_t, ancient @ p, p)
            p = ss.pulse_operator(pu_t[0], 0, b2) @ p
            p = ss.pulse_operator(pu_t[1], 1, b2) @ p
            if spectrum_mode == "vector":
                coeffs = jnp.stack([lc_t[0], lc_t[1], mi_t[0], mi_t[1]])
                p1, n1p = expm_action_pair(k2, coeffs, norms2, T_t, p)
            else:
                m = ss.two_pop_matrix(lc_t[0], lc_t[1], mi_t[0], mi_t[1], b2)
                e, n1 = expm_and_integral(m, T_t)
                p1, n1p = e @ p, n1 @ p
            return p1, cm * (n1p @ jsfs2)

        p0, jafs_pre = jax.lax.scan(
            pre_body, p0, (lc_pre, tp, mi_pre, pu_pre, is_s, cmask)
        )
        # ancient rebase exactly at the split (sd == splitT, post-split grid)
        st_val = jnp.take(jnp.asarray(tables["s_of"]), st_idx)
        p0 = jnp.where(sd == st_val, ancient @ p0, p0)
        p8 = collapse @ p0

        def post_spec(p, inp):
            lc_t, T_t = inp
            if spectrum_mode == "vector":
                p1, n1p = expm_action_pair(k1, lc_t[:1], norms1, T_t, p)
            else:
                m = ss.one_pop_matrix(lc_t[0], b1)
                e, n1 = expm_and_integral(m, T_t)
                p1, n1p = e @ p, n1 @ p
            return p1, n1p @ jsfs1

        p8, jafs_post = jax.lax.scan(post_spec, p8, (lc_post, tq))

        m_last = ss.one_pop_matrix(lam_last, b1)
        occ_last = jnp.linalg.solve(m_last, -p8)
        jafs_raw = jafs_pre.sum(0) + jafs_post.sum(0) + occ_last @ jsfs1

        norm = jafs_raw.sum()
        jafs = jafs_raw / norm
        n = data7.sum()
        if unfolded:
            cats, dat = jafs, data7
            const = jax.scipy.special.gammaln(n + 1) - jnp.sum(
                jax.scipy.special.gammaln(data7 + 1)
            )
        else:
            cats = jnp.stack([jafs[0] + jafs[6], jafs[1] + jafs[5],
                              jafs[2] + jafs[4], jafs[3]])
            dat = jnp.stack([data7[0] + data7[6], data7[1] + data7[5],
                             data7[2] + data7[4], data7[3]])
            const = jax.scipy.special.gammaln(n + 1) - jnp.sum(
                jax.scipy.special.gammaln(dat + 1)
            )
        pos = jnp.all(cats > 0) & jnp.isfinite(norm) & (norm > 0)
        # accurate f32 log: see engine/likelihood.py (kernels/precise.py)
        from ..kernels.precise import log_accurate

        llh = const + jnp.sum(dat * log_accurate(jnp.where(cats > 0, cats, 1.0)))
        return jnp.where(nonneg & valid & pos, llh, -jnp.inf)

    def llh_baked(st_idx, params, data7):
        return llh_fn(st_idx, params, data7, tables_np)

    def fit_cell(st_idx, x0, data7, tol=1e-4):
        res = nelder_mead(lambda p: -llh_baked(st_idx, p, data7), x0,
                          xatol=tol, fatol=tol)
        return res.x, -res.fun

    # static-structure key: everything that selects WHICH computation
    # llh_fn traces (shapes of the tables are hashed separately by jit /
    # the AOT layer from the arguments themselves)
    from .aot import scenario_key

    shape_key = scenario_key(
        "fused-sweep-v1", S, s_max, n_post, n_par, n_opt_mi, sd,
        bool(correct), bool(cpfit), bool(smooth), bool(unfolded),
        float(mixture_th), bool(static_no_mig), correction_mode,
        spectrum_mode, _fused_corr is not None,
        bool(pu_template) or bool(np.any(pu_base != 0)),
    )

    return FusedSweep(
        split_times=np.asarray(splits, float),
        n_params=n_par,
        init_params=specs[0].init_params,
        llh=llh_baked,
        fit_cell=fit_cell,
        llh_t=llh_fn,
        tables=tables_np,
        shape_key=shape_key,
    )
