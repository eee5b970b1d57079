"""End-to-end likelihood parity vs the reference on all fixture scenarios.

The key regression suite: reference MigrationInference.JAFSLikelihood oracles
(expected JSFS, corrected rates, llh) across trueEPS, correction (both fit
modes), migration bands, pulses, smoothing, ancient samples and fractional
split times.
"""

import json
import os

import numpy as np
import pytest

from conftest import FIXDIR, load_fixture
from misti_tpu.engine.spec import build_spec
from misti_tpu.engine.likelihood import build_likelihood


def _load_cases():
    meta_path = os.path.join(FIXDIR, "likelihood_meta.json")
    if not os.path.exists(meta_path):
        pytest.skip("likelihood fixtures not generated")
    with open(meta_path) as f:
        names = json.load(f)
    fx = load_fixture("likelihood.npz")
    cases = []
    for i, name in enumerate(names):
        g = lambda k, i=i: fx[f"c{i}_{k}"]
        flags = g("flags")
        cases.append(
            dict(
                name=name,
                times=g("times"),
                lambdas=g("lambdas"),
                splitT=float(g("splitT")),
                sfs8=g("sfs8"),
                jafs=g("jafs"),
                llh=float(g("llh")),
                lc=g("lc"),
                mi=g("mi"),
                pu=g("pu"),
                unfolded=bool(flags[0]),
                trueEPS=bool(flags[1]),
                cpfit=bool(flags[2]),
                smooth=bool(flags[3]),
                sampleDate=int(flags[4]),
                mixture_th=float(flags[5]) if len(flags) > 5 else 0.0,
            )
        )
    return cases


CASES = _load_cases()


def _build(case):
    spec = build_spec(
        list(case["times"]),
        [list(v) for v in case["lambdas"]],
        list(case["sfs8"]),
        case["splitT"],
        [list(v) for v in case["mi"]],
        [list(v) for v in case["pu"]],
        correct=not case["trueEPS"],
        cpfit=case["cpfit"],
        smooth=case["smooth"],
        unfolded=case["unfolded"],
        sample_date=case["sampleDate"],
        mixture_th=case["mixture_th"],
    )
    return build_likelihood(spec)


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_llh_matches_reference(case):
    lik = _build(case)
    llh, aux = lik.llh_aux(np.zeros(0))
    if not np.isfinite(case["llh"]):
        # reference correction bail-out (e.g. the -mth mixture threshold,
        # CorrectLambda.py:267-272): ours must fail the same eval
        assert not bool(aux["valid"]) and float(llh) == -np.inf
        return
    assert bool(aux["valid"]), f"valid=False but reference llh={case['llh']}"
    # corrected rates: exact in trueEPS mode, solver-tolerance otherwise
    tol = 1e-12 if case["trueEPS"] else 2e-4
    np.testing.assert_allclose(np.asarray(aux["lc"]), case["lc"],
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(aux["jafs"]), case["jafs"],
                               rtol=5e-6, atol=1e-9)
    np.testing.assert_allclose(float(llh), case["llh"], rtol=1e-7, atol=1e-3)


@pytest.mark.parametrize(
    "case",
    [c for c in CASES if c["name"] in
     ("correct_cpfit0_mig1", "correct_cpfit1_mig1", "correct_pulse",
      "correct_sdate", "correct_smooth")],
    ids=lambda c: c["name"],
)
def test_parallel_correction_matches_reference(case):
    """The Jacobi parallel correction strategy (the TPU path) must agree
    with the reference oracles like the sequential one does."""
    from misti_tpu.engine.likelihood import build_likelihood as _bl

    spec = build_spec(
        list(case["times"]), [list(v) for v in case["lambdas"]],
        list(case["sfs8"]), case["splitT"],
        [list(v) for v in case["mi"]], [list(v) for v in case["pu"]],
        correct=not case["trueEPS"], cpfit=case["cpfit"],
        smooth=case["smooth"], unfolded=case["unfolded"],
        sample_date=case["sampleDate"],
    )
    lik = _bl(spec, sequential=False)
    llh, aux = lik.llh_aux(np.zeros(0))
    assert bool(aux["valid"])
    np.testing.assert_allclose(np.asarray(aux["lc"]), case["lc"],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(llh), case["llh"], rtol=1e-7, atol=1e-3)


def test_negative_rate_gives_minus_inf():
    case = next(c for c in CASES if c["name"] == "correct_cpfit1_mig1")
    spec = build_spec(
        list(case["times"]), [list(v) for v in case["lambdas"]],
        list(case["sfs8"]), case["splitT"],
        [[1, 2, int(case["splitT"]), 0.3, 1]], [],
        unfolded=True, cpfit=True,
    )
    lik = build_likelihood(spec)
    assert np.isneginf(float(lik.llh(np.array([-0.5]))))
    assert np.isfinite(float(lik.llh(np.array([0.3]))))


def test_batched_llh_matches_single():
    case = next(c for c in CASES if c["name"] == "correct_cpfit1_mig1")
    spec = build_spec(
        list(case["times"]), [list(v) for v in case["lambdas"]],
        list(case["sfs8"]), case["splitT"],
        [[1, 2, int(case["splitT"]), 0.3, 1]], [],
        unfolded=True, cpfit=True,
    )
    lik = build_likelihood(spec)
    batch = np.linspace(0.05, 1.2, 8)[:, None]
    out = np.asarray(lik.llh_batch(batch))
    for i, p in enumerate(batch):
        np.testing.assert_allclose(out[i], float(lik.llh(p)), rtol=1e-9,
                                   atol=1e-7)


@pytest.mark.parametrize(
    "case",
    [c for c in CASES if c["name"].startswith("correct_mth")],
    ids=lambda c: c["name"],
)
@pytest.mark.parametrize("mode", ["scan-seq", "scan-jacobi", "fused-xla"])
def test_mixture_threshold_all_strategies(case, mode):
    """Nonzero -mth through every correction strategy: the pass case must
    reproduce the reference llh, the bail case must go to -inf exactly
    like the reference (CorrectLambda.py:267-272; kernel bail in
    kernels/correction.py and correction_pallas.py)."""
    spec = build_spec(
        list(case["times"]), [list(v) for v in case["lambdas"]],
        list(case["sfs8"]), case["splitT"],
        [list(v) for v in case["mi"]], [list(v) for v in case["pu"]],
        correct=True, cpfit=case["cpfit"], smooth=case["smooth"],
        unfolded=case["unfolded"], mixture_th=case["mixture_th"],
    )
    lik = build_likelihood(spec, correction_mode=mode)
    llh = float(lik.llh(np.zeros(0)))
    if np.isfinite(case["llh"]):
        np.testing.assert_allclose(llh, case["llh"], rtol=1e-7, atol=1e-3)
    else:
        assert llh == -np.inf


@pytest.mark.parametrize(
    "case",
    [c for c in CASES
     if not c["trueEPS"] and not c["cpfit"] and np.isfinite(c["llh"])],
    ids=lambda c: c["name"],
)
@pytest.mark.parametrize("mode", ["scan-seq", "scan-jacobi", "fused-xla"])
def test_f32_ect_mode_accuracy(case, mode):
    """ECT-mode correction (cpfit=False -- the reference's DEFAULT residual)
    must be usable in float32.  Round 4 documented the raw formulation's
    catastrophic cancellation (llh off by integer factors, a RuntimeWarning
    gated the mode off accelerators); round 5 reforms every residual as a
    deviation from the shared T/2 baseline (kernels/correction.py `_ect_dev`
    / `_residual_coal_time` / `_residual_nomig`, mirrored in the fused
    kernel), which is algebraically identical in f64 and holds ~1e-4
    relative llh accuracy in f32 across all strategies."""
    import jax

    spec = build_spec(
        list(case["times"]), [list(v) for v in case["lambdas"]],
        list(case["sfs8"]), case["splitT"],
        [list(v) for v in case["mi"]], [list(v) for v in case["pu"]],
        correct=True, cpfit=False, smooth=case["smooth"],
        unfolded=case["unfolded"], sample_date=case["sampleDate"],
        mixture_th=case["mixture_th"],
    )
    jax.config.update("jax_enable_x64", False)
    try:
        lik = build_likelihood(spec, correction_mode=mode)
        llh = float(lik.llh(np.zeros(0, np.float32)))
    finally:
        jax.config.update("jax_enable_x64", True)
    assert np.isfinite(llh)
    np.testing.assert_allclose(llh, case["llh"], rtol=2e-4)


@pytest.mark.parametrize(
    "case",
    [c for c in CASES
     if not c["trueEPS"] and c["cpfit"] and np.isfinite(c["llh"])],
    ids=lambda c: c["name"],
)
@pytest.mark.parametrize("mode", ["scan-seq", "fused-xla"])
def test_f32_cpfit_mode_accuracy(case, mode):
    """cpfit in float32 after the round-5 deviation-form residuals
    (kernels/correction.py `_residual_cp` / `_nomig_closed_form`): the
    no-coalescence masses are compared as deviations from the shared total
    mass, so f32 holds ~1e-5 relative llh (measured 7.8e-7 on the bench
    workload vs 1.2e-4 with the raw formulation; ACCURACY.md round 5)."""
    import jax

    spec = build_spec(
        list(case["times"]), [list(v) for v in case["lambdas"]],
        list(case["sfs8"]), case["splitT"],
        [list(v) for v in case["mi"]], [list(v) for v in case["pu"]],
        correct=True, cpfit=True, smooth=case["smooth"],
        unfolded=case["unfolded"], sample_date=case["sampleDate"],
        mixture_th=case["mixture_th"],
    )
    jax.config.update("jax_enable_x64", False)
    try:
        lik = build_likelihood(spec, correction_mode=mode)
        llh = float(lik.llh(np.zeros(0, np.float32)))
    finally:
        jax.config.update("jax_enable_x64", True)
    assert np.isfinite(llh)
    np.testing.assert_allclose(llh, case["llh"], rtol=2e-5)
