#!/usr/bin/env python3
"""Generate golden test fixtures by RUNNING the reference MiSTI implementation.

This script imports the reference code from /root/reference (read-only) and
records its numerical outputs as .npz fixtures.  No reference code is copied;
the fixtures are oracle values for parity tests of the TPU-native rebuild.

Run from the repo root:  python tests/fixtures/generate_fixtures.py
"""

import json
import os
import sys

import numpy as np

REF = os.environ.get("MISTI_REFERENCE", "/root/reference")
OUT = os.path.dirname(os.path.abspath(__file__))

# numpy 2.x removed the `numpy.mat` alias the reference imports.
np.mat = np.asmatrix
sys.path.insert(0, REF)

import TwoPopulations as ref_two  # noqa: E402
import OnePopulation as ref_one  # noqa: E402
from CorrectLambda import CorrectLambda  # noqa: E402
from MigrationInference import MigrationInference  # noqa: E402
import migrationIO  # noqa: E402

rng = np.random.default_rng(20260817)


def fix_statespace():
    """Rate matrices, JSFS maps, pulse operators, ancient rebase for random rates."""
    out = {}
    # full 44-state matrix for several random positive rate 4-tuples
    rates = rng.uniform(0.05, 5.0, size=(6, 4))
    mats = []
    for l1, l2, m1, m2 in rates:
        tp = ref_two.TwoPopulations(l1, l2, m1, m2)
        mats.append(np.asarray(tp.SetMatrix()))
    out["two_rates"] = rates
    out["two_mats"] = np.stack(mats)

    # mu = 0 case: reference deletes the 7 stationary states -> 37x37
    tp0 = ref_two.TwoPopulations(1.3, 0.7, 0.0, 0.0)
    out["two_mat_nomig"] = np.asarray(tp0.SetMatrix())
    out["stationary_idx"] = np.asarray(tp0.stationary)

    tp = ref_two.TwoPopulations(1.0, 1.0, 1.0, 1.0)
    out["two_jsfs"] = np.stack([np.asarray(tp.StateToJAF(i), float) for i in range(44)])

    op = ref_one.OnePopulation(0.9)
    out["one_mat"] = np.asarray(op.SetMatrix())
    out["one_jsfs"] = np.stack([np.asarray(op.StateToJAF(i), float) for i in range(8)])

    # pulse operator columns: P(r) e_i for random r and both source pops
    for pop in (0, 1):
        cols = []
        r = 0.23 if pop == 0 else 0.61
        for i in range(44):
            e = [0.0] * 44
            e[i] = 1.0
            cols.append(np.asarray(tp.PulseMigration(e, r, pop)))
        out[f"pulse_mat_pop{pop}"] = np.stack(cols, axis=1)  # [dst, src]
        out[f"pulse_rate_pop{pop}"] = np.asarray(r)

    # ancient-sample rebasing operator columns
    cols = []
    for i in range(44):
        e = [0.0] * 44
        e[i] = 1.0
        cols.append(np.asarray(tp.AncientSampleP0(e)))
    out["ancient_mat"] = np.stack(cols, axis=1)
    np.savez(os.path.join(OUT, "statespace.npz"), **out)


def fix_correction():
    """CorrectLambda.SolveLambdaSystem solutions on random interval problems."""
    cl = CorrectLambda()
    cases = []
    for k in range(40):
        lh = rng.uniform(0.3, 4.0, size=2)
        T = float(rng.uniform(0.005, 0.6))
        mu = rng.uniform(0.0, 3.0, size=2)
        if k % 5 == 0:
            mu = np.zeros(2)  # exercise the no-migration branches
        # random-ish but valid 2x3 initial conditions (non-negative, rows sum <= 1)
        p = rng.uniform(0.05, 1.0, size=(2, 3))
        p /= p.sum(axis=1, keepdims=True) / rng.uniform(0.5, 1.0, size=(2, 1))
        for cpfit in (False, True):
            cl.SetMu(mu[0], mu[1])
            cl.SetInterval(list(lh), T, [list(p[0]), list(p[1])])
            try:
                sol = cl.SolveLambdaSystem(cpfit)
                lc = np.asarray(sol[0], float).reshape(2)
                pout = np.stack(
                    [np.asarray(sol[1][0], float).reshape(3),
                     np.asarray(sol[1][1], float).reshape(3)]
                )
                ok = 1.0
            except Exception:
                lc = np.full(2, np.nan)
                pout = np.full((2, 3), np.nan)
                ok = 0.0
            cases.append(
                dict(lh=lh, T=T, mu=mu, p0=p.copy(), cpfit=float(cpfit),
                     lc=lc, pout=pout, ok=ok)
            )
    np.savez(
        os.path.join(OUT, "correction.npz"),
        **{k: np.stack([np.atleast_1d(np.asarray(c[k], float)) for c in cases])
           for k in cases[0]},
    )


def fix_single_pop():
    """FitSinglePop oracle values (post-split correction)."""
    cl = CorrectLambda()
    cases = []
    for _ in range(25):
        lh = rng.uniform(0.3, 4.0, size=2)
        T = float(rng.uniform(0.01, 1.2))
        w = rng.uniform(0.1, 3.0, size=2)
        cl.SetMu(0.0, 0.0)
        cl.SetInterval(list(lh), T, [[w[0], 0, 0], [w[1], 0, 0]])
        lam = float(np.asarray(cl.FitSinglePop()).reshape(())) if True else None
        cases.append(dict(lh=lh, T=T, w=w, lam=lam))
    np.savez(
        os.path.join(OUT, "single_pop.npz"),
        **{k: np.stack([np.atleast_1d(np.asarray(c[k], float)) for c in cases])
           for k in cases[0]},
    )


def _spectrum_case(name, times, lambdas, splitT, mi, pu, sfs8, **kwargs):
    m = MigrationInference(
        list(times), [list(v) for v in lambdas], list(sfs8), splitT,
        [list(v) for v in mi], [list(v) for v in pu], **kwargs
    )
    llh = m.JAFSLikelihood([])
    flags = dict(
        unfolded=float(kwargs.get("unfolded", False)),
        trueEPS=float(kwargs.get("trueEPS", False)),
        cpfit=float(kwargs.get("cpfit", False)),
        smooth=float(kwargs.get("smooth", False)),
        sampleDate=float(kwargs.get("sampleDate", 0)),
        mixtureTH=float(kwargs.get("mixtureTH", 0.0)),
    )
    return dict(
        name=name,
        times=np.asarray(times, float),
        lambdas=np.asarray(lambdas, float),
        splitT=float(splitT),
        sfs8=np.asarray(sfs8, float),
        jafs=np.asarray(m.JAFS, float),
        llh=float(llh),
        lc=np.asarray(m.lc, float),
        mi=np.asarray([list(map(float, v)) for v in mi], float).reshape(-1, 5),
        pu=np.asarray([list(map(float, v)) for v in pu], float).reshape(-1, 4),
        flags=np.asarray(list(flags.values()), float),
    )


def fix_likelihood():
    """End-to-end JAFSLikelihood oracles (the key regression fixtures)."""
    cases = []

    # 1. README run_sim scenario via ReadMS + trueEPS + uniform SFS (survey S6)
    ms = "-n 1 10 -n 2 4.5 -eN 0.025 0.2 -ej 0.045 2 1 -eN 0.175 3 -eN 0.625 1.8 -eN 3 3.2 -eN 8 5.5"
    d = migrationIO.ReadMS(ms)
    cases.append(
        _spectrum_case(
            "readme_trueEPS_unfolded",
            d.times, d.lambdas, d.divergenceTime, d.mi, d.pu,
            [1.0] * 8, unfolded=True, trueEPS=True,
        )
    )
    # folded variant
    d = migrationIO.ReadMS(ms)
    cases.append(
        _spectrum_case(
            "readme_trueEPS_folded",
            d.times, d.lambdas, d.divergenceTime, d.mi, d.pu,
            [1.0] * 8, unfolded=False, trueEPS=True,
        )
    )

    # 2. scenario with continuous migration bands + pulse + trueEPS
    ms2 = ("-n 1 2.0 -n 2 0.8 -em 0.0 1 2 1.5 -em 0.01 2 1 0.8 -en 0.02 1 1.1 "
           "-es 0.03 2 0.85 -en 0.05 2 0.6 -ej 0.08 2 1 -eN 0.2 2.5 -eN 1.0 1.5")
    d2 = migrationIO.ReadMS(ms2)
    sfs = [0.0] + list(rng.integers(50, 4000, size=7).astype(float))
    cases.append(
        _spectrum_case(
            "migpulse_trueEPS_unfolded",
            d2.times, d2.lambdas, d2.divergenceTime, d2.mi, d2.pu,
            sfs, unfolded=True, trueEPS=True,
        )
    )

    # 3. correction path (no trueEPS): synthetic PSMC-like 24-interval model
    # with geometric time grid and smooth lambda trajectories, as real PSMC
    # output looks (wild random rates make the reference solver diverge).
    nT = 24
    grid = 0.01 * (1.09 ** np.arange(nT)) - 0.01
    times = list(np.round(np.diff(grid), 8))
    tt = np.cumsum([0.0] + times)
    lam1 = 1.0 + 0.8 * np.sin(tt * 18.0) * np.exp(-tt * 4)
    lam2 = 1.1 + 0.6 * np.cos(tt * 15.0) * np.exp(-tt * 3)
    lams = np.round(np.stack([lam1, lam2], axis=1), 6)
    splitT = 10
    sfs = [0.0] + list(rng.integers(100, 5000, size=7).astype(float))
    for cpfit in (False, True):
        for mig in (True, False):
            mi = [[1, 2, splitT, 0.3, 0]] if mig else []
            nm = f"correct_cpfit{int(cpfit)}_mig{int(mig)}"
            cases.append(
                _spectrum_case(
                    nm, list(times), [list(v) for v in lams], splitT, mi, [],
                    sfs, unfolded=True, cpfit=cpfit, smooth=False,
                )
            )
    # 4. correction + smoothing (piecewise-constant lh to make smoothing active)
    lams_pc = np.repeat(np.round(rng.uniform(0.4, 3.0, size=(6, 2)), 6), 4, axis=0)
    cases.append(
        _spectrum_case(
            "correct_smooth", list(times), [list(v) for v in lams_pc], splitT,
            [[1, 2, splitT, 0.3, 0]], [], sfs, unfolded=True, smooth=True,
        )
    )
    # 5. pulse + correction
    cases.append(
        _spectrum_case(
            "correct_pulse", list(times), [list(v) for v in lams], splitT,
            [[1, 2, splitT, 0.3, 0]], [[2, 4, 0.15, 0]], sfs, unfolded=False,
            smooth=False,
        )
    )
    # 6. ancient sample date
    cases.append(
        _spectrum_case(
            "correct_sdate", list(times), [list(v) for v in lams], splitT,
            [[1, 3, splitT, 0.3, 0]], [], sfs, unfolded=True, smooth=False,
            sampleDate=3,
        )
    )
    # 7. nonzero mixture threshold (-mth): the bail-out fires when the two
    # genomes' location distributions come within mixtureTH of each other
    # (CorrectLambda.py:267-272).  rate=10 mixes the rows deep in the band:
    # mth=1.2 does NOT trip (llh equals the mth=0 value); mth=1.35 trips
    # on some interval -> correction failed -> llh = -inf.
    for nm, mth in (("correct_mth_pass", 1.2), ("correct_mth_bail", 1.35)):
        cases.append(
            _spectrum_case(
                nm, list(times), [list(v) for v in lams], splitT,
                [[1, 2, splitT, 10.0, 0]], [], sfs, unfolded=True,
                cpfit=True, smooth=False, mixtureTH=mth,
            )
        )

    # 8. fractional split time
    d = migrationIO.ReadMS(ms)
    cases.append(
        _spectrum_case(
            "readme_fractional_split",
            d.times, d.lambdas, d.divergenceTime + 0.5, d.mi, d.pu,
            [1.0] * 8, unfolded=True, trueEPS=True,
        )
    )

    meta = [c.pop("name") for c in cases]
    arrs = {}
    for i, c in enumerate(cases):
        for k, v in c.items():
            arrs[f"c{i}_{k}"] = np.asarray(v)
    np.savez(os.path.join(OUT, "likelihood.npz"), **arrs)
    with open(os.path.join(OUT, "likelihood_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)


def fix_readms():
    """ReadMS parse fixtures."""
    strings = [
        "-n 1 10 -n 2 4.5 -eN 0.025 0.2 -ej 0.045 2 1 -eN 0.175 3 -eN 0.625 1.8 -eN 3 3.2 -eN 8 5.5",
        ("-n 1 2.0 -n 2 0.8 -em 0.0 1 2 1.5 -em 0.01 2 1 0.8 -en 0.02 1 1.1 "
         "-es 0.03 2 0.85 -en 0.05 2 0.6 -ej 0.08 2 1 -eN 0.2 2.5 -eN 1.0 1.5"),
    ]
    out = {}
    for i, s in enumerate(strings):
        d = migrationIO.ReadMS(s)
        out[f"s{i}_times"] = np.asarray(d.times, float)
        out[f"s{i}_lambdas"] = np.asarray(d.lambdas, float)
        out[f"s{i}_split"] = np.asarray(float(d.divergenceTime))
        out[f"s{i}_mi"] = np.asarray(d.mi, float) if d.mi else np.zeros((0, 5))
        out[f"s{i}_pu"] = np.asarray(d.pu, float) if d.pu else np.zeros((0, 4))
    with open(os.path.join(OUT, "readms_strings.json"), "w") as f:
        json.dump(strings, f, indent=1)
    np.savez(os.path.join(OUT, "readms.npz"), **out)


def fix_solve():
    """Full Nelder-Mead fit oracle on a small correction problem."""
    nT = 16
    grid = 0.012 * (1.13 ** np.arange(nT)) - 0.012
    times = list(np.round(np.diff(grid), 8))
    tt = np.cumsum([0.0] + times)
    lam1 = 1.0 + 0.5 * np.sin(tt * 14.0) * np.exp(-tt * 4)
    lam2 = 1.1 + 0.4 * np.cos(tt * 11.0) * np.exp(-tt * 3)
    lams = [list(v) for v in np.round(np.stack([lam1, lam2], axis=1), 6)]
    splitT = 7
    sfs = [0.0] + list(np.asarray([3000, 800, 2900, 1500, 1200, 850, 1250], float))
    mi = [[1, 2, splitT, 0.5, 1]]
    m = MigrationInference(
        list(times), [list(v) for v in lams], list(sfs), splitT, mi, [],
        unfolded=True, smooth=False,
    )
    sol = m.Solve(1e-4)
    np.savez(
        os.path.join(OUT, "solve.npz"),
        times=np.asarray(times), lams=np.asarray(lams), splitT=splitT,
        sfs=np.asarray(sfs), mi=np.asarray(mi, float),
        x=np.asarray(sol[0], float), llh=np.asarray(float(sol[1])),
        count_llh=np.asarray(float(MigrationInference.COUNT_LLH)),
    )


PSMC_TEMPLATE = """\
CC  synthetic psmc output for parser parity testing
MM  pattern:{pattern}, n_seqs:10, sum_L:90000000
RD\t0
TR\t{theta0}\t{rho0}
{rs0}PA\t{pattern} 0.1
//
RD\t{rd}
TR\t{theta}\t{rho}
{rs}PA\t{pattern} 0.05
//
"""


def make_psmc_file(path, seed, rd=20, n=14, pattern="1*4+5*2"):
    """Write a synthetic psmc-format file with two RD rounds."""
    r = np.random.default_rng(seed)
    theta = float(np.round(r.uniform(0.002, 0.03), 6))
    rho = float(np.round(theta * r.uniform(0.15, 0.3), 6))
    tk = np.concatenate([[0.0], np.round(np.cumsum(r.uniform(0.002, 0.09, n - 1)), 6)])
    lk = np.round(r.uniform(0.2, 6.0, n), 6)
    tk0 = tk * 1.1
    lk0 = lk * 0.9

    def rs_block(tk, lk):
        return "".join(
            f"RS\t{i}\t{tk[i]}\t{lk[i]}\t0.0\t0.0\t0.0\n" for i in range(len(tk))
        )

    with open(path, "w") as f:
        f.write(
            PSMC_TEMPLATE.format(
                pattern=pattern, rd=rd,
                theta0=theta * 1.2, rho0=rho, rs0=rs_block(tk0, lk0),
                theta=theta, rho=rho, rs=rs_block(tk, lk),
            )
        )
    return theta, rho


def fix_readpsmc():
    """ReadPSMC / ReadPSMC1 oracles on synthetic psmc files."""
    import tempfile

    f1 = os.path.join(OUT, "synth1.psmc")
    f2 = os.path.join(OUT, "synth2.psmc")
    make_psmc_file(f1, seed=11)
    make_psmc_file(f2, seed=22)
    out = {}
    for tag, sdate in (("sd0", 0.0), ("sd1", 7300.0)):
        d = migrationIO.ReadPSMC(f1, f2, sdate, -1)
        out[f"{tag}_times"] = np.asarray(d.times, float)
        out[f"{tag}_lambdas"] = np.asarray(d.lambdas, float)
        out[f"{tag}_scaleTime"] = np.asarray(float(d.scaleTime))
        out[f"{tag}_theta"] = np.asarray(float(d.theta))
        out[f"{tag}_rho"] = np.asarray(float(d.rho))
        out[f"{tag}_sdd"] = np.asarray(float(d.sampleDateDiscr))
        out[f"{tag}_tpsmc0"] = np.asarray(d.Tpsmc[0], float)
        out[f"{tag}_tpsmc1"] = np.asarray(d.Tpsmc[1], float)
    # het-loss rescale (-hl): theta / time / EPS rescaling through
    # migrationIO.ReadPSMC (SetHetLoss + :232-248)
    units = migrationIO.Units()
    units.SetHetLoss([0.12, 0.07])
    d = migrationIO.ReadPSMC(f1, f2, 0.0, -1)
    out["hl_times"] = np.asarray(d.times, float)
    out["hl_lambdas"] = np.asarray(d.lambdas, float)
    out["hl_scaleTime"] = np.asarray(float(d.scaleTime))
    out["hl_theta"] = np.asarray(float(d.theta))
    out["hl_vals"] = np.asarray([0.12, 0.07])
    units.SetHetLoss([0.0, 0.0])

    d = migrationIO.ReadPSMC1(f1, f2, -1, divergenceTime=120000.0)
    out["pm1_times"] = np.asarray(d.times, float)
    out["pm1_lambdas"] = np.asarray(d.lambdas, float)
    out["pm1_div"] = np.asarray(float(d.divergenceTime))
    np.savez(os.path.join(OUT, "readpsmc.npz"), **out)


if __name__ == "__main__":
    fix_statespace()
    print("statespace ok")
    fix_correction()
    print("correction ok")
    fix_single_pop()
    print("single_pop ok")
    fix_likelihood()
    print("likelihood ok")
    fix_readms()
    print("readms ok")
    fix_readpsmc()
    print("readpsmc ok")
    fix_solve()
    print("solve ok")


def fix_cli():
    """End-to-end reference CLI run on the synthetic psmc/jsfs inputs.

    Reproduces: MiSTI.py synth1.psmc synth2.psmc synth.jsfs 8 -uf
                -mi 1 2 8 0.3 1 -o ref_fit.mi -bs 0
    (kept in tests/fixtures/ref_fit.mi; regenerate with runpy as in the
    repository history if the synthetic inputs change).
    """
