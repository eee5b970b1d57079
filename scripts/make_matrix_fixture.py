#!/usr/bin/env python3
"""Generate the 4-pair x 4-scenario synthetic matrix for the resident sweep.

The reference benchmark suite is 16 shell scripts (test.bs/): 4 genome
pairs (han_fre, san_din, san_sar, din_sar) x 4 migration scenarios
(no.mig, 1->2, 2->1, two-sided), each a full bootstrap x split-time sweep
run as its own process tree.  The real inputs are gitignored upstream, so
this writes synthetic stand-ins with the same shape (see
make_sweep_fixture.py for the single-scenario design rationale):

* 4 psmc pairs on the standard 28-knot pattern with different thetas and
  size histories -- every pair's merged union grid has the SAME interval
  count, so same-template scenarios across pairs share one compiled sweep
  program (engine/bootstrap.py `sweep_many`);
* one 200-chunk JSFS per pair, drawn from the pair's own generating model
  with per-chunk split heterogeneity (splits 23/24/25 at p=0.45/0.10/0.45,
  the make_sweep_fixture.py design) -- pairs 1/2 generate with one-sided
  migration (1->2), pairs 3/4 with two-sided, so the 4 fitted scenario
  templates per pair include both well-specified and misspecified fits,
  exactly like the real suite;
* tests/fixtures/matrix/matrix.json: the 16-entry manifest consumed by
  `python -m misti_tpu.cli.sweep --scenarios`.

Run from the repo root:  python scripts/make_matrix_fixture.py
"""

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
FIXDIR = os.path.join(os.path.dirname(HERE), "tests", "fixtures", "matrix")

sys.path.insert(0, os.path.dirname(HERE))
from make_sweep_fixture import psmc_text  # noqa: E402  (same repo, scripts/)

PAIRS = [
    # name, theta1, theta2, psmc seeds, generating migration template(s)
    ("pair1", 0.00072, 0.00065, (11, 12), [[1, 4, "S", 0.5, 0]]),
    ("pair2", 0.00068, 0.00074, (21, 22), [[1, 4, "S", 0.7, 0]]),
    ("pair3", 0.00076, 0.00062, (31, 32),
     [[1, 4, "S", 0.4, 0], [2, 4, "S", 0.4, 0]]),
    ("pair4", 0.00063, 0.00070, (41, 42),
     [[1, 4, "S", 0.6, 0], [2, 4, "S", 0.3, 0]]),
]

# the 4 fitted scenario templates of the reference suite (rate start 1,
# optimised; the no.mig scenario has no parameters at all)
SCENARIOS = [
    ("no.mig", []),
    ("mi12", [[1, 4, "ST", 1, 1]]),
    ("mi21", [[2, 4, "ST", 1, 1]]),
    ("mi2", [[1, 4, "ST", 1, 1], [2, 4, "ST", 1, 1]]),
]


def main() -> int:
    os.makedirs(FIXDIR, exist_ok=True)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from misti_tpu.engine.likelihood import build_likelihood
    from misti_tpu.engine.spec import build_spec
    from misti_tpu.io import psmc as io_psmc

    manifest = []
    rng = np.random.default_rng(57)
    for name, th1, th2, seeds, gen_mi in PAIRS:
        f1 = os.path.join(FIXDIR, f"{name}_1.psmc")
        f2 = os.path.join(FIXDIR, f"{name}_2.psmc")
        with open(f1, "w") as f:
            f.write(psmc_text(th1, th1 / 5.5, seed=seeds[0]))
        with open(f2, "w") as f:
            f.write(psmc_text(th2, th2 / 5.5, seed=seeds[1]))
        d = io_psmc.read_psmc(f1, f2, 0, -1)

        split_specs = []
        for s_idx in (23, 24, 25):
            mi = [[r[0], r[1], s_idx, r[3], r[4]] for r in gen_mi]
            spec = build_spec(d.times, d.lambdas, [0.0] + [1.0] * 7, s_idx,
                              mi, [], unfolded=True, cpfit=True, smooth=False)
            _, aux = build_likelihood(spec).llh_aux(np.zeros(0))
            p = np.asarray(aux["jafs"], float)
            split_specs.append(p / p.sum())

        rows = []
        for _ in range(200):
            length = int(rng.uniform(0.8, 1.2) * 13_500_000)
            n_seg = rng.poisson(600)
            k = rng.choice(3, p=[0.45, 0.10, 0.45])
            rows.append([length, *rng.multinomial(n_seg, split_specs[k])])
        fj = os.path.join(FIXDIR, f"{name}.jsfs")
        with open(fj, "w") as f:
            f.write("#MiSTI_JSFS version 1.0\n")
            f.write("#total\t0100\t1100\t0001\t0101\t1101\t0011\t0111\n")
            for r in rows:
                f.write("\t".join(str(v) for v in r) + "\n")
        print(f"{name}: numT={len(d.times)} jsfs(split24)="
              f"{np.round(split_specs[1], 3)}")

        for scn, mi_t in SCENARIOS:
            manifest.append(dict(
                name=f"{name}.{scn}",
                fpsmc1=os.path.relpath(f1, FIXDIR),
                fpsmc2=os.path.relpath(f2, FIXDIR),
                fjafs=os.path.relpath(fj, FIXDIR),
                splits=[20, 27],
                mi=[[str(v) for v in r] for r in mi_t],
            ))

    with open(os.path.join(FIXDIR, "matrix.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"wrote {len(manifest)}-scenario manifest in {FIXDIR}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
