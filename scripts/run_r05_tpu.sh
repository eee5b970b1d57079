#!/usr/bin/env bash
# Round-5 on-chip artifact batch.  STRICTLY sequential: two TPU-backed
# python processes hang each other (CLAUDE.md).  Each step is resumable --
# rerun the script and completed artifacts are skipped.  A step that fails
# (timeout, crash, empty output) REMOVES its partial artifact and aborts,
# so a rerun retries it instead of silently skipping it.
set -u
cd "$(dirname "$0")/.."
log() { echo "== $(date +%H:%M:%S) $*"; }
need_json() {  # abort unless $1 contains a JSON line; drop partials
  if ! grep -q '^{' "$1" 2>/dev/null; then
    rm -f "$1"
    log "FAILED: $1 missing or empty -- rerun to retry"
    exit 1
  fi
}

# 1. default corrected bench (cpfit) -- warm number for BENCH_r05 preview
if [ ! -f scripts/bench_r05_corrected.json ]; then
  log "bench corrected"
  timeout 3000 python bench.py > scripts/bench_r05_corrected.json 2> scripts/bench_r05_corrected.err
  need_json scripts/bench_r05_corrected.json
  cat scripts/bench_r05_corrected.json
fi

# 2. ECT-mode bench (the reference's default residual, round-5 fix)
if [ ! -f scripts/bench_r05_ect.json ]; then
  log "bench ect"
  MISTI_BENCH_MODE=ect timeout 3000 python bench.py > scripts/bench_r05_ect.json 2> scripts/bench_r05_ect.err
  need_json scripts/bench_r05_ect.json
  cat scripts/bench_r05_ect.json
fi

# 3. trueEPS bench (round-5 refresh)
if [ ! -f scripts/bench_r05_trueeps.json ]; then
  log "bench trueeps"
  MISTI_BENCH_MODE=trueeps timeout 3000 python bench.py > scripts/bench_r05_trueeps.json 2> scripts/bench_r05_trueeps.err
  need_json scripts/bench_r05_trueeps.json
  cat scripts/bench_r05_trueeps.json
fi

# 4. cross-precision accuracy: TPU phase then CPU-f64 phase
if [ ! -f scripts/accuracy_r05.txt ]; then
  log "accuracy tpu phase"
  timeout 3000 python scripts/tpu_accuracy_check.py tpu 2> /dev/null
  log "accuracy cpu phase"
  MISTI_PLATFORM=cpu timeout 3000 python scripts/tpu_accuracy_check.py cpu > scripts/accuracy_r05.txt 2> /dev/null
  if [ ! -s scripts/accuracy_r05.txt ]; then
    rm -f scripts/accuracy_r05.txt
    log "FAILED: accuracy_r05.txt empty -- rerun to retry"
    exit 1
  fi
  cat scripts/accuracy_r05.txt
fi

# 5. two-band north-star sweep (the LIVE han_fre command shape: 2 params)
if [ ! -f scripts/sweep2band_r05.json ]; then
  log "two-band sweep (cold compile possible)"
  timeout 5400 python -m misti_tpu.cli.sweep \
    tests/fixtures/sweep1.psmc tests/fixtures/sweep2.psmc tests/fixtures/sweep.jsfs \
    --splits 20 27 -bs 100 -mi 1 4 ST 1 1 -mi 2 4 ST 1 1 -uf --cpfit --nosmooth \
    --funits /nonexistent -o scripts/sweep2band_r05.npz \
    > scripts/sweep2band_r05.out 2> scripts/sweep2band_r05.err
  grep '^{' scripts/sweep2band_r05.out | tail -1 > scripts/sweep2band_r05.json
  need_json scripts/sweep2band_r05.json
  cat scripts/sweep2band_r05.json
fi

# 6. one-band sweep warm reruns (r05 refresh + maxiter-256 comparison)
for i in 1 2 3; do
  if [ ! -f scripts/sweep1band_r05_run$i.json ]; then
    log "one-band sweep run $i"
    timeout 5400 python -m misti_tpu.cli.sweep \
      tests/fixtures/sweep1.psmc tests/fixtures/sweep2.psmc tests/fixtures/sweep.jsfs \
      --splits 20 27 -bs 100 -mi 1 4 ST 3 1 -uf --cpfit --nosmooth \
      --funits /nonexistent -o scripts/sweep1band_r05.npz \
      > scripts/sweep1band_r05_run$i.out 2> scripts/sweep1band_r05_run$i.err
    grep '^{' scripts/sweep1band_r05_run$i.out | tail -1 > scripts/sweep1band_r05_run$i.json
    need_json scripts/sweep1band_r05_run$i.json
    cat scripts/sweep1band_r05_run$i.json
  fi
done
if [ ! -f scripts/sweep1band_r05_cap256.json ]; then
  log "one-band sweep maxiter 256 (runaway-tail comparison)"
  timeout 5400 python -m misti_tpu.cli.sweep \
    tests/fixtures/sweep1.psmc tests/fixtures/sweep2.psmc tests/fixtures/sweep.jsfs \
    --splits 20 27 -bs 100 -mi 1 4 ST 3 1 -uf --cpfit --nosmooth --maxiter 256 \
    --funits /nonexistent -o scripts/sweep1band_r05_cap256.npz \
    > scripts/sweep1band_r05_cap256.out 2> scripts/sweep1band_r05_cap256.err
  grep '^{' scripts/sweep1band_r05_cap256.out | tail -1 > scripts/sweep1band_r05_cap256.json
  need_json scripts/sweep1band_r05_cap256.json
  cat scripts/sweep1band_r05_cap256.json
fi

# 7. the 16-scenario resident matrix (4 pairs x 4 scenarios, ~13k cells)
if [ ! -f scripts/matrix_r05.json ]; then
  log "16-scenario matrix (cold compiles for 3 program shapes)"
  timeout 9000 python -m misti_tpu.cli.sweep \
    --scenarios tests/fixtures/matrix/matrix.json \
    -bs 100 -uf --cpfit --nosmooth --funits /nonexistent \
    > scripts/matrix_r05.out 2> scripts/matrix_r05.err
  grep '^{' scripts/matrix_r05.out > scripts/matrix_r05.json
  need_json scripts/matrix_r05.json
  tail -1 scripts/matrix_r05.json
fi

log "all artifacts done"
