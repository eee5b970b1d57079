#!/bin/bash
# Bootstrap confidence-interval workflow (equivalent of the reference
# test.bs/<pair>.bs.sh scripts: 101 replicates x 8-10 split times x one
# Nelder-Mead fit each).
#
# Usage: ./pipelines/bootstrap_ci.sh DATA_DIR GENOME1.psmc GENOME2.psmc JSFS \
#            ST_FIRST ST_LAST [extra misti/sweep flags...]
#
# FAST PATH (default): one on-device sweep -- all (replicate x split) cells
# as lockstep vmapped fits sharded over the TPU mesh; prints the same
# per-cell `bs_id = ... llh = ...` lines the awk pipelines consume, plus the
# Student-t CI that the reference computes in bs_conf_int.ipynb.
#
# LEGACY PATH (MISTI_LEGACY_LOOP=1): per-process loop exactly like the
# reference scripts, using the drop-in MiSTI.py.
set -euo pipefail
DIR=$1; G1=$2; G2=$3; JSFS=$4; ST0=$5; ST1=$6; shift 6
MISTI_PATH="$(cd "$(dirname "$0")/.." && pwd)"
BS=${BS:-100}

python "$MISTI_PATH/utils/generateJSFS_bs.py" "$BS" "$DIR/$JSFS" > "$DIR/bs.sfs"

if [ "${MISTI_LEGACY_LOOP:-0}" = "1" ]; then
  mkdir -p "$DIR/LLH"
  for bs in $(seq 0 "$BS"); do
    for st in $(seq "$ST0" "$ST1"); do
      python "$MISTI_PATH/MiSTI.py" "$DIR/$G1" "$DIR/$G2" "$DIR/bs.sfs" "$st" \
        -bs "$bs" -uf -mi 1 4 "$st" 3 1 --cpfit "$@" \
        | grep "llh" | tr -d "][" | awk '{print $17,$14,$6}' \
        >> "$DIR/LLH/LLH.bs=${bs}.txt"
    done
  done
else
  python -m misti_tpu.cli.sweep "$DIR/$G1" "$DIR/$G2" "$DIR/$JSFS" \
    --splits "$ST0" "$ST1" -bs "$BS" -mi 1 4 ST 3 1 -uf --cpfit \
    -o "$DIR/sweep_results.npz" "$@"
fi
