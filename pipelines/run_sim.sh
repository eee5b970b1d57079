#!/bin/bash
# Simulation round-trip: msHOT-lite -> per-genome pseudo-.ms -> PSMC x2 ->
# JSFS -> ready for the misti fit (equivalent of the reference run_sim.sh;
# validates the end-to-end pipeline on a known demography, README scenario:
#   ./pipelines/run_sim.sh sim_dir "4 100 -t 15000 -r 1920 30000000 -l -I 2 2 2 \
#       -n 1 10 -n 2 4.5 -eN 0.025 0.2 -ej 0.045 2 1 -eN 0.175 3 -eN 0.625 1.8 \
#       -eN 3 3.2 -eN 8 5.5"
# then: python -m misti_tpu.cli.misti sim_dir/ms2g1.psmc sim_dir/ms2g2.psmc \
#       sim_dir/sim.jsfs 22 -o out.mi -uf
#
# External native tools (same as the reference; NOT reimplemented here):
#   msHOT-lite (Heng Li), psmc + ms2psmcfa.pl/psmc_plot.pl, GNU parallel.
set -euo pipefail

PSMC_PATH=${PSMC_PATH:-$HOME/install/psmc}
MSHOT_PATH=${MSHOT_PATH:-$HOME/install/msHOT-lite}
MISTI_PATH="$(cd "$(dirname "$0")/.." && pwd)"

if [ "$#" -lt 2 ]; then
  echo "Usage: $0 DIRECTORY \"ms arguments\" [-c]" >&2
  exit 1
fi
DIR=$1
MSARG=$2
CLEAN=${3:-}

mkdir "$DIR"

"$MSHOT_PATH/msHOT-lite" $MSARG | gzip > "$DIR/sim.ms.gz"
python "$MISTI_PATH/utils/MSSPLIT.py" <(gunzip -c "$DIR/sim.ms.gz") "$DIR"
gzip "$DIR/ms2g1.ms" "$DIR/ms2g2.ms"
for g in 1 2; do
  "$PSMC_PATH/utils/ms2psmcfa.pl" <(gunzip -c "$DIR/ms2g$g.ms.gz") \
    | gzip > "$DIR/ms2g$g.psmc.fa.gz"
done
parallel "$PSMC_PATH/psmc" "-p 1*4+25*2+1*4+1*6 <(gunzip -c $DIR/ms2g{}.psmc.fa.gz) > $DIR/ms2g{}.psmc" ::: 1 2
"$PSMC_PATH/utils/psmc_plot.pl" -n30 -u 1.25e-8 -g1 -x1 -X1000000 -L \
  -M genome1,genome2, "$DIR/plot_sim" "$DIR/ms2g1.psmc" "$DIR/ms2g2.psmc" || true
python "$MISTI_PATH/utils/MS2JSFS.py" <(gunzip -c "$DIR/sim.ms.gz") -p ms2g1 ms2g2 > "$DIR/sim.jsfs"

if [ "$CLEAN" = "-c" ]; then
  rm -f "$DIR/sim.ms.gz" "$DIR"/ms2g?.ms.gz
fi
