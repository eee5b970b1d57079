#!/bin/bash
# fq -> psmcfa -> psmc -> plot (reference prep_data/hpc/psmc.sh; same psmc
# pattern "4+25*2+4+6" as the workstation script).  ./psmc.sh SAMPLE
set -euo pipefail
. "$(dirname "$0")/env.sh"
SAMPLE=$1
cd "${SAMPLE}"
mkdir -p psmcIN psmcOUT

{ time fq2psmcfa -q20 "fq/${SAMPLE}.fq.gz" > "psmcIN/${SAMPLE}.psmcfa" ; } \
    2> "psmcIN/fq2psmc_${SAMPLE}.time"
{ time psmc -N25 -t15 -r5 -p "4+25*2+4+6" \
    -o "psmcOUT/${SAMPLE}.psmc" "psmcIN/${SAMPLE}.psmcfa" ; } \
    2> "psmcOUT/psmc_${SAMPLE}.time"
psmc_plot.pl -n25 -u 1.25e-8 -g1 -x1000 -X1000000 -L \
    "psmcOUT/plot_${SAMPLE}" "psmcOUT/${SAMPLE}.psmc"
