#!/bin/bash
# Real-data preparation: human bam -> PSMC demography + 2D-SFS (equivalent of
# the reference prep_data/run_all.sh).  External native tools: samtools,
# bcftools, psmc toolchain, ANGSD/realSFS -- the framework consumes their
# text outputs; none are reimplemented.
set -euo pipefail
BAM=$1                      # path to the bam file
PREF=$(basename "$BAM" .bam)
HERE=$(cd "$(dirname "$0")" && pwd)

[ -f "${BAM}.bai" ] || samtools index "$BAM"

# average autosomal coverage drives the depth filters
samtools view -h "$BAM" | grep -m 22 "@SQ" | sed 's/:/\t/g' \
  | awk '{print $3"\t"0"\t"$5}' > autosomes.bed
samtools bedcov autosomes.bed "$BAM" | grep -vP "\t0$" >> coverage.txt
AVCOV=$(awk '{total+=$3; spl+=$4} END {print int(spl/total)}' coverage.txt)
echo "average coverage is $AVCOV"

nice "$HERE/run_bam2psmc.sh" "$BAM" "$AVCOV" 8
psmc_plot.pl -n25 -u 1.25e-8 -g1 -x1000 -X1000000 -L \
  "psmcOUT/plot_${PREF}" "psmcOUT/${PREF}.psmc"
nice "$HERE/run_angsdsfs.sh" "$BAM" "$AVCOV" 2
