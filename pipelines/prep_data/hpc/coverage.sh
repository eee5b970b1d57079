#!/bin/bash
# Per-sample autosome coverage table (reference prep_data/hpc/coverage.sh).
# ./coverage.sh SAMPLE NTHR
set -euo pipefail
. "$(dirname "$0")/env.sh"
SAMPLE=$1
nthr=${2:-2}
CRAM=${CRAM_DIR}/${SAMPLE}.cram
mkdir -p "${SAMPLE}"

[ -f "${CRAM}.crai" ] || samtools index "${CRAM}"

# autosome BED from the CRAM header, then per-chromosome base coverage
samtools view -h "${CRAM}" -T "${REF_FASTA}" --threads "${nthr}" \
    | grep -m 22 "@SQ" | sed 's/:/\t/g' \
    | awk '{print $3"\t"0"\t"$5}' > "./${SAMPLE}/${SAMPLE}.autosomes.bed"
samtools bedcov "./${SAMPLE}/${SAMPLE}.autosomes.bed" "${CRAM}" \
    | grep -vP "\t0$" >> "./${SAMPLE}/${SAMPLE}.coverage.txt"

echo "average coverage is $(avg_coverage "${SAMPLE}")"
