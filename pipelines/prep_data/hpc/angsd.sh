#!/bin/bash
# Per-sample site allele frequencies (reference prep_data/hpc/angsd.sh).
# ./angsd.sh AVDEP NTHR SAMPLE   (AVDEP non-numeric -> derived from coverage)
set -euo pipefail
. "$(dirname "$0")/env.sh"
avdep=$1
nthr=$2
SAMPLE=$3
CRAM=${CRAM_DIR}/${SAMPLE}.cram
STRICT_MASK=${MASK_DIR}/autosome.sites.strict.mask.bed

if ! [[ "$avdep" =~ ^[0-9]+$ ]]; then
    avdep=$(avg_coverage "${SAMPLE}")
fi
echo "AVDEPTH: ${avdep}"
mindep=$((avdep/3))
maxdep=$((2*avdep))

mkdir -p "${SAMPLE}/${SAMPLE}.sfs"
angsd -P "${nthr}" -i "${CRAM}" -out "./${SAMPLE}/${SAMPLE}.sfs/${SAMPLE}.all" \
    -sites "${STRICT_MASK}" \
    -C 50 -minMapQ 20 -minQ 30 \
    -setMinDepth "${mindep}" -setMaxDepth "${maxdep}" \
    -GL 1 -ref "${REF_FASTA}" -anc "${ANC_FASTA}" \
    -doSaf 1 -doCounts 1
