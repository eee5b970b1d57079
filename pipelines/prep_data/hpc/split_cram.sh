#!/bin/bash
# Split a whole-genome CRAM into per-chromosome CRAMs (reference
# prep_data/hpc/split.cram.sh).  ./split_cram.sh SAMPLE NTHR_PER_PROC
set -euo pipefail
. "$(dirname "$0")/env.sh"
SAMPLE=$1
nthr_per_proc=${2:-8}
CRAM=${CRAM_DIR}/${SAMPLE}.cram
cd "${SAMPLE}"

process_cram_chr() {
    local chr_name="chr$1"
    samtools view -T "${REF_FASTA}" -C -h -o "${chr_name}.cram" \
        "${CRAM}" "${chr_name}" --threads "${nthr_per_proc}"
    samtools index -c "${chr_name}.cram" --threads "${nthr_per_proc}"
    echo "Created ${chr_name}.cram"
}
export CRAM REF_FASTA nthr_per_proc
export -f process_cram_chr
parallel -j 3 process_cram_chr ::: {1..22}
