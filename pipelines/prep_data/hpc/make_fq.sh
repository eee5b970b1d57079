#!/bin/bash
# Consensus fastq per chromosome -> one fq.gz per sample (reference
# prep_data/hpc/make.fq.sh: mpileup | call -c | vcfutils vcf2fq with
# depth bounds [avdep/3, 2*avdep]).  ./make_fq.sh SAMPLE NTHR
set -euo pipefail
. "$(dirname "$0")/env.sh"
SAMPLE=$1
nthr=${2:-8}
avdep=$(avg_coverage "${SAMPLE}")
echo "average coverage is ${avdep}"
mindep=$((avdep/3))
maxdep=$((2*avdep))

cd "${SAMPLE}"
mkdir -p fq

process_chr_fq() {
    local chr=$1
    local bed="${MASK_DIR}/autosome_chr${chr}.bed"
    bcftools mpileup -C50 -f "${REF_FASTA}" -T "${bed}" "./chr${chr}.cram" \
        | bcftools call -c - \
        | vcfutils.pl vcf2fq -d "${mindep}" -D "${maxdep}" -Q 20 \
        | gzip > "fq/${SAMPLE}.chr${chr}.fq.gz"
}
export -f process_chr_fq
export REF_FASTA MASK_DIR SAMPLE mindep maxdep
parallel -j "${nthr}" process_chr_fq ::: {1..22}

cat fq/${SAMPLE}.chr*.fq.gz > "fq/${SAMPLE}.fq.gz" \
    && rm fq/${SAMPLE}.chr*.fq.gz && rm ./*.cram*
echo "All chromosomes processed"
