#!/bin/bash
# Variant-call + consensus route to per-chromosome fastq (reference
# prep_data/hpc/cram2fq.sh; the filtered-VCF alternative to make_fq.sh).
# ./cram2fq.sh SAMPLE NTHR
set -euo pipefail
. "$(dirname "$0")/env.sh"
SAMPLE=$1
nthr=${2:-2}
avdep=$(avg_coverage "${SAMPLE}")
echo "average coverage is ${avdep}"
mindep=$((avdep/3))
maxdep=$((2*avdep))

cd "${SAMPLE}"
mkdir -p fq

process_chr() {
    local chr=$1
    local BED="${MASK_DIR}/autosome_chr${chr}.bed"
    local CHR_CRAM="./chr${chr}.cram"
    bcftools mpileup -C50 -f "${REF_FASTA}" -R "${BED}" "${CHR_CRAM}" --threads 2 -Ou \
        | bcftools call -mv --threads 2 \
        | bcftools filter -i 'QUAL>=20' -Oz -o "${SAMPLE}.chr${chr}.vcf.gz"
    bcftools index "${SAMPLE}.chr${chr}.vcf.gz" --threads 2
    bcftools consensus -m "${BED}" -f "${REF_FASTA}" \
        -i "DP>${mindep} && DP<${maxdep}" "${SAMPLE}.chr${chr}.vcf.gz" \
        | gzip > "fq/${SAMPLE}_chr${chr}.fq.gz"
    echo "Finished chromosome ${chr} at $(date)"
}
export -f process_chr
export REF_FASTA MASK_DIR SAMPLE mindep maxdep
parallel -j "${nthr}" --linebuffer --tag "process_chr {}" ::: {1..22}
