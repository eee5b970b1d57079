#!/bin/bash
# Shared dataset locations for the SLURM prep stages.  The reference scripts
# (prep_data/hpc/*.sh) hardcode absolute home-directory paths; here every
# location is an overridable environment variable.
: "${MISTI_DATA:=$PWD/data}"
: "${REF_FASTA:=$MISTI_DATA/fasta/GRCh38_full_analysis_set_plus_decoy_hla.fa}"
: "${ANC_FASTA:=$MISTI_DATA/ancestral/ancestral.grch38.autosomes.fa}"
: "${CRAM_DIR:=$MISTI_DATA/BAMs}"
: "${MASK_DIR:=$MISTI_DATA/masks/grch38}"
: "${SBATCH_ACCOUNT:=}"
export MISTI_DATA REF_FASTA ANC_FASTA CRAM_DIR MASK_DIR SBATCH_ACCOUNT

avg_coverage() {  # sample -> mean depth from the coverage stage's table
    awk '{total+=$3; spl1+=$4} END {print int(spl1/total)}' "./$1/$1.coverage.txt"
}
