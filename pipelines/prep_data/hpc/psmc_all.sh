#!/bin/bash
# Chain the four per-sample PSMC stages as dependent SLURM jobs (reference
# prep_data/hpc/psmc.all.sh).  ./psmc_all.sh SAMPLE
set -euo pipefail
. "$(dirname "$0")/env.sh"
SAMPLE=$1
ACCT=${SBATCH_ACCOUNT:+-A ${SBATCH_ACCOUNT}}
HERE=$(cd "$(dirname "$0")" && pwd)

JOB1=$(sbatch ${ACCT} --parsable --cpus-per-task=2  "${HERE}/coverage.sh"   "${SAMPLE}" 2)
JOB2=$(sbatch ${ACCT} --parsable --dependency=afterok:${JOB1} --cpus-per-task=24 "${HERE}/split_cram.sh" "${SAMPLE}" 8)
JOB3=$(sbatch ${ACCT} --parsable --dependency=afterok:${JOB2} --cpus-per-task=8  "${HERE}/make_fq.sh"    "${SAMPLE}" 8)
JOB4=$(sbatch ${ACCT} --parsable --dependency=afterok:${JOB3} --cpus-per-task=1  "${HERE}/psmc.sh"       "${SAMPLE}")

echo "Submitted: coverage=${JOB1} split=${JOB2} fq=${JOB3} psmc=${JOB4}"
