#!/bin/bash
# bam -> consensus fastq (per chromosome, parallel) -> psmcfa -> psmc.
# Depth filter: [avg/3, 2*avg]; mask/reference paths via env vars.
set -euo pipefail
bfile=$1
avdep=$2
ncores=$3
mindep=$((avdep/3))
maxdep=$((2*avdep))
REF=${REF:?set REF to the reference fasta}
MASK_DIR=${MASK_DIR:?set MASK_DIR to the strict-mask bed directory}

mkdir -p fq psmcIN psmcOUT
out=$(basename "$bfile" .bam)
for chr in {1..22}; do
  echo "samtools mpileup -C50 -u -v -f $REF --positions $MASK_DIR/strictmask_anccons_chr${chr}.bed $bfile 2> fq/${out}_stderr.txt | bcftools call -c - | vcfutils.pl vcf2fq -d $mindep -D $maxdep | gzip > fq/${out}_chr${chr}.fq.gz"
done | parallel -j "$ncores"
cat fq/${out}_chr*.fq.gz > "fq/${out}.fq.gz"
rm fq/${out}_chr*.fq.gz

fq2psmcfa -q30 "fq/$out.fq.gz" > "psmcIN/$out.psmcfa"
psmc -N25 -t15 -r5 -p "4+25*2+4+6" -o "psmcOUT/$out.psmc" "psmcIN/$out.psmcfa"
