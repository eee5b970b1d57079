#!/bin/bash
# bam -> site allele frequencies (ANGSD -doSaf) for the realSFS 2D-SFS;
# feed two genomes' .saf.idx into realSFS, then utils/ANGSDSFS.py to get the
# MiSTI JSFS format.
set -euo pipefail
bfile=$1
avdep=$2
nthr=$3
mindep=$((avdep/3))
maxdep=$((2*avdep))
REF=${REF:?set REF to the reference fasta}
ANC=${ANC:?set ANC to the ancestral-state fasta}
MASK_DIR=${MASK_DIR:?set MASK_DIR to the strict-mask directory}

mkdir -p sfs
li=bamlist.txt
echo "$bfile" > "$li"
[ -f "$bfile.bai" ] || samtools index "$bfile"
out=$(basename "$bfile" .bam)
angsd -C 50 -rf "$MASK_DIR/strictmask_anccons_autosomes.regions" \
  -sites "$MASK_DIR/strictmask_anccons_autosomes.sites" \
  -setMinDepth "$mindep" -setMaxDepth "$maxdep" -GL 1 -minMapQ 30 -minQ 30 \
  -b "$li" -anc "$ANC" -ref "$REF" -P "$nthr" -out "sfs/${out}" \
  -doSaf 1 -doCounts 1
