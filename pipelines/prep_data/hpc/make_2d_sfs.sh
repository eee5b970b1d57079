#!/bin/bash
# Pairwise 2D-SFS from two samples' .saf.idx -> MiSTI JSFS text format.
set -euo pipefail
nthr=$1; sample1=$2; sample2=$3; pop1=$4; pop2=$5
HERE=$(cd "$(dirname "$0")/../../.." && pwd)
mkdir -p ./2dsfs
realSFS "./${sample1}/${sample1}.sfs/${sample1}.all.saf.idx" \
        "./${sample2}/${sample2}.sfs/${sample2}.all.saf.idx" \
        -cores "${nthr}" -nSites 2500000 > "./2dsfs/${sample1}_${sample2}.2dsfs"
python "$HERE/utils/ANGSDSFS.py" "./2dsfs/${sample1}_${sample2}.2dsfs" \
  "${pop1}" "${pop2}" > "./2dsfs/${sample1}_${sample2}.sfs"
