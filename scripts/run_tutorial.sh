#!/bin/bash
# Tutorial pipeline on the reference's P.patens dataset, mirroring its
# run.sh (reference README.md:70-151).  Download P.patens.tar.bz2 from the
# reference release and run this from inside the extracted directory.
set -euo pipefail
HM=${HM:-$(dirname "$0")/../hifimeth-tpu}
REF=GCA_000002425.3_Phypa_V5_genomic.fasta
BAM=m84070_250716_151350_s2.bam

# 1) read-level 5mC calling (all contexts)
$HM call "$BAM" mod.bam

# 2) align with pbmm2 (external, as in the reference)
pbmm2 index --preset CCS "$REF" "$REF.mmi"
pbmm2 align --preset CCS --sort -j48 "$REF.mmi" mod.bam mod.pbmm2.bam

# 3) genome-wide quantification
$HM pileup "$REF" mod.pbmm2.bam P.patens

# 4) evaluation vs BS-seq (per context; CHH shown)
$HM cov2bed "$REF" CHH P.patens.CHH.gz.bismark.cov chh.bed
$HM corr P.patens.CHH.cov.bed chh.bed
$HM eval "$REF" chh.bed mod.pbmm2.bam read-level.eval
$HM read-level-eval read-level.eval 5
