#!/bin/bash
# North-star parity check (BASELINE.json): contig-set equality vs the
# reference w2rap-contigger on synthetic PE data.
#
# 1. build the reference with -O2 (its -Ofast miscompiles under gcc>=12):
#    cmake /root/reference -B /tmp/w2rap_o2 && sed -i 's/-Ofast/-O2 -fno-strict-aliasing/' /tmp/w2rap_o2/CMakeFiles/*.dir/flags.make && make -C /tmp/w2rap_o2 -j w2rap-contigger
# 2. synthesize data + run both + compare:
set -e
OUT=${1:-/tmp/parity}
python scripts/make_synth_fastq.py $OUT --glen 200000 --pairs 24000 --rlen 250 --insert 500
mkdir -p $OUT/ref_out $OUT/tpu_out
/tmp/w2rap_o2/bin/w2rap-contigger -r $OUT/reads_R1.fastq,$OUT/reads_R2.fastq -o $OUT/ref_out -p pe -K 200 -t 2
python -m w2rap_contigger_tpu -r $OUT/reads_R1.fastq,$OUT/reads_R2.fastq -o $OUT/tpu_out -p pe -K 200
python scripts/compare_contigs.py $OUT/tpu_out/a.lines.fasta $OUT/ref_out/a.lines.fasta
# Verified 2026-08-17 (round 1): VERDICT: BIT-IDENTICAL CONTIG SETS
# (1 contig, 199904 bp, on 200kb genome / 24k PE250 pairs / K=200)
