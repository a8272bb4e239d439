#!/bin/bash
# Scale / memory-ceiling run (VERDICT r2 #4): a genome ~3.5x the E. coli
# config with an enforced -m ceiling low enough to force hash-range
# multipass counting (the createDictOMPDiskBased analogue,
# BuildReadQGraph.cc:1120-1250), with wall + peak-mem recorded.
#
#   bash scripts/scale_run.sh /tmp/scale [GLEN] [PAIRS] [MEM_GB]
#
# Defaults: 16Mbp genome, 1.92M PE250 pairs (30x), 4 GB ceiling (the
# k=60 working set is ~18 GB unbatched, so this forces >= 8 ranges).
# The run records TIME lines (--dump_perf) and prints peak RSS.
set -e
OUT=${1:-/tmp/scale}
GLEN=${2:-16000000}
PAIRS=${3:-1920000}
MEM=${4:-4}
python scripts/make_synth_fastq.py $OUT --glen $GLEN --pairs $PAIRS --rlen 250 --insert 500
mkdir -p $OUT/out
python -u -c "
import resource, runpy, sys, time
sys.argv = ['w2rap_contigger_tpu', '-r', '$OUT/reads_R1.fastq,$OUT/reads_R2.fastq',
            '-o', '$OUT/out', '-p', 'pe', '-K', '260', '-m', '$MEM',
            '-d', '4', '--tmp_dir', '$OUT/tmp', '--dump_perf', '--dump_all']
t0 = time.time()
runpy.run_module('w2rap_contigger_tpu', run_name='__main__')
kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(f'scale_run: wall {time.time()-t0:.1f}s peak_rss {kb/1048576:.2f} GiB')
"
cat $OUT/out/pe.perf
cat $OUT/out/stats
