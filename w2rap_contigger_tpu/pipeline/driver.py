"""7-step pipeline driver with per-step checkpoints.

Mirrors src/modules/w2rap-contigger.cc:306-606: each step loads exactly
what it needs from the previous step's checkpoint (--from_step/--to_step
semantics), writes its own dumps, and appends TIME lines to the .perf
log (checkpoint_perf_time, w2rap-contigger.cc:32-46).

Checkpoint schema (npz replaces the reference's feudal/BinaryStream
formats; same logical content):
  frag_reads_orig.npz          step 1  (<-> frag_reads_orig.fastb/.qualp)
  <p>.small_K.hbv.npz/.paths.npz  step 2
  <p>.large_K.hbv.npz/.paths.npz  step 3
  <p>.large_K.clean.*             step 4
  <p>.large_K.final.*             step 5
  <p>.contig.*                    step 6 (+ _contigs GFA)
  a.lines.fasta, stats, <p>_assembly GFA  step 7
"""

from __future__ import annotations

import os
import time

import numpy as np

from ..core.io_fastq import extract_reads
from ..core.reads import ReadSet
from ..graph.hbv import HyperBasevector
from ..paths.read_paths import ReadPathVec
from . import step2_small_k, step3_repath, step4_clean, step6_simplify


class PerfLog:
    def __init__(self, path=None):
        self.path = path
        self.t0 = time.time()
        self.c0 = time.process_time()
        if path:
            with open(path, "w") as f:
                f.write("")

    def checkpoint(self, section: str):
        t1, c1 = time.time(), time.process_time()
        line = f"TIME, {section}, {t1 - self.t0:.2f}, {c1 - self.c0:.2f}"
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        self.t0, self.c0 = t1, c1
        return line


def run_pipeline(
    out_dir: str,
    read_spec: str | None = None,
    reads: ReadSet | None = None,
    prefix: str = "pe",
    large_k: int = 200,
    from_step: int = 1,
    to_step: int = 7,
    min_freq: int = 4,
    min_qual: int = 7,
    min_size: int = 0,
    dump_all: bool = False,
    dump_perf: bool = False,
    chunk_reads: int = 65536,
    path_finder: bool = False,
    threads: int = 4,
    max_mem_gb: int = 10000,
    disk_batches: int = 0,
    tmp_dir: str | None = None,
    pair_sample: int = 200,
    extend_paths: bool = False,
    dump_pf: bool = False,
    fill_join: bool = False,
    shard_devices: int = -1,
):
    os.makedirs(out_dir, exist_ok=True)
    perf = PerfLog(f"{out_dir}/{prefix}.perf" if dump_perf else None)
    p = f"{out_dir}/{prefix}"

    # Multi-chip mesh (production): shard step-2 counting + pathing and
    # step-3 K2 counting across every visible device.  -1 = auto (shard
    # iff >1 device), 0 = off, N = force N devices (W2RAP_SHARD env
    # overrides).  Results are bit-identical either way.
    from ..parallel import mesh as pmesh

    mesh = pmesh.auto_mesh(shard_devices)
    if mesh is not None:
        print(f"sharding over {mesh.shape[pmesh.AXIS]} devices")

    # SetThreads analogue (DiscovarTools.cc:468): caps the host-side
    # BLAS/numpy thread pools; XLA device parallelism is unaffected.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS"):
        os.environ.setdefault(var, str(threads))
    # SetMaxMemory analogue (System.cc:1027): soft ceiling consulted by
    # the counting pipelines for automatic hash-range batching
    from ..utils import sysinfo

    sysinfo.set_max_memory(int(max_mem_gb) << 30)

    hbv = paths = None

    # Lazy read loading: the reference reloads only what each step needs
    # (w2rap-contigger.cc:559-569); steps 3 and 7 never touch the reads.
    _reads_box = [reads]

    def get_reads():
        if _reads_box[0] is None:
            _reads_box[0] = ReadSet.load(f"{out_dir}/frag_reads_orig.npz")
        return _reads_box[0]

    # ---- step 1: read loading ----------------------------------------
    if from_step <= 1 <= to_step:
        if reads is None:
            assert read_spec, "step 1 needs read files"
            reads = extract_reads(read_spec)
            _reads_box[0] = reads
        # the reference always writes frag_reads_orig.* in step 1
        # (w2rap-contigger.cc:315-316) so any later --from_step works
        reads.save(f"{out_dir}/frag_reads_orig.npz")
        # the reference prints peak memory after loading
        # (ExtractReads.cc:661-664)
        print(f"peak mem usage = {sysinfo.peak_mem_usage_gb_string()} GB")
        perf.checkpoint("ReadLoad")

    # ---- step 2: small-k graph ---------------------------------------
    if from_step <= 2 <= to_step:
        hbv, paths, _d = step2_small_k.build_read_q_graph(
            get_reads(),
            min_qual=min_qual,
            min_freq=min_freq,
            workdir=out_dir,
            chunk_reads=chunk_reads,
            disk_batches=disk_batches,
            tmp_dir=tmp_dir,
            max_mem_gb=max_mem_gb,
            do_fill_gaps=fill_join,
            do_join_overlaps=fill_join,
            mesh=mesh,
        )
        if dump_all or to_step == 2:
            hbv.save(f"{p}.small_K.hbv.npz")
            paths.save(f"{p}.small_K.paths.npz")
        perf.checkpoint("SmallKGraph")
    elif from_step == 3:
        hbv = HyperBasevector.load(f"{p}.small_K.hbv.npz")
        paths = ReadPathVec.load(f"{p}.small_K.paths.npz")

    # ---- step 3: repath to large K -----------------------------------
    if from_step <= 3 <= to_step:
        hbv, paths, _d2 = step3_repath.repath(
            hbv, paths, large_k, extend_paths=extend_paths, mesh=mesh
        )
        if dump_all or to_step == 3:
            hbv.save(f"{p}.large_K.hbv.npz")
            paths.save(f"{p}.large_K.paths.npz")
        perf.checkpoint("RepathInMemory")
    elif from_step == 4:
        hbv = HyperBasevector.load(f"{p}.large_K.hbv.npz")
        paths = ReadPathVec.load(f"{p}.large_K.paths.npz")

    # ---- step 4: clean large-K graph ---------------------------------
    if from_step <= 4 <= to_step:
        hbv, paths = step4_clean.clean200x(
            hbv, paths, get_reads(), min_size=min_size
        )
        if dump_all or to_step == 4:
            hbv.save(f"{p}.large_K.clean.hbv.npz")
            paths.save(f"{p}.large_K.clean.paths.npz")
        perf.checkpoint("Clean200x")
    elif from_step == 5:
        hbv = HyperBasevector.load(f"{p}.large_K.clean.hbv.npz")
        paths = ReadPathVec.load(f"{p}.large_K.clean.paths.npz")

    # ---- step 5: local assemblies in gaps ----------------------------
    if from_step <= 5 <= to_step:
        # AssembleGaps2 + AddNewStuff + PartnersToEnds
        # (w2rap-contigger.cc:424-459)
        from . import step5_gaps
        from ..paths.partners import partners_to_ends

        new_stuff = step5_gaps.assemble_gaps2(
            hbv, paths, get_reads(), pair_sample=pair_sample,
            threads=threads,
        )
        if new_stuff:
            hbv, paths = step5_gaps.add_new_stuff(
                hbv, paths, get_reads(), new_stuff, chunk_reads=chunk_reads
            )
        paths, _ = partners_to_ends(hbv, paths, get_reads())
        if dump_all or to_step == 5:
            hbv.save(f"{p}.large_K.final.hbv.npz")
            paths.save(f"{p}.large_K.final.paths.npz")
        perf.checkpoint("AssembleGaps")
    elif from_step == 6:
        hbv = HyperBasevector.load(f"{p}.large_K.final.hbv.npz")
        paths = ReadPathVec.load(f"{p}.large_K.final.paths.npz")

    # ---- step 6: simplify + lines + contig outputs -------------------
    if from_step <= 6 <= to_step:
        hbv, paths = step6_simplify.simplify(
            hbv, paths, get_reads(), run_pathfinder=path_finder,
            dump_pf=out_dir if dump_pf else None,
        )
        lines, stats = step6_simplify.contig_outputs(
            hbv, paths, out_dir, prefix="a"
        )
        hbv.save(f"{p}.contig.hbv.npz")
        paths.save(f"{p}.contig.paths.npz")
        # fork-classification log line (w2rap-contigger.cc:556)
        from ..paths.pathfinder import PathFinder

        PathFinder(hbv, paths).classify_forks(log=True)
        perf.checkpoint("Simplify")
    elif from_step == 7:
        hbv = HyperBasevector.load(f"{p}.contig.hbv.npz")
        paths = ReadPathVec.load(f"{p}.contig.paths.npz")

    # ---- step 7: PE scaffolding + final files ------------------------
    if from_step <= 7 <= to_step:
        from ..graph import gfa, lines as lines_mod
        from . import step7_scaffold

        lines7 = lines_mod.find_lines(hbv)
        hbv, paths, n_gaps = step7_scaffold.make_gaps(
            hbv, paths, lines7, min_line=5000, min_link_count=3
        )
        # FinalFiles (FinalFiles.cc:22): re-find lines and re-emit outputs
        # from the scaffolded graph
        if n_gaps:
            hbv.save(f"{p}_assembly.hbv.npz")
            paths.save(f"{p}_assembly.paths.npz")
            lines_f = lines_mod.find_lines(hbv)
            lines_f = lines_mod.sort_lines(hbv, lines_f)
            lines_mod.dump_line_files(hbv, lines_f, out_dir, "a", paths=paths)
            lines_mod.write_stats(hbv, lines_f, out_dir)
        gfa.gfa_dump(hbv, f"{out_dir}/{prefix}_assembly", find_lines=True)
        perf.checkpoint("MakeGaps+FinalFiles")

    from ..utils import sysinfo

    if sysinfo.timelog_enabled():
        rep = sysinfo.timelog_report()
        if rep:
            print(rep)

    return hbv, paths
