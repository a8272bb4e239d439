"""Benchmark: step-2 kmer counting throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

Metric: canonical k=60 kmers counted per second per chip for the full
dictionary-build kernel pipeline — Pallas kmerize+canonicalize, global
sort, Pallas one-pass collapse+compact (the BuildReadQGraph hot loop:
createDictOMPRecursive, reference BuildReadQGraph.cc:1015-1110).  The
kernel rate is measured with all compute on device and synchronized by
downloading a probe scalar (block_until_ready does not synchronize on
the tunneled backend used here).

Baseline: measured on this machine — the reference (-O2 build; its
-Ofast miscompiles under gcc13) at two scales:
  * 240k PE250 reads (45.8M kmers): buildReadQGraph 8.7s on 2 cores
    = 2.6M kmers/s/core (round-2 measurement);
  * the full north-star scale, 1.1M PE250 reads (210.1M kmers, E. coli
    4.6Mbp/30x): buildReadQGraph 90.9s at -t 1 and 46.0s at -t 2
    (2026-08-20) = 2.31M kmers/s/core with 99% 1->2-core scaling
    efficiency.
This box has 2 cores, so the 32-core figure is an extrapolation; the
measured near-perfect 1->2 scaling and the reference's own
shared-nothing OMP task tree (BuildReadQGraph.cc:1015-1048) support
linearity, and the HIGHER of the two per-core rates is used:
2.6M x 32 = 8.4e7 kmers/s is the vs_baseline denominator (the
north-star-scale rate would give 7.4e7, i.e. vs_baseline here is
conservative by ~14%).

detail.end_to_end_kmers_per_sec is ops.kmer_engine.count_kmers_device
wall time end to end, including host->device upload of the reads and
the compacted-dictionary download through this environment's TPU
network tunnel (multi-second round-trip latency, not representative of
a directly-attached TPU VM).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_KMERS_PER_SEC = 8.4e7


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    import jax.numpy as jnp
    import numpy as np

    from w2rap_contigger_tpu.ops import bitkmer as bk
    from w2rap_contigger_tpu.ops import kmer_engine as ke
    from w2rap_contigger_tpu.ops import pallas_collapse as pcol
    from w2rap_contigger_tpu.ops import pallas_kmer as pk
    from w2rap_contigger_tpu.ops import pallas_sort as psrt

    k, L = 60, 250
    n_reads = 131072
    W = bk.nwords(k)
    rng = np.random.default_rng(42)

    genome = rng.integers(0, 4, size=4_600_000).astype(np.uint8)
    starts = rng.integers(0, len(genome) - L, size=n_reads)
    bases = genome[starts[:, None] + np.arange(L)[None, :]].astype(np.uint8)
    err = rng.random((n_reads, L)) < 0.003
    bases = np.where(err, (bases + 1) % 4, bases).astype(np.uint8)
    quals = np.full((n_reads, L), 35, dtype=np.uint8)
    quals[rng.random((n_reads, L)) < 0.02] = 2
    lengths = np.full(n_reads, L, dtype=np.int32)

    P16 = 16 * ((L - k + 1 + 15) // 16)
    M = n_reads * P16
    backend = os.environ.get("W2RAP_SORT", "lax")
    if backend == "pallas":
        NP2 = ke._next_pow2(M + 1)
    elif backend == "radix":
        from w2rap_contigger_tpu.ops import pallas_radix as prad

        T = prad.DEFAULT_TILE_ROWS * 128
        NP2 = T * ke._next_pow2(-(-(M + 1) // T))
    else:
        tile = pcol.DEFAULT_TILE_ROWS * 128
        NP2 = ((M + 1 + tile - 1) // tile) * tile

    db = jnp.asarray(bases)
    dl = jnp.asarray(lengths)
    dq = jnp.asarray(quals)

    FULLC = jnp.uint32(0xFFFFFFFF)

    @jax.jit
    def kernel(b, l, q, salt):
        words, ctx, _ = pk.kmerize_chunk_pallas(b, l, q ^ salt, k, 7)
        planes = [
            jnp.concatenate(
                [words[:, j], jnp.full(NP2 - M, FULLC, jnp.uint32)]
            )
            for j in range(W)
        ]
        if backend == "pallas":
            valid = ~bk.words_eq(
                words, jnp.full((1, W), FULLC, jnp.uint32)
            )
            payload = jnp.where(valid, (ctx << jnp.uint32(8)) | 1, 0)
            planes.append(
                jnp.concatenate([payload, jnp.zeros(NP2 - M, jnp.uint32)])
            )
            sp = psrt.bitonic_sort(planes, num_keys=W)
        elif backend == "radix":
            # partition sort with ctx in the pad bits (same packing as
            # the lax path); overflow/collision flags fold into the
            # probe so a silent-failure run cannot report a good number
            from w2rap_contigger_tpu.ops import pallas_radix as prad

            ctxp = jnp.concatenate([ctx, jnp.zeros(NP2 - M, jnp.uint32)])
            planes[W - 1] = planes[W - 1] | (ctxp & jnp.uint32(0xFF))
            sp, overflow = prad.partition_sort(planes, num_keys=W)
            ctx_s = sp[W - 1] & jnp.uint32(0xFF)
            w_last = sp[W - 1] & ~jnp.uint32(0xFF)
            sent = sp[0] == FULLC
            for j in range(1, W - 1):
                sent = sent & (sp[j] == FULLC)
            sent = sent & (w_last == (FULLC & ~jnp.uint32(0xFF)))
            w_last = jnp.where(sent, FULLC, w_last)
            pay_s = jnp.where(
                sent, jnp.uint32(0), (ctx_s << jnp.uint32(8)) | 1
            )
            stripped = sp[: W - 1] + [w_last]
            cflag = prad.collision_flag(stripped, num_keys=W)
            sp = stripped + [pay_s]
            sp[0] = sp[0] ^ jnp.where(
                (overflow + cflag) > 0, jnp.uint32(0xDEAD), jnp.uint32(0)
            )
        else:
            # ctx rides in the last word's pad bits (k=60 -> 8 free bits):
            # the sort moves 4 operands instead of 5
            ctxp = jnp.concatenate([ctx, jnp.zeros(NP2 - M, jnp.uint32)])
            planes[W - 1] = planes[W - 1] | (ctxp & jnp.uint32(0xFF))
            sp = list(jax.lax.sort(planes, num_keys=W))
            ctx_s = sp[W - 1] & jnp.uint32(0xFF)
            w_last = sp[W - 1] & ~jnp.uint32(0xFF)
            sent = sp[0] == FULLC
            for j in range(1, W - 1):
                sent = sent & (sp[j] == FULLC)
            sent = sent & (w_last == (FULLC & ~jnp.uint32(0xFF)))
            w_last = jnp.where(sent, FULLC, w_last)
            pay_s = jnp.where(
                sent, jnp.uint32(0), (ctx_s << jnp.uint32(8)) | 1
            )
            sp = sp[: W - 1] + [w_last, pay_s]
        out_planes, counts, _lb = pcol.collapse_compact(sp, min_count=4)
        probe = (
            jnp.sum(counts).astype(jnp.uint32)
            + jnp.sum(out_planes[0][:: 1 << 15])
        )
        return probe

    # the tunnel RTT is multi-second: fuse the timed iterations into one
    # scan so one download synchronizes all of them; the salt perturbs
    # the quals stream so iterations cannot be hoisted or CSE'd
    iters = 3

    @jax.jit
    def run(salts):
        def body(acc, s):
            return acc + kernel(db, dl, dq, s), None

        acc, _ = jax.lax.scan(body, jnp.uint32(0), salts)
        return acc

    # distinct salts: a loop-invariant body would be hoisted/CSE'd and
    # the measurement voided (salt 0..2 flips low qual bits only; the
    # workload is identical)
    salts = jnp.arange(iters, dtype=jnp.uint8)
    _ = int(run(salts))  # compile + warm
    t0 = time.time()
    _ = int(run(salts))
    dt_kernel = (time.time() - t0) / iters
    n_kmers = n_reads * (L - k + 1)
    kernel_rate = n_kmers / dt_kernel

    # end-to-end: full count_kmers_device incl. transfers + dict download.
    # First call compiles the transfer/epilogue programs (or loads them
    # from the persistent cache); the steady-state production rate is the
    # warm second call, and the cold time is reported alongside.
    t0 = time.time()
    d, hist = ke.count_kmers_device(bases, lengths, quals, k)
    dt_cold = time.time() - t0
    t0 = time.time()
    d, hist = ke.count_kmers_device(bases, lengths, quals, k)
    dt_e2e = time.time() - t0

    # attribute the e2e-vs-kernel gap: host pack cost + link probes.
    # (This environment reaches the TPU through a network tunnel; a
    # directly-attached TPU VM moves the same bytes ~100x faster.)
    from w2rap_contigger_tpu.ops import pallas_kmer as pk

    t0 = time.time()
    _pr, _gl = pk.pack_and_glen_host(bases, quals, lengths, k, 7)
    dt_pack = time.time() - t0
    probe = jnp.zeros(8, jnp.uint32)
    _ = np.asarray(probe[:1])
    t0 = time.time()
    for _i in range(3):
        _ = np.asarray(probe[:1])
    rtt = (time.time() - t0) / 3
    up_buf = np.zeros(8 << 20, np.uint8)
    t0 = time.time()
    _ = np.asarray(jnp.asarray(up_buf)[:1])
    up_s = time.time() - t0
    down_dev = jnp.zeros(16 << 20, jnp.uint8)
    _ = np.asarray(down_dev[:16])
    t0 = time.time()
    _ = np.asarray(down_dev)
    down_s = time.time() - t0
    if d.dev is not None:
        # device-resident dict: only per-tile counts + the 101-bin
        # histogram crossed the link during e2e (the hist download also
        # synchronizes the timed call — all outputs of the one compaction
        # executable materialize together)
        dict_mb = 0.0
    else:
        dict_mb = (d.words.nbytes + d.ctx.nbytes + d.counts.nbytes) / 1e6

    print(
        json.dumps(
            {
                "metric": "k60_kmers_counted_per_sec_per_chip",
                "value": round(kernel_rate, 1),
                "unit": "kmers/s",
                "vs_baseline": round(kernel_rate / BASELINE_KMERS_PER_SEC, 3),
                "detail": {
                    "kernel_wall_s": round(dt_kernel, 3),
                    "end_to_end_kmers_per_sec": round(n_kmers / dt_e2e, 1),
                    "end_to_end_wall_s": round(dt_e2e, 2),
                    "end_to_end_cold_s": round(dt_cold, 2),
                    "host_pack_s": round(dt_pack, 3),
                    "link_rtt_s": round(rtt, 3),
                    "link_up_MBps": round(8 / max(up_s - rtt, 1e-9), 1),
                    "link_down_MBps": round(16 / max(down_s - rtt, 1e-9), 1),
                    "dict_download_mb": round(dict_mb, 1),
                    "dev_dict": d.dev is not None,
                    "reads": n_reads,
                    "unique_kmers": int(d.size),
                    "sort_backend": backend,
                    "device": str(jax.devices()[0]),
                    "baseline": "measured reference -O2: 2.6M kmers/s/core x 32",
                    # end-to-end CPU-parity record (measured offline on
                    # this box, both sides serial, 2026-08-21; full
                    # per-step table + parity verdicts in STATUS.md)
                    "northstar_e2e_wall_s": 170.2,
                    "northstar_ref_wall_s": 175.8,
                    "northstar_parity": "BIT-IDENTICAL",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
