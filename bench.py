"""Benchmark: step-2 kmer counting throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.

Metric: canonical k=60 kmers counted per second per chip for the
counting kernel (kmerize + canonicalize + 4-word lexicographic sort +
segmented collapse) on device-resident reads — the BuildReadQGraph hot
loop (reference createDictOMPRecursive, BuildReadQGraph.cc:1015).

Baseline: measured on this machine — the reference (-O2 build; its
-Ofast miscompiles under gcc13) runs buildReadQGraph on 240k PE250 reads
(45.8M kmers) in 8.7s wall on 2 cores = 2.6M kmers/s/core; the
BASELINE.json 32-core target machine therefore counts ~8.4e7 kmers/s
assuming perfect scaling, which is the vs_baseline denominator.

detail.end_to_end_kmers_per_sec includes host merge + transfers through
this environment's TPU network tunnel (multi-second round-trip latency,
not representative of a directly-attached TPU VM).
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from w2rap_contigger_tpu.ops import bitkmer as bk
    from w2rap_contigger_tpu.ops import kmer_engine as ke

    k, L = 60, 250
    chunk = 16384
    n_iters = 8
    rng = np.random.default_rng(42)

    genome = rng.integers(0, 4, size=4_600_000).astype(np.uint8)

    def make_chunk(seed):
        r = np.random.default_rng(seed)
        starts = r.integers(0, len(genome) - L, size=chunk)
        idx = starts[:, None] + np.arange(L)[None, :]
        b = genome[idx]
        err = r.random((chunk, L)) < 0.003
        b = np.where(err, (b + 1) % 4, b).astype(np.uint8)
        q = np.full((chunk, L), 35, dtype=np.uint8)
        q[r.random((chunk, L)) < 0.02] = 2
        return b, np.full(chunk, L, dtype=np.int32), q

    W = bk.nwords(k)
    dev_chunks = [
        tuple(jnp.asarray(x) for x in make_chunk(s)) for s in range(n_iters)
    ]

    # warmup / compile
    cw, cctx, _ = ke.kmerize_chunk(*dev_chunks[0], k, 7)
    out = ke.sort_collapse_leaf(cw, cctx, W)
    jax.block_until_ready(out)

    # device-kernel rate: all chunks fused into ONE lax.scan call so the
    # tunnel round-trip (~seconds here) is paid once; every output is
    # consumed via probes so nothing is dead-code-eliminated.
    db = jnp.stack([dc[0] for dc in dev_chunks])
    dl = jnp.stack([dc[1] for dc in dev_chunks])
    dq = jnp.stack([dc[2] for dc in dev_chunks])

    @jax.jit
    def fused(b, l, q):
        def body(acc, xs):
            bb, ll, qq = xs
            cw, cctx, _ = ke.kmerize_chunk(bb, ll, qq, k, 7)
            ow, octx, ocnt, nu = ke.sort_collapse_leaf(cw, cctx, W)
            probe = (
                jnp.sum(ow[:: 1 << 15], dtype=jnp.uint32)
                + jnp.sum(octx[:: 1 << 15], dtype=jnp.uint32)
                + jnp.sum(ocnt[:: 1 << 15]).astype(jnp.uint32)
            )
            return acc + nu + probe.astype(jnp.int32), None
        acc, _ = jax.lax.scan(body, jnp.int32(0), (b, l, q))
        return acc

    _ = int(fused(db, dl, dq))  # compile + warm
    t0 = time.time()
    _ = int(fused(db, dl, dq))
    dt_kernel = time.time() - t0
    n_kmers = n_iters * chunk * (L - k + 1)
    kernel_rate = n_kmers / dt_kernel

    # end-to-end rate: full count_kmers (transfers + host merge included)
    bases = np.concatenate([np.asarray(dc[0]) for dc in dev_chunks])
    lengths = np.concatenate([np.asarray(dc[1]) for dc in dev_chunks])
    quals = np.concatenate([np.asarray(dc[2]) for dc in dev_chunks])
    t0 = time.time()
    d, hist = ke.count_kmers(bases, lengths, quals, k, chunk_reads=chunk)
    dt_e2e = time.time() - t0

    print(
        json.dumps(
            {
                "metric": "k60_kmers_counted_per_sec_per_chip",
                "value": round(kernel_rate, 1),
                "unit": "kmers/s",
                "vs_baseline": round(kernel_rate / BASELINE_KMERS_PER_SEC, 3),
                "detail": {
                    "kernel_wall_s": round(dt_kernel, 2),
                    "end_to_end_kmers_per_sec": round(n_kmers / dt_e2e, 1),
                    "end_to_end_wall_s": round(dt_e2e, 2),
                    "reads": n_iters * chunk,
                    "unique_kmers": int(d.size),
                    "device": str(jax.devices()[0]),
                    "baseline": "measured reference -O2: 2.6M kmers/s/core x 32",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
