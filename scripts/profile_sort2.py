"""TPU timing for the Pallas sort + collapse pipeline (bench_scan style)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from w2rap_contigger_tpu.ops import bitkmer as bk
from w2rap_contigger_tpu.ops import pallas_kmer as pk
from w2rap_contigger_tpu.ops import pallas_sort as psrt
from w2rap_contigger_tpu.ops import pallas_collapse as pcol

k, L = 60, 250
chunk = 16384
W = bk.nwords(k)
ITERS = 4

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, size=4_600_000).astype(np.uint8)
starts = rng.integers(0, len(genome) - L, size=chunk)
b = genome[starts[:, None] + np.arange(L)[None, :]].astype(np.uint8)
q = np.full((chunk, L), 35, dtype=np.uint8)
l = np.full(chunk, L, dtype=np.int32)

words, ctx, _ = pk.kmerize_chunk_pallas(
    jnp.asarray(b), jnp.asarray(l), jnp.asarray(q), 60, 7)
M = words.shape[0]
NP2 = 1 << 22
print(f"M={M} NP2={NP2}", flush=True)

pw = [jnp.concatenate([words[:, i], jnp.full(NP2 - M, 0xFFFFFFFF, jnp.uint32)])
      for i in range(W)]
payload = jnp.where(
    ~bk.words_eq(words, jnp.full((1, W), 0xFFFFFFFF, dtype=jnp.uint32)),
    (ctx << np.uint32(8)) | 1, 0)
pc = jnp.concatenate([payload, jnp.zeros(NP2 - M, jnp.uint32)])
salts = jnp.arange(ITERS, dtype=jnp.uint32)


def bench_scan(make_body, name, elems):
    @jax.jit
    def run(salts):
        def body(acc, s):
            return acc + make_body(s), None
        acc, _ = jax.lax.scan(body, jnp.uint32(0), salts)
        return acc
    _ = int(run(salts))
    t0 = time.time()
    _ = int(run(salts))
    dt = (time.time() - t0) / ITERS
    print(f"{name:32s} {dt*1e3:9.1f} ms  {elems/dt/1e6:9.1f} Melem/s", flush=True)
    return dt


def probe(arrs):
    tot = jnp.uint32(0)
    for a in arrs:
        tot = tot + jnp.sum(a[:: 1 << 15].astype(jnp.uint32))
    return tot


def psort_body(s, tile_rows):
    ops = [pw[0] ^ (s & 0)] + pw[1:] + [pc ^ s]
    out = psrt.bitonic_sort(ops, num_keys=W, tile_rows=tile_rows)
    return probe(out)


for tr in (256, 512, 1024):
    bench_scan(lambda s, tr=tr: psort_body(s, tr), f"pallas sort tr={tr}", NP2)

# collapse on sorted data
sorted_planes = psrt.bitonic_sort(pw + [pc], num_keys=W)


def pcoll_body(s, tile_rows):
    ops = sorted_planes[:W] + [sorted_planes[W] ^ (s & 0)]
    out_planes, counts, _lb = pcol.collapse_compact(ops, tile_rows=tile_rows)
    return probe(out_planes[:1]) + jnp.sum(counts).astype(jnp.uint32) + s * 0


for tr in (64, 256, 512):
    bench_scan(lambda s, tr=tr: pcoll_body(s, tr), f"pallas collapse tr={tr}", NP2)


# fused: kmerize + mask + sort + collapse (the real kernel pipeline)
db, dl, dq = jnp.asarray(b), jnp.asarray(l), jnp.asarray(q)

def full_body(s):
    w, c, _ = pk.kmerize_chunk_pallas(db, dl, dq ^ (s & 0).astype(jnp.uint8), k, 7)
    valid = ~bk.words_eq(w, jnp.full((1, W), 0xFFFFFFFF, dtype=jnp.uint32))
    pay = jnp.where(valid, (c << np.uint32(8)) | 1, 0)
    planes = [jnp.concatenate([w[:, j], jnp.full(NP2 - M, 0xFFFFFFFF, jnp.uint32)])
              for j in range(W)]
    planes.append(jnp.concatenate([pay, jnp.zeros(NP2 - M, jnp.uint32)]))
    sp = psrt.bitonic_sort(planes, num_keys=W)
    op, cnts, _ = pcol.collapse_compact(sp)
    return probe(op[:1]) + jnp.sum(cnts).astype(jnp.uint32)

bench_scan(full_body, "kmerize+sort+collapse", M)

# correctness vs lax.sort on the real data
out_p = psrt.bitonic_sort(pw + [pc], num_keys=W)
out_x = jax.lax.sort([np.asarray(x) for x in pw] + [np.asarray(pc)], num_keys=W)
for i in range(W):
    assert np.array_equal(np.asarray(out_p[i]), np.asarray(out_x[i])), f"word {i} mismatch"
# payload may legally differ within equal-key runs; compare sorted within runs
print("pallas sort == lax.sort keys on 4M real kmer rows", flush=True)
