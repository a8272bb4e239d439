"""Micro-profile step-2 counting pieces on the real TPU.

block_until_ready does not synchronize on the tunneled axon backend, so
every measurement fuses ITERS repetitions into one lax.scan whose carry
is downloaded (int()) — the bench.py pattern.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from w2rap_contigger_tpu.ops import bitkmer as bk
from w2rap_contigger_tpu.ops import kmer_engine as ke
from w2rap_contigger_tpu.ops import pallas_kmer as pk

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

db, dl, dq = jnp.asarray(b), jnp.asarray(l), jnp.asarray(q)
words, ctx, valid = pk.kmerize_chunk_pallas(db, dl, dq, k, 7)
M = words.shape[0]
print(f"rows per chunk M = {M}", flush=True)

# perturbation stream so iterations can't be hoisted out of the scan
salts = jnp.arange(ITERS, dtype=jnp.uint32)


def bench_scan(make_body, name, elems):
    """make_body(salt) -> probe scalar (uint32)."""

    @jax.jit
    def run(salts):
        def body(acc, s):
            return acc + make_body(s), None
        acc, _ = jax.lax.scan(body, jnp.uint32(0), salts)
        return acc

    _ = int(run(salts))  # compile + warm
    t0 = time.time()
    _ = int(run(salts))
    dt = (time.time() - t0) / ITERS
    print(f"{name:28s} {dt*1e3:9.1f} ms   {elems/dt/1e6:9.1f} Melem/s",
          flush=True)
    return dt


def probe(arrs):
    tot = jnp.uint32(0)
    for a in arrs:
        tot = tot + jnp.sum(a[:: 1 << 15], dtype=jnp.uint32) if a.ndim == 1 \
            else tot + jnp.sum(a[:: 1 << 12, 0], dtype=jnp.uint32)
    return tot


# 1) kmerize alone
bench_scan(
    lambda s: probe(pk.kmerize_chunk_pallas(db, dl, jnp.minimum(dq + s.astype(jnp.uint8) * 0, dq), k, 7)[:2]),
    "kmerize_pallas", M)

wc = [(words[:, i] ^ 0) for i in range(W)]

# 2) XLA 4-key sort + ctx payload
def sort5(s):
    ops = [wc[0] ^ s] + wc[1:] + [ctx]
    out = jax.lax.sort(ops, num_keys=W)
    return probe(out)
bench_scan(sort5, "lax.sort 4key+ctx", M)

# 3) XLA 1-key sort
bench_scan(lambda s: probe(jax.lax.sort([wc[0] ^ s], num_keys=1)),
           "lax.sort 1key", M)

# 4) collapse
sorted5 = jax.lax.sort(wc + [ctx], num_keys=W)
sw = jnp.stack(sorted5[:W], axis=-1)
sctx = sorted5[W]
ones = jnp.ones(M, jnp.int32)
def coll(s):
    out = ke._collapse_sorted(sw.at[0, 0].set(sw[0, 0] ^ s), sctx, ones, W)
    return probe(out[:1]) + out[3].astype(jnp.uint32)
bench_scan(coll, "_collapse_sorted", M)

# 5) one elementwise pass over 5 operands (bandwidth probe)
def ep(s):
    outs = [jnp.minimum(x ^ s, jnp.roll(x, 1, 0)) for x in wc + [ctx]]
    return probe(outs)
bench_scan(ep, "elementwise pass x5ops", M)

# 6) pallas bitonic sort (new kernel)
from w2rap_contigger_tpu.ops import pallas_sort as ps
NP2 = 1 << 22  # 4M
pw = [jnp.concatenate([x, jnp.full(NP2 - M, 0xFFFFFFFF, jnp.uint32)]) for x in wc]
pc = jnp.concatenate([ctx, jnp.zeros(NP2 - M, jnp.uint32)])
def psort(s):
    ops = [pw[0] ^ s] + pw[1:] + [pc]
    out = ps.bitonic_sort(ops, num_keys=W)
    return probe(out)
bench_scan(psort, "pallas bitonic 4key+ctx", NP2)

# correctness check vs lax.sort on this data (first words plane)
out_p = ps.bitonic_sort(pw + [pc], num_keys=W)
out_x = jax.lax.sort(pw + [pc], num_keys=W)
for i in range(W):
    a = np.asarray(out_p[i])
    bx = np.asarray(out_x[i])
    assert np.array_equal(a, bx), f"word {i} mismatch"
print("pallas sort == lax.sort on 4M real kmer rows", flush=True)
