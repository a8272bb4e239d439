"""Incremental TPU compile+run timing of the pallas sort pieces."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from w2rap_contigger_tpu.ops import pallas_sort as psrt
from w2rap_contigger_tpu.ops import pallas_collapse as pcol

TR = int(os.environ.get("TR", 256))
N = 1 << int(os.environ.get("LOGN", 22))
W = 4
rng = np.random.default_rng(0)
ops = [jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32))
       for _ in range(W)] + [jnp.asarray(rng.integers(0, 1 << 16, size=N, dtype=np.uint64).astype(np.uint32))]

t0 = time.time()
out = psrt.bitonic_sort(ops, num_keys=W, tile_rows=TR)
probe = int(jnp.sum(out[0][:: 1 << 15]).astype(jnp.uint32))
print(f"tile_rows={TR} N={N}: compile+first run {time.time()-t0:.1f}s", flush=True)

salts = jnp.arange(4, dtype=jnp.uint32)

@jax.jit
def run(salts):
    def body(acc, s):
        o = psrt.bitonic_sort([ops[0] ^ s] + ops[1:], num_keys=W, tile_rows=TR)
        return acc + jnp.sum(o[0][:: 1 << 15]).astype(jnp.uint32), None
    acc, _ = jax.lax.scan(body, jnp.uint32(0), salts)
    return acc

t0 = time.time()
_ = int(run(salts))
print(f"scan-wrapped compile+run {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
_ = int(run(salts))
dt = (time.time() - t0) / 4
print(f"sort: {dt*1e3:.1f} ms  {N/dt/1e6:.1f} Melem/s", flush=True)

# correctness vs lax.sort
ref = jax.lax.sort([np.asarray(o) for o in ops], num_keys=W)
for i in range(W):
    assert np.array_equal(np.asarray(out[i]), np.asarray(ref[i])), f"mismatch word {i}"
print("matches lax.sort", flush=True)

# collapse
t0 = time.time()
op2, counts, _ = pcol.collapse_compact(out)
probe = int(jnp.sum(counts))
print(f"collapse compile+first {time.time()-t0:.1f}s uniq={probe}", flush=True)

@jax.jit
def runc(salts):
    def body(acc, s):
        o, c, _ = pcol.collapse_compact(out[:W] + [out[W] ^ (s << 16)])
        return acc + jnp.sum(c).astype(jnp.uint32) + jnp.sum(o[0][:: 1 << 15]).astype(jnp.uint32), None
    acc, _ = jax.lax.scan(body, jnp.uint32(0), salts)
    return acc

_ = int(runc(salts))
t0 = time.time()
_ = int(runc(salts))
dt = (time.time() - t0) / 4
print(f"collapse: {dt*1e3:.1f} ms  {N/dt/1e6:.1f} Melem/s", flush=True)

# fused: lax.sort + pallas collapse
@jax.jit
def runf(salts):
    def body(acc, s):
        sp = jax.lax.sort([ops[0] ^ s] + ops[1:], num_keys=W)
        o, c, _ = pcol.collapse_compact(list(sp))
        return acc + jnp.sum(c).astype(jnp.uint32) + jnp.sum(o[0][:: 1 << 15]).astype(jnp.uint32), None
    acc, _ = jax.lax.scan(body, jnp.uint32(0), salts)
    return acc

_ = int(runf(salts))
t0 = time.time()
_ = int(runf(salts))
dt = (time.time() - t0) / 4
print(f"lax.sort+collapse: {dt*1e3:.1f} ms  {N/dt/1e6:.1f} Melem/s", flush=True)

# fused: pallas bitonic sort + pallas collapse
@jax.jit
def runpf(salts):
    def body(acc, s):
        sp = psrt.bitonic_sort([ops[0] ^ s] + ops[1:], num_keys=W, tile_rows=TR)
        o, c, _ = pcol.collapse_compact(list(sp))
        return acc + jnp.sum(c).astype(jnp.uint32) + jnp.sum(o[0][:: 1 << 15]).astype(jnp.uint32), None
    acc, _ = jax.lax.scan(body, jnp.uint32(0), salts)
    return acc

_ = int(runpf(salts))
t0 = time.time()
_ = int(runpf(salts))
dt = (time.time() - t0) / 4
print(f"pallas.sort+collapse: {dt*1e3:.1f} ms  {N/dt/1e6:.1f} Melem/s", flush=True)

# collapse correctness on real sorted data
op2, counts2, _ = pcol.collapse_compact(out)
from w2rap_contigger_tpu.ops import pallas_collapse as pc2
got_w, got_ctx, got_cnt = pc2.gather_unique(op2, counts2)
print(f"uniques: {got_w.shape[0]}", flush=True)
import numpy as _np
sw = _np.stack([_np.asarray(o) for o in out[:W]], axis=-1)
sent = _np.all(sw == 0xFFFFFFFF, axis=1)
w = sw[~sent]
b = _np.ones(w.shape[0], bool); b[1:] = _np.any(w[1:] != w[:-1], axis=1)
print("ref uniques:", int(b.sum()), flush=True)
assert got_w.shape[0] == int(b.sum())
assert _np.array_equal(got_w, w[b])
print("collapse matches numpy on 4M sorted rows", flush=True)
