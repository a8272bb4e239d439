"""Measure lax.sort cost vs num_keys on TPU at the bench shape.

Hypothesis (round 3): the counting pipeline only needs equal kmers
ADJACENT (grouping), not a fully lexicographic stream — the final
lexicographic dictionary can be restored by re-sorting the ~13x smaller
unique set.  If a 1-key sort (word0 as key, other planes as payload) is
much cheaper than the 4-key comparator, the big sort gets faster.

Run: python scripts/profile_sort_keys.py  (on the TPU backend)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 25  # ~33.5M rows (bench-scale)
W = 4  # k=60 -> 4 words (ctx riding in pad bits)

rng = np.random.default_rng(0)
planes_h = [rng.integers(0, 1 << 32, size=N, dtype=np.uint32) for _ in range(W)]
planes = [jnp.asarray(p) for p in planes_h]
idx = jnp.arange(N, dtype=jnp.uint32)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:16])
    t0 = time.perf_counter()
    reps = 3
    for _r in range(reps):
        out = f(*args)
        # force execution: download a tiny slice of the first output
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:16])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:8.1f} ms   {N/dt/1e6:8.1f} Mrows/s")
    return dt


def sort4(*ps):
    return jax.lax.sort(list(ps), num_keys=W)


def sort1_carry(*ps):
    return jax.lax.sort(list(ps), num_keys=1)


def sort1_pair(p0, ix):
    return jax.lax.sort([p0, ix], num_keys=1)


def sort1_gather(p0, ix, *rest):
    s0, sidx = jax.lax.sort([p0, ix], num_keys=1)
    return [s0] + [r[sidx] for r in rest]


def sort2_carry(*ps):
    return jax.lax.sort(list(ps), num_keys=2)


print(f"N = {N}  W = {W}  backend = {jax.default_backend()}")
timeit("4-key sort, 4 operands (today)", sort4, *planes)
timeit("2-key sort, 4 operands", sort2_carry, *planes)
timeit("1-key sort, 4 operands (carry)", sort1_carry, *planes)
timeit("1-key sort, 2 operands (pair)", sort1_pair, planes[0], idx)
timeit("1-key pair sort + gather 3 planes", sort1_gather, planes[0], idx, *planes[1:])

# the small final re-sort at unique scale (~1/13 of N)
Nu = N // 13
pu = [jnp.asarray(p[:Nu]) for p in planes_h]
cnts = jnp.ones(Nu, dtype=jnp.uint32)


def sort_final(*ps):
    return jax.lax.sort(list(ps), num_keys=W)


timeit("final 4-key sort at unique scale", sort_final, *(pu + [cnts]))
