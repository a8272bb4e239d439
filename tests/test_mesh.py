"""Multi-chip sharded kmer counting on the virtual 8-device CPU mesh."""

import numpy as np

from w2rap_contigger_tpu.ops import kmer_engine as ke
from w2rap_contigger_tpu.parallel import mesh as pmesh


def test_sharded_count_matches_single_device(rng):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert len(jax.devices()) >= 8
    mesh = pmesh.make_mesh(8)
    k = 31
    n, L = 64, 80
    bases = rng.integers(0, 4, size=(n, L)).astype(np.uint8)
    lengths = np.full(n, L, dtype=np.int32)
    quals = np.full((n, L), 35, dtype=np.uint8)

    sh = NamedSharding(mesh, P(pmesh.AXIS))
    b = jax.device_put(jnp.asarray(bases), sh)
    l = jax.device_put(jnp.asarray(lengths), sh)
    q = jax.device_put(jnp.asarray(quals), sh)
    ow, ocnt, hist = pmesh.sharded_count_kmers_step(b, l, q, k, mesh)

    d, hist_ref = ke.count_kmers(
        bases, lengths, quals, k, min_freq=1, pad_quantum=1024
    )
    # global unique kmer count matches
    assert int(np.asarray(hist).sum()) == d.size
    # histogram matches exactly
    np.testing.assert_array_equal(np.asarray(hist)[1:101], hist_ref[1:101])


def test_graft_entry_single_and_multi():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn).lower(*args).compile()
    res = out(*args)
    assert int(res[2]) > 0
    ge.dryrun_multichip(8)
