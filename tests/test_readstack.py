"""readstack reduction tests vs literal reference logic."""

import numpy as np

from w2rap_contigger_tpu.ops import readstack as rs


def brute_consensus1(bases, quals):
    rows, cols = bases.shape
    con = np.zeros(cols, dtype=np.uint8)
    conq = np.zeros(cols, dtype=np.int16)
    for c in range(cols):
        vals = [0.0] * 4
        for r in range(rows):
            q = float(quals[r, c])
            if q <= 2:
                q = min(q, 0.2)
            if q == 0:
                q = 0.1
            if quals[r, c] >= 0:
                vals[bases[r, c]] += q
        order = sorted(range(4), key=lambda b: -vals[b])
        con[c] = order[0]
        conq[c] = min(50, round(vals[order[0]] - vals[order[1]]))
        if vals[order[1]] > 100:
            bad = sum(
                1
                for r in range(rows)
                if quals[r, c] >= 30 and bases[r, c] == order[1]
            )
            if bad >= 2:
                conq[c] = 0
    return con, conq


def test_consensus1_parity(rng):
    rows, cols = 30, 50
    bases = rng.integers(0, 4, size=(rows, cols)).astype(np.int8)
    quals = rng.integers(0, 41, size=(rows, cols)).astype(np.int16)
    # some undefined cells
    undef = rng.random((rows, cols)) < 0.2
    bases[undef] = -1
    quals[undef] = -1
    # make a strong consensus on some columns
    bases[: rows // 2, :10] = 2
    quals[: rows // 2, :10] = 35
    con, conq = rs.consensus1(bases, quals)
    bcon, bconq = brute_consensus1(bases, quals)
    # winners must match wherever the margin is nonzero (ties may order
    # differently between stable argsorts)
    margin = bconq > 0
    np.testing.assert_array_equal(con[margin], bcon[margin])
    np.testing.assert_array_equal(conq, bconq)


def test_high_qual_diff(rng):
    bases, quals = rs.make_stack(5, 20)
    founder = rng.integers(0, 4, size=20).astype(np.int8)
    for r in range(5):
        rs.add_read(bases, quals, r, 0, founder.copy(), np.full(20, 30))
    # row 3 disagrees at high quality
    bases[3, 7] = (bases[3, 7] + 1) % 4
    # row 4 disagrees at LOW quality
    bases[4, 9] = (bases[4, 9] + 1) % 4
    quals[4, 9] = 5
    sus = rs.high_qual_diff(bases, quals, n=25, top=1)
    assert bool(sus[3]) and not bool(sus[4]) and not bool(sus[0])


def test_clean_columns(rng):
    bases, quals = rs.make_stack(12, 30)
    founder = rng.integers(0, 4, size=30).astype(np.int8)
    for r in range(12):
        rs.add_read(bases, quals, r, 0, founder.copy(), np.full(30, 30))
    # create a genuine mixed column: 6 reads carry an alt base
    alt = (founder[5] + 1) % 4
    for r in range(6, 12):
        bases[r, 5] = alt
    sus = rs.clean_columns(bases, quals, top=1)
    assert sus[6:].all() and not sus[0]
