"""PackAlign/Align value-class tests (reference src/PackAlign.h)."""

import numpy as np

from w2rap_contigger_tpu.ops import packalign as pa


def test_reference_example_roundtrip():
    """The PackAlign.h:24-35 worked example: pos1=0, pos2=3,
    blocks (5, -2:1, 1:2, 1:5)."""
    a = pa.Align(0, 3, [0, -2, 1, 1], [5, 1, 2, 5])
    w = pa.pack(a)
    assert w.shape[0] == 4  # type-0 record (16 bytes)
    b = pa.unpack(w)
    assert (b.pos1, b.pos2, b.gaps, b.lengths) == (0, 3, a.gaps, a.lengths)
    # extents follow the gap convention (gap<0 consumes seq1, >0 seq2)
    assert a.extent1() == 0 + 5 + 2 + 1 + 2 + 5
    assert a.extent2() == 3 + 5 + 1 + 1 + 2 + 1 + 5


def test_general_tier_roundtrip():
    a = pa.Align(5000, 12, [0, -40, 7], [2000, 17, 900])
    w = pa.pack(a)
    assert int(w[0]) >> 28 == 2
    b = pa.unpack(w)
    assert (b.pos1, b.pos2, b.gaps, b.lengths) == (5000, 12, a.gaps, a.lengths)


def test_flip_and_errors():
    rng = np.random.default_rng(0)
    s2 = rng.integers(0, 4, size=50).astype(np.uint8)
    # s1 = s2[3:20] with one mismatch and a 2-base deletion
    s1 = np.concatenate([s2[3:10], s2[12:23]]).astype(np.uint8)
    s1[2] = (s1[2] + 1) % 4
    a = pa.Align(0, 3, [0, 2], [7, 11])
    assert a.errors(s1, s2) == 1 + 2
    f = a.flip()
    assert f.gaps == [0, -2]
    assert f.errors(s2, s1) == 1 + 2
    assert a.extent1() == 18
    assert a.extent2() == 23


def test_from_ops():
    #    s1: ACG--TTA
    #    s2: ACGGG--A   -> M M M D D I I M
    a = pa.Align.from_ops(0, 0, "MMMDDIIM")
    assert a.lengths == [3, 0, 1]
    assert a.gaps == [0, 2, -2]
    assert a.extent1() == 3 + 2 + 1
    assert a.extent2() == 3 + 2 + 1
