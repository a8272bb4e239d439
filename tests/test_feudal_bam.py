"""IO-parity tests: feudal .fastb/.qualb/.qualp roundtrips and the
BGZF/BAM reader (formats per src/feudal/FeudalControlBlock.h,
src/feudal/PQVec.cc, src/bam/ReadBAM.cc)."""

import struct
import zlib

import numpy as np
import pytest

from w2rap_contigger_tpu.core import feudal
from w2rap_contigger_tpu.core import io_bam
from w2rap_contigger_tpu.core.io_fastq import load_bam_readset


def _rand_reads(rng, n=23, lmin=0, lmax=311):
    return [rng.integers(0, 4, size=rng.integers(lmin, lmax + 1)).astype(np.uint8)
            for _ in range(n)]


def test_fastb_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    reads = _rand_reads(rng)
    p = str(tmp_path / "x.fastb")
    feudal.write_fastb(p, reads)
    back = feudal.read_fastb(p)
    assert len(back) == len(reads)
    for a, b in zip(reads, back):
        np.testing.assert_array_equal(a, b)


def test_qualb_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    quals = [rng.integers(0, 64, size=rng.integers(0, 260)).astype(np.uint8)
             for _ in range(17)]
    p = str(tmp_path / "x.qualb")
    feudal.write_qualb(p, quals)
    back = feudal.read_qualb(p)
    for a, b in zip(quals, back):
        np.testing.assert_array_equal(a, b)


def test_pqvec_roundtrip_exhaustive():
    rng = np.random.default_rng(3)
    cases = [
        np.array([], dtype=np.uint8),
        np.array([0], dtype=np.uint8),
        np.array([63] * 300, dtype=np.uint8),
        np.arange(64, dtype=np.uint8),
    ]
    for _ in range(30):
        n = int(rng.integers(1, 600))
        # runs of near-constant quality (the realistic case PQVec targets)
        base = rng.integers(2, 41)
        q = np.clip(base + rng.integers(-2, 3, size=n), 0, 63).astype(np.uint8)
        cases.append(q)
        cases.append(rng.integers(0, 64, size=n).astype(np.uint8))
    for q in cases:
        buf = feudal.pqvec_encode(q)
        np.testing.assert_array_equal(feudal.pqvec_decode(buf), q)


def test_pqvec_compresses_constant_runs():
    q = np.full(250, 37, dtype=np.uint8)
    buf = feudal.pqvec_encode(q)
    assert len(buf) == 4  # one zero-bit block (3 bytes) + terminator


def test_qualp_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    quals = [np.clip(35 + rng.integers(-5, 6, size=rng.integers(0, 260)),
                     0, 63).astype(np.uint8) for _ in range(19)]
    p = str(tmp_path / "x.qualp")
    feudal.write_qualp(p, quals)
    back = feudal.read_qualp(p)
    for a, b in zip(quals, back):
        np.testing.assert_array_equal(a, b)


# ------------------------------------------------------------------ BAM

def _bgzf_block(payload: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = co.compress(payload) + co.flush()
    bsize = len(cdata) + 26
    hdr = (b"\x1f\x8b\x08\x04" + b"\x00" * 6
           + struct.pack("<H", 6) + b"BC" + struct.pack("<HH", 2, bsize - 1))
    ftr = struct.pack("<II", zlib.crc32(payload), len(payload) & 0xFFFFFFFF)
    return hdr + cdata + ftr


_SEQ_SYMS = "=ACMGRSVTWYHKDBN"


def _bam_record(name: str, seq: str, quals, flags: int) -> bytes:
    nm = name.encode() + b"\x00"
    nib = [_SEQ_SYMS.index(c) for c in seq]
    if len(nib) % 2:
        nib.append(0)
    packed = bytes((nib[i] << 4) | nib[i + 1] for i in range(0, len(nib), 2))
    body = struct.pack("<iiBBHHHiiii", -1, -1, len(nm), 0, 0, 0, flags,
                       len(seq), -1, -1, 0)
    body += nm + packed + bytes(quals)
    return struct.pack("<i", len(body)) + body


def _bam_bytes(records) -> bytes:
    hdr = b"BAM\x01" + struct.pack("<i", 0) + struct.pack("<i", 0)
    return _bgzf_block(hdr + b"".join(records))


def test_bam_reader(tmp_path):
    recs = [
        _bam_record("p1", "ACGT", [30, 31, 32, 33], io_bam.FLAG_FIRST_SEGMENT),
        _bam_record("p1", "GGTCA", [20, 21, 22, 23, 24],
                    io_bam.FLAG_LAST_SEGMENT | io_bam.FLAG_REVERSED),
        _bam_record("p1", "AAAA", [9, 9, 9, 9],
                    io_bam.FLAG_FIRST_SEGMENT | 0x100),  # secondary: skipped
    ]
    p = str(tmp_path / "x.bam")
    with open(p, "wb") as fh:
        fh.write(_bam_bytes(recs))
    out = io_bam.read_bam(p)
    assert [n for n, _, _ in out] == ["p1.1", "p1.2"]
    np.testing.assert_array_equal(out[0][1], [0, 1, 2, 3])  # ACGT
    # reversed record comes back reverse-complemented: GGTCA -> TGACC
    np.testing.assert_array_equal(out[1][1], [3, 2, 0, 1, 1])
    np.testing.assert_array_equal(out[1][2], [24, 23, 22, 21, 20])

    rs = load_bam_readset(p)
    assert rs.n_reads == 2
    np.testing.assert_array_equal(rs.bases[0, :4], [0, 1, 2, 3])


def test_bam_ambiguity_and_n():
    # N nibble (15) maps to A (code 0), not an error
    rec = _bam_record("s", "ANCG", [1, 2, 3, 4], io_bam.FLAG_FIRST_SEGMENT)
    import tempfile, os
    with tempfile.NamedTemporaryFile(suffix=".bam", delete=False) as fh:
        fh.write(_bam_bytes([rec]))
        p = fh.name
    try:
        out = io_bam.read_bam(p)
        np.testing.assert_array_equal(out[0][1], [0, 0, 1, 2])
    finally:
        os.unlink(p)


def test_extract_reads_fastb_roundtrip(tmp_path):
    from w2rap_contigger_tpu.core.io_fastq import extract_reads

    rng = np.random.default_rng(7)
    reads = [rng.integers(0, 4, size=100).astype(np.uint8) for _ in range(8)]
    quals = [np.clip(33 + rng.integers(-3, 4, size=100), 0, 63).astype(np.uint8)
             for _ in range(8)]
    feudal.write_fastb(str(tmp_path / "r.fastb"), reads)
    feudal.write_qualp(str(tmp_path / "r.qualp"), quals)
    rs = extract_reads(str(tmp_path / "r.fastb"))
    assert rs.n_reads == 8
    for i in range(8):
        np.testing.assert_array_equal(rs.bases[i], reads[i])
        np.testing.assert_array_equal(rs.quals[i], quals[i])
