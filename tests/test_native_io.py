"""Native C++ fastq loader vs the Python parser (core/native_io.py,
native/fastq_loader.cc)."""

import gzip

import numpy as np
import pytest

from w2rap_contigger_tpu.core import native_io
from w2rap_contigger_tpu.core.io_fastq import extract_reads, load_fastq, to_readset

FASTQ = (b"@r1\nACGTN\n+\nIIIII\n"
         b"@r2\nGGCATT\n+\n!#%&()\n"
         b"@r3\nTT\n+\nAB\n")


@pytest.fixture(scope="module")
def lib_ok():
    if not native_io.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_matches_python(tmp_path, lib_ok):
    p = str(tmp_path / "x.fastq")
    with open(p, "wb") as fh:
        fh.write(FASTQ)
    rs_native = native_io.load_fastq_readset(p)
    rs_py = to_readset(*load_fastq(p))
    np.testing.assert_array_equal(rs_native.lengths, rs_py.lengths)
    np.testing.assert_array_equal(rs_native.bases, rs_py.bases)
    np.testing.assert_array_equal(rs_native.quals, rs_py.quals)
    assert rs_native.n_reads == 3
    # N maps to A (code 0)
    assert rs_native.bases[0, 4] == 0


def test_native_gzip(tmp_path, lib_ok):
    p = str(tmp_path / "x.fastq.gz")
    with gzip.open(p, "wb") as fh:
        fh.write(FASTQ)
    rs = native_io.load_fastq_readset(p)
    assert rs.n_reads == 3
    np.testing.assert_array_equal(rs.bases[2, :2], [3, 3])


def test_native_gzip_multimember(tmp_path, lib_ok):
    # concatenated gzip members must decompress fully
    p = str(tmp_path / "m.fastq.gz")
    with open(p, "wb") as fh:
        fh.write(gzip.compress(FASTQ[:17]) + gzip.compress(FASTQ[17:]))
    rs = native_io.load_fastq_readset(p)
    assert rs.n_reads == 3


def test_extract_reads_native_paired(tmp_path, lib_ok, monkeypatch):
    r1 = str(tmp_path / "r1.fastq")
    r2 = str(tmp_path / "r2.fastq")
    with open(r1, "w") as fh:
        fh.write("@a\nACGT\n+\nIIII\n@b\nGGGG\n+\nIIII\n")
    with open(r2, "w") as fh:
        fh.write("@a\nTTTT\n+\nIIII\n@b\nCCCC\n+\nIIII\n")
    rs_nat = extract_reads(f"{r1},{r2}")
    monkeypatch.setenv("W2RAP_NATIVE", "0")
    rs_py = extract_reads(f"{r1},{r2}")
    np.testing.assert_array_equal(rs_nat.bases, rs_py.bases)
    np.testing.assert_array_equal(rs_nat.quals, rs_py.quals)
    np.testing.assert_array_equal(rs_nat.lengths, rs_py.lengths)
