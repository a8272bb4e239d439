"""PairsManager / ReadNameLookup / KmerSpectrum tests."""

import numpy as np
import pytest

from w2rap_contigger_tpu.core.pairs import PairsManager, ReadNameLookup
from w2rap_contigger_tpu.ops.spectra import KmerSpectrum


def test_pairs_manager():
    pm = PairsManager(10)
    lib = pm.add_library(sep=300, sd=40, name="pe300", pair_range=(0, 5))
    assert pm.n_pairs == 5
    assert pm.sep(2) == 300 and pm.sd(2) == 40
    assert pm.id1(3) == 6 and pm.id2(3) == 7
    assert pm.pair_id(7) == 3 and pm.partner(6) == 7 and pm.partner(7) == 6
    pm.estimate_library_stats([280, 300, 320], lib)
    assert pm.sep(0) == 300
    assert pm.sd(0) == int(round(np.std([280, 300, 320])))
    assert pm.libraries[0].name == "pe300"


def test_read_name_lookup():
    rl = ReadNameLookup.from_names(["a", "b", "c"])
    assert rl.get("b") == 1
    assert "c" in rl and "z" not in rl
    with pytest.raises(KeyError):
        rl.get("z")
    with pytest.raises(ValueError):
        rl.add("a", 5)
    # pair-suffix resolution through the base name
    rl2 = ReadNameLookup()
    rl2.add("p", 4)
    assert rl2.get("p.1") == 4 and rl2.get("p.2") == 5


def test_kmer_spectrum_merge_and_analyze():
    rng = np.random.default_rng(0)
    # error spike at f=1..2 + coverage peak around f=30
    counts = np.zeros(101, dtype=np.int64)
    counts[1] = 100000
    counts[2] = 20000
    f = np.arange(101)
    counts += np.round(5000 * np.exp(-0.5 * ((f - 30) / 5.0) ** 2)).astype(
        np.int64)
    ks = KmerSpectrum(60, counts)
    ks.analyze()
    assert 2 <= ks.kf_min1 <= 10
    assert abs(ks.kf_max1 - 30) <= 1
    # genome size ~ total signal kmers / 30
    sig = (f >= ks.kf_min1)
    expect = int(round((f[sig] * counts[sig]).sum() / ks.kf_max1))
    assert ks.genome_size == expect
    assert ks.genome_size_unique + ks.genome_size_repetitive == ks.genome_size

    ks2 = KmerSpectrum(60)
    ks2.increment(1, 7)
    ks2.increment(200, 3)
    tot = ks + ks2
    assert tot.counts[1] == counts[1] + 7
    assert tot.counts[200] == 3
    assert tot.sum() == ks.sum() + 10


def test_spectrum_from_kmer_counts():
    ks = KmerSpectrum.from_kmer_counts(31, [1, 1, 2, 5, 5, 5, 0])
    assert ks.counts[1] == 2 and ks.counts[2] == 1 and ks.counts[5] == 3
    assert ks.sum() == 6
