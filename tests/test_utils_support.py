"""Support-library tests: PeakFinder / CN1PeakFinder, IntDistribution,
PerfStat / TextTable / Logger, efasta."""

import io

import numpy as np

from w2rap_contigger_tpu.core import efasta
from w2rap_contigger_tpu.utils.peaks import CN1PeakFinder, PeakFinder
from w2rap_contigger_tpu.utils.reporting import (IntDistribution, Logger,
                                                 PerfStatLogger, TextTable)


def _gauss_hist(centers_heights, n=2000, sigma=40.0):
    # the 5% x-window needs >= min_shoulder points per side, so realistic
    # coverage scales (hundreds) are required for peaks to qualify
    x = np.arange(1, n + 1, dtype=np.float64)
    y = np.zeros(n)
    for c, h in centers_heights:
        y += h * np.exp(-0.5 * ((x - c) / sigma) ** 2)
    return x, np.round(y).astype(np.int64)


def test_peakfinder_single_peak():
    x, y = _gauss_hist([(500, 10000)])
    peaks = PeakFinder().find_peaks(x, y)
    assert len(peaks) == 1 and abs(peaks[0] - 499) <= 1


def test_peakfinder_rejects_shallow_troughs():
    x = np.arange(1, 201, dtype=np.float64)
    y = np.full(200, 1000, dtype=np.int64)
    y[49] += 10  # tiny bump on a plateau: trough ratio too shallow
    assert PeakFinder().find_peaks(x, y) == []


def test_cn1_single_peak():
    x, y = _gauss_hist([(500, 10000)])
    f = CN1PeakFinder()
    cov = f.find_peak(x, y)
    assert abs(cov - 500) <= 2
    assert f.cn_values == [1] and not f.diploid


def test_cn1_haploid_with_cn2():
    # CN1 at 400, CN2 at 800 (weaker): should pick 400 as CN1
    x, y = _gauss_hist([(400, 10000), (800, 3000)])
    f = CN1PeakFinder()
    cov = f.find_peak(x, y)
    assert abs(cov - 400) <= 2
    assert 2 in f.cn_values


def test_cn1_diploid_half_peak():
    # diploid: half-coverage peak at 300 much smaller than main peak at
    # 600 -> reference marks diploid and reports cn1 = cov(main)/2
    # (CN1PeakFinder.cc:98-104,124-128)
    x, y = _gauss_hist([(300, 2000), (600, 40000)])
    f = CN1PeakFinder()
    cov = f.find_peak(x, y)
    assert f.diploid
    assert abs(cov - 300) <= 2


def test_int_distribution():
    d = IntDistribution.from_samples([400, 500, 500, 600])
    assert d.x_min == 400 and d.x_max == 600
    assert abs(d.mean() - 500) < 1e-9
    assert d.median() == 500
    assert abs(d.prob_in(450, 550) - 0.5) < 1e-9
    assert d.prob_le(399) == 0.0 and d.prob_le(600) == 1.0
    assert d.quantile(0.99) == 600


def test_perfstat_and_table_and_logger():
    buf = io.StringIO()
    ps = PerfStatLogger(stream=buf)
    ps.log("contig_N50", 59775, "N50 of contig lines")
    assert "PERFSTAT: contig_N50 = 59775" in buf.getvalue()
    assert ps.rows[0][0] == "contig_N50"

    t = TextTable()
    t.add_row("step", "wall", "cpu")
    t.add_row("2", "10.5", "80.1")
    out = t.render()
    assert out.splitlines()[0].startswith("step")
    assert "10.5" in out

    lg = Logger("err")
    lg.log("bad read")
    lg.log("bad read")
    lg.log("other")
    assert lg.count("bad read") == 2
    buf2 = io.StringIO()
    lg.dump(buf2)
    assert "(2x) bad read" in buf2.getvalue()


def test_efasta_parse_expand():
    s = "AC{G,T}A{,C}G"
    amb, snps, indels = efasta.amb_count(s)
    assert (amb, snps, indels) == (2, 1, 1)
    exp = efasta.expand_to(s)
    assert sorted(exp) == sorted(["ACGAG", "ACGACG", "ACTAG", "ACTACG"])
    assert efasta.expand_to(s, max_count=3) is None
    assert efasta.flatten_to(s) == "ACGAG"
    np.testing.assert_array_equal(efasta.to_codes("ACGT"), [0, 1, 2, 3])
    assert len(efasta.expand_to_codes(s)) == 4


def test_sysinfo_memory_and_timelog(monkeypatch):
    from w2rap_contigger_tpu.utils import sysinfo

    assert sysinfo.mem_usage_bytes() > 0
    assert sysinfo.peak_mem_usage_bytes() >= sysinfo.mem_usage_bytes() // 2
    assert float(sysinfo.peak_mem_usage_gb_string()) > 0
    sysinfo.set_max_memory(123 << 30)
    assert sysinfo.get_max_memory() == 123 << 30

    monkeypatch.setenv("W2RAP_TIMELOG", "1")
    sysinfo.timelog_reset()
    with sysinfo.timelog("phase_a"):
        pass
    with sysinfo.timelog("phase_a"):
        pass
    rep = sysinfo.timelog_report()
    assert "phase_a" in rep and "2 calls" in rep


def test_rngen_reference_sequence():
    """Bit-exact vs the reference's lagged-Fibonacci RNGen (RNGen.h:28;
    verified against a direct C++ transcription of the algorithm)."""
    from w2rap_contigger_tpu.utils import random as wr

    g = wr.RNGen(1)
    assert [g.next() for _ in range(5)] == [
        2078917053, 143302914, 1027100827, 1953210302, 755253631,
    ]


def test_normal_distribution_functions():
    import math

    from w2rap_contigger_tpu.utils import random as wr

    assert abs(wr.standard_normal_distribution_integral(0.0) - 0.5) < 1e-6
    assert wr.standard_normal_distribution_integral(6.0) == 1.0
    assert wr.standard_normal_distribution_integral(-6.0) == 0.0
    # CDF consistent with density (finite difference)
    a = 0.7
    eps = 1e-3
    d = (
        wr.standard_normal_distribution_integral(a + eps)
        - wr.standard_normal_distribution_integral(a - eps)
    ) / (2 * eps)
    assert abs(d - wr.normal_density(a, 0.0, 1.0)) < 1e-3
    assert abs(wr.partial_bernoulli_sum(10, 10) - 2**10) < 1e-6
    assert wr.partial_bernoulli_sum(5, 2) == 1 + 5 + 10
    ok, x = wr.normal_deviate(0.9, 0.6)
    assert ok and abs(x) < 1.0
