"""EMEC3 EM error-correction tests (ops/emec3.py vs the semantics of
src/paths/long/EMEC3.cc)."""

import numpy as np

from w2rap_contigger_tpu.ops import emec3


def _stack(rng, L=60, n_friends=12, n_noise=0, err_pos=(), founder_err=()):
    truth = rng.integers(0, 4, L).astype(np.int8)
    rows = [truth.copy()]
    for p in founder_err:
        rows[0][p] = (rows[0][p] + 1) % 4
    for _ in range(n_friends):
        r = truth.copy()
        for p in err_pos:
            if rng.random() < 0.1:
                r[p] = (r[p] + 1) % 4
        rows.append(r)
    for _ in range(n_noise):
        rows.append(rng.integers(0, 4, L).astype(np.int8))
    calls = np.stack(rows)
    quals = np.full(calls.shape, 30, dtype=np.uint8)
    return truth, calls, quals


def test_too_few_friends_returns_founder():
    rng = np.random.default_rng(0)
    truth, calls, quals = _stack(rng, n_friends=2)
    t, q, pf = emec3.run_emec3(calls, quals)
    np.testing.assert_array_equal(t, calls[0])
    np.testing.assert_array_equal(q, quals[0])


def test_corrects_founder_errors():
    rng = np.random.default_rng(1)
    truth, calls, quals = _stack(rng, n_friends=15, founder_err=(5, 30))
    t, q, pf = emec3.run_emec3(calls, quals)
    np.testing.assert_array_equal(t, truth)
    # edited positions get quality zero (hack: EMEC3.cc:787-790)
    assert q[5] == 0 and q[30] == 0
    assert q[0] == 30
    assert (pf[1:] > 0.5).all()


def test_noise_rows_get_low_friendship():
    rng = np.random.default_rng(2)
    truth, calls, quals = _stack(rng, n_friends=10, n_noise=5,
                                 founder_err=(7,))
    t, q, pf = emec3.run_emec3(calls, quals)
    np.testing.assert_array_equal(t, truth)
    assert (pf[1:11] > 0.5).all()
    assert (pf[11:] < 0.5).all()


def test_empty_columns_ignored():
    rng = np.random.default_rng(3)
    truth, calls, quals = _stack(rng, n_friends=12, founder_err=(10,))
    calls[1:, :5] = -1  # friends don't cover the left edge
    t, q, pf = emec3.run_emec3(calls, quals)
    # uncovered positions keep the founder call
    np.testing.assert_array_equal(t[:5], calls[0, :5])
    assert t[10] == truth[10]


def test_ambiguous_column_keeps_founder():
    # a 50/50 split column must not be rewritten (needs >0.70 / <0.10)
    rng = np.random.default_rng(4)
    truth, calls, quals = _stack(rng, n_friends=12)
    half = calls[1:].shape[0] // 2
    alt = (truth[20] + 1) % 4
    calls[1:1 + half, 20] = alt
    t, q, pf = emec3.run_emec3(calls, quals)
    assert t[20] == calls[0, 20]


def test_prior():
    read = np.array([0, 1, 2, 3], dtype=np.int8)
    quals = np.array([30, 0, 1, 2], dtype=np.uint8)
    pr = emec3.init_prior(read, quals)
    assert abs(pr[0, 0] - (1 - 1e-3)) < 1e-9
    assert abs(pr[1, 1] - (1 - 1e-3)) < 1e-9  # q0 -> treated as 30
    assert abs(pr[2, 2] - (1 - 0.66)) < 1e-9  # q1 -> perror 0.66
    assert abs(pr[3, 0] - 0.66 / 3) < 1e-9
    np.testing.assert_allclose(pr.sum(axis=1), 1.0)
