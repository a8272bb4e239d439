"""Pre-correction parity vs a literal python KernelPreCorrector."""

import numpy as np

from w2rap_contigger_tpu.core import dna
from w2rap_contigger_tpu.core.reads import ReadSet
from w2rap_contigger_tpu.ops import precorrect as pc


def brute_precorrect(bases, lengths, quals):
    """Literal center-column voting (KernelPreCorrector.h:350-440)."""
    K, C = pc.PC_K, pc.CENTER
    groups = {}
    n, L = bases.shape
    for r in range(n):
        for p in range(int(lengths[r]) - K + 1):
            win = bases[r, p : p + K]
            flank = np.concatenate([win[:C], win[C + 1 :]])
            canon, was_rc = dna.canonical_codes(flank)
            if np.array_equal(canon, dna.revcomp_codes(canon)):
                continue  # flank palindrome
            cb = int(win[C])
            if was_rc:
                cb = 3 - cb
            q = int(quals[r, p + C])
            groups.setdefault(canon.tobytes(), []).append((r, p, cb, q, was_rc))
    fixes = {}
    for rows in groups.values():
        if len(rows) < pc.N_KMERS_MIN:
            continue
        q_sum = [0] * 4
        n_qh = [0] * 4
        for _, _, cb, q, _ in rows:
            q_sum[cb] += q
            if q >= pc.Q_HIGH:
                n_qh[cb] += 1
        winner = 0
        for b in (1, 2, 3):
            if q_sum[b] > q_sum[winner]:
                winner = b
        if q_sum[winner] < pc.Q_SUM_MIN_TO_WIN:
            continue
        lose_max = q_sum[winner] * pc.RATIO_LOSER
        for r, p, cb, q, was_rc in rows:
            if (
                cb != winner
                and n_qh[cb] <= pc.N_Q_HIGH_MAX_TO_LOSE
                and q_sum[cb] < lose_max
            ):
                nb = 3 - winner if was_rc else winner
                fixes[(r, p + C)] = nb
    return fixes


def test_precorrect_parity(rng):
    genome = rng.integers(0, 4, size=900).astype(np.uint8)
    rlen = 60
    seqs, quals = [], []
    for s in range(0, 900 - rlen, 2):
        r = genome[s : s + rlen].copy()
        q = np.full(rlen, 35, np.uint8)
        m = rng.random(rlen) < 0.02
        r[m] = (r[m] + rng.integers(1, 4, size=int(m.sum()))) % 4
        q[m] = 4  # errors get low qual
        if rng.random() < 0.5:
            r = dna.revcomp_codes(r)
            q = q[::-1].copy()
        seqs.append(r)
        quals.append(q)
    reads = ReadSet.from_sequences(seqs, quals)
    new_bases, n_fixed = pc.pre_correct(reads)

    expect = brute_precorrect(reads.bases, reads.lengths, reads.quals)
    got = {}
    diff = np.argwhere(new_bases != reads.bases)
    for r, p in diff:
        got[(int(r), int(p))] = int(new_bases[r, p])
    assert got == expect, (
        f"{len(got)} fixes vs {len(expect)} expected; "
        f"extra={set(got) - set(expect)} missing={set(expect) - set(got)}"
    )
    assert n_fixed == len(expect)
    # corrections restore genome bases for fwd reads
    assert n_fixed > 0, "test should exercise at least one fix"
