"""Compare two assemblies as canonical contig sequence sets.

The BASELINE.json north star is sequence-set equality of a.lines.fasta
against the reference.  Usage:
    python scripts/compare_contigs.py ours.fasta theirs.fasta [--min-len N]
Prints per-set stats, the overlap (exact canonical matches), and
containment (contigs that are substrings of the other assembly).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from w2rap_contigger_tpu.core import dna  # noqa: E402


def read_fasta(path):
    seqs = []
    cur = []
    with open(path) as f:
        for line in f:
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                    cur = []
            else:
                cur.append(line.strip().upper())
    if cur:
        seqs.append("".join(cur))
    return seqs


def canon(s):
    rc = s[::-1].translate(str.maketrans("ACGTN", "TGCAN"))
    return min(s, rc)


def n50(lens):
    ls = sorted(lens, reverse=True)
    total = sum(ls)
    c = 0
    for l in ls:
        c += l
        if 2 * c >= total:
            return l
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("theirs")
    ap.add_argument("--min-len", type=int, default=1000)
    args = ap.parse_args()

    a = [s for s in read_fasta(args.ours) if len(s) >= args.min_len]
    b = [s for s in read_fasta(args.theirs) if len(s) >= args.min_len]
    ca = {canon(s) for s in a}
    cb = {canon(s) for s in b}
    print(f"ours:   {len(a)} contigs >= {args.min_len}bp, "
          f"{sum(len(s) for s in a)} bp, N50 {n50([len(s) for s in a])}")
    print(f"theirs: {len(b)} contigs >= {args.min_len}bp, "
          f"{sum(len(s) for s in b)} bp, N50 {n50([len(s) for s in b])}")
    inter = ca & cb
    print(f"exact canonical matches: {len(inter)} "
          f"({sum(len(s) for s in inter)} bp)")
    only_a = ca - cb
    only_b = cb - ca
    # containment: our unmatched contigs contained in one of theirs
    big_b = "|".join(cb)
    contained = sum(1 for s in only_a if s in big_b or canon(s) in big_b)
    print(f"ours-only: {len(only_a)} (of which {contained} contained in theirs)")
    big_a = "|".join(ca)
    contained_b = sum(1 for s in only_b if s in big_a or canon(s) in big_a)
    print(f"theirs-only: {len(only_b)} (of which {contained_b} contained in ours)")
    if ca == cb:
        print("VERDICT: BIT-IDENTICAL CONTIG SETS")
    else:
        jac = len(inter) / max(1, len(ca | cb))
        print(f"VERDICT: jaccard {jac:.3f}")


if __name__ == "__main__":
    main()
