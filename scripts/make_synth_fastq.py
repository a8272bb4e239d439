"""Generate a synthetic genome + PE reads as paired fastq files.

Used for benchmarking and for parity runs against the reference binary.
Usage: python scripts/make_synth_fastq.py OUT_DIR [--glen 4600000]
       [--pairs 1000000] [--rlen 250] [--insert 500] [--err 0.003] [--seed 42]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from w2rap_contigger_tpu.core import dna  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--glen", type=int, default=4_600_000)
    ap.add_argument("--pairs", type=int, default=1_000_000)
    ap.add_argument("--rlen", type=int, default=250)
    ap.add_argument("--insert", type=int, default=500)
    ap.add_argument("--err", type=float, default=0.003)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--repeats", type=int, default=0,
                    help="plant N copies of a shared repeat unit")
    ap.add_argument("--repeat_len", type=int, default=3000)
    ap.add_argument("--dips", type=int, default=0,
                    help="N coverage-dip windows (reads there dropped "
                         "with 85%% probability -> unsatisfied pairs)")
    ap.add_argument("--dip_len", type=int, default=400)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    genome = rng.integers(0, 4, size=args.glen).astype(np.uint8)
    if args.repeats > 1:
        # identical repeat copies at spread-out loci: the large-K graph
        # collapses them into shared edges, exercising Unsat clustering,
        # gap assembly and PathFinder untangling
        unit = rng.integers(0, 4, size=args.repeat_len).astype(np.uint8)
        spacing = args.glen // (args.repeats + 1)
        for i in range(args.repeats):
            at = spacing * (i + 1)
            genome[at : at + args.repeat_len] = unit[: max(0, min(
                args.repeat_len, args.glen - at))]
    dip_windows = []
    if args.dips > 0:
        spacing = args.glen // (args.dips + 1)
        for i in range(args.dips):
            at = spacing * (i + 1) + spacing // 3
            dip_windows.append((at, at + args.dip_len))
    with open(f"{args.out_dir}/genome.fasta", "w") as f:
        f.write(">genome\n")
        s = dna.codes_to_seq(genome)
        for i in range(0, len(s), 80):
            f.write(s[i : i + 80] + "\n")

    qchars = np.frombuffer(bytes(range(33 + 2, 33 + 41)), dtype=np.uint8)
    f1 = open(f"{args.out_dir}/reads_R1.fastq", "w")
    f2 = open(f"{args.out_dir}/reads_R2.fastq", "w")
    B = 10000
    for b0 in range(0, args.pairs, B):
        nb = min(B, args.pairs - b0)
        starts = rng.integers(0, args.glen - args.insert, size=nb)
        if dip_windows:
            mid = starts + args.insert // 2
            in_dip = np.zeros(nb, dtype=bool)
            for lo, hi in dip_windows:
                in_dip |= (mid >= lo) & (mid < hi)
            drop = in_dip & (rng.random(nb) < 0.85)
            # resample dropped fragments away from the dips
            while drop.any():
                starts[drop] = rng.integers(
                    0, args.glen - args.insert, size=int(drop.sum())
                )
                mid = starts + args.insert // 2
                in_dip = np.zeros(nb, dtype=bool)
                for lo, hi in dip_windows:
                    in_dip |= (mid >= lo) & (mid < hi)
                drop = drop & in_dip
        idx = starts[:, None] + np.arange(args.insert)[None, :]
        frags = genome[idx]
        r1 = frags[:, : args.rlen].copy()
        r2 = frags[:, -args.rlen :][:, ::-1]
        r2 = (3 - r2).astype(np.uint8)
        for r, fh, tag in ((r1, f1, "/1"), (r2, f2, "/2")):
            err = rng.random(r.shape) < args.err
            r[err] = (r[err] + rng.integers(1, 4, size=int(err.sum()))) % 4
            quals = rng.integers(30, 41, size=r.shape).astype(np.uint8)
            low = rng.random(r.shape) < 0.02
            quals[low] = 2
            for i in range(nb):
                fh.write(
                    f"@read_{b0+i}{tag}\n{dna.codes_to_seq(r[i])}\n+\n"
                    + (quals[i] + 33).astype(np.uint8).tobytes().decode()
                    + "\n"
                )
    f1.close()
    f2.close()
    print(f"wrote {args.pairs} pairs to {args.out_dir}")


if __name__ == "__main__":
    main()
