"""CLI — mirrors the reference's TCLAP interface
(src/modules/w2rap-contigger.cc:71-152).

Usage:
  python -m w2rap_contigger_tpu -r r1.fastq,r2.fastq -o out_dir [-p prefix]
      [-K 200] [--from_step 1] [--to_step 7] [--min_freq 4] [--min_qual 7]
      [-s min_size] [--dump_all] [--dump_perf]
"""

from __future__ import annotations

import argparse

ALLOWED_K = [
    60, 64, 72, 80, 84, 88, 96, 100, 108, 116, 128, 136, 144, 152, 160,
    168, 172, 180, 188, 192, 196, 200, 208, 216, 224, 232, 240, 260,
]  # reference allowed_k (w2rap-contigger.cc:60-62); 208 excluded below


def main(argv=None):
    ap = argparse.ArgumentParser(prog="w2rap-contigger-tpu")
    ap.add_argument("-r", "--read_files", help="r1.fastq,r2.fastq (.gz ok)")
    ap.add_argument("-o", "--out_dir", required=True)
    ap.add_argument("-p", "--prefix", default="pe")
    ap.add_argument("-K", "--large_k", type=int, default=200)
    ap.add_argument("--from_step", type=int, default=1)
    ap.add_argument("--to_step", type=int, default=7)
    ap.add_argument("--min_freq", type=int, default=4)
    ap.add_argument("--min_qual", type=int, default=7)
    ap.add_argument("-s", "--min_size", type=int, default=0)
    ap.add_argument("--path_finder", action="store_true")
    ap.add_argument("--dump_all", action="store_true")
    ap.add_argument("--dump_perf", action="store_true")
    args = ap.parse_args(argv)

    if args.large_k % 16 == 0:
        # multiword sentinel layout needs pad bits in the last lane
        raise SystemExit(
            f"-K {args.large_k}: multiples of 16 unsupported; pick from "
            + ",".join(str(x) for x in ALLOWED_K if x % 16)
        )

    import os

    import jax

    # the axon TPU plugin force-selects itself at interpreter start, so a
    # plain JAX_PLATFORMS env var is ignored; honor an explicit override
    # (same mechanism as tests/conftest.py) and reuse compiled kernels
    # across runs via the persistent cache.
    plat = os.environ.get("W2RAP_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    cache = os.environ.get(
        "W2RAP_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from .pipeline.driver import run_pipeline

    run_pipeline(
        out_dir=args.out_dir,
        read_spec=args.read_files,
        prefix=args.prefix,
        large_k=args.large_k,
        from_step=args.from_step,
        to_step=args.to_step,
        min_freq=args.min_freq,
        min_qual=args.min_qual,
        min_size=args.min_size,
        dump_all=args.dump_all,
        dump_perf=args.dump_perf,
        path_finder=args.path_finder,
    )


if __name__ == "__main__":
    main()
