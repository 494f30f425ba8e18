#!/usr/bin/env python
"""Throughput-vs-bank-size sweep of the screened all-pairs path.

Produces the scaling table for BASELINE.md: full-union screened pair
comparisons/s at several bank sizes on the local accelerator - the same
measurement protocol as bench.py (shared code: bench.measure), one JSON
row per N.

Usage: python experiments/scale_sweep.py [--sizes 4096 8192 16384 24576]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[4096, 8192, 16384, 24576])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    bench._configure_jax()
    for n in args.sizes:
        headline, raw, util = bench.measure(n_genomes=n, reps=args.reps)
        print(json.dumps({
            "n_genomes": n,
            "pairs_per_sec": round(headline, 1),
            "vs_baseline": round(
                headline / bench.CUDA_BASELINE_PAIRS_PER_SEC, 3),
            "raw_kernel_pairs_per_sec": round(raw, 1),
            "mxu_util": round(util, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
