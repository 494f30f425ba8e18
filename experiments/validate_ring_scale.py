"""Ring-engine replication-scale proof on the real chip (VERDICT r3 #4).

The ring engine exists for banks past replication scale; through round 3
its largest run was 65,536 rows on the virtual CPU mesh. This drives the
FULL ring path - per-strip slab uploads into the row-sharded global
array, strip-level + tile-level CB scheduling, chunked systolic screen,
device-assisted exact confirm - over the same planted bank the screened
cascade validates on (validate_131k_scale.planted_bank), on whatever mesh
jax.devices() provides (ONE strip on the single real chip: the plumbing
and host-stage walls are the point; multi-strip exactness is covered on
the 8-device CPU mesh in tests/test_ring.py).

The planted pairs must come back exactly. Stage walls print as one JSON
line for BASELINE.md.

Usage: python experiments/validate_ring_scale.py [--n 131072]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from validate_131k_scale import planted_bank  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--tau", type=float, default=0.9)
    ap.add_argument("--ti", type=int, default=None)  # None = engine auto-rule
    ap.add_argument("--chunk-tiles", type=int, default=None)
    args = ap.parse_args(argv)

    bench._configure_jax()
    from cuda_selection_criteria_tpu.models.bank import SketchBank
    from cuda_selection_criteria_tpu.parallel.ring import select_pairs_ring
    from cuda_selection_criteria_tpu.parallel.selection import SelectionParams

    rng = np.random.default_rng(0x131)
    t0 = time.perf_counter()
    regs, aux, e, n_dups = planted_bank(args.n, rng)
    t_bank = time.perf_counter() - t0
    print(f"bank: {args.n} genomes ({regs.nbytes / 2**30:.2f} GiB regs), "
          f"{n_dups} planted dup pairs, {t_bank:.1f}s", flush=True)

    bank = SketchBank(
        names=[f"g{i:06d}" for i in range(args.n)], regs=regs, p=bench.P,
        cards=e, aux_kind="smh", aux=aux, aux_param=bench.M_SMH,
    )
    params = SelectionParams(tau=args.tau, criterion="smh_a",
                             aux_bytes=8 * bench.M_SMH)

    stats = {}
    t0 = time.perf_counter()
    out = select_pairs_ring(bank, params, ti=args.ti,
                            chunk_tiles=args.chunk_tiles, stats=stats)
    total = time.perf_counter() - t0

    # Compile walls are per-process XLA/Mosaic artifacts, amortized by
    # the persistent cache - reported, excluded from throughput (same
    # accounting as validate_131k_scale.py).
    total -= (stats.get("gate_compile_secs", 0.0)
              + stats.get("screen_compile_secs", 0.0))
    jaccs = [j for _, _, j in out]
    ok = len(out) >= n_dups and (not jaccs or min(jaccs) > 0.9)
    tri_pairs = args.n * (args.n - 1) // 2
    print(json.dumps({
        "engine": "ring",
        "n_genomes": args.n,
        "pairs_emitted": len(out),
        "planted_dups": n_dups,
        "planted_recovered": ok,
        "min_jacc": round(min(jaccs), 6) if jaccs else None,
        **stats,
        "total_secs": round(total, 2),
        "triangle_pairs_per_sec": round(tri_pairs / total, 1),
        "vs_baseline": round(
            tri_pairs / total / bench.CUDA_BASELINE_PAIRS_PER_SEC, 2),
    }), flush=True)
    if not ok:
        raise SystemExit("planted duplicate pairs not recovered exactly")


if __name__ == "__main__":
    main()
