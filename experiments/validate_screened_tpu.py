#!/usr/bin/env python
"""Scale differential validation of the TPU screened engine.

Builds a synthetic bank with planted near-duplicate clusters (known
ground-truth structure), runs the fused Pallas screened engine on the
available accelerator, and compares the emitted pair set + Jaccard values
against the sequential host reference engine - the at-scale analog of the
reference's CPU-vs-GPU comparison (run_comparison_experiment.sh:93-110),
with EXACT equality required instead of EPS=1e-6.

Usage: python experiments/validate_screened_tpu.py [-n 1024] [--tau 0.8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_planted_bank(n, p=14, m=32, items=4096, n_clusters=24,
                       mutate=0.05, seed=0):
    """Bank with n_clusters groups of near-duplicates (expected J >= ~0.9)
    plus unrelated singletons."""
    import jax.numpy as jnp
    from cuda_selection_criteria_tpu.models.bank import SketchBank
    from cuda_selection_criteria_tpu.ops import hll_build, smh_build

    rng = np.random.default_rng(seed)
    genomes = []
    for c in range(n_clusters):
        base = rng.integers(0, 1 << 63, size=items, dtype=np.uint64)
        size = int(rng.integers(2, 5))
        for _ in range(size):
            g = base.copy()
            n_mut = int(mutate * items)
            idx = rng.choice(items, size=n_mut, replace=False)
            g[idx] = rng.integers(0, 1 << 63, size=n_mut, dtype=np.uint64)
            genomes.append(g)
    while len(genomes) < n:
        genomes.append(rng.integers(0, 1 << 63, size=items, dtype=np.uint64))
    genomes = genomes[:n]

    regs_l, aux_l = [], []
    batch = 256
    for b0 in range(0, n, batch):
        chunk = genomes[b0:b0 + batch]
        kms = jnp.asarray(np.concatenate(chunk))
        gids = jnp.asarray(np.repeat(np.arange(len(chunk), dtype=np.int32),
                                     items))
        valid = jnp.ones(kms.shape, bool)
        regs_l.append(np.asarray(
            hll_build.hll_build_batch(kms, valid, gids, p, len(chunk))))
        aux_l.append(np.asarray(
            smh_build.smh_build_batch(kms, valid, gids, m, len(chunk))))
    bank = SketchBank(
        names=[f"g{i:05d}" for i in range(n)],
        regs=np.concatenate(regs_l), p=p,
        aux_kind="smh", aux=np.concatenate(aux_l), aux_param=m,
    )
    return bank


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=1024)
    ap.add_argument("--tau", type=float, default=0.8)
    ap.add_argument("--criterion", default="smh_a")
    args = ap.parse_args()

    from cuda_selection_criteria_tpu.parallel.selection import SelectionParams
    from cuda_selection_criteria_tpu.parallel.screened import (
        select_pairs_screened,
    )
    from cuda_selection_criteria_tpu.utils.hostref import select_pairs_host

    print(f"building planted bank n={args.n} ...", flush=True)
    bank = build_planted_bank(args.n)

    params = SelectionParams(tau=args.tau, criterion=args.criterion)
    t0 = time.perf_counter()
    got = select_pairs_screened(bank, params)
    dt = time.perf_counter() - t0
    pairs = args.n * (args.n - 1) // 2
    print(f"screened engine: {len(got)} pairs in {dt:.2f}s "
          f"({pairs/dt/1e6:.1f} Mpairs/s incl. build-side overheads)")

    t0 = time.perf_counter()
    want = select_pairs_host(bank, args.tau, args.criterion)
    print(f"host reference: {len(want)} pairs in {time.perf_counter()-t0:.2f}s")

    if [(a, b, round(j, 12)) for a, b, j in want] == [
        (a, b, round(j, 12)) for a, b, j in got
    ]:
        print(f"EXACT MATCH: {len(got)} pairs")
        return 0
    sw, sg = set((a, b) for a, b, _ in want), set((a, b) for a, b, _ in got)
    print(f"MISMATCH: missing={len(sw - sg)} extra={len(sg - sw)}")
    for pair in list(sw - sg)[:5]:
        print("  missing:", pair)
    for pair in list(sg - sw)[:5]:
        print("  extra:", pair)
    return 1


if __name__ == "__main__":
    sys.exit(main())
