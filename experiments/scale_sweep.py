#!/usr/bin/env python
"""Throughput-vs-bank-size sweep of the screened all-pairs path.

Produces the scaling table for BASELINE.md: full-union screened pair
comparisons/s at several bank sizes on the local accelerator (the same
measurement protocol as bench.py, one row per N).

Usage: python experiments/scale_sweep.py [--sizes 4096 8192 16384 24576]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P, M_SMH, TAU, TI, CHUNK, ITEMS = 14, 32, 0.9, 512, 128, 2048


def build_bank(n, rng):
    import jax.numpy as jnp
    from cuda_selection_criteria_tpu.ops import hll_build, smh_build, estimators

    regs_parts, aux_parts = [], []
    g = 512
    for _ in range(0, n, g):
        kms = jnp.asarray(rng.integers(0, 1 << 63, g * ITEMS, np.uint64))
        gids = jnp.asarray(np.repeat(np.arange(g, dtype=np.int32), ITEMS))
        valid = jnp.ones(kms.shape, bool)
        regs_parts.append(np.asarray(
            hll_build.hll_build_batch(kms, valid, gids, P, g)))
        aux_parts.append(np.asarray(
            smh_build.smh_build_batch(kms, valid, gids, M_SMH, g)))
    regs = np.concatenate(regs_parts)
    aux = np.concatenate(aux_parts)
    cards = np.asarray(estimators.ertl_mle_from_regs(jnp.asarray(regs), P))
    order = np.argsort(cards, kind="stable")
    return regs[order], aux[order], np.trunc(cards)[order]


def sweep_rate(regs, aux, e, reps=2):
    import jax.numpy as jnp
    from cuda_selection_criteria_tpu.ops import criteria, screen
    from cuda_selection_criteria_tpu.parallel import screened

    n = regs.shape[0]
    nrb, nb_ = criteria.smh_band_params(M_SMH, TAU)
    tau = criteria.effective_tau(TAU)
    tau_scr = np.float32(screened.screen_tau(tau))
    tau_cb = np.float32(tau * (1.0 - 1e-5))
    values = screen.bank_values(regs)
    d_regs = jnp.asarray(regs)
    d_fp = screened.band_fingerprints(jnp.asarray(aux), nrb, nb_)
    d_e = jnp.asarray(e.astype(np.float32))
    nb = n // TI
    tiles = [(i, j) for i in range(nb) for j in range(i, nb)]
    rows = np.array([t[0] for t in tiles], np.int32)
    cols = np.array([t[1] for t in tiles], np.int32)
    n_sched = -(-len(tiles) // CHUNK) * CHUNK
    rows = np.pad(rows, (0, n_sched - len(tiles)), constant_values=rows[-1])
    cols = np.pad(cols, (0, n_sched - len(tiles)), constant_values=cols[-1])

    def one(jit_tau):
        pend = []
        for c0 in range(0, n_sched, CHUNK):
            _, cnt = screened._screen_chunk(
                d_regs, jnp.asarray(rows[c0:c0 + CHUNK]),
                jnp.asarray(cols[c0:c0 + CHUNK]), d_e, d_fp, jnp.int32(n),
                jnp.float32(tau_scr + jit_tau), tau_cb, P, values, TI, nb_,
                True, True,
            )
            pend.append(cnt)
        return int(np.asarray(jnp.stack(pend)).sum())

    one(0.0)
    t0 = time.perf_counter()
    for k in range(reps):
        one((k + 1) * 1e-7)
    dt = (time.perf_counter() - t0) / reps
    return n * (n - 1) / 2 / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[4096, 8192, 16384, 24576])
    args = ap.parse_args()
    rng = np.random.default_rng(0xD0)
    print("| N genomes | pairs | sweep s | pairs/s | vs 2.32e7 |")
    print("|---|---|---|---|---|")
    for n in args.sizes:
        t0 = time.perf_counter()
        regs, aux, e = build_bank(n, rng)
        build_s = time.perf_counter() - t0
        rate, dt = sweep_rate(regs, aux, e)
        print(f"| {n} | {n*(n-1)//2/1e6:.0f}M | {dt:.2f} "
              f"| {rate:.3e} | {rate/2.32e7:.1f}x |  (build {build_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
