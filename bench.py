"""Headline benchmark: pairwise sketch comparisons/sec/chip.

Runs the flagship fused selection tile (CB mask + smh_a LSH banding + MXU
HLL-union histograms + batched ERTL-MLE + J >= tau) on synthetic sketch
banks sized like real genome collections, on whatever backend jax.devices()
provides (the driver runs this on one real TPU chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no absolute numbers (BASELINE.md), so
the baseline is the reference CUDA kernel's speed-of-light on its target
hardware (Makefile:26 -arch=sm_86, RTX 3080-class): kernel_CBsmh reads both
16 KiB register arrays per surviving pair (selection_kernels.cu:78-116), so
at 760 GB/s HBM the union stage tops out at 760e9 / 32768 = 2.32e7 pairs/s.
That DRAM-bound bound ignores the estimator math, so it flatters the
reference; beating it by >10x is the BASELINE.json north star.
"""

import json
import time

import numpy as np

CUDA_BASELINE_PAIRS_PER_SEC = 2.32e7  # see module docstring

P = 14
M_SMH = 32  # aux_bytes=256 default -> m=32 buckets
TAU = 0.9
BLOCK = 512
N_GENOMES = 2048
ITEMS_PER_GENOME = 4096


def _build_bank():
    import jax
    import jax.numpy as jnp
    from cuda_selection_criteria_tpu.ops import hll_build, smh_build, estimators

    rng = np.random.default_rng(0xBE7C)
    # Build through the real device pipeline in genome batches.
    regs_parts = []
    aux_parts = []
    gbatch = 256
    for g0 in range(0, N_GENOMES, gbatch):
        kms = jnp.asarray(
            rng.integers(0, 1 << 63, size=gbatch * ITEMS_PER_GENOME,
                         dtype=np.uint64)
        )
        gids = jnp.asarray(
            np.repeat(np.arange(gbatch, dtype=np.int32), ITEMS_PER_GENOME)
        )
        valid = jnp.ones(kms.shape, bool)
        regs_parts.append(np.asarray(
            hll_build.hll_build_batch(kms, valid, gids, P, gbatch)
        ))
        aux_parts.append(np.asarray(
            smh_build.smh_build_batch(kms, valid, gids, M_SMH, gbatch)
        ))
    regs = np.concatenate(regs_parts)
    aux = np.concatenate(aux_parts)
    cards = np.asarray(
        estimators.ertl_mle_from_regs(jnp.asarray(regs), P)
    )
    return regs, aux, np.trunc(cards)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from cuda_selection_criteria_tpu.ops import criteria, pairwise

    regs, aux, e = _build_bank()
    order = np.argsort(e, kind="stable")
    regs, aux, e = regs[order], aux[order], e[order]

    n_rows, n_bands = criteria.smh_band_params(M_SMH, TAU)
    tau = criteria.effective_tau(TAU)

    # Screen dtype: f32 on accelerators (TPU f64 is emulated; the engine's
    # margin + host adjudication keeps outputs exact), f64 on CPU.
    mle_dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32

    @partial(jax.jit, static_argnames=())
    def tile(regs_a, regs_b, aux_a, aux_b, e_a, e_b, idx_a, idx_b):
        tri = idx_a[:, None] < idx_b[None, :]
        gate = (
            tri
            & (e_b[None, :] != 0)
            & criteria.cb_mask(e_a, e_b, tau)
            & criteria.smh_a_mask(aux_a, aux_b, n_rows, n_bands)
        )
        jacc, _ = pairwise.pairwise_jaccard(
            regs_a, regs_b, e_a, e_b, P, mle_dtype=mle_dtype
        )
        hits = gate & (jacc >= tau)
        return hits.sum(), jacc.sum()

    # Device-resident inputs.
    d_regs = jnp.asarray(regs)
    d_aux = jnp.asarray(aux)
    d_e = jnp.asarray(e)
    d_idx = jnp.arange(N_GENOMES, dtype=jnp.int64)

    nb = N_GENOMES // BLOCK
    tiles = [(i, j) for i in range(nb) for j in range(i, nb)]

    def run_all():
        outs = []
        for (i, j) in tiles:
            sl_i = slice(i * BLOCK, (i + 1) * BLOCK)
            sl_j = slice(j * BLOCK, (j + 1) * BLOCK)
            outs.append(
                tile(
                    d_regs[sl_i], d_regs[sl_j], d_aux[sl_i], d_aux[sl_j],
                    d_e[sl_i], d_e[sl_j], d_idx[sl_i], d_idx[sl_j],
                )
            )
        jax.block_until_ready(outs)
        return outs

    run_all()  # warmup/compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        run_all()
    dt = (time.perf_counter() - t0) / reps

    pairs = len(tiles) * BLOCK * BLOCK  # full-tile comparisons incl. masked
    pairs_per_sec = pairs / dt
    print(
        json.dumps(
            {
                "metric": "pair_comparisons_per_sec_per_chip",
                "value": round(pairs_per_sec, 1),
                "unit": "pairs/s",
                "vs_baseline": round(
                    pairs_per_sec / CUDA_BASELINE_PAIRS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
