"""Headline benchmark: pairwise sketch comparisons/sec/chip.

Runs the flagship screened selection path - the fused Pallas MXU kernel
(harmonic-sum / zero-count indicator matmuls, int8 MXU) plus the fused
gate/estimator postprocess (CB mask + smh_a LSH banding + ORIGINAL-
estimator Jaccard screen) - over the FULL i<j pair triangle of a
synthetic sketch bank built through the real device pipeline, on whatever
backend jax.devices() provides (the driver runs this on one real TPU chip).

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
TI = 512
CHUNK = 128
N_GENOMES = 16384
ITEMS_PER_GENOME = 2048


def _build_bank():
    import jax.numpy as jnp
    from cuda_selection_criteria_tpu.ops import hll_build, smh_build, estimators

    rng = np.random.default_rng(0xBE7C)
    regs_parts, aux_parts = [], []
    gbatch = 512
    for _ in range(0, N_GENOMES, gbatch):
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
    from cuda_selection_criteria_tpu.ops import criteria, screen
    from cuda_selection_criteria_tpu.parallel import screened

    regs, aux, e = _build_bank()
    order = np.argsort(e, kind="stable")
    regs, aux, e = regs[order], aux[order], e[order]

    n_rows_b, n_bands = criteria.smh_band_params(M_SMH, TAU)
    tau = criteria.effective_tau(TAU)
    tau_scr = np.float32(screened.screen_tau(tau))
    tau_cb = np.float32(tau * (1.0 - 1e-5))
    values = screen.bank_values(regs)

    # Device-resident bank (production holds the bank on-chip across
    # queries; the upload is not part of the per-query cost).
    d_regs = jnp.asarray(regs)
    d_fp = screened.band_fingerprints(jnp.asarray(aux), n_rows_b, n_bands)
    d_e = jnp.asarray(e.astype(np.float32))

    nb = N_GENOMES // TI
    tiles = [(i, j) for i in range(nb) for j in range(i, nb)]
    rows = np.array([t[0] for t in tiles], np.int32)
    cols = np.array([t[1] for t in tiles], np.int32)
    n_sched = -(-len(tiles) // CHUNK) * CHUNK
    rows = np.pad(rows, (0, n_sched - len(tiles)), constant_values=rows[-1])
    cols = np.pad(cols, (0, n_sched - len(tiles)), constant_values=cols[-1])

    interpret = jax.default_backend() not in ("tpu", "axon")

    def sweep(tau_jitter):
        """One full all-pairs screened pass; returns total screen hits.

        Matches the engine's fetch discipline (parallel/screened.py): all
        chunks dispatched back-to-back, one small count array fetched, full
        masks pulled only for chunks that contain candidates.
        """
        tau_s = jnp.float32(tau_scr + tau_jitter)
        pending = []
        for c0 in range(0, n_sched, CHUNK):
            r_chunk = rows[c0:c0 + CHUNK]
            c_chunk = cols[c0:c0 + CHUNK]
            hits, cnt = screened._screen_chunk(
                d_regs, jnp.asarray(r_chunk), jnp.asarray(c_chunk), d_e,
                d_fp, jnp.int32(N_GENOMES), tau_s, tau_cb, P, values,
                TI, n_bands, True, True,
            )
            pending.append((hits, cnt))
        counts = np.asarray(jnp.stack([c for _, c in pending]))
        total = 0
        for (h, _), cnt in zip(pending, counts):
            if cnt:
                total += int(np.asarray(h).sum())
        return total

    sweep(0.0)  # warmup / compile
    reps = 3
    t0 = time.perf_counter()
    for k in range(reps):
        sweep(k * 1e-7)  # jitter defeats any transparent result caching
    dt = (time.perf_counter() - t0) / reps

    pairs = N_GENOMES * (N_GENOMES - 1) // 2
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
