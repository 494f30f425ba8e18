"""Engine-path fused probe: the jitted _screen_chunk (gates + Mosaic in
ONE program, as the engine and shard_map paths compile it) at the
production shape, vs the two-pass form. Verifies counts equality and
measures the sweep rate through the REAL engine entry point."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import bench


def main():
    import jax.numpy as jnp
    from cuda_selection_criteria_tpu.ops import criteria, screen
    from cuda_selection_criteria_tpu.parallel import screened

    bench._configure_jax()
    P, TI, CHUNK, TAU, M_SMH = bench.P, bench.TI, bench.CHUNK, bench.TAU, \
        bench.M_SMH
    n = bench.N_GENOMES
    regs, aux, e = bench.build_synthetic_bank(n)
    order = np.argsort(e, kind="stable")
    regs, aux, e = regs[order], aux[order], e[order]
    n_rows_b, n_bands = criteria.smh_band_params(M_SMH, TAU)
    tau = criteria.effective_tau(TAU)
    tau_scr = np.float32(screened.screen_tau(tau))
    tau_cb = np.float32(tau * (1.0 - 1e-5))
    values = screen.truncate_values(
        screen.bank_values(regs), float(e.max()), P)
    d_regs = jnp.asarray(regs)
    d_fp = screened.band_fingerprints(jnp.asarray(aux), n_rows_b, n_bands)
    d_e = jnp.asarray(e.astype(np.float32))
    nb = n // TI
    tiles = [(i, j) for i in range(nb) for j in range(i, nb)]
    rows = np.array([t[0] for t in tiles], np.int32)
    cols = np.array([t[1] for t in tiles], np.int32)
    spans = bench._spans(len(tiles), min(CHUNK, len(tiles)))
    pairs = n * (n - 1) // 2
    arg_cache = {}

    def chunk_args(c0, width):
        if (c0, width) not in arg_cache:
            take = min(width, len(rows) - c0)
            r = np.pad(rows[c0:c0 + take], (0, width - take),
                       constant_values=rows[-1])
            c = np.pad(cols[c0:c0 + take], (0, width - take),
                       constant_values=cols[-1])
            arg_cache[(c0, width)] = (jnp.asarray(r), jnp.asarray(c))
        return arg_cache[(c0, width)]

    def sweep(jit_idx):
        pend = []
        for c0, width in spans:
            r, c = chunk_args(c0, width)
            h, cnt = screened._screen_chunk(
                d_regs, r, c, d_e, d_fp, jnp.int32(n),
                jnp.float32(tau_scr + jit_idx * 1e-7),
                jnp.float32(tau_cb), P, values, TI, n_bands, True, True)
            pend.append(cnt)
        return pend

    def collect(pend):
        return np.asarray(jnp.concatenate(pend))

    mode = "fused" if os.environ.get("CSC_FUSED_SCREEN", "1") == "1" \
        else "two-pass"
    t0 = time.perf_counter()
    c0 = collect(sweep(0))
    print(f"{mode} engine chunk compile+run: "
          f"{time.perf_counter() - t0:.1f}s total={int(c0.sum())}",
          flush=True)
    np.save(f"/tmp/engine_counts_{mode}.npy", c0)
    other = f"/tmp/engine_counts_" \
        f"{'two-pass' if mode == 'fused' else 'fused'}.npy"
    if os.path.exists(other):
        c1 = np.load(other)
        print("counts EQUAL across modes" if np.array_equal(c0, c1)
              else "COUNTS MISMATCH", flush=True)

    reps = 5
    t0 = time.perf_counter()
    inflight = sweep(1)
    for k in range(1, reps):
        nxt = sweep(k + 1)
        collect(inflight)
        inflight = nxt
    collect(inflight)
    dt = (time.perf_counter() - t0) / reps
    print(f"{mode}: {dt*1e3:.1f} ms/sweep {pairs/dt:.3e} pairs/s "
          f"({pairs/dt/2.32e7:.1f}x)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
