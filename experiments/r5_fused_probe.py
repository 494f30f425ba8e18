"""Round-5 probe: the fused screen kernel on the real chip.

1. Mosaic-compiles screen_hits_fused at the production shape
   (ti=1024, chunk=33, p=14) and checks counts equal the two-pass path.
2. Measures the fused sweep rate vs the old two-pass sweep rate with the
   bench's sustained-load protocol (fresh tau jitter per rep).
"""

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
    print(f"values={values}", flush=True)
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

    def sweep(fused, jit_idx):
        pend = []
        for c0, width in spans:
            r, c = chunk_args(c0, width)
            ts = jnp.float32(tau_scr + jit_idx * 1e-7)
            if fused:
                h, cnt = screen.screen_hits_fused(
                    d_regs, r, c, d_e, d_fp, jnp.int32(n), ts,
                    jnp.float32(tau_cb), P, values, TI, n_bands, True,
                    True)
            else:
                s, z = screen.screen_s_z(d_regs, r, c, P, values, ti=TI,
                                         tj=TI)
                h = screened._screen_post(
                    s, z, d_e, d_fp, r * TI, c * TI, jnp.int32(n), ts,
                    jnp.float32(tau_cb), P, n_bands, TI, TI, True, True)
                cnt = jnp.sum(h, axis=(1, 2), dtype=jnp.int32)
            pend.append((h, cnt))
        return pend

    def collect(pend):
        counts = np.asarray(jnp.concatenate([c for _, c in pend]))
        return counts

    # --- correctness on chip: fused counts == two-pass counts
    t0 = time.perf_counter()
    c_fused = collect(sweep(True, 0))
    print(f"fused compile+run: {time.perf_counter() - t0:.1f}s "
          f"(counts total {int(c_fused.sum())})", flush=True)
    t0 = time.perf_counter()
    c_old = collect(sweep(False, 0))
    print(f"two-pass compile+run: {time.perf_counter() - t0:.1f}s "
          f"(counts total {int(c_old.sum())})", flush=True)
    if not np.array_equal(c_fused, c_old):
        bad = np.nonzero(c_fused != c_old)[0]
        print(f"MISMATCH at {len(bad)} tiles, first {bad[:5]}:"
              f" fused={c_fused[bad[:5]]} old={c_old[bad[:5]]}",
              flush=True)
        return 1
    print("counts EQUAL on chip", flush=True)

    # --- rates, sustained-load
    def run(fused, reps):
        t0 = time.perf_counter()
        inflight = sweep(fused, 1)
        for k in range(1, reps):
            nxt = sweep(fused, k + 1)
            collect(inflight)
            inflight = nxt
        collect(inflight)
        dt = (time.perf_counter() - t0) / reps
        rate = pairs / dt
        tag = "fused" if fused else "two-pass"
        print(f"{tag:9s} reps={reps}: {dt*1e3:7.1f} ms/sweep "
              f"{rate:.3e} pairs/s ({rate/2.32e7:.1f}x)", flush=True)
        return rate

    run(False, 5)
    run(True, 5)
    run(False, 5)
    run(True, 5)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
