"""Fused-kernel operating-point sweep (round 5).

The two-pass kernel's optimum was ti=1024 / r_sub=512 / chunk=33
(r3e ktune). The fused kernel forces r_sub<=256 (VMEM scratch) and
shrinks outputs 8x, so the chunk/tile optimum may have moved. Sweeps
the engine-path rate (jitted _screen_chunk, sustained-load protocol)
over (ti, chunk) with the kernel's r_sub rule as-is.

One TPU process; run AFTER any chain completes (CLAUDE.md: serialize).
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
    P, TAU, M_SMH = bench.P, bench.TAU, bench.M_SMH
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
    pairs = n * (n - 1) // 2

    def rate(ti, chunk, reps=5):
        nb = n // ti
        tiles = [(i, j) for i in range(nb) for j in range(i, nb)]
        rows = np.array([t[0] for t in tiles], np.int32)
        cols = np.array([t[1] for t in tiles], np.int32)
        spans = bench._spans(len(tiles), min(chunk, len(tiles)))
        cache = {}

        def chunk_args(c0, width):
            if (c0, width) not in cache:
                take = min(width, len(rows) - c0)
                r = np.pad(rows[c0:c0 + take], (0, width - take),
                           constant_values=rows[-1])
                c = np.pad(cols[c0:c0 + take], (0, width - take),
                           constant_values=cols[-1])
                cache[(c0, width)] = (jnp.asarray(r), jnp.asarray(c))
            return cache[(c0, width)]

        def sweep(j):
            out = []
            for c0, width in spans:
                r, c = chunk_args(c0, width)
                _, cnt = screened._screen_chunk(
                    d_regs, r, c, d_e, d_fp, jnp.int32(n),
                    jnp.float32(tau_scr + j * 1e-7), jnp.float32(tau_cb),
                    P, values, ti, n_bands, True, True)
                out.append(cnt)
            return out

        def collect(pend):
            return int(np.asarray(jnp.concatenate(pend)).sum())

        t0 = time.perf_counter()
        collect(sweep(0))
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        inflight = sweep(1)
        for k in range(1, reps):
            nxt = sweep(k + 1)
            collect(inflight)
            inflight = nxt
        collect(inflight)
        dt = (time.perf_counter() - t0) / reps
        r = pairs / dt
        print(f"ti={ti:4d} chunk={chunk:3d}: {dt*1e3:7.1f} ms/sweep "
              f"{r:.3e} pairs/s ({r/2.32e7:.1f}x)  [warm {warm:.0f}s]",
              flush=True)
        return r

    for ti, chunk in [(1024, 33), (1024, 64), (1024, 16), (512, 132),
                      (1024, 33)]:
        rate(ti, chunk)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
