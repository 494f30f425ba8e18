"""Round-5 probe: where do the headline-vs-raw ~10% go? (VERDICT r4 weak #2)

Decomposes the bench headline into its cost components on the real chip:
  a) reps=3 vs reps=10        -> the untimed-tail / pipeline amortization
  b) counts-only sweep        -> the (T, ti, ti) hits-mask materialization
  c) post-free sweep (raw)    -> the gate+screen postprocess compute

All variants run the SAME schedule on the SAME resident bank, permuted
tile lists per rep against relay caching (CLAUDE.md). One TPU process.
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

import bench  # noqa: E402  (repo-root module)


def main():
    import jax
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
    values = screen.truncate_values(screen.bank_values(regs), float(e.max()), P)
    d_regs = jnp.asarray(regs)
    d_fp = screened.band_fingerprints(jnp.asarray(aux), n_rows_b, n_bands)
    d_e = jnp.asarray(e.astype(np.float32))
    nb = n // TI
    tiles = [(i, j) for i in range(nb) for j in range(i, nb)]
    rows = np.array([t[0] for t in tiles], np.int32)
    cols = np.array([t[1] for t in tiles], np.int32)
    spans = bench._spans(len(tiles), min(CHUNK, len(tiles)))
    pairs = n * (n - 1) // 2
    rng = np.random.default_rng(11)

    def chunk_args(perm, c0, width):
        rp, cp = rows[perm], cols[perm]
        take = min(width, len(rp) - c0)
        r = np.pad(rp[c0:c0 + take], (0, width - take),
                   constant_values=rp[-1])
        c = np.pad(cp[c0:c0 + take], (0, width - take),
                   constant_values=cp[-1])
        return jnp.asarray(r), jnp.asarray(c)

    @partial(jax.jit, static_argnames=("p", "values", "ti", "n_bands",
                                       "use_cb", "use_smh"))
    def _counts_only(regs_, r, c, e_, fp_, n_real, ts, tc, p, values, ti,
                     n_bands, use_cb, use_smh):
        _, cnt = screened._screen_chunk.__wrapped__(
            regs_, r, c, e_, fp_, n_real, ts, tc, p, values, ti, n_bands,
            use_cb, use_smh)
        return cnt

    def sweep(kind, jit_idx):
        perm = rng.permutation(len(rows))
        pend = []
        for c0, width in spans:
            r, c = chunk_args(perm, c0, width)
            if kind == "full":
                h, cnt = screened._screen_chunk(
                    d_regs, r, c, d_e, d_fp, jnp.int32(n),
                    jnp.float32(tau_scr + jit_idx * 1e-7), tau_cb, P,
                    values, TI, n_bands, True, True)
                pend.append((h, cnt))
            else:
                cnt = _counts_only(
                    d_regs, r, c, d_e, d_fp, jnp.int32(n),
                    jnp.float32(tau_scr + jit_idx * 1e-7), tau_cb, P,
                    values, TI, n_bands, True, True)
                pend.append((None, cnt))
        return pend

    def collect(pend):
        counts = np.asarray(jnp.concatenate([c for _, c in pend]))
        total = int(counts.sum())
        pos = 0
        for h, cnt in pend:
            width = cnt.shape[0]
            if h is not None:
                for t in np.nonzero(counts[pos:pos + width])[0]:
                    np.nonzero(np.asarray(h[t]))
            pos += width
        return total

    def run(kind, reps):
        collect(sweep(kind, 0))  # warm
        t0 = time.perf_counter()
        inflight = sweep(kind, 1)
        for k in range(1, reps):
            nxt = sweep(kind, k + 1)
            collect(inflight)
            inflight = nxt
        collect(inflight)
        dt = (time.perf_counter() - t0) / reps
        rate = pairs / dt
        print(f"{kind:12s} reps={reps:2d}: {dt*1e3:7.1f} ms/sweep  "
              f"{rate:.3e} pairs/s  ({rate/2.32e7:.1f}x)", flush=True)
        return rate

    print("== gap probe at N=16384, TI=1024, CHUNK=33 ==", flush=True)
    run("full", 3)
    run("full", 10)
    run("counts", 3)
    run("counts", 10)


if __name__ == "__main__":
    main()
