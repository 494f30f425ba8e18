"""Bisect 4: add features one at a time to the known-OK kernel shape.

Known OK (bisect3): screen+z scratch + smh 4-band + int8 hits + cnt,
ti=1024, r_sub=256, 4 tiles. Known FAIL: full screen_hits_fused with
33 tiles. Variants here isolate tile count, gj_eff/iota, cb, staged RMW.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import bench


def main():
    import jax
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
    values = screen.truncate_values(
        screen.bank_values(regs), float(e.max()), P)
    d_regs = jnp.asarray(regs)
    d_fp = screened.band_fingerprints(jnp.asarray(aux), n_rows_b, n_bands)
    d_e = jnp.asarray(e.astype(np.float32))
    tau_scr = jnp.float32(0.8)
    tau_cb = jnp.float32(0.8)

    def attempt(tag, fn):
        t0 = time.perf_counter()
        try:
            jax.block_until_ready(fn())
            print(f"OK   {tag}: {time.perf_counter() - t0:.1f}s",
                  flush=True)
            return True
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).replace("\n", " ")[:80]
            print(f"FAIL {tag}: {type(exc).__name__}: {msg}", flush=True)
            return False

    def hits_fused(n_tiles, use_cb=True, use_smh=True):
        rows = jnp.asarray(np.arange(n_tiles, dtype=np.int32) % 8)
        cols = jnp.asarray((np.arange(n_tiles, dtype=np.int32) + 1) % 8)
        return lambda: screen.screen_hits_fused(
            d_regs, rows, cols, d_e, d_fp, jnp.int32(n), tau_scr, tau_cb,
            P, values, 1024, n_bands, use_cb, use_smh)

    ok4 = attempt("hits_fused T=4 cb+smh", hits_fused(4))
    if ok4:
        attempt("hits_fused T=16 cb+smh", hits_fused(16))
        attempt("hits_fused T=33 cb+smh", hits_fused(33))
        attempt("hits_fused T=32 cb+smh", hits_fused(32))
    else:
        attempt("hits_fused T=4 smh-only", hits_fused(4, use_cb=False))
        attempt("hits_fused T=4 cb-only", hits_fused(4, use_smh=False))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
