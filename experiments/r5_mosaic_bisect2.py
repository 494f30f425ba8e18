"""Bisect 2: which GATE ingredient breaks Mosaic at ti=1024/r_sub=256."""

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
            out = fn()
            jax.block_until_ready(out)
            print(f"OK   {tag}: {time.perf_counter() - t0:.1f}s",
                  flush=True)
            return True
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).replace("\n", " ")[:100]
            print(f"FAIL {tag}: {type(exc).__name__}: {msg}", flush=True)
            return False

    rows = jnp.asarray(np.array([0, 1, 2, 3], np.int32))
    cols = jnp.asarray(np.array([1, 2, 3, 4], np.int32))

    def fused(ti, use_cb, use_smh):
        return lambda: screen.screen_hits_fused(
            d_regs, rows, cols, d_e, d_fp, jnp.int32(n), tau_scr, tau_cb,
            P, values, ti, n_bands, use_cb, use_smh)

    attempt("1024 cb-only", fused(1024, True, False))
    attempt("1024 smh-only", fused(1024, False, True))
    attempt("1024 none", fused(1024, False, False))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
