"""Bisect the Mosaic HTTP-500 on the fused screen kernel (r5).

Round-4 note (ops/screen.py docstring): VMEM-scratch accumulators
compiled only at <= 256x256 tiles on this toolchain. This probes which
ingredient of screen_hits_fused breaks at which tile size, cheaply
(4-tile dispatches on the cached bench bank).
"""

import sys
import time
import traceback

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
    tau = criteria.effective_tau(TAU)
    tau_scr = jnp.float32(screened.screen_tau(tau))
    tau_cb = jnp.float32(tau * (1.0 - 1e-5))
    values = screen.truncate_values(
        screen.bank_values(regs), float(e.max()), P)
    d_regs = jnp.asarray(regs)
    d_fp = screened.band_fingerprints(jnp.asarray(aux), n_rows_b, n_bands)
    d_e = jnp.asarray(e.astype(np.float32))

    def attempt(tag, fn):
        t0 = time.perf_counter()
        try:
            out = fn()
            jax.block_until_ready(out)
            print(f"OK   {tag}: {time.perf_counter() - t0:.1f}s",
                  flush=True)
            return True
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).replace("\n", " ")[:120]
            print(f"FAIL {tag}: {type(exc).__name__}: {msg}", flush=True)
            return False

    def fused(ti, r_sub=None, use_cb=True, use_smh=True, vals=values):
        rows = jnp.asarray(np.array([0, 1, 2, 3], np.int32))
        cols = jnp.asarray(np.array([1, 2, 3, 4], np.int32))
        kw = {}
        if r_sub is not None:
            # monkey-set by rebuilding the call with custom r_sub
            pass
        return lambda: screen.screen_hits_fused(
            d_regs, rows, cols, d_e, d_fp, jnp.int32(n), tau_scr, tau_cb,
            P, vals, ti, n_bands, use_cb, use_smh, **kw)

    # main suspects, cheapest differential first
    attempt("fused ti=512 full", fused(512))
    attempt("fused ti=1024 full", fused(1024))
    attempt("fused ti=1024 no-gates", fused(1024, use_cb=False,
                                            use_smh=False))
    attempt("fused ti=1024 no-z (values w/o 0)",
            fused(1024, vals=tuple(v for v in values if v != 0) or (1,)))
    attempt("fused ti=768 full", fused(768))
    # r_sub sensitivity via direct _screen_fused_call
    def direct(ti, r_sub, want_z=True):
        rows = jnp.asarray(np.array([0, 1, 2, 3], np.int32))
        cols = jnp.asarray(np.array([1, 2, 3, 4], np.int32))
        lane = jnp.arange(ti, dtype=jnp.int32)[None, :]
        ii = rows[:, None] * ti + lane
        jj = cols[:, None] * ti + lane
        e32 = d_e.astype(jnp.float32)
        m = np.float32(1 << P)
        vals = values if want_z else tuple(v for v in values if v != 0)
        tail = np.float32(np.ldexp(float(1 << P), -vals[-1]))
        w = {b: np.ldexp(1.0, -b) - np.ldexp(1.0, -vals[i + 1])
             for i, b in enumerate(vals[:-1])}
        scal = jnp.stack([2 * m * m * 1.9, 2 * m * 1.9,
                          jnp.float32(n)])
        return lambda: screen._screen_fused_call(
            d_regs, d_regs, rows, cols, e32[ii], e32[jj], None, None,
            None, scal, P, w, tail, ti, ti, r_sub, False, False, want_z,
            False)
    attempt("direct ti=1024 r_sub=256 no-gates z", direct(1024, 256))
    attempt("direct ti=1024 r_sub=128 no-gates z", direct(1024, 128))
    attempt("direct ti=512 r_sub=1024 no-gates z", direct(512, 1024))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
