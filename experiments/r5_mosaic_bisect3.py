"""Bisect 3: int32 band-equality vs op-count at ti=1024.

Variants patch screen._screen_fused_call's band compare via a wrapper
kernel built here with the same structure, only the smh gate varied.
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

import bench


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
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
    ti = 1024
    r_sub = 256
    rows = jnp.asarray(np.array([0, 1, 2, 3], np.int32))
    cols = jnp.asarray(np.array([1, 2, 3, 4], np.int32))
    items = sorted({b: np.ldexp(1.0, -b) - np.ldexp(1.0, -values[i + 1])
                    for i, b in enumerate(values[:-1])}.items())
    n_r = (1 << P) // r_sub
    lane = jnp.arange(ti, dtype=jnp.int32)[None, :]
    ii = rows[:, None] * ti + lane
    jj = cols[:, None] * ti + lane
    e_r = d_e[ii][:, :, None]          # (T, ti, 1)
    e_c = d_e[jj][:, None, :]          # (T, 1, tj)
    fp_r = d_fp[ii]                    # (T, ti, nbd) int32
    fp_c = jnp.transpose(d_fp[jj], (0, 2, 1))  # (T, nbd, tj)

    def build(n_eq, mode):
        """mode: i32 | f32 | split16"""
        def kernel(rws, cls, a_ref, b_ref, er_ref, ec_ref, fpr_ref,
                   fpc_ref, hits_ref, cnt_ref, s_acc, z_acc):
            r = pl.program_id(1)

            @pl.when(r == 0)
            def _():
                s_acc[:] = jnp.zeros_like(s_acc)
                z_acc[:] = jnp.zeros_like(z_acc)

            a = a_ref[:].astype(jnp.int32)
            b = b_ref[:].astype(jnp.int32)
            for v, w in items:
                ia = (a <= v).astype(jnp.int8)
                ib = (b <= v).astype(jnp.int8)
                d = jax.lax.dot_general(
                    ia, ib, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                s_acc[:] += np.float32(w) * d
                if v == 0:
                    z_acc[:] += d

            @pl.when(r == n_r - 1)
            def _():
                s = s_acc[:] + np.float32(0.001)
                zz = z_acc[:]
                e_a = er_ref[0]
                e_b = ec_ref[0]
                h = (3.0 * s - zz) * (e_a + e_b) >= 1e8 - 3e4 * zz
                fpr = fpr_ref[0]
                fpc = fpc_ref[0]
                if mode == "i32":
                    bh = fpr[:, 0:1] == fpc[0:1, :]
                    for band in range(1, n_eq):
                        bh |= fpr[:, band:band + 1] == fpc[band:band + 1, :]
                elif mode == "f32":
                    bh = (fpr[:, 0:1].astype(jnp.float32)
                          == fpc[0:1, :].astype(jnp.float32))
                    for band in range(1, n_eq):
                        bh |= (fpr[:, band:band + 1].astype(jnp.float32)
                               == fpc[band:band + 1, :].astype(jnp.float32))
                else:  # split16: lo/hi 16-bit halves as exact f32
                    def lo(x):
                        return (x & 0xFFFF).astype(jnp.float32)

                    def hi(x):
                        return ((x >> 16) & 0xFFFF).astype(jnp.float32)

                    bh = ((lo(fpr[:, 0:1]) == lo(fpc[0:1, :]))
                          & (hi(fpr[:, 0:1]) == hi(fpc[0:1, :])))
                    for band in range(1, n_eq):
                        bh |= ((lo(fpr[:, band:band + 1])
                                == lo(fpc[band:band + 1, :]))
                               & (hi(fpr[:, band:band + 1])
                                  == hi(fpc[band:band + 1, :])))
                h &= bh
                hi8 = h.astype(jnp.int8)
                hits_ref[0] = hi8
                cnt_ref[0, 0, :] = jnp.full(
                    (128,), jnp.sum(hi8.astype(jnp.float32)).astype(
                        jnp.int32), jnp.int32)

        def im_rows(t, r, rws, cls):
            return (rws[t].astype(jnp.int32), r)

        def im_cols(t, r, rws, cls):
            return (cls[t].astype(jnp.int32), r)

        def im_t3(t, r, rws, cls):
            return (t, jnp.int32(0), jnp.int32(0))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(4, n_r),
            in_specs=[
                pl.BlockSpec((ti, r_sub), im_rows),
                pl.BlockSpec((ti, r_sub), im_cols),
                pl.BlockSpec((1, ti, 1), im_t3),
                pl.BlockSpec((1, 1, ti), im_t3),
                pl.BlockSpec((1, ti, n_bands), im_t3),
                pl.BlockSpec((1, n_bands, ti), im_t3),
            ],
            out_specs=[
                pl.BlockSpec((1, ti, ti), im_t3),
                pl.BlockSpec((1, 1, 128), im_t3),
            ],
            scratch_shapes=[
                pltpu.VMEM((ti, ti), jnp.float32),
                pltpu.VMEM((ti, ti), jnp.float32),
            ],
        )
        return lambda: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((4, ti, ti), jnp.int8),
                jax.ShapeDtypeStruct((4, 1, 128), jnp.int32),
            ],
        )(rows, cols, d_regs, d_regs, e_r, e_c, fp_r, fp_c)

    def attempt(tag, fn):
        t0 = time.perf_counter()
        try:
            jax.block_until_ready(fn())
            print(f"OK   {tag}: {time.perf_counter() - t0:.1f}s",
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).replace("\n", " ")[:90]
            print(f"FAIL {tag}: {type(exc).__name__}: {msg}", flush=True)

    attempt("i32 x1", build(1, "i32"))
    attempt("i32 x4", build(4, "i32"))
    attempt("f32 x4", build(4, "f32"))
    attempt("split16 x4", build(4, "split16"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
