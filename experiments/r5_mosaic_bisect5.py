"""Bisect 5: full one-shot fused kernel standalone vs inside an outer jit.

v3: all gates + screen at n_last, operands pre-materialized, bare
    pallas_call (bisect3 style).  OK here + FAIL in screen_hits_fused
    would implicate the outer-jit (gathers fused around the custom call).
v5: identical, but the gathers + pallas_call run inside ONE jit.
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
    nbd = n_bands
    T = 4
    rows_np = np.arange(T, dtype=np.int32) % 8
    cols_np = (np.arange(T, dtype=np.int32) + 1) % 8
    items = sorted({b: np.ldexp(1.0, -b) - np.ldexp(1.0, -values[i + 1])
                    for i, b in enumerate(values[:-1])}.items())
    n_r = (1 << P) // r_sub
    m_f = np.float32(1 << P)

    def kernel(rws, cls, a_ref, b_ref, er_ref, ec_ref, gjeff_ref,
               ecbc_ref, fpr_ref, fpc_ref, hits_ref, cnt_ref, s_acc,
               z_acc):
        t = pl.program_id(0)
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
            e_sum = er_ref[0] + ec_ref[0]
            h = (3.0 * s - zz) * e_sum >= 2.0 * m_f * m_f - 2.0 * m_f * zz
            gi = (rws[t] * ti
                  + jax.lax.broadcasted_iota(jnp.int32, (ti, 1), 0)
                  ).astype(jnp.float32)
            h &= gi < gjeff_ref[0]
            h &= er_ref[0] >= ecbc_ref[0]
            fpr = fpr_ref[0]
            fpc = fpc_ref[0]
            bh = fpr[:, 0:1] == fpc[0:1, :]
            for band in range(1, nbd):
                bh |= fpr[:, band:band + 1] == fpc[band:band + 1, :]
            h &= bh
            hi8 = h.astype(jnp.int8)
            hits_ref[0] = hi8
            cnt_ref[0, 0, :] = jnp.full(
                (128,), jnp.sum(hi8.astype(jnp.float32)).astype(jnp.int32),
                jnp.int32)

    def im_rows(t, r, rws, cls):
        return (rws[t].astype(jnp.int32), r)

    def im_cols(t, r, rws, cls):
        return (cls[t].astype(jnp.int32), r)

    def im_t3(t, r, rws, cls):
        return (t, jnp.int32(0), jnp.int32(0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, n_r),
        in_specs=[
            pl.BlockSpec((ti, r_sub), im_rows),
            pl.BlockSpec((ti, r_sub), im_cols),
            pl.BlockSpec((1, ti, 1), im_t3),
            pl.BlockSpec((1, 1, ti), im_t3),
            pl.BlockSpec((1, 1, ti), im_t3),
            pl.BlockSpec((1, 1, ti), im_t3),
            pl.BlockSpec((1, ti, nbd), im_t3),
            pl.BlockSpec((1, nbd, ti), im_t3),
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

    def call(rws, cls, e_r, e_c, gj_eff, e_cbc, fp_r, fp_c):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((T, ti, ti), jnp.int8),
                jax.ShapeDtypeStruct((T, 1, 128), jnp.int32),
            ],
        )(rws, cls, d_regs, d_regs, e_r, e_c, gj_eff, e_cbc, fp_r, fp_c)

    def gather(rws, cls):
        lane = jnp.arange(ti, dtype=jnp.int32)[None, :]
        ii = rws[:, None] * ti + lane
        jj = cls[:, None] * ti + lane
        e32 = d_e / jnp.float32(1.8)
        e_r = e32[ii][:, :, None]
        e_c = e32[jj][:, None, :]
        gj_eff = jnp.where((jj < n) & (e32[jj] > 0),
                           jj.astype(jnp.float32),
                           jnp.float32(-(2.0 ** 30)))[:, None, :]
        e_cbc = (jnp.float32(0.8) * e_c)
        fp_r = d_fp[ii]
        fp_c = jnp.transpose(d_fp[jj], (0, 2, 1))
        return e_r, e_c, gj_eff, e_cbc, fp_r, fp_c

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

    rws = jnp.asarray(rows_np)
    cls = jnp.asarray(cols_np)
    # v3: operands pre-materialized, bare pallas_call
    ops_mat = [jnp.asarray(np.asarray(x)) for x in gather(rws, cls)]
    attempt("v3 standalone full one-shot", lambda: call(rws, cls, *ops_mat))

    # v5: gathers + pallas inside ONE jit
    @jax.jit
    def fused_jit(rws, cls):
        return call(rws, cls, *gather(rws, cls))

    attempt("v5 gathers+pallas in one jit", lambda: fused_jit(rws, cls))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
