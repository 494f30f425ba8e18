"""Fused MXU screening kernel: harmonic sums of pairwise HLL unions.

The exact confirm path (ops/pairwise.py) computes a full 52-bin union
histogram plus the iterative ERTL-MLE per pair. For *screening* the
N^2 pair space that is overkill: the Flajolet ORIGINAL estimator
(reference: include/criteria_sketch_cuda.cuh:30-65 - the estimator the
reference's own CUDA kernels use for every pair) needs only two scalars
per pair:

    S[i,j] = sum_r 2^-max(a_ir, b_jr)      (the harmonic sum)
    Z[i,j] = #{r : max(a_ir, b_jr) == 0}   (the zero-register count)

Both reduce to matrix products over 0/1 indicators. With
CDF[v] = sum_r [a_ir <= v][b_jr <= v] and vmax an upper bound on every
register value (so CDF[vmax] == R), the dyadic telescope

    2^-x = 2^-vmax + sum_{v=x}^{vmax-1} 2^-(v+1)        (x <= vmax)

gives

    S = R * 2^-vmax + sum_{v=0}^{vmax-1} 2^-(v+1) * CDF[v],
    Z = CDF[0].

This Pallas kernel generates the indicator matrices on the fly in VMEM
(the register bank is read from HBM exactly once per tile) and
accumulates the weighted matmuls on the MXU - ~2*vmax*2^p bf16 flops
per pair and no intermediate materialization. The selection engine
screens with a conservative relative margin delta (ORIGINAL vs ERTL-MLE
deviation, measured in tests/test_screen.py) and re-confirms survivors
with the exact estimator, so emitted pairs are bit-identical to the
reference.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default():
    return jax.default_backend() != "tpu"


def v_bins_for(regs_max):
    """Static bin-count bucket covering register values <= regs_max.

    Rounded up to a multiple of 4 to bound recompiles; 51 == q+1 at p=14
    is the absolute ceiling for any input.
    """
    return int(min(51, max(8, -(-int(regs_max + 1) // 4) * 4)))


def v_lo_for(regs_min):
    """Static low-bin bucket: CDF[v] == 0 for v < the bank-wide minimum
    register value, so those matmuls are skipped (large genomes saturate
    every register past 0). Rounded down to a multiple of 4."""
    return int(max(0, (int(regs_min) // 4) * 4))


def _weighted_cdf_sum(regs, row_tiles, col_tiles, p, weights, ti, tj,
                      r_sub, precision, interpret, emit_z0=False):
    """One fused Pallas pass: out[t,i,j] = sum_v w_v * CDF_v for the given
    static {v: w_v} weight map, over a list of (row, col) tiles; with
    emit_z0, a second output captures CDF_0 (the zero-register count) in
    the same pass.

    Indicators are generated on the fly in VMEM (the register bank leaves
    HBM once per tile) as int32 compares (v5e Mosaic supports neither
    8-bit nor bf16 vector compares); the per-bin weights apply OUTSIDE the
    matmul, so the MXU runs at int8 rate with exact int32 accumulation,
    and accumulation goes straight into the VMEM-resident output blocks -
    no scratch, which is what lets 1024x1024 single-output tiles fit the
    16 MB VMEM budget.
    """
    r_total = 1 << p
    r_sub = min(r_sub, r_total)
    n_r = r_total // r_sub
    n_tiles = row_tiles.shape[0]
    items = sorted(weights.items())

    def kernel(row_ref, col_ref, a_ref, b_ref, s_ref, *maybe_z):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            s_ref[:] = jnp.zeros_like(s_ref)
            if emit_z0:
                maybe_z[0][:] = jnp.zeros_like(maybe_z[0])

        a = a_ref[:].astype(jnp.int32)  # (ti, r_sub)
        b = b_ref[:].astype(jnp.int32)
        for v, w in items:
            if precision == "int8":
                ia = (a <= v).astype(jnp.int8)
                ib = (b <= v).astype(jnp.int8)
                acc_dt = jnp.int32
            else:
                ia = (a <= v).astype(jnp.float32).astype(jnp.bfloat16)
                ib = (b <= v).astype(jnp.float32).astype(jnp.bfloat16)
                acc_dt = jnp.float32
            d = jax.lax.dot_general(
                ia, ib, (((1,), (1,)), ((), ())),
                preferred_element_type=acc_dt,
            ).astype(jnp.float32)
            s_ref[:] += np.float32(w) * d
            if v == 0 and emit_z0:
                maybe_z[0][:] += d

    out_spec = pl.BlockSpec(
        (1, ti, tj),
        lambda t, r, rows, cols: (t, jnp.int32(0), jnp.int32(0)),
    )
    out_shape = jax.ShapeDtypeStruct((n_tiles, ti, tj), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles, n_r),
        in_specs=[
            pl.BlockSpec(
                (ti, r_sub),
                lambda t, r, rows, cols: (rows[t].astype(jnp.int32), r),
            ),
            pl.BlockSpec(
                (tj, r_sub),
                lambda t, r, rows, cols: (cols[t].astype(jnp.int32), r),
            ),
        ],
        out_specs=[out_spec, out_spec] if emit_z0 else [out_spec],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out_shape, out_shape] if emit_z0 else [out_shape],
        interpret=interpret,
    )(row_tiles, col_tiles, regs, regs)
    return out if emit_z0 else out[0]


@partial(jax.jit, static_argnames=("p", "v_bins", "v_lo", "ti", "tj",
                                   "r_sub", "precision", "interpret"))
def screen_s_z(regs, row_tiles, col_tiles, p, v_bins, v_lo=0, ti=512,
               tj=512, r_sub=None, precision="int8", interpret=None):
    """Pairwise harmonic sums / zero counts for a list of (row, col) tiles.

    Args:
      regs: uint8 (N, 2^p) register bank; N must be a multiple of ti and tj,
        and every register value must be <= v_bins (engine guarantees by
        picking v_bins from the bank max).
      row_tiles: int32 (T,) row-block index per tile (units of ti rows).
      col_tiles: int32 (T,) col-block index per tile (units of tj rows).
      p: static HLL precision.
      v_bins: static vmax (weighted CDF matmuls run for v in [v_lo, v_bins)).
      v_lo: static bank-wide minimum register value (bins below it have
        CDF == 0; with v_lo > 0 the union has no zero registers and the Z
        output is omitted entirely).

    Returns:
      (S, Z): float32 (T, ti, tj) harmonic sums and zero-register counts;
      Z is None when v_lo > 0 (it would be identically zero). Z is a
      separate single-bin pass (1/(v_bins - v_lo) of the S work) so the
      main kernel stays single-output.
    """
    if interpret is None:
        interpret = _interpret_default()
    if r_sub is None:
        # Keep (in-blocks + widened operands + one f32 output block) x
        # double-buffering inside the 16 MB VMEM budget at every tile size.
        r_sub = max(256, (1 << 18) // max(ti, tj))
    tail = np.float32(np.ldexp(float(1 << p), -v_bins))
    s_weights = {v: np.ldexp(1.0, -(v + 1)) for v in range(v_lo, v_bins)}
    if v_lo > 0:
        s = _weighted_cdf_sum(regs, row_tiles, col_tiles, p, s_weights, ti,
                              tj, r_sub, precision, interpret)
        return s + tail, None
    if ti * tj <= 512 * 512:
        # Both outputs fit VMEM: capture Z in the same pass (one read of
        # the register bank).
        s, z = _weighted_cdf_sum(regs, row_tiles, col_tiles, p, s_weights,
                                 ti, tj, r_sub, precision, interpret,
                                 emit_z0=True)
        return s + tail, z
    # Large tiles: single-output passes (S, then the 1-bin Z pass).
    s = _weighted_cdf_sum(regs, row_tiles, col_tiles, p, s_weights, ti, tj,
                          r_sub, precision, interpret)
    z = _weighted_cdf_sum(regs, row_tiles, col_tiles, p, {0: 1.0}, ti, tj,
                          r_sub, precision, interpret)
    return s + tail, z


def original_from_s_z(s, z, p):
    """Flajolet ORIGINAL union-cardinality estimate from (S, Z), f32.

    Elementwise twin of estimators.original_estimate
    (reference: include/criteria_sketch_cuda.cuh:30-65) for the screen path.
    z=None means "no zero registers anywhere" (the v_lo > 0 fast path).
    """
    from .estimators import make_alpha

    m = 1 << p
    alpha = np.float32(make_alpha(m))
    raw = alpha * np.float32(m) * np.float32(m) / s
    two32 = np.float32(2.0**32)
    large = -two32 * jnp.log1p(-raw / two32)
    out = jnp.where(raw > two32 / 30.0, large, raw)
    if z is None:
        return out
    lin = np.float32(m) * jnp.log(np.float32(m) / jnp.maximum(z, 1.0))
    return jnp.where((raw < 2.5 * m) & (z > 0), lin, out)
