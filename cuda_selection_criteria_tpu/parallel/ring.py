"""Ring-rotated row-sharded screened engine: banks beyond replication.

The tile-sharded engine (parallel/screened.select_pairs_screened_sharded)
replicates the register bank on every device - the right trade up to
~500k genomes (16 KiB/genome vs ~16 GB HBM). Past that, the bank itself
must be sharded. This engine is the systolic answer:

  * each device owns a contiguous STRIP of the ascending-cardinality-
    sorted bank: registers (N/D, R), cardinalities, LSH fingerprints -
    P("rows") sharding, nothing replicated;
  * a copy of the strip circulates around the ring: at step s, device d
    screens (resident strip d) x (circulating strip (d - s) mod D) with
    the same fused Pallas kernel (ops/screen.screen_s_z with a separate
    column bank), then passes the circulating strip to device (d+1) via
    jax.lax.ppermute - a neighbor-only ICI transfer that overlaps with
    the next step's matmuls under XLA's scheduler;
  * after D steps every ordered strip pair has been screened exactly
    once on exactly one device; the global i<j triangle mask keeps each
    genome pair exactly once.

Per-device HBM is O(2 * N/D * 2^p) instead of O(N * 2^p): a v5e-256 pod
holds ~128M genomes at p=14. Comms per full sweep: each device sends its
strip D times = N * 16 KiB total per device, fully pipelined on ICI.

The screen math, margins, and the exact host confirmation are shared
with the other engines (conservative superset screen -> PairOracle), so
output stays bit-identical to the reference. Every criterion is
supported: for hll_a/hll_an the aux-HLL registers circulate as a second
(tiny) strip and the conservative aux-union gate runs per step.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import criteria, screen
from ..utils.hostref import PairOracle
from .screened import band_fingerprints, screen_tau


def make_ring_screen_step(mesh, p, values, ti, strip, n_bands, use_cb,
                          use_smh, aux=None):
    """Jitted D-step ring sweep over a ("rows",) mesh.

    Inputs (shard_map specs):
      regs  (N, R)  P("rows")   - resident row strips
      aux_regs (N, 2^p_aux) P("rows") - only for the hll-aux criteria
      e     (N,)    P("rows")
      fp    (N, B)  P("rows")
      base  (D,)    P("rows")   - global start index of each strip
      n_real, tau_scr, tau_cb, [coef_aux] - replicated scalars

    aux: None, or (p_aux, values_aux) - adds a second circulating strip
    (the aux-HLL registers, ~1% of the primary bytes) and the
    conservative aux-union gate of hll_a/hll_an.

    Returns, both P("rows")-sharded over the leading axis:
      hits   (D * T, ti, ti) bool  - T = (strip/ti)^2 tiles per step,
              laid out [step s][row_tile a][col_tile b]
      counts (D * T,) int32        - per-tile hit counts (counts-first)
    """
    from jax.sharding import PartitionSpec as P

    nt = strip // ti
    t_per_step = nt * nt
    rt = jnp.asarray(np.repeat(np.arange(nt, dtype=np.int32), nt))
    ct = jnp.asarray(np.tile(np.arange(nt, dtype=np.int32), nt))
    n_dev = mesh.shape["rows"]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    p_aux, values_aux = aux if aux is not None else (None, None)

    def step(regs_mine, aux_mine, e_mine, fp_mine, base_mine, n_real,
             tau_scr, tau_cb, coef_aux):
        base_mine = base_mine[0]

        def body(s, carry):
            (col_regs, col_aux, col_e, col_fp, col_base, hits,
             counts) = carry
            ss, zz = screen.screen_s_z(
                regs_mine, rt, ct, p, values, ti=ti, tj=ti,
                regs_cols=col_regs,
            )
            h = _ring_post(
                ss, zz, e_mine, col_e, fp_mine, col_fp, base_mine,
                col_base, n_real, tau_scr, tau_cb, p, n_bands, ti, nt,
                use_cb, use_smh,
            )
            if aux is not None:
                s_a, z_a = screen.screen_s_z(
                    aux_mine, rt, ct, p_aux, values_aux, ti=ti, tj=ti,
                    regs_cols=col_aux,
                )
                h &= _ring_aux_pass(s_a, z_a, e_mine, col_e, coef_aux,
                                    p_aux, ti, nt)
            hits = jax.lax.dynamic_update_slice(
                hits, h, (s * t_per_step, 0, 0))
            counts = jax.lax.dynamic_update_slice(
                counts, jnp.sum(h, axis=(1, 2), dtype=jnp.int32),
                (s * t_per_step,))
            # Rotate the circulating strips one hop around the ring (ICI
            # neighbor transfer; overlaps the next step's kernel).
            col_regs = jax.lax.ppermute(col_regs, "rows", perm)
            if aux is not None:
                col_aux = jax.lax.ppermute(col_aux, "rows", perm)
            col_e = jax.lax.ppermute(col_e, "rows", perm)
            col_fp = jax.lax.ppermute(col_fp, "rows", perm)
            col_base = jax.lax.ppermute(col_base, "rows", perm)
            return (col_regs, col_aux, col_e, col_fp, col_base, hits,
                    counts)

        hits0 = jnp.zeros((n_dev * t_per_step, ti, ti), bool)
        counts0 = jnp.zeros(n_dev * t_per_step, jnp.int32)
        _, _, _, _, _, hits, counts = jax.lax.fori_loop(
            0, n_dev, body,
            (regs_mine, aux_mine, e_mine, fp_mine, base_mine[None],
             hits0, counts0),
        )
        return hits, counts

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P("rows", None),  # regs strips
            P("rows", None),  # aux strips (dummy when aux is None)
            P("rows"),  # e
            P("rows", None),  # fp
            P("rows"),  # base
            P(),  # n_real
            P(),  # tau_scr
            P(),  # tau_cb
            P(),  # coef_aux
        ),
        out_specs=(P("rows"), P("rows")),
        check_vma=False,
    )
    return jax.jit(sharded)


@partial(jax.jit, static_argnames=("p_aux", "ti", "nt"))
def _ring_aux_pass(s_a, z_a, e_rows, e_cols, coef_aux, p_aux, ti, nt):
    """Strip-pair variant of the hll-aux union gate
    (screened._screen_chunk_hllaux): conservative threshold
    t_aux <= coef*(e1+e2) + slack, division-free / separable."""
    from ..ops.estimators import make_alpha
    from .screened import SCREEN_DELTA_AUX

    m_a = 1 << p_aux
    alpha_a = np.float32(make_alpha(m_a))
    rl = (jnp.repeat(jnp.arange(nt, dtype=jnp.int32), nt)[:, None] * ti
          + jnp.arange(ti, dtype=jnp.int32)[None, :])
    cl = (jnp.tile(jnp.arange(nt, dtype=jnp.int32), nt)[:, None] * ti
          + jnp.arange(ti, dtype=jnp.int32)[None, :])
    e_a = e_rows[rl]
    e_b = e_cols[cl]
    e_sum = e_a[:, :, None] + e_b[:, None, :]
    c32 = coef_aux.astype(jnp.float32)
    slack = np.float32(1.0 + SCREEN_DELTA_AUX)
    aux_pass = (s_a * (e_sum * c32 + slack)
                >= alpha_a * np.float32(m_a) * np.float32(m_a))
    if z_a is not None:
        v_i = jnp.exp(-c32 * e_a / m_a)
        v_j = jnp.exp(-c32 * e_b / m_a)
        v_slack = np.float32(np.exp(-float(slack) / m_a))
        aux_pass |= (z_a > 0) & (
            z_a >= m_a * v_slack * v_i[:, :, None] * v_j[:, None, :]
        )
    return aux_pass


@partial(jax.jit, static_argnames=("p", "n_bands", "ti", "nt", "use_cb",
                                   "use_smh"))
def _ring_post(s, z, e_rows, e_cols, fp_rows, fp_cols, row_base, col_base,
               n_real, tau_scr, tau_cb, p, n_bands, ti, nt, use_cb,
               use_smh):
    """Strip-pair variant of screened._screen_post: identical gate and
    ORIGINAL-estimator screen math, but rows/cols come from two different
    strips with global offsets (row_base / col_base) for the triangle and
    real-row masks. Same conservative-superset contract."""
    from .. import ops

    m = 1 << p
    alpha = np.float32(ops.estimators.make_alpha(m))
    one_tau = np.float32(1.0) + tau_scr.astype(jnp.float32)
    col_base = col_base[0]

    # (T, ti) row/col LOCAL indices per tile, T = nt*nt row-major.
    rl = (jnp.repeat(jnp.arange(nt, dtype=jnp.int32), nt)[:, None] * ti
          + jnp.arange(ti, dtype=jnp.int32)[None, :])
    cl = (jnp.tile(jnp.arange(nt, dtype=jnp.int32), nt)[:, None] * ti
          + jnp.arange(ti, dtype=jnp.int32)[None, :])
    gi = row_base + rl  # global row index
    gj = col_base + cl
    e_a = e_rows[rl]
    e_b = e_cols[cl]
    u_a = jnp.exp(-e_a / (one_tau * m))
    u_b = jnp.exp(-e_b / (one_tau * m))

    e_sum = e_a[:, :, None] + e_b[:, None, :]
    hits = s * e_sum >= alpha * np.float32(m) * np.float32(m) * one_tau
    if z is not None:
        hits |= (z > 0) & (z >= m * u_a[:, :, None] * u_b[:, None, :])

    hits &= (gi[:, :, None] < gj[:, None, :]) & (gj[:, None, :] < n_real)
    hits &= e_b[:, None, :] > 0
    if use_cb:
        hits &= e_a[:, :, None] >= tau_cb * e_b[:, None, :]
    if use_smh:
        fa = fp_rows[rl]
        fb = fp_cols[cl]
        band_hit = fa[:, :, None, 0] == fb[:, None, :, 0]
        for band in range(1, n_bands):
            band_hit |= fa[:, :, None, band] == fb[:, None, :, band]
        hits &= band_hit
    return hits


def select_pairs_ring(bank, params, mesh=None, ti=128):
    """All-pairs selection with the bank SHARDED across devices (ring
    systolic sweep). Same exact-output contract as the other engines;
    every criterion supported.
    """
    from jax.sharding import Mesh

    if mesh is None:
        devices = np.array(jax.devices())
        mesh = Mesh(devices.reshape(len(devices)), axis_names=("rows",))
    crit = params.criterion
    valid = ("smh_a", "smh_only", "cb", "baseline", "hll_a", "hll_an")
    if crit not in valid:
        raise ValueError(f"ring engine does not support criterion {crit!r}")
    n = bank.n
    if n < 2:
        return []
    n_dev = mesh.shape["rows"]

    tau = params.tau_eff
    use_cb = crit not in ("baseline", "smh_only")
    use_smh = crit in ("smh_a", "smh_only")
    use_hllaux = crit in ("hll_a", "hll_an")

    order = bank.sorted_by_cardinality()
    e_s = np.trunc(bank.cards[order])
    regs_s = bank.regs[order]
    aux_s = bank.aux[order] if bank.aux is not None else None

    # Pad to D * ti multiple so every strip is a whole number of tiles.
    quantum = n_dev * ti
    n_pad = -(-n // quantum) * quantum
    strip = n_pad // n_dev
    regs_p = np.zeros((n_pad, regs_s.shape[1]), np.uint8)
    regs_p[:n] = regs_s
    e_p = np.zeros(n_pad, np.float32)
    e_p[:n] = e_s

    if use_smh:
        n_rows_b, n_bands = criteria.smh_band_params(bank.aux_param,
                                                     params.tau)
        aux_p = np.zeros((n_pad, aux_s.shape[1]), aux_s.dtype)
        aux_p[:n] = aux_s
        fp = np.asarray(band_fingerprints(jnp.asarray(aux_p), n_rows_b,
                                          n_bands))
    else:
        n_bands = 1
        fp = np.zeros((n_pad, 1), np.int32)

    # hll-aux: the aux-HLL registers become a second circulating strip;
    # coef <= 0 disables the gate (screen stays a superset either way).
    from .screened import hll_aux_threshold_coef, SCREEN_DELTA_AUX

    aux_spec = None
    coef = 0.0
    aux_regs_p = np.zeros((n_pad, 8), np.uint8)  # dummy when unused
    if use_hllaux:
        zs = criteria.z_sigma(params.z_score, bank.aux_param)
        c = hll_aux_threshold_coef(crit, tau, zs, params.order_n)
        if c is not None:
            coef = c * (1.0 + SCREEN_DELTA_AUX)
            aux_regs_p = np.zeros((n_pad, aux_s.shape[1]), np.uint8)
            aux_regs_p[:n] = aux_s
            values_aux = screen.truncate_values(
                screen.bank_values(aux_s), float(e_s.max(initial=1.0)),
                bank.aux_param)
            aux_spec = (bank.aux_param, values_aux)

    values = screen.truncate_values(
        screen.bank_values(regs_s), float(e_s.max(initial=1.0)), bank.p)
    tau_scr = np.float32(screen_tau(tau, params.screen_delta))
    tau_cb = np.float32(tau * (1.0 - 1e-5))
    base = (np.arange(n_dev, dtype=np.int32) * strip)

    step = make_ring_screen_step(mesh, bank.p, values, ti, strip, n_bands,
                                 use_cb, use_smh, aux=aux_spec)
    hits, counts = step(
        jnp.asarray(regs_p), jnp.asarray(aux_regs_p), jnp.asarray(e_p),
        jnp.asarray(fp), jnp.asarray(base), jnp.int32(n),
        jnp.float32(tau_scr), jnp.float32(tau_cb), jnp.float32(coef),
    )

    # Counts-first fetch. hits rows are laid out, per device d, as
    # [step s][row_tile a][col_tile b]; the circulating strip at device d
    # step s originates from device (d - s) mod D.
    counts = np.asarray(counts)
    nt = strip // ti
    t_per_step = nt * nt
    dT = n_dev * t_per_step  # rows of `hits` owned by one device
    cand = []
    for t in np.nonzero(counts)[0]:
        d = int(t) // dT
        rem = int(t) % dT
        s_step = rem // t_per_step
        tile = rem % t_per_step
        a, b = divmod(tile, nt)
        src = (d - s_step) % n_dev
        ri, cj = np.nonzero(np.asarray(hits[t]))
        gi = d * strip + a * ti + ri
        gj = src * strip + b * ti + cj
        cand.extend(zip(gi.tolist(), gj.tolist()))
    cand = sorted(set(cand))

    oracle = PairOracle(
        bank.p, regs_s, e_s, aux=aux_s, aux_param=bank.aux_param,
        criterion=crit, tau=params.tau, z_score=params.z_score,
        order_n=params.order_n, apply_cb=use_cb,
    )
    names = bank.names
    return [
        (names[order[i]], names[order[j]], jacc)
        for i, j, jacc in oracle.confirm_pairs(cand)
    ]
