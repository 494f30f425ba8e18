"""Multi-host orchestration: jax.distributed + tile-slice ownership.

The reference is single-process (OpenMP shared memory is its only
"communication" - SURVEY.md section 2.3). The TPU-native scale-out story
has three independent levers, composable because the screen is
embarrassingly parallel over tiles:

  1. intra-host: tiles sharded over the local device mesh
     (parallel/screened.select_pairs_screened_sharded - XLA shard_map,
     zero collectives in the screen);
  2. inter-host (ICI slice or DCN): each process owns a contiguous slice
     of the live-tile list (deterministic given the shared cardinality
     sort), screens it on its local devices, and exact-confirms its own
     survivors; results are a disjoint union, merged by reference row
     order at the end;
  3. storage: row-sharded bank checkpoints (models/bank.SketchBank.save
     with shards=process_count) let each host read only its rows and
     all_gather the column strips it needs.

This module wires 2 (and the jax.distributed bootstrap); it is exercised
single-process in tests (process_count == 1 degenerates to the local
engine) - the same code path runs unchanged under
`jax.distributed.initialize` on real multi-host slices.
"""

import numpy as np
import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Bootstrap jax.distributed (no-op when already initialized or when
    running single-process)."""
    if jax.process_count() > 1:
        return  # runtime already initialized (TPU pod auto-bootstrap)
    if coordinator_address is None:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def tile_slice(n_tiles, process_index=None, process_count=None):
    """Contiguous [lo, hi) slice of the live-tile list owned by a process.

    Deterministic given the (shared) ascending-cardinality sort, so every
    process computes the same global schedule and takes its own rows -
    no coordination traffic at all.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    bounds = np.linspace(0, n_tiles, process_count + 1, dtype=np.int64)
    return int(bounds[process_index]), int(bounds[process_index + 1])


def select_pairs_multihost(bank, params, ti=512, chunk=64):
    """Per-process shard of the screened all-pairs selection.

    Every process runs the identical schedule computation (sort + live
    tiles) and screens only its tile slice; the returned lists are
    disjoint across processes and their concatenation, sorted by the
    global row order, equals the single-host result (verified in
    tests/test_multichip.py by emulating the processes serially).
    """
    from . import scheduler, screened
    from ..ops import criteria, screen as screen_ops
    from ..utils.hostref import PairOracle
    import jax.numpy as jnp

    crit = params.criterion
    n = bank.n
    if n < 2:
        return []
    tau = params.tau_eff
    use_cb = crit not in ("baseline", "smh_only")
    use_smh = crit in ("smh_a", "smh_only")

    order = bank.sorted_by_cardinality()
    e_s = np.trunc(bank.cards[order])
    regs_s = bank.regs[order]
    aux_s = bank.aux[order] if bank.aux is not None else None

    n_pad = -(-n // ti) * ti
    regs_p = np.zeros((n_pad, regs_s.shape[1]), np.uint8)
    regs_p[:n] = regs_s
    e_p = np.zeros(n_pad, e_s.dtype)
    e_p[:n] = e_s

    tiles = scheduler.triangle_blocks(e_p[:n], tau, ti, use_cb_skip=use_cb)
    lo, hi = tile_slice(len(tiles))
    tiles = tiles[lo:hi]
    if not tiles:
        return []
    rows = np.array([r0 // ti for (r0, _), _ in tiles], np.int32)
    cols = np.array([c0 // ti for _, (c0, _) in tiles], np.int32)

    if use_smh:
        nrb, n_bands = criteria.smh_band_params(bank.aux_param, params.tau)
        aux_p = np.zeros((n_pad, aux_s.shape[1]), aux_s.dtype)
        aux_p[:n] = aux_s
        d_fp = screened.band_fingerprints(jnp.asarray(aux_p), nrb, n_bands)
    else:
        n_bands = 1
        d_fp = jnp.zeros((n_pad, 1), jnp.int32)

    values = screen_ops.bank_values(regs_s)
    tau_scr = np.float32(screened.screen_tau(tau, params.screen_delta))
    tau_cb = np.float32(tau * (1.0 - 1e-5))
    d_regs = jnp.asarray(regs_p)
    d_e = jnp.asarray(e_p.astype(np.float32))

    n_live = len(rows)
    chunk = min(chunk, n_live)
    n_sched = -(-n_live // chunk) * chunk
    rows = np.pad(rows, (0, n_sched - n_live), constant_values=rows[-1])
    cols = np.pad(cols, (0, n_sched - n_live), constant_values=cols[-1])

    pending = []
    for c0 in range(0, n_sched, chunk):
        r_chunk = rows[c0:c0 + chunk]
        c_chunk = cols[c0:c0 + chunk]
        hits, cnt = screened._screen_chunk(
            d_regs, jnp.asarray(r_chunk), jnp.asarray(c_chunk), d_e, d_fp,
            jnp.int32(n), tau_scr, tau_cb, bank.p, values, ti,
            n_bands, use_cb, use_smh,
        )
        pending.append((r_chunk, c_chunk, hits, cnt))

    counts = np.asarray(jnp.stack([c for _, _, _, c in pending]))
    cand = []
    for (r_chunk, c_chunk, hits, _), cnt in zip(pending, counts):
        if not cnt:
            continue
        tt, ri, cj = np.nonzero(np.asarray(hits))
        cand.extend(zip((r_chunk[tt] * ti + ri).tolist(),
                        (c_chunk[tt] * ti + cj).tolist()))

    cand = sorted(set(cand))
    oracle = PairOracle(
        bank.p, regs_s, e_s, aux=aux_s, aux_param=bank.aux_param,
        criterion=crit, tau=params.tau, z_score=params.z_score,
        order_n=params.order_n, apply_cb=use_cb,
    )
    names = bank.names
    # Keys (i, j) are global sorted positions: concatenating shards and
    # sorting on them reproduces the single-host row order exactly.
    return [
        (i, j, names[order[i]], names[order[j]], jacc)
        for i, j, jacc in oracle.confirm_pairs(cand)
    ]


def merge_multihost_results(shards):
    """Merge per-process result shards into the reference row order."""
    merged = sorted({t for shard in shards for t in shard})
    return [(a, b, j) for _, _, a, b, j in merged]
