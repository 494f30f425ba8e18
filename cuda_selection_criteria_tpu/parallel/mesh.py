"""Device-mesh construction and the multi-chip sharded selection step.

The reference has no distributed layer at all (single process; OpenMP shared
memory + cudaMemcpy are its only "communication" - SURVEY.md section 2.3).
The TPU-native scaling design:

  * mesh axis "rows": pair-block data parallelism - each device owns a strip
    of the ascending-cardinality-sorted genome rows and compares it against
    the full column bank.
  * mesh axis "regs": contraction parallelism - the 2^14-register axis of
    the primary HLL bank is sharded; each device computes partial CDF
    matmuls over its register slice and the full histograms are assembled
    with a psum over "regs" (an ICI all-reduce, not a host gather).

Both axes compose in one shard_map; collectives are XLA-inserted psums.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import criteria, pairwise, estimators


def make_mesh(n_rows=None, n_regs=None, devices=None):
    """Build a ("rows", "regs") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_rows is None and n_regs is None:
        # Prefer splitting both axes when possible.
        n_regs = 2 if n % 2 == 0 and n > 1 else 1
        n_rows = n // n_regs
    elif n_rows is None:
        n_rows = n // n_regs
    elif n_regs is None:
        n_regs = n // n_rows
    if n_rows * n_regs != n:
        raise ValueError(f"mesh {n_rows}x{n_regs} != {n} devices")
    dev_array = np.array(devices).reshape(n_rows, n_regs)
    return Mesh(dev_array, axis_names=("rows", "regs"))


def sharded_smh_selection_step(mesh, p, n_rows_band, n_bands, precision="bf16"):
    """Build the jitted multi-chip CB+smh_a selection step.

    Array layout (N = padded genome count, R = 2^p, m = SMH buckets):
      regs_rows (N, R)  sharded P("rows", "regs")   - row strip x reg slice
      regs_cols (N, R)  sharded P(None,  "regs")    - full bank x reg slice
      aux       (N, m)  replicated                   - SMH buckets (small)
      e         (N,)    replicated                   - truncated cards, sorted
      idx       (N,)    sharded P("rows") / repl     - global sorted positions

    Returns hits (N, N) bool and jacc (N, N) f64, both sharded P("rows", None).
    """
    r_total = 1 << p

    def step(regs_rows, regs_cols, aux_rows, aux_cols, e_rows, e_cols,
             idx_rows, idx_cols, tau):
        # Partial CDF over the local register slice; full CDF via psum
        # over the "regs" mesh axis (rides ICI).
        cdf = pairwise.cdf_matmul(regs_rows, regs_cols, p, precision)
        cdf = jax.lax.psum(cdf, axis_name="regs")
        counts = pairwise.counts_from_cdf(cdf, r_total)
        t = estimators.ertl_mle(counts, p)

        e1 = jnp.trunc(e_rows)[:, None]
        e2 = jnp.trunc(e_cols)[None, :]
        jacc = (e1 + e2 - t) / t

        tri = (
            (idx_rows[:, None] < idx_cols[None, :])
            & (idx_rows[:, None] >= 0)
            & (idx_cols[None, :] >= 0)
        )
        gate = (
            tri
            & (e2 != 0)
            & ((e1 / e2) >= tau)
            & criteria.smh_a_mask(aux_rows, aux_cols, n_rows_band, n_bands)
        )
        hits = gate & (jacc >= tau)
        return hits, jacc

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P("rows", "regs"),  # regs_rows
            P(None, "regs"),  # regs_cols
            P("rows", None),  # aux_rows
            P(None, None),  # aux_cols
            P("rows"),  # e_rows
            P(None),  # e_cols
            P("rows"),  # idx_rows
            P(None),  # idx_cols
            P(),  # tau
        ),
        out_specs=(P("rows", None), P("rows", None)),
        check_vma=False,
    )
    return jax.jit(sharded)


def select_pairs_sharded(bank, params, mesh=None):
    """Multi-chip all-pairs selection (CB + smh_a criterion).

    Pads the sorted bank to the row-axis size, runs the sharded step, and
    extracts results host-side in reference order. Suitable when the full
    (N, N) mask fits in memory; the tiled engine handles larger N per chip.
    """

    if mesh is None:
        mesh = make_mesh()
    if bank.aux_kind != "smh":
        raise ValueError("sharded path currently implements the smh_a cascade")

    tau = params.tau_eff
    order = bank.sorted_by_cardinality()
    n = bank.n
    d_rows = mesh.shape["rows"]
    n_pad = -(-n // d_rows) * d_rows

    def pad(a, fill=0):
        if a.shape[0] == n_pad:
            return a
        width = [(0, n_pad - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, width, constant_values=fill)

    regs_s = pad(bank.regs[order])
    aux_s = pad(bank.aux[order])
    e_s = pad(np.trunc(bank.cards[order]))
    idx = pad(np.arange(n), fill=-1)

    tau_dev = tau - params.screen_margin if params.adjudicate else tau
    nrb, nbd = criteria.smh_band_params(bank.aux_param, params.tau)
    step = sharded_smh_selection_step(mesh, bank.p, nrb, nbd, params.precision)
    hits, jacc = step(
        regs_s, regs_s, aux_s, aux_s, e_s, e_s, idx, idx, jnp.float64(tau_dev)
    )
    hits = np.asarray(hits)
    jacc = np.asarray(jacc)
    ii, jj = np.nonzero(hits)
    triples = sorted(zip(ii.tolist(), jj.tolist()))
    names = bank.names
    if params.adjudicate:
        from ..utils.hostref import PairOracle

        oracle = PairOracle(
            bank.p, regs_s, e_s, aux=aux_s, aux_param=bank.aux_param,
            criterion="smh_a", tau=params.tau, z_score=params.z_score,
            order_n=params.order_n,
        )
        out = []
        for i, j in triples:
            selected, jacc_exact = oracle.evaluate(i, j)
            if selected:
                out.append((names[order[i]], names[order[j]], jacc_exact))
        return out
    return [
        (names[order[i]], names[order[j]], float(jacc[i, j])) for i, j in triples
    ]
