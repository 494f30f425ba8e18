"""Batched selection criteria: CB cardinality bound + auxiliary gates.

Re-implements the reference's pruning cascade (include/criteria_sketch.hpp)
as dense boolean masks over (Bi, Bj) pair blocks:

  * CB      - gamma = |A|/|B| >= tau               (criteria_sketch.hpp:45-49)
  * hll_a   - K+ bound from aux-HLL union          (criteria_sketch.hpp:36-43,60-64)
  * hll_an  - order-n corrected Jaccard bound      (criteria_sketch.hpp:22-34,52-58)
  * smh_a   - LSH banding over SuperMinHash h_     (criteria_sketch.hpp:66-81)

Mixed f32/f64 arithmetic mirrors the reference exactly: sigma() and the
Z-score are C floats, so Z*sigma is computed in f32 and then widened
(criteria_sketch.hpp uses `float Z` / `float sigma_p` inside double math).
Cardinalities are pre-truncated to integers by the caller (size_t semantics).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .estimators import ertl_mle, sigma
from .fpx import rounded
from .pairwise import union_histograms


def effective_tau(tau):
    """The threshold as the reference sees it: parsed with std::stof
    (f32) then promoted to double (src/selection.cpp:103)."""
    return np.float64(np.float32(tau))


def z_sigma(z_score, p):
    """f64(f32(Z) * f32(sigma(p))) - the reference's float product, widened."""
    return np.float64(np.float32(z_score) * sigma(p))


@jax.jit
def cb_mask(cards_a, cards_b, tau):
    """Cardinality-bound mask: gamma = e1/e2 >= tau (cards sorted: e1 <= e2)."""
    e1 = jnp.asarray(cards_a, jnp.float64)[:, None]
    e2 = jnp.asarray(cards_b, jnp.float64)[None, :]
    return (e1 / e2) >= tau


def smh_band_params(m, tau):
    """Band/row split: smallest divisor band count with P_r >= 0.95.

    Matches src/selection.cpp:258-267 including the float/double mixing in
    P_r and the fallback to (n_rows=1, n_bands=m) when no divisor reaches
    the target.
    """
    n_rows, n_bands = 1, 1
    tau32 = np.float32(tau)
    for band in range(1, m + 1):
        if m % band:
            continue
        n_bands, n_rows = band, m // band
        inner = np.power(tau32, np.float32(m) / np.float32(band))  # float pow
        p_r = 1.0 - np.power(np.float64(1.0) - np.float64(inner), np.float64(np.float32(band)))
        if p_r >= 0.95:
            break
    return n_rows, n_bands


@partial(jax.jit, static_argnames=("n_rows", "n_bands"))
def smh_a_mask(aux_a, aux_b, n_rows, n_bands):
    """LSH banding mask: any contiguous band of n_rows buckets fully equal.

    Args:
      aux_a: uint64 (Bi, m) SuperMinHash h_ rows.
      aux_b: uint64 (Bj, m) SuperMinHash h_ columns.
    """
    eq = aux_a[:, None, :] == aux_b[None, :, :]  # (Bi, Bj, m)
    eq = eq.reshape(eq.shape[0], eq.shape[1], n_bands, n_rows)
    return jnp.any(jnp.all(eq, axis=-1), axis=-1)


@partial(jax.jit, static_argnames=("p_aux", "precision", "mle_dtype"))
def hll_a_mask(aux_regs_a, aux_regs_b, cards_a, cards_b, tau, zs, p_aux,
               precision="bf16", mle_dtype=jnp.float64):
    """K+ bound gate (criteria_sketch.hpp:36-43,60-64) over a pair block.

    t_hat is size_t-truncated like the reference
    (`size_t t_hat = S_A->union_size(...)`, criteria_sketch.hpp:61).
    zs = z_sigma(Z, p_aux), precomputed f64.
    """
    counts = union_histograms(aux_regs_a, aux_regs_b, p_aux, precision)
    t_hat = jnp.trunc(ertl_mle(counts, p_aux, dtype=mle_dtype))
    e1 = jnp.asarray(cards_a, mle_dtype)[:, None]
    e2 = jnp.asarray(cards_b, mle_dtype)[None, :]
    gamma = e1 / e2
    t_hat_mas = t_hat / (1.0 + zs)
    k_mas = (rounded((1.0 + gamma) * e2) - t_hat_mas) / t_hat_mas
    return k_mas >= tau


@partial(jax.jit, static_argnames=("p_aux", "order_n", "precision", "mle_dtype"))
def hll_an_mask(aux_regs_a, aux_regs_b, cards_a, cards_b, tau, zs, p_aux,
                order_n=1, precision="bf16", mle_dtype=jnp.float64):
    """Order-n corrected Jaccard gate (criteria_sketch.hpp:22-34,52-58).

    t_hat stays f64 here (hll_an takes `double t_hat`, no truncation).
    """
    counts = union_histograms(aux_regs_a, aux_regs_b, p_aux, precision)
    t_hat = ertl_mle(counts, p_aux, dtype=mle_dtype)
    e1 = jnp.asarray(cards_a, mle_dtype)[:, None]
    e2 = jnp.asarray(cards_b, mle_dtype)[None, :]
    gamma = e1 / e2
    j_hat = (e1 + e2 - t_hat) / t_hat
    s = mle_dtype(0.0)
    num = mle_dtype(1.0)
    for _ in range(order_n):  # static unroll; num *= Z*sigma each step
        num = num * zs
        s = s + num
    minimo = jnp.minimum(1.0, (1.0 + zs) * e2 / t_hat)
    c = minimo * (1.0 + gamma) * s
    return (j_hat + rounded(c)) >= tau
