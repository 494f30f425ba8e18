"""Batched SuperMinHash bucket construction (order-independent reformulation).

The reference's SuperMinHash (Ertl) processes items sequentially with a
data-dependent early-exit loop (reference: sketch/include/sketch/bbmh.h:639-670):
for item `x` it seeds WyRand with `x`, then for j = 0..a_ draws
(k_j, r_j), maintains a lazily-reset Fisher-Yates permutation p via
swap(p[k_j], p[j]), and min-updates h[p[j]] with the candidate
(j << 32) | r_j. The bound a_ (tracked via the b_ histogram) only skips
candidates that provably cannot win:

    a_ = max_b min(m-1, h[b] >> 32), so j > a_  =>  for every bucket b,
    j > h[b] >> 32  =>  (j << 32 | r) > h[b]  =>  no update.

Therefore the final sketch is exactly

    h[b] = min over items x and j in [0, m) with sigma_x(j) = b
               of (j << 32) | r_j(x)

where sigma_x is the Fisher-Yates permutation prefix of item x - a pure
min-reduce over independent per-item candidates. Items commute, batches
merge by element-wise min, and the whole build parallelizes with zero
sequential state. Bit-exactness vs. the reference is proven in
tests/test_smh.py against the committed .smh4/.smh64 files.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .hashes import wyrand_draws

U64_MAX = jnp.uint64(0xFFFFFFFFFFFFFFFF)


@partial(jax.jit, static_argnames=("m",))
def smh_candidates(kmers, valid, m):
    """Per-item SuperMinHash candidates and their target buckets.

    Args:
      kmers: uint64 (T,) canonical k-mers (the WyRand seeds; seed 0 -> 1337).
      valid: bool (T,) mask; invalid items yield candidates of U64_MAX.
      m: static bucket count (power of two; SizePow2Policy semantics).

    Returns:
      (buckets, cands): int32 (T, m) bucket index sigma_x(j), and
      uint64 (T, m) candidate values (j << 32) | r_j.
    """
    t = kmers.shape[0]
    mask = jnp.uint64(m - 1)
    draws = wyrand_draws(kmers, m)  # (T, m); one 64-bit draw per j
    # gen() call order per j: low 32 bits -> k, high 32 bits -> r
    # (reference: sketch/include/aesctr/wy.h:133-142, bbmh.h:650,657).
    k = (draws & mask).astype(jnp.int32)  # mod is "& (m-1)" (policy.h:21-23)
    r = draws >> 32

    # Fisher-Yates prefix, vectorized across items: p starts as identity
    # (the reference's lazy q_/i_ reset makes p fresh per item). The j loop
    # is a lax.fori_loop so the trace stays O(1) in m - a Python unroll at
    # m=512 costs minutes of TPU compile time for identical math.
    perm0 = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (t, m))
    iota = jnp.arange(m, dtype=jnp.int32)
    buckets0 = jnp.zeros((t, m), jnp.int32)

    def body(j, carry):
        perm, buckets = carry
        kj = jax.lax.dynamic_index_in_dim(k, j, axis=1, keepdims=False)
        vj = jax.lax.dynamic_index_in_dim(perm, j, axis=1, keepdims=False)
        vk = jnp.take_along_axis(perm, kj[:, None], axis=1)[:, 0]
        # swap(p[k], p[j]): p[j] <- old p[k]; p[k] <- old p[j].
        perm = jax.lax.dynamic_update_slice_in_dim(
            perm, vk[:, None], j, axis=1
        )
        perm = jnp.where(iota[None, :] == kj[:, None], vj[:, None], perm)
        # after the swap, the candidate goes to bucket p[j] == vk
        # (when kj == j the second write restores vj == vk, consistent).
        bj = jnp.where(kj == j, vj, vk)
        buckets = jax.lax.dynamic_update_slice_in_dim(
            buckets, bj[:, None], j, axis=1
        )
        return perm, buckets

    _, buckets = jax.lax.fori_loop(0, m, body, (perm0, buckets0))

    j64 = jnp.arange(m, dtype=jnp.uint64) << 32
    cands = jnp.where(valid[:, None], j64[None, :] | r, U64_MAX)
    return buckets, cands


@partial(jax.jit, static_argnames=("m", "n_genomes"))
def smh_build_batch(kmers, valid, genome_ids, m, n_genomes):
    """Build SuperMinHash h_ vectors for a batch of genomes in one reduce.

    Returns uint64 (n_genomes, m); empty buckets remain U64_MAX, matching the
    reference's h_ initialization (bbmh.h:567).
    """
    buckets, cands = smh_candidates(kmers, valid, m)
    seg = genome_ids[:, None] * m + buckets  # (T, m)
    h = jax.ops.segment_min(
        cands.reshape(-1),
        seg.reshape(-1).astype(jnp.int32),
        num_segments=n_genomes * m,
    )
    return h.reshape(n_genomes, m)


def smh_merge_min(h_a, h_b):
    """Element-wise min merge: combining batches == one sequential build."""
    return jnp.minimum(h_a, h_b)


@partial(jax.jit, static_argnames=("m",))
def smh_update(h, kmers, valid, m):
    """Fold a new k-mer batch into an existing single-genome h_ vector."""
    batch = smh_build_batch(kmers, valid, jnp.zeros(kmers.shape, jnp.int32), m, 1)[0]
    return jnp.minimum(h, batch)
