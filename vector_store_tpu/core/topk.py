"""Top-k selection and sorted-pool merge primitives.

The beam-search pool (the `ef` candidate list of HNSW, reference:
src/lib.rs:182-200 expansion params) is kept as fixed-shape, distance-sorted
arrays `(dist[Q,P], ids[Q,P], flags[Q,P])`.  Merging a batch of new
candidates into the pool is a sort-based kernel: concatenate, dedup by id,
and keep the best P — all static shapes, no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INF = jnp.float32(jnp.inf)
SENTINEL = jnp.int32(2**31 - 1)  # "no node" id; sorts after all real ids


def topk_ascending(dist: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Smallest-k along the last axis → (dist[..., k], idx[..., k]) sorted."""
    neg, idx = jax.lax.top_k(-dist, k)
    return -neg, idx


def dedup_by_id(
    dist: jnp.ndarray,  # [..., C]
    ids: jnp.ndarray,  # [..., C] int32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mask duplicate ids (keep the first-best copy) by sorting on id.

    Returns (dist, ids) with duplicates replaced by (+inf, SENTINEL).
    Shapes are preserved; order is sorted by id on return.
    """
    # Sort by (id, dist) so the best copy of each id comes first.
    ids_s, dist_s = jax.lax.sort((ids, dist), num_keys=2)
    dup = jnp.concatenate(
        [jnp.zeros_like(ids_s[..., :1], dtype=bool), ids_s[..., 1:] == ids_s[..., :-1]],
        axis=-1,
    )
    dist_s = jnp.where(dup, INF, dist_s)
    ids_s = jnp.where(dup, SENTINEL, ids_s)
    return dist_s, ids_s


def merge_pool(
    pool_dist: jnp.ndarray,  # [Q, P] ascending
    pool_ids: jnp.ndarray,  # [Q, P]
    pool_expanded: jnp.ndarray,  # [Q, P] bool
    new_dist: jnp.ndarray,  # [Q, C]
    new_ids: jnp.ndarray,  # [Q, C]
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Merge new candidates into the beam pool, dedup'd by id, best-P kept.

    Expanded flags survive the merge: a pool entry that was already expanded
    keeps its flag; new entries arrive unexpanded.  When the same id appears
    both in the pool and among the new candidates, the pool copy (with its
    flag) wins — its distance is identical, and keeping it preserves the
    expanded bit, which is what makes the visited-set work without a hash
    table (reference's C++ usearch keeps an explicit visited bitset; here
    membership-in-pool *is* the visited set).
    """
    P = pool_dist.shape[-1]
    all_dist = jnp.concatenate([pool_dist, new_dist], axis=-1)
    all_ids = jnp.concatenate([pool_ids, new_ids], axis=-1)
    all_exp = jnp.concatenate(
        [pool_expanded, jnp.zeros_like(new_dist, dtype=bool)], axis=-1
    )

    # Sort by (id, expanded-first) so the pool copy of a duplicate id is kept:
    # expanded sorts before unexpanded via the negated flag as secondary key.
    ids_s, exp_neg, dist_s = jax.lax.sort(
        (all_ids, (~all_exp).astype(jnp.int32), all_dist), num_keys=2
    )
    exp_s = exp_neg == 0
    dup = jnp.concatenate(
        [jnp.zeros_like(ids_s[..., :1], dtype=bool), ids_s[..., 1:] == ids_s[..., :-1]],
        axis=-1,
    )
    dist_s = jnp.where(dup, INF, dist_s)
    ids_s = jnp.where(dup, SENTINEL, ids_s)
    exp_s = jnp.where(dup, False, exp_s)

    # Best P by distance.
    top_d, pos = topk_ascending(dist_s, P)
    top_i = jnp.take_along_axis(ids_s, pos, axis=-1)
    top_e = jnp.take_along_axis(exp_s, pos, axis=-1)
    return top_d, top_i, top_e
