"""merge_pool vs merge_pool_fast equivalence (the sort-free fast path)."""

import jax.numpy as jnp
import numpy as np

from vector_store_tpu.core.topk import SENTINEL, merge_pool, merge_pool_fast


def _as_sets(d, i, e):
    """Pool contents as {id: (dist, expanded)} ignoring order/sentinels."""
    out = {}
    for dd, ii, ee in zip(np.asarray(d)[0], np.asarray(i)[0], np.asarray(e)[0]):
        if ii != SENTINEL and np.isfinite(dd):
            out[int(ii)] = (round(float(dd), 5), bool(ee))
    return out


def test_fast_merge_matches_sort_merge(rng):
    for trial in range(20):
        P, C = 16, 24
        pool_ids_np = rng.choice(1000, size=P, replace=False).astype(np.int32)
        pool_d_np = np.sort(rng.random(P).astype(np.float32))
        pool_e_np = rng.random(P) < 0.5
        # new block: mix of fresh ids, pool duplicates, internal duplicates
        new_ids_np = np.concatenate(
            [
                rng.choice(1000, size=C - 8).astype(np.int32),
                rng.choice(pool_ids_np, size=4),
                np.full(4, 77, dtype=np.int32),
            ]
        )
        new_d_np = rng.random(C).astype(np.float32)
        # duplicate ids must carry the same distance (true in search: the
        # distance to a node is well-defined)
        canon = {int(ii): dd for ii, dd in zip(pool_ids_np, pool_d_np)}
        for j, ii in enumerate(new_ids_np):
            new_d_np[j] = canon.setdefault(int(ii), new_d_np[j])

        args = (
            jnp.asarray(pool_d_np)[None],
            jnp.asarray(pool_ids_np)[None],
            jnp.asarray(pool_e_np)[None],
            jnp.asarray(new_d_np)[None],
            jnp.asarray(new_ids_np)[None],
        )
        slow = _as_sets(*merge_pool(*args))
        fast = _as_sets(*merge_pool_fast(*args))
        assert slow == fast, f"trial {trial}: {slow} != {fast}"
