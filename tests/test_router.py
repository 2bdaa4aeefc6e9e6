"""Hierarchical (centroid) router tests — core/cluster.py + graph routing.

The router replaces the flat strided routing sample above ROUTE_MIN_ROWS
(the HNSW-upper-layers role, reference src/index/usearch.rs C++ internals).
These tests force small centroid counts so the mechanics run at test scale.
"""

import dataclasses

import numpy as np
import pytest

from vector_store_tpu.core import cluster
from vector_store_tpu.core.index import SlotIndex
from vector_store_tpu.core.topk import SENTINEL
from vector_store_tpu.types import IndexParams


def _clustered(n, d, seed=0, n_clusters=64):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    x = centers[rng.integers(0, n_clusters, n)] + 0.3 * rng.normal(
        size=(n, d)
    ).astype(np.float32)
    return x


def test_ring_assign_mechanics():
    import jax.numpy as jnp

    K, Bm = 4, 3
    members = jnp.full((K, Bm), SENTINEL, dtype=jnp.int32)
    m_cnt = jnp.zeros((K,), dtype=jnp.int32)
    # three rows to cluster 1 (one dead), one to cluster 3
    cids = jnp.asarray([1, 1, 3, 1], dtype=jnp.int32)
    slots = jnp.asarray([10, 11, 12, 13], dtype=jnp.int32)
    live = jnp.asarray([True, True, True, False])
    members, m_cnt = cluster.ring_assign(members, m_cnt, cids, slots, live)
    m = np.asarray(members)
    assert sorted(m[1][m[1] != int(SENTINEL)].tolist()) == [10, 11]
    assert 12 in m[3].tolist()
    assert np.asarray(m_cnt).tolist() == [0, 2, 0, 1]
    # ring wrap: overflow a cluster, newest entries survive
    cids = jnp.asarray([1, 1, 1, 1], dtype=jnp.int32)
    slots = jnp.asarray([20, 21, 22, 23], dtype=jnp.int32)
    live = jnp.ones((4,), dtype=bool)
    members, m_cnt = cluster.ring_assign(members, m_cnt, cids, slots, live)
    row = set(np.asarray(members)[1].tolist())
    assert int(m_cnt[1]) == 6
    assert len(row & {20, 21, 22, 23}) == Bm  # all slots now new-batch


@pytest.fixture(scope="module")
def routed_index():
    d = 32
    x = _clustered(20_000, d, seed=3)
    idx = SlotIndex(
        IndexParams(dimensions=d, space="cosine"),
        initial_capacity=1 << 15,
        insert_block=512,
    )
    idx.add(x)
    with idx._lock:
        idx._rebuild_router_locked(idx.frontier, k=256)
    return idx, x


@pytest.mark.slow
def test_router_recall_matches_flat(routed_index):
    idx, x = routed_index
    assert idx.cfg.route_k == 256
    rng = np.random.default_rng(7)
    qi = rng.choice(len(x), 128, replace=False)
    queries = x[qi] + 0.1 * rng.normal(size=(128, x.shape[1])).astype(np.float32)
    _, exact = idx.exact_search(queries, 10)

    _, ids = idx.search(queries, 10)
    rec_routed = np.mean(
        [len(set(ids[i]) & set(exact[i])) / 10 for i in range(len(queries))]
    )
    # flat baseline on the same graph
    flat_cfg = dataclasses.replace(idx.cfg, route_k=0)
    from vector_store_tpu.core import search as search_mod
    import jax.numpy as jnp

    _, fids = search_mod.search(idx.state, jnp.asarray(queries), flat_cfg, 10)
    fids = np.asarray(fids)
    rec_flat = np.mean(
        [len(set(fids[i]) & set(exact[i])) / 10 for i in range(len(queries))]
    )
    assert rec_routed >= 0.9
    assert rec_routed >= rec_flat - 0.03, (rec_routed, rec_flat)


@pytest.mark.slow
def test_router_incremental_insert(routed_index):
    idx, x = routed_index
    # a far-out new vector must become its own routed nearest neighbour:
    # insert-time ring assignment is what makes it reachable as an entry
    rng = np.random.default_rng(11)
    new = (10.0 + rng.random((4, x.shape[1]))).astype(np.float32)
    slots = idx.add(new)
    d, ids = idx.search(new, 1)
    assert (ids[:, 0] == slots).all()


@pytest.mark.slow
def test_router_survives_persist(tmp_path, routed_index):
    from vector_store_tpu.core import persist

    idx, x = routed_index
    path = str(tmp_path / "routed.npz")
    persist.save(path, idx)
    idx2, _ = persist.load(path)
    assert idx2.cfg.route_k == idx.cfg.route_k
    assert idx2.state.route_members.shape == idx.state.route_members.shape
    q = x[:16]
    _, a = idx.search(q, 5)
    _, b = idx2.search(q, 5)
    assert (a == b).all()


def test_bulk_add_ends_with_fresh_router(monkeypatch):
    """A bulk load must not end on a stale router: the in-loop policy
    rebuilds at doubling only, so up to half the bank could be merely
    ring-assigned (rings evict under overload — 1M recall plateaued at
    0.954 vs 0.986).  add() bounds staleness to 25% at call end."""
    import numpy as np

    from vector_store_tpu.core import index as index_mod
    from vector_store_tpu.core.index import SlotIndex
    from vector_store_tpu.types import IndexParams

    from vector_store_tpu.core import cluster as cluster_mod

    monkeypatch.setattr(index_mod, "ROUTE_MIN_ROWS", 1024)
    monkeypatch.setattr(
        cluster_mod, "route_k_for", lambda rows: 128
    )  # test-scale centroid count
    rng = np.random.default_rng(0)
    d = 16
    idx = SlotIndex(IndexParams(dimensions=d, space="cosine"), initial_capacity=8192)
    idx.add(rng.normal(size=(1500, d)).astype(np.float32))
    assert idx._route_built_at == 1500  # rebuilt at call end, not at 1024
    # small follow-ups below the 1.25x threshold do NOT rebuild...
    idx.add(rng.normal(size=(100, d)).astype(np.float32))
    assert idx._route_built_at == 1500
    # ...but crossing it does
    idx.add(rng.normal(size=(300, d)).astype(np.float32))
    assert idx._route_built_at == 1900
