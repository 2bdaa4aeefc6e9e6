"""Centroid router construction — the HNSW-upper-layers role, TPU-style.

The reference's usearch HNSW reaches a query's neighbourhood through
log-many upper graph layers walked serially (src/index/usearch.rs —
C++ HNSW internals).  Serial pointer descent is the wrong shape for a
systolic-array machine, and round 1's replacement — one matmul over a
flat strided sample — stops scaling past ~2M rows/chip (the sample
gather and the [Q, S] distance matrix both grow linearly with the bank).

This module builds the two-level replacement:

  centroids [K, D]   k-means centroids of the bank (dense, matmul-scored:
                     the "upper layers" collapsed into ONE MXU block)
  members   [K, Bm]  per-centroid ring of member slot ids (entry
                     candidates; ring-replaced, SENTINEL-padded)
  m_cnt     [K]      total assignments per centroid (ring write cursor)

Query-time routing (core/graph.py::routing_entries) is then:
one [Q, K] matmul → top-`probes` clusters → gather+score their ring
members (≤ probes × Bm rows per query) → best `entry_points` seed the
beam.  Nothing in the hot path scales with the bank size except the
centroid count K, which grows ~N/64.

Construction is device-side k-means: sampled init + a few Lloyd
iterations (assignment = chunked MXU matmuls, update = scatter-add
segment means), then a full assignment pass fills the member rings.
Incremental maintenance happens at insert time (core/build.py calls
`ring_assign` for every new batch); the router is rebuilt from scratch
when the bank doubles (SlotIndex growth policy), which keeps centroids
tracking the data distribution without any device-side re-clustering in
the hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import distance as dist_mod
from .graph import GraphConfig, GraphState, gather_vectors
from .topk import SENTINEL

# Assignment matmul chunk: rows scored against the centroid bank per step.
ASSIGN_CHUNK = 4096
# Lloyd refinement sample cap — k-means quality saturates long before the
# full bank is used, and the sample gather is a one-time cost per rebuild.
LLOYD_SAMPLE = 1 << 18
LLOYD_ITERS = 2


def route_k_for(rows: int) -> int:
    """Centroid count policy: ~64 rows per cluster, MXU-aligned, capped.

    At 1M rows → 16K centroids (a [Q, 16K] routing matmul), at 8M → 64K.
    The cap bounds the routing matmul and centroid-bank memory; beyond
    512M rows/chip the bank itself no longer fits anyway.
    """
    k = min(max(rows // 64, 4096), 1 << 16)
    return (k // 128) * 128


@functools.partial(jax.jit, static_argnames=("space",))
def assign(
    centroids: jnp.ndarray,  # [K, D] compute dtype
    vecs: jnp.ndarray,  # [M, D] compute dtype (preprocessed)
    space: str,
) -> jnp.ndarray:  # [M] int32 nearest-centroid id
    d = dist_mod.pairwise(vecs, centroids, space)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def _rank_in_run(sorted_keys: jnp.ndarray) -> jnp.ndarray:
    """Rank of each element within its run of equal keys (keys sorted)."""
    n = sorted_keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    run_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    return idx - run_start


def ring_assign(
    members: jnp.ndarray,  # [K, Bm] int32
    m_cnt: jnp.ndarray,  # [K] int32
    cids: jnp.ndarray,  # [M] int32 assigned centroid per row
    slots: jnp.ndarray,  # [M] int32 row ids
    live: jnp.ndarray,  # [M] bool
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Scatter a batch of rows into their centroids' member rings.

    Collision-free within the batch: rows are sorted by centroid and
    ranked within each run, so two same-cluster rows land at distinct
    ring positions (cursor + rank) mod Bm.
    """
    K, Bm = members.shape
    key = jnp.where(live, cids, jnp.int32(K))  # dead lanes sort last
    key_s, slot_s = jax.lax.sort((key, slots), num_keys=1)
    rank = _rank_in_run(key_s)
    cursor = jnp.take(m_cnt, jnp.clip(key_s, 0, K - 1))
    pos = (cursor + rank) % Bm
    ok = key_s < K
    row = jnp.where(ok, key_s, K)  # OOB rows dropped by the scatter
    members = members.at[row, pos].set(slot_s, mode="drop")
    m_cnt = m_cnt.at[row].add(ok.astype(jnp.int32), mode="drop")
    return members, m_cnt


_ring_assign = jax.jit(ring_assign)


def _gather_chunk(state: GraphState, base: int, n: int, cfg: GraphConfig):
    """Rows [base, base+n) in compute dtype + their liveness."""
    ids = base + jnp.arange(n, dtype=jnp.int32)
    vecs, _ = gather_vectors(state, ids, cfg)
    live = jnp.take(state.valid, jnp.clip(ids, 0, state.capacity - 1)) & (
        ids < state.frontier
    )
    return ids, vecs, live


@functools.partial(jax.jit, static_argnames=("space", "k"))
def _lloyd_step(centroids, vecs, live, space, k):
    """One Lloyd iteration over a sample block: assign + segment-mean."""
    cid = assign(centroids, vecs, space)
    cid = jnp.where(live, cid, k)  # dead lanes drop out of the scatter
    sums = jnp.zeros((k, vecs.shape[1]), dtype=jnp.float32)
    cnts = jnp.zeros((k,), dtype=jnp.float32)
    sums = sums.at[cid].add(vecs.astype(jnp.float32), mode="drop")
    cnts = cnts.at[cid].add(1.0, mode="drop")
    return sums, cnts


def build_router(
    state: GraphState,
    cfg: GraphConfig,
    route_k: int,
    members_per: int,
    lloyd_iters: int = LLOYD_ITERS,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cluster the bank and fill member rings.

    Returns (centroids [route_k, D], members [route_k, Bm], m_cnt [route_k])
    ready to slot into a GraphState whose cfg has route_k set.
    """
    frontier = int(state.frontier)
    assert frontier >= route_k, "not enough rows to seed centroids"

    # --- init: strided sample of the bank as seed centroids.
    stride = max(frontier // route_k, 1)
    seed_ids = (np.arange(route_k, dtype=np.int32) * stride) % frontier
    centroids, _ = gather_vectors(
        state, jnp.asarray(seed_ids, dtype=jnp.int32), cfg
    )
    centroids = centroids.astype(cfg.compute_dtype)

    # --- Lloyd iterations over a strided sample, chunked matmuls.
    sample_n = min(frontier, LLOYD_SAMPLE)
    s_stride = max(frontier // sample_n, 1)
    for _ in range(lloyd_iters):
        sums = jnp.zeros((route_k, cfg.dims), dtype=jnp.float32)
        cnts = jnp.zeros((route_k,), dtype=jnp.float32)
        for off in range(0, sample_n, ASSIGN_CHUNK):
            n = min(ASSIGN_CHUNK, sample_n - off)
            ids = jnp.asarray(
                (np.arange(off, off + n, dtype=np.int64) * s_stride) % frontier,
                dtype=jnp.int32,
            )
            vecs, _ = gather_vectors(state, ids, cfg)
            live = jnp.take(state.valid, ids)
            s, c = _lloyd_step(
                centroids, vecs.astype(cfg.compute_dtype), live, cfg.space, route_k
            )
            sums = sums + s
            cnts = cnts + c
        mean = sums / jnp.maximum(cnts, 1.0)[:, None]
        if cfg.space == "cosine":
            mean = dist_mod.normalize(mean)
        centroids = jnp.where(
            (cnts > 0)[:, None], mean.astype(cfg.compute_dtype), centroids
        )

    # --- fill member rings: assign EVERY allocated row.
    members = jnp.full((route_k, members_per), SENTINEL, dtype=jnp.int32)
    m_cnt = jnp.zeros((route_k,), dtype=jnp.int32)
    for off in range(0, frontier, ASSIGN_CHUNK):
        n = min(ASSIGN_CHUNK, frontier - off)
        ids, vecs, live = _gather_chunk(state, off, ASSIGN_CHUNK, cfg)
        if n < ASSIGN_CHUNK:
            live = live & (jnp.arange(ASSIGN_CHUNK) < n)
        cid = assign(centroids, vecs.astype(cfg.compute_dtype), cfg.space)
        members, m_cnt = _ring_assign(members, m_cnt, cid, ids, live)
    return centroids, members, m_cnt
