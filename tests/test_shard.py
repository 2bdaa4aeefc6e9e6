"""Sharded-index tests on the virtual 8-device CPU mesh.

BASELINE config 5 in miniature: documents sharded over the mesh,
queries replicated, per-shard top-k merged via all_gather over the
shard axis.
"""

import numpy as np
import pytest

import jax

from vector_store_tpu.shard import ShardedSlotIndex, make_mesh
from vector_store_tpu.types import IndexParams


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8
    return make_mesh(8)


def test_sharded_identity_and_count(mesh8, rng):
    idx = ShardedSlotIndex(
        IndexParams(dimensions=16, space="l2"),
        mesh=mesh8,
        initial_capacity_per_shard=1024,
    )
    x = rng.normal(size=(600, 16)).astype(np.float32)
    gids = idx.add(x)
    assert idx.count() == 600
    assert len(set(gids.tolist())) == 600
    # every vector finds itself
    d, i = idx.search(x[:32], 1)
    assert (i[:, 0] == gids[:32]).all()
    np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-3)


@pytest.mark.slow
def test_sharded_recall_vs_single(mesh8, rng):
    """Sharded search ≈ single-device search on the same data."""
    from vector_store_tpu.core import SlotIndex

    n, dims, q, k = 3000, 24, 48, 10
    x = rng.normal(size=(n, dims)).astype(np.float32)
    queries = rng.normal(size=(q, dims)).astype(np.float32)

    sharded = ShardedSlotIndex(
        IndexParams(dimensions=dims, space="l2"),
        mesh=mesh8,
        initial_capacity_per_shard=1024,
    )
    gids = sharded.add(x)
    single = SlotIndex(
        IndexParams(dimensions=dims, space="l2"), initial_capacity=4096
    )
    single.add(x)

    _, exact = single.exact_search(queries, k)
    _, approx = sharded.search(queries, k)
    # map sharded gids back to original row numbers
    gid_to_row = {int(g): r for r, g in enumerate(gids)}
    hits = 0
    for j in range(q):
        got = {gid_to_row[int(g)] for g in approx[j] if g >= 0}
        want = set(exact[j].tolist())
        hits += len(got & want)
    recall = hits / (q * k)
    assert recall >= 0.95, f"sharded recall@{k}={recall:.3f}"


def test_sharded_remove(mesh8, rng):
    idx = ShardedSlotIndex(
        IndexParams(dimensions=8, space="l2"),
        mesh=mesh8,
        initial_capacity_per_shard=1024,
    )
    x = rng.normal(size=(100, 8)).astype(np.float32)
    gids = idx.add(x)
    d, i = idx.search(x[7], 1)
    assert i[0] == gids[7]
    idx.remove(gids[[7]])
    assert idx.count() == 99
    d, i = idx.search(x[7], 1)
    assert i[0] != gids[7]


def test_sharded_growth(mesh8, rng):
    idx = ShardedSlotIndex(
        IndexParams(dimensions=8, space="l2"),
        mesh=mesh8,
        initial_capacity_per_shard=600,
    )
    x = rng.normal(size=(5000, 8)).astype(np.float32)
    gids = idx.add(x)  # forces per-shard growth 600 → larger
    assert idx.count() == 5000
    d, i = idx.search(x[4321], 1)
    assert i[0] == gids[4321]


def test_sharded_gids_stable_across_growth(mesh8, rng):
    """Ids issued before a capacity doubling stay valid after it.

    Regression: round 1 encoded gid = shard * C + slot, so growth
    (C doubling mid-add) silently re-addressed every outstanding id —
    searches returned different gids for the same row and removes
    tombstoned the wrong slot."""
    idx = ShardedSlotIndex(
        IndexParams(dimensions=8, space="l2"),
        mesh=mesh8,
        initial_capacity_per_shard=600,
    )
    x1 = rng.normal(size=(400, 8)).astype(np.float32)
    gids1 = idx.add(x1)  # pre-growth ids
    cap_before = idx.capacity
    x2 = rng.normal(size=(5000, 8)).astype(np.float32)
    idx.add(x2)  # forces growth
    assert idx.capacity > cap_before
    # pre-growth rows still resolve to their original ids
    d, i = idx.search(x1[:32], 1)
    assert (i[:, 0] == gids1[:32]).all()
    # and removing by a pre-growth id kills the right row
    idx.remove(gids1[[5]])
    assert idx.count() == 400 + 5000 - 1
    d, i = idx.search(x1[5], 1)
    assert i[0] != gids1[5]


def test_sharded_remove_count_integrity(mesh8, rng):
    """count() tracks device truth under double/unknown/duplicate removes.

    Regression: round 1 decremented host _sizes unconditionally, so
    removing a gid twice (or a never-valid gid) desynced count()."""
    idx = ShardedSlotIndex(
        IndexParams(dimensions=8, space="l2"),
        mesh=mesh8,
        initial_capacity_per_shard=1024,
    )
    x = rng.normal(size=(64, 8)).astype(np.float32)
    gids = idx.add(x)
    idx.remove(gids[[3]])
    assert idx.count() == 63
    idx.remove(gids[[3]])  # double remove — no-op
    assert idx.count() == 63
    idx.remove(np.asarray([gids[4], gids[4], gids[4]]))  # duplicates in batch
    assert idx.count() == 62
    never_valid = int(1000) * idx.n_shards + 2  # slot 1000 was never written
    idx.remove(np.asarray([never_valid]))
    assert idx.count() == 62


@pytest.mark.slow
def test_sharded_single_row_adds_balance(mesh8, rng):
    """A stream of single-row add() calls must spread over shards via the
    rotating cursor (review r3: every call restarted at shard 0)."""
    idx = ShardedSlotIndex(
        IndexParams(dimensions=8, space="l2"), mesh=make_mesh(4)
    )
    # 5 single-row adds over 4 shards: the rotating deal leaves every
    # shard with 1 row and one shard with 2; the pre-fix behavior
    # (restart at shard 0 every call) would pile all 5 onto shard 0.
    # (kept small: each add is a full shard_map dispatch, and the 1-core
    # CI box pays seconds of scheduler stall per dispatch — 4 shards
    # exercise the same rotation property at half the dispatch bill)
    for i in range(5):
        idx.add(rng.normal(size=(1, 8)).astype(np.float32))
    assert idx.count() == 5
    assert idx._sizes.max() - idx._sizes.min() <= 1, idx._sizes
    # gids must still be unique within each query's result list
    d, ids = idx.search(rng.normal(size=(4, 8)).astype(np.float32), 10)
    for row in ids:
        live = row[row >= 0]
        assert len(set(live.tolist())) == len(live), row
