"""Actor-protocol tests: engine registry + ANN index actor.

Port of the reference's patterns: actors tested by their message
protocol with poll-until loops, never sleeps (usearch.rs:313-426 test,
SURVEY §4.1-2).
"""

import asyncio

import numpy as np
import pytest

from vector_store_tpu.engine import AnnIndexFactory, new_engine
from vector_store_tpu.types import IndexId, IndexMetadata, IndexParams, Limit


def meta(name: str, dims: int = 3) -> IndexMetadata:
    return IndexMetadata(
        index_id=IndexId(name),
        params=IndexParams(dimensions=dims, space="l2", capacity=2048),
    )


async def poll_until(cond, timeout=60.0):
    """Reference pattern: poll with yield until condition (usearch.rs:352-358)."""
    async with asyncio.timeout(timeout):
        while not await cond():
            await asyncio.sleep(0)


@pytest.mark.asyncio
async def test_engine_add_get_del():
    engine = await new_engine(AnnIndexFactory())
    assert await engine.get_index_ids() == []

    await engine.add_index(meta("ks.a"))
    await engine.add_index(meta("ks.b"))
    ids = await engine.get_index_ids()
    assert sorted(i.value for i in ids) == ["ks.a", "ks.b"]

    # idempotent-skip: re-adding keeps the same actor (engine.rs:96-100)
    h1 = await engine.get_index(IndexId("ks.a"))
    await engine.add_index(meta("ks.a"))
    h2 = await engine.get_index(IndexId("ks.a"))
    assert h1 is h2

    await engine.del_index(IndexId("ks.a"))
    assert await engine.get_index(IndexId("ks.a")) is None
    # deleted index actor terminates (engine.rs:113-116)
    await asyncio.wait_for(h1.join(), 10)
    await engine.close()


@pytest.mark.asyncio
async def test_ann_actor_add_or_replace_size_ann():
    """Full port of the usearch unit test (usearch.rs:322-426)."""
    engine = await new_engine(AnnIndexFactory())
    await engine.add_index(meta("vector.store"))
    actor = await engine.get_index(IndexId("vector.store"))

    await actor.add_or_replace((1, "one"), np.array([1.0, 1.0, 1.0]))
    await actor.add_or_replace((2, "two"), np.array([2.0, -2.0, 2.0]))
    await actor.add_or_replace((3, "three"), np.array([3.0, 3.0, 3.0]))

    await poll_until(lambda: _eq(actor.count(), 3))

    keys, dists = await actor.ann(np.array([2.2, -2.2, 2.2]), Limit(1))
    assert keys == [(2, "two")]
    assert len(dists) == 1

    # replace key 3 with a closer vector, requery until visible
    await actor.add_or_replace((3, "three"), np.array([2.1, -2.1, 2.1]))

    async def three_wins():
        keys, _ = await actor.ann(np.array([2.2, -2.2, 2.2]), Limit(1))
        return keys == [(3, "three")]

    await poll_until(three_wins)

    # remove → count drops, next-best returned
    await actor.remove((3, "three"))
    await poll_until(lambda: _eq(actor.count(), 2))
    keys, dists = await actor.ann(np.array([2.2, -2.2, 2.2]), Limit(1))
    assert keys == [(2, "two")]
    await engine.close()


@pytest.mark.asyncio
async def test_ann_dimension_validation():
    """ann validates dimensions (usearch.rs:259-272)."""
    engine = await new_engine(AnnIndexFactory())
    await engine.add_index(meta("ks.v", dims=4))
    actor = await engine.get_index(IndexId("ks.v"))
    with pytest.raises(ValueError, match="dimensions"):
        await actor.ann(np.ones(3), Limit(1))
    await engine.close()


@pytest.mark.asyncio
async def test_concurrent_ann_batching():
    """Many concurrent queries coalesce and all get correct answers."""
    engine = await new_engine(AnnIndexFactory())
    await engine.add_index(meta("ks.c", dims=8))
    actor = await engine.get_index(IndexId("ks.c"))
    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(64, 8)).astype(np.float32)
    for i in range(64):
        await actor.add_or_replace((i,), vecs[i])
    await poll_until(lambda: _eq(actor.count(), 64))

    results = await asyncio.gather(
        *(actor.ann(vecs[i], Limit(1)) for i in range(64))
    )
    for i, (keys, dists) in enumerate(results):
        assert keys == [(i,)], f"query {i} → {keys}"
    await engine.close()


@pytest.mark.asyncio
async def test_ann_queries_actually_coalesce():
    """Concurrent Ann messages must ride one device batch.

    Regression: round 1 awaited the batcher inside the actor loop, so at
    most one query was ever in flight — every batch had size 1 and every
    query still paid the full batching window."""
    from vector_store_tpu.engine.actor import spawn_index_actor
    from vector_store_tpu.engine.ann_index import AnnIndexBackend

    backend = AnnIndexBackend(
        IndexId("ks.batch"),
        IndexParams(dimensions=8, space="l2", capacity=2048),
        window_s=0.02,
    )
    sizes: list[int] = []
    orig = backend._batcher._flush_fn

    def spy(items):
        sizes.append(len(items))
        return orig(items)

    backend._batcher._flush_fn = spy
    actor = spawn_index_actor(backend, name="ks.batch")

    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(16, 8)).astype(np.float32)
    for i in range(16):
        await actor.add_or_replace((i,), vecs[i])
    await poll_until(lambda: _eq(actor.count(), 16))

    n = 8
    results = await asyncio.gather(
        *(actor.ann(vecs[i], Limit(1)) for i in range(n))
    )
    for i, (keys, _) in enumerate(results):
        assert keys == [(i,)]
    assert max(sizes) > 1, f"queries never coalesced: batch sizes {sizes}"
    actor.close()
    await actor.join()


@pytest.mark.asyncio
async def test_mutations_coalesce_in_mailbox():
    """Consecutive queued upserts/removes apply as batched device steps.

    The actor loop drains the mailbox each turn and lets the backend
    merge runs (actor.py coalesce hook) — N queued single-row mutations
    must not cost N device dispatches."""
    from vector_store_tpu.engine.actor import spawn_index_actor
    from vector_store_tpu.engine.ann_index import AnnIndexBackend

    backend = AnnIndexBackend(
        IndexId("ks.co"), IndexParams(dimensions=8, space="l2", capacity=2048)
    )
    upsert_calls: list[int] = []
    remove_calls: list[int] = []
    orig_upserts = backend._apply_upserts
    orig_remove = backend.index.remove
    backend._apply_upserts = lambda b: (upsert_calls.append(len(b)), orig_upserts(b))[1]
    backend.index.remove = lambda s: (remove_calls.append(len(s)), orig_remove(s))[1]
    actor = spawn_index_actor(backend, name="ks.co")

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(64, 8)).astype(np.float32)
    for i in range(64):
        await actor.add_or_replace((i,), vecs[i])
    await poll_until(lambda: _eq(actor.count(), 64))
    assert sum(upsert_calls) == 64
    assert max(upsert_calls) > 1, f"upserts never coalesced: {upsert_calls}"

    for i in range(32):
        await actor.remove((i,))
    await poll_until(lambda: _eq(actor.count(), 32))
    assert sum(remove_calls) == 32
    assert max(remove_calls) > 1, f"removes never coalesced: {remove_calls}"

    # ordering across a type boundary: remove(k) then re-add(k) must land
    # in that order even when drained in one mailbox sweep
    await actor.remove((40,))
    await actor.add_or_replace((40,), vecs[40])
    await poll_until(lambda: _eq(actor.count(), 32))
    keys, _ = await actor.ann(vecs[40], Limit(1))
    assert keys == [(40,)]
    actor.close()
    await actor.join()


async def _eq(coro, val):
    return await coro == val


@pytest.mark.asyncio
async def test_auto_kind_routes_by_capacity():
    """kind="auto" picks the ANN backend from the declared capacity:
    graph below the crossover, IVF at or above it (the measured
    crossover lives in ARCHITECTURE.md "Backend crossover")."""
    from vector_store_tpu import new_index_factory
    from vector_store_tpu.engine.factory import AUTO_IVF_MIN_CAPACITY

    factory = new_index_factory()

    def auto_meta(name: str, capacity: int) -> IndexMetadata:
        return IndexMetadata(
            index_id=IndexId(name),
            params=IndexParams(dimensions=8, space="cosine", capacity=capacity),
            kind="auto",
        )

    small = factory.create_index(
        IndexId("small"), auto_meta("small", AUTO_IVF_MIN_CAPACITY // 2)
    )
    large = factory.create_index(
        IndexId("large"), auto_meta("large", AUTO_IVF_MIN_CAPACITY)
    )
    try:
        assert small.resolved_kind == "ann"
        assert large.resolved_kind == "ivf"
        # both serve the ANN protocol
        for h in (small, large):
            await h.add_or_replace((1,), np.ones(8, np.float32))
            await poll_until(lambda h=h: _count_is(h, 1))
    finally:
        for h in (small, large):
            h.close()
            await h.join()


async def _count_is(handle, n: int) -> bool:
    return await handle.count() == n


@pytest.mark.asyncio
async def test_queries_race_compaction():
    """Queries concurrent with Compact must never mix the old keymap
    with the new slot numbering (or vice versa).

    Regression for the round-3 offline-compact change: the backend now
    rebuilds into a scratch index and swaps (state, keymap) atomically
    under a serve lock; a query landing anywhere around the swap must
    still resolve every hit to the correct primary key."""
    engine = await new_engine(AnnIndexFactory())
    await engine.add_index(meta("ks.race", dims=8))
    actor = await engine.get_index(IndexId("ks.race"))
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(96, 8)).astype(np.float32)
    for i in range(96):
        await actor.add_or_replace((i,), vecs[i])
    await poll_until(lambda: _eq(actor.count(), 96))
    # tombstone a third so compaction genuinely moves slots
    for i in range(0, 96, 3):
        await actor.remove((i,))
    await poll_until(lambda: _eq(actor.count(), 64))

    live = [i for i in range(96) if i % 3 != 0]
    stop = asyncio.Event()
    failures: list[str] = []

    async def query_storm():
        j = 0
        while not stop.is_set():
            i = live[j % len(live)]
            keys, _ = await actor.ann(vecs[i], Limit(1))
            if keys != [(i,)]:
                failures.append(f"query {i} -> {keys}")
            j += 1
            await asyncio.sleep(0)

    storms = [asyncio.create_task(query_storm()) for _ in range(4)]
    try:
        for _ in range(3):
            n = await asyncio.wait_for(actor.compact(), 120)
            assert n == 64, n
    finally:
        stop.set()
        await asyncio.gather(*storms, return_exceptions=True)
        await engine.close()
    assert not failures, failures[:5]


@pytest.mark.asyncio
async def test_close_with_full_mailbox_still_terminates():
    """close() while the mailbox is at capacity must not raise QueueFull
    (pre-fix it did, leaking the actor forever with no sentinel queued);
    every message already accepted must still be processed, and the
    actor must then terminate."""
    from vector_store_tpu.engine.actor import (
        MAILBOX_CAPACITY,
        spawn_index_actor,
    )

    gate = asyncio.Event()
    seen: list[int] = []

    async def process(msg: int) -> None:
        await gate.wait()
        seen.append(msg)

    actor = spawn_index_actor(process, name="ks.full")
    # msg 0 is dequeued and blocks in process; 1..CAP fill the mailbox
    for i in range(MAILBOX_CAPACITY + 1):
        await asyncio.wait_for(actor._send(i), 5)
        await asyncio.sleep(0)

    actor.close()  # mailbox is full here
    with pytest.raises(RuntimeError, match="closed"):
        await actor._send(99)

    gate.set()
    await asyncio.wait_for(actor.join(), 10)
    assert seen == list(range(MAILBOX_CAPACITY + 1)), seen
