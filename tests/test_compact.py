"""Compaction: tombstone reclaim via rebuild-from-self."""

import asyncio

import numpy as np
import pytest

from vector_store_tpu.core import SlotIndex
from vector_store_tpu.engine import AnnIndexFactory, new_engine
from vector_store_tpu.types import IndexId, IndexMetadata, IndexParams, Limit


def test_slotindex_compact(rng):
    idx = SlotIndex(IndexParams(dimensions=16, space="l2"), initial_capacity=2048)
    x = rng.normal(size=(600, 16)).astype(np.float32)
    slots = idx.add(x)
    dead = rng.choice(600, size=300, replace=False)
    idx.remove(slots[dead])
    assert idx.count() == 300
    assert idx.frontier == 600

    remap = idx.compact()
    assert idx.count() == 300
    assert idx.frontier == 300  # tombstones reclaimed
    assert len(remap) == 300
    # a surviving vector still finds itself under its new slot
    live = [i for i in range(600) if i not in set(dead.tolist())]
    probe = live[17]
    d, i = idx.search(x[probe], 1)
    assert i[0] == remap[probe]
    assert d[0] < 1e-3


@pytest.mark.asyncio
async def test_compact_through_actor(rng):
    engine = await new_engine(AnnIndexFactory())
    await engine.add_index(
        IndexMetadata(
            index_id=IndexId("ks.c"),
            params=IndexParams(dimensions=8, space="l2", capacity=2048),
        )
    )
    actor = await engine.get_index(IndexId("ks.c"))
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    for i in range(40):
        await actor.add_or_replace((i,), vecs[i])
    for i in range(0, 40, 2):
        await actor.remove((i,))
    async with asyncio.timeout(60):
        while await actor.count() != 20:
            await asyncio.sleep(0)

    count = await actor.compact()
    assert count == 20
    # keys still resolve to the right vectors post-remap
    keys, _ = await actor.ann(vecs[11], Limit(1))
    assert keys == [(11,)]
    keys, _ = await actor.ann(vecs[10], Limit(1))
    assert keys != [(10,)]  # deleted key stays deleted
    await engine.close()
