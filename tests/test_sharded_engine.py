"""Sharded ANN backend behind the actor seam (engine-level, 8-dev mesh)."""

import asyncio

import numpy as np
import pytest

from vector_store_tpu.engine import AnnIndexFactory, new_engine
from vector_store_tpu.types import IndexId, IndexMetadata, IndexParams, Limit


@pytest.mark.slow
@pytest.mark.asyncio
async def test_sharded_backend_actor(rng):
    engine = await new_engine(AnnIndexFactory(n_devices=8))
    await engine.add_index(
        IndexMetadata(
            index_id=IndexId("ks.sharded"),
            params=IndexParams(dimensions=16, space="l2", capacity=8192),
        )
    )
    actor = await engine.get_index(IndexId("ks.sharded"))
    vecs = rng.normal(size=(64, 16)).astype(np.float32)
    for i in range(64):
        await actor.add_or_replace((i,), vecs[i])
    async with asyncio.timeout(120):
        while await actor.count() != 64:
            await asyncio.sleep(0)

    keys, dists = await actor.ann(vecs[17], Limit(1))
    assert keys == [(17,)]

    # replace + remove through the sharded path
    await actor.add_or_replace((17,), vecs[18] + 100.0)
    keys, _ = await actor.ann(vecs[17], Limit(1))
    assert keys != [(17,)]
    await actor.remove((3,))
    async with asyncio.timeout(120):
        while await actor.count() != 63:
            await asyncio.sleep(0)
    await engine.close()


@pytest.mark.asyncio
async def test_sharded_text_backend_actor():
    """Text protocol (Add/Search/Remove) over the document-sharded BM25."""
    from vector_store_tpu.engine.text_index import TextIndexFactory

    engine = await new_engine(TextIndexFactory(n_devices=8))
    await engine.add_index(IndexMetadata(index_id=IndexId("articles")))
    actor = await engine.get_index(IndexId("articles"))
    await actor.add("a1", "the quick brown fox")
    await actor.add("a2", "lazy dogs sleep all day")
    await actor.add("a3", "tensor processing units score text")
    keys = await actor.search("quick fox", Limit(2))
    assert keys and keys[0] == "a1"
    await actor.remove("a1")
    async with asyncio.timeout(120):
        while "a1" in await actor.search("quick fox", Limit(2)):
            await asyncio.sleep(0)
    await engine.close()
