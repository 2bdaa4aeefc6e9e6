"""File-source ingestion: JSONL and fvecs through the monitor pipeline."""

import asyncio
import json
import os
import tempfile

import numpy as np
import pytest

from vector_store_tpu.engine import AnnIndexFactory, new_engine
from vector_store_tpu.ingest import MonitorIndexes
from vector_store_tpu.ingest.filesource import FileSource
from vector_store_tpu.types import IndexId, IndexParams, Limit


@pytest.mark.asyncio
async def test_jsonl_source_pipeline(rng):
    rows = rng.normal(size=(20, 8)).astype(np.float32)
    with tempfile.NamedTemporaryFile(
        "w", suffix=".jsonl", delete=False
    ) as fh:
        path = fh.name
        for i, row in enumerate(rows):
            fh.write(json.dumps({"key": i, "embedding": row.tolist()}) + "\n")
        # a delete event (tombstone) for key 5, newer timestamp
        fh.write(json.dumps({"key": 5, "embedding": None, "timestamp": 10**9}) + "\n")
    try:
        src = FileSource(
            path, "files.vecs", IndexParams(dimensions=8, space="l2")
        )
        engine = await new_engine(AnnIndexFactory())
        mon = MonitorIndexes(src, engine, tick_s=0.01)
        mon.spawn()
        try:
            async with asyncio.timeout(120):
                while (await engine.get_index_ids()) == []:
                    await asyncio.sleep(0)
                actor = await engine.get_index(IndexId("files.vecs"))
                while await actor.count() != 19:  # 20 - tombstone
                    await asyncio.sleep(0)
            keys, _ = await actor.ann(rows[7], Limit(1))
            assert keys == [(7,)]
            keys, _ = await actor.ann(rows[5], Limit(1))
            assert keys != [(5,)]  # deleted
        finally:
            await mon.stop()
            await engine.close()
    finally:
        os.unlink(path)


@pytest.mark.asyncio
async def test_fvecs_source(rng):
    from vector_store_tpu.utils import native

    if not native.available():
        pytest.skip("native library not built")
    rows = rng.normal(size=(10, 4)).astype(np.float32)
    with tempfile.NamedTemporaryFile(suffix=".fvecs", delete=False) as fh:
        path = fh.name
        for row in rows:
            fh.write(np.int32(4).tobytes())
            fh.write(row.tobytes())
    try:
        src = FileSource(path, "files.f", fmt="fvecs")
        metas = await src.get_indexes()
        assert metas[0].params.dimensions == 4
        stream = await src.get_db_index(metas[0])
        got = {}
        async with asyncio.timeout(10):
            while len(got) < 10:
                ev = await stream.get()
                got[ev.primary_key] = ev
        # parallel range slices deliver out of order (db_index.rs:217-237
        # shape); coverage and per-row content are the contract
        assert set(got) == {(i,) for i in range(10)}
        np.testing.assert_array_equal(got[(3,)].embedding, rows[3])
    finally:
        os.unlink(path)
