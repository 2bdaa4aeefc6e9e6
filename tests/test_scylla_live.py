"""Live-cluster exercise of the CQL transport (gated).

The reference actually connects to a running ScyllaDB
(src/db.rs:260-266 builds the driver session; db_index.rs:77-87 opens
the CDC reader against it).  This test drives the SAME roundtrip —
``ScyllaSource.connect()`` → control-plane probes → DDL → initial
token-range scan → CDC upsert + tombstone — against a real server when
one is available, and against the wire-level ``FakeSession`` otherwise,
so the roundtrip body itself is always exercised locally.

Gating:
  - ``VST_SCYLLA_URI`` (e.g. ``127.0.0.1:9042``) selects the live path;
    without it the live test SKIPS (this build environment has no
    cluster and no egress).  CI provides one via a scylladb/scylla
    container (see .github/workflows/ci.yml, job ``test-scylla-live``).
  - the live path additionally requires the cassandra/scylla python
    driver (``pytest.importorskip``).
  - servers too old for the CQL ``vector<float, N>`` type fall back to
    ``list<float>`` for the data plane (the scan/CDC plumbing is
    type-agnostic; only control-plane dimension discovery needs the
    vector type, and that branch is asserted only when supported).
"""

import asyncio
import os
import time
import uuid

import numpy as np
import pytest

from vector_store_tpu.ingest.scylla import ScyllaSource
from vector_store_tpu.types import IndexId, IndexMetadata

from test_scylla import FakeSession, _timeuuid

KS = "vst_live_ci"
DIMS = 4
LIVE_URI = os.environ.get("VST_SCYLLA_URI")


# --- shared roundtrip body ---------------------------------------------------


async def _drive_roundtrip(src, meta, h):
    """Initial scan must surface h.initial rows; a post-scan upsert and
    tombstone must arrive through the CDC poller with CDC timestamps."""
    stream = await src.get_db_index(meta)
    assert await stream.primary_key_columns() == h.pk_columns

    got = {}
    async with asyncio.timeout(60):
        while len(got) < len(h.initial):
            e = await stream.get()
            assert e is not None, "stream closed before the scan finished"
            got[e.primary_key] = e
    for pk, vec in h.initial.items():
        np.testing.assert_allclose(got[pk].embedding, vec, rtol=1e-6)
        assert got[pk].timestamp.micros > 0

    # CDC: one upsert, one tombstone (db_index.rs:389-459 mapping)
    new_vec = [9.0, 8.0, 7.0, 6.0]
    up_pk, del_pk = h.pk(7), h.pk(0)
    await h.upsert(up_pk, new_vec)
    await h.delete(del_pk)
    seen_up = seen_del = None
    async with asyncio.timeout(60):
        while seen_up is None or seen_del is None:
            e = await stream.get()
            assert e is not None, "stream closed before CDC events arrived"
            if e.primary_key == up_pk and e.embedding is not None:
                seen_up = e
            elif e.primary_key == del_pk and e.embedding is None:
                seen_del = e
    np.testing.assert_allclose(seen_up.embedding, new_vec, rtol=1e-6)
    assert seen_del.embedding is None  # tombstone
    assert seen_up.timestamp.micros > 0
    stream.stop()


# --- fake-session fallback (always runs) -------------------------------------


class _FakeHarness:
    pk_columns = ("id", "sub")  # the fake's canned schema

    def __init__(self, sess: FakeSession):
        self.sess = sess
        self.initial = {}
        rng = np.random.default_rng(7)
        for i in range(8):
            vec = rng.normal(size=DIMS).astype(np.float32).tolist()
            sess.rows[self.pk(i)] = (vec, 1_000_000 + i)
            self.initial[self.pk(i)] = vec

    def pk(self, i):
        return (i, f"s{i}")

    async def upsert(self, pk, vec):
        self.sess.cdc_rows.append((_timeuuid(2_000_000), 2, pk, vec))

    async def delete(self, pk):
        self.sess.cdc_rows.append((_timeuuid(2_000_001), 3, pk, None))


@pytest.mark.asyncio
async def test_roundtrip_on_fake_session():
    """The live roundtrip body, driven through the wire-level fake —
    keeps the gated test's assertions green where no cluster exists."""
    sess = FakeSession(dims=DIMS)
    h = _FakeHarness(sess)
    src = ScyllaSource(sess)
    metas = await src.get_indexes()
    assert len(metas) == 1 and metas[0].params.dimensions == DIMS
    await _drive_roundtrip(src, metas[0], h)


# --- live cluster (gated on VST_SCYLLA_URI + driver) --------------------------


class _LiveHarness:
    pk_columns = ("id",)

    def __init__(self, src: ScyllaSource, vector_type: bool):
        self.src = src
        self.vector_type = vector_type
        self.initial = {}

    def pk(self, i):
        return (i,)

    async def _cql(self, stmt: str):
        return await self.src.session.execute(stmt)

    async def setup(self):
        emb_t = f"vector<float, {DIMS}>" if self.vector_type else "list<float>"
        await self._cql(
            f"CREATE KEYSPACE IF NOT EXISTS {KS} WITH replication = "
            "{'class': 'NetworkTopologyStrategy', 'replication_factor': 1}"
        )
        await self._cql(f"DROP TABLE IF EXISTS {KS}.items")
        await self._cql(
            f"CREATE TABLE {KS}.items (id int PRIMARY KEY, emb {emb_t}) "
            "WITH cdc = {'enabled': true}"
        )
        rng = np.random.default_rng(11)
        for i in range(8):
            vec = [round(float(v), 4) for v in rng.normal(size=DIMS)]
            await self._cql(
                f"INSERT INTO {KS}.items (id, emb) VALUES ({i}, {vec})"
            )
            self.initial[(i,)] = vec

    async def upsert(self, pk, vec):
        await self._cql(f"INSERT INTO {KS}.items (id, emb) VALUES ({pk[0]}, {vec})")

    async def delete(self, pk):
        await self._cql(f"DELETE FROM {KS}.items WHERE id = {pk[0]}")

    async def teardown(self):
        try:
            await self._cql(f"DROP KEYSPACE IF EXISTS {KS}")
        except Exception:  # noqa: BLE001 — teardown best-effort
            pass


@pytest.mark.slow
@pytest.mark.skipif(not LIVE_URI, reason="VST_SCYLLA_URI not set (no live cluster)")
@pytest.mark.asyncio
async def test_live_cql_roundtrip():
    """connect() → schema agreement → DDL → full-scan + CDC roundtrip
    against a real ScyllaDB (reference: db.rs:260-266, db_index.rs:77-130)."""
    pytest.importorskip("cassandra")
    # the container may still be bootstrapping when CI reaches this test
    deadline = time.time() + 120
    src = None
    while True:
        try:
            src = ScyllaSource.connect(LIVE_URI)
            break
        except Exception:  # noqa: BLE001 — connection refused while booting
            if time.time() > deadline:
                raise
            time.sleep(3)

    # control plane against the live server
    assert await src.session.await_schema_agreement() is not None
    assert await src.latest_schema_version() is not None
    assert src.session.nr_shards() >= 1
    assert len(src.session.ring_tokens()) >= 1

    # does this server speak vector<float, N>?  (ScyllaDB 2025.1+)
    vector_type = True
    try:
        await src.session.execute(
            f"CREATE KEYSPACE IF NOT EXISTS {KS} WITH replication = "
            "{'class': 'NetworkTopologyStrategy', 'replication_factor': 1}"
        )
        await src.session.execute(
            f"CREATE TABLE {KS}.vtype_probe (id int PRIMARY KEY, "
            f"emb vector<float, {DIMS}>)"
        )
        await src.session.execute(f"DROP TABLE {KS}.vtype_probe")
    except Exception:  # noqa: BLE001 — old server: no vector type
        vector_type = False

    h = _LiveHarness(src, vector_type)
    await h.setup()
    try:
        assert await src.is_valid_index(KS, "items")

        meta = None
        if vector_type:
            # full discovery needs a CUSTOM vector index; servers without
            # the vector-search feature reject the index class — fall back
            # to hand-assembled metadata (the data plane is identical)
            try:
                await src.session.execute(
                    f"CREATE CUSTOM INDEX vecidx ON {KS}.items(emb) "
                    "USING 'vector_index'"
                )
                metas = [
                    m
                    for m in await src.get_indexes()
                    if m.index_id.keyspace_name == KS
                ]
                if metas:
                    meta = metas[0]
                    assert meta.params.dimensions == DIMS
                    assert meta.key_columns == ("id",)
            except Exception:  # noqa: BLE001 — vector_index class absent
                meta = None
        if meta is None:
            meta = IndexMetadata(
                index_id=IndexId.from_parts(KS, "vecidx"),
                key_columns=("id",),
            )
            # get_db_index re-derives the table from system_schema.indexes;
            # without a CUSTOM index row, drive the seam directly
            stream_src = _SeamSource(src)
        else:
            stream_src = src
        await _drive_roundtrip(stream_src, meta, h)
    finally:
        await h.teardown()


class _SeamSource:
    """get_db_index without the system_schema.indexes lookup — feeds the
    REAL _initial_scan + _consume_cdc over the live wire when no CUSTOM
    index row exists on the server."""

    def __init__(self, src: ScyllaSource):
        self._src = src

    async def get_db_index(self, metadata: IndexMetadata):
        from vector_store_tpu.ingest.source import EmbeddingStream

        ks = metadata.index_id.keyspace_name
        stream = EmbeddingStream(("id",))
        asyncio.get_running_loop().create_task(
            self._src._feed(stream, ks, "items", ("id",), "emb"),
            name=f"scylla-live-feed-{ks}",
        )
        return stream
