"""ScyllaDB source adapter — the live-cluster implementation of DbSource.

Maps the reference's control/data planes (src/db.rs, src/db_index.rs)
onto the DbSource/EmbeddingStream seam:

  latest_schema_version  ← system.group0_history state_id   (db.rs:299-316)
  get_indexes            ← system_schema.indexes kind='CUSTOM'
                           (options['target'] → column), version from
                           system_schema.scylla_tables, dimensions parsed
                           from the column type `vector<float, N>`,
                           validity checked under schema agreement
                           (db.rs:318-441)
  get_db_index           ← initial token-ring full scan (circular ranges
                           per db_index.rs:268-295, parallelism = cluster
                           shards × 3 per :253-258) + a CDC consumer on
                           the table's `{table}_scylla_cdc_log`
                           (db_index.rs:77-130,389-459), both feeding one
                           bounded EmbeddingStream

The adapter talks to an injectable **session object** (the `ScyllaSession`
protocol below) instead of importing a driver directly: the cluster-state
surface it needs (token ring, shard count, keyspace metadata, schema
agreement) mirrors what the rust driver exposes, so a real
cassandra/scylla driver session wraps in a few lines — and the fake
session in tests/test_scylla.py drives every logic path here without a
cluster, exactly as the reference's db_basic.rs faked its protocol.

Behavioral note: reference `is_valid_index` (db.rs:424-433) returns false
when the base table EXISTS — an inverted-looking check recorded in
SURVEY.md as observed behavior.  This adapter implements the evident
intent (base table and its CDC log MUST exist) and documents the
deviation here.
"""

from __future__ import annotations

import asyncio
import logging
import re
import uuid as uuid_mod
from typing import Optional, Protocol, Sequence

import numpy as np

from ..types import (
    DbEmbedding,
    IndexId,
    IndexMetadata,
    IndexParams,
    Timestamp,
)
from .source import EmbeddingStream

log = logging.getLogger("vst.scylla")

# --- CQL statement surface (reference: src/db.rs:299-372, db_index.rs:195-211)

ST_LATEST_SCHEMA_VERSION = (
    "SELECT state_id FROM system.group0_history "
    "WHERE key = 'history' ORDER BY state_id DESC LIMIT 1"
)
ST_GET_INDEXES = (
    "SELECT keyspace_name, index_name, table_name, options "
    "FROM system_schema.indexes WHERE kind = 'CUSTOM' ALLOW FILTERING"
)
ST_GET_INDEX_VERSION = (
    "SELECT version FROM system_schema.scylla_tables "
    "WHERE keyspace_name = ? AND table_name = ?"
)
ST_GET_INDEX_TARGET_TYPE = (
    "SELECT type FROM system_schema.columns "
    "WHERE keyspace_name = ? AND table_name = ? AND column_name = ?"
)

# column type carrying the embedding, `vector<float, N>` (db.rs:372-398)
VECTOR_TYPE_RE = re.compile(r"^vector<float, (?P<dimensions>\d+)>$")

# token ring bounds (db_index.rs:268-270); note MIN = -MAX, not i64::MIN
TOKEN_MAX = 2**63 - 1
TOKEN_MIN = -TOKEN_MAX

# parallel range scans = cluster shards × smuge factor (db_index.rs:253-258)
SMUGE_FACTOR = 3

# timeuuid epoch: 100ns ticks since 1582-10-15 (db_index.rs:436-446,492-495)
GREGORIAN_TO_UNIX_MICROS = -12_219_292_800 * 1_000_000

# CDC poll cadence: the reference's scylla-cdc consumer is push-shaped;
# a wire-level poller re-reads the log on a short tick instead.
CDC_POLL_S = 0.2


def timeuuid_to_timestamp(tu: uuid_mod.UUID) -> Timestamp:
    """CDC timeuuid → microsecond Timestamp (db_index.rs:436-446)."""
    micros = tu.time // 10  # 100ns ticks → µs since the Gregorian epoch
    return Timestamp(micros + GREGORIAN_TO_UNIX_MICROS)


def fullscan_ranges(ring_tokens: Sequence[int]) -> list[tuple[int, int]]:
    """Token ring → inclusive scan ranges (db_index.rs:268-295).

    The ring's tokens plus a TOKEN_MIN sentinel are walked as circular
    windows; each range is [token, next_token - 1] except the wrap-around
    window, which runs to TOKEN_MAX undecremented.
    """
    tokens = [TOKEN_MIN] + sorted(
        set(int(t) for t in ring_tokens) - {TOKEN_MIN}
    )
    n = len(tokens)
    if n == 1:  # empty ring → one full-range scan
        return [(TOKEN_MIN, TOKEN_MAX)]
    out = []
    for i in range(n):
        begin, end = tokens[i], tokens[(i + 1) % n]
        if begin > end:  # the last (wrap-around) range
            out.append((begin, TOKEN_MAX))
        else:
            out.append((begin, end - 1))
    return out


def range_scan_query(
    keyspace: str, table: str, pk_columns: Sequence[str], embedding: str
) -> str:
    """SELECT pk..., embedding, writetime (db_index.rs:195-211)."""
    pk_list = ", ".join(pk_columns)
    return (
        f"SELECT {pk_list}, {embedding}, writetime({embedding}) "
        f"FROM {keyspace}.{table} "
        f"WHERE token({pk_list}) >= ? AND token({pk_list}) <= ?"
    )


def cdc_log_query(keyspace: str, table: str, pk_columns: Sequence[str], embedding: str) -> str:
    """Poll the CDC log for rows after a timeuuid cursor."""
    pk_list = ", ".join(pk_columns)
    return (
        f'SELECT "cdc$time", "cdc$operation", {pk_list}, {embedding} '
        f"FROM {keyspace}.{table}_scylla_cdc_log "
        f'WHERE "cdc$time" > ? ALLOW FILTERING'
    )


class ScyllaSession(Protocol):
    """The driver surface this adapter needs — a thin slice of what the
    rust driver exposes (session + cluster state).  A real
    cassandra-driver session adapts to this in a few lines; tests inject
    a fake."""

    async def execute(self, query: str, params: tuple = ()) -> list[tuple]:
        """Run CQL, return rows as tuples."""
        ...

    def ring_tokens(self) -> list[int]:
        """Cluster token ring (db_index.rs:275-283)."""
        ...

    def nr_shards(self) -> int:
        """Total shard count across the cluster (db_index.rs:239-252)."""
        ...

    async def await_schema_agreement(self) -> Optional[str]:
        """Block until agreement; returns the agreed version (db.rs:413)."""
        ...

    async def check_schema_agreement(self) -> Optional[str]:
        """Non-blocking agreement probe (db.rs:436-440)."""
        ...

    def keyspace_tables(self, keyspace: str) -> Optional[dict]:
        """{table_name: {"partition_key": [...], "clustering_key": [...]}}
        or None when the keyspace doesn't exist (db.rs:417-433)."""
        ...


class DriverSession:
    """Adapts a cassandra/scylla python-driver session (duck-typed: any
    object with `execute_async`, `prepare`, and a `cluster` carrying
    metadata/control_connection) to the ScyllaSession protocol.

    The driver is thread-pool based; responses bridge into asyncio via
    ResponseFuture callbacks.  Statements are prepared once and cached —
    the adapter's queries use `?` markers, which only prepared statements
    accept (reference: db.rs:250-257 prepares its statement set up
    front)."""

    def __init__(self, session) -> None:
        self._session = session
        self._prepared: dict[str, object] = {}

    # -- ScyllaSession protocol -------------------------------------------

    async def execute(self, query: str, params: tuple = ()) -> list[tuple]:
        loop = asyncio.get_running_loop()
        stmt = self._prepared.get(query)
        if stmt is None and params:
            stmt = self._prepared[query] = await loop.run_in_executor(
                None, self._session.prepare, query
            )
        fut: asyncio.Future = loop.create_future()
        rf = self._session.execute_async(stmt or query, params or None)
        # the callback fires once per driver page (default fetch_size
        # 5000); keep pulling pages until exhausted or a token-range scan
        # / CDC poll burst larger than one page silently loses rows
        acc: list[tuple] = []

        def on_page(rows):
            # runs on a driver callback thread whose runner swallows
            # exceptions — any failure must resolve the future or the
            # awaiting ingest task hangs forever
            try:
                acc.extend(tuple(r) for r in rows or [])
                if getattr(rf, "has_more_pages", False):
                    rf.start_fetching_next_page()
                else:
                    loop.call_soon_threadsafe(fut.set_result, acc)
            except Exception as exc:  # noqa: BLE001
                loop.call_soon_threadsafe(fut.set_exception, exc)

        rf.add_callbacks(
            on_page,
            lambda exc: loop.call_soon_threadsafe(fut.set_exception, exc),
        )
        return await fut

    def ring_tokens(self) -> list[int]:
        token_map = self._session.cluster.metadata.token_map
        if token_map is None:
            return []
        return [int(t.value) for t in token_map.ring]

    def nr_shards(self) -> int:
        """Scylla exposes per-host shard counts through the driver's
        sharding info; sum them (db_index.rs:239-252).  Hosts without it
        (cassandra, old scylla) count as one."""
        hosts = self._session.cluster.metadata.all_hosts()
        total = 0
        for h in hosts:
            info = getattr(h, "sharding_info", None)
            total += int(getattr(info, "shards_count", 1) or 1)
        return max(total, 1)

    async def await_schema_agreement(self) -> Optional[str]:
        loop = asyncio.get_running_loop()
        agreed = await loop.run_in_executor(
            None,
            self._session.cluster.control_connection.wait_for_schema_agreement,
        )
        return await self._local_schema_version() if agreed else None

    async def check_schema_agreement(self) -> Optional[str]:
        # near-instant probe: one agreement check round (db.rs:436-440).
        # NOTE: the driver treats wait_time<=0 as "skip the check entirely
        # and return True", so a strictly positive sub-second timeout is
        # the smallest honest probe.
        loop = asyncio.get_running_loop()
        agreed = await loop.run_in_executor(
            None,
            lambda: self._session.cluster.control_connection.wait_for_schema_agreement(
                wait_time=0.5
            ),
        )
        return await self._local_schema_version() if agreed else None

    async def _local_schema_version(self) -> Optional[str]:
        rows = await self.execute(
            "SELECT schema_version FROM system.local WHERE key = 'local'"
        )
        return str(rows[0][0]) if rows else None

    def keyspace_tables(self, keyspace: str) -> Optional[dict]:
        ks = self._session.cluster.metadata.keyspaces.get(keyspace)
        if ks is None:
            return None
        return {
            name: {
                "partition_key": [c.name for c in t.partition_key],
                "clustering_key": [c.name for c in t.clustering_key],
            }
            for name, t in ks.tables.items()
        }


class ScyllaSource:
    """DbSource over a ScyllaDB session (live driver or wire-level fake)."""

    def __init__(self, session: ScyllaSession) -> None:
        self.session = session

    @classmethod
    def connect(cls, uri: str) -> "ScyllaSource":  # pragma: no cover
        """Build from a live cluster via the cassandra/scylla python
        driver (reference: db.rs:260-266 builds the rust-driver session).
        `uri` is `host[:port]`."""
        try:
            from cassandra.cluster import Cluster
        except ImportError as exc:
            raise RuntimeError(
                "ScyllaSource.connect requires the cassandra/scylla driver; "
                "construct ScyllaSource(DriverSession(session)) with your own "
                "session, or use MemDb/FileSource (the pipeline is source-"
                "agnostic above the DbSource seam)"
            ) from exc
        host, _, port = uri.partition(":")
        cluster = Cluster(
            contact_points=[host or "127.0.0.1"],
            port=int(port) if port else 9042,
        )
        return cls(DriverSession(cluster.connect()))

    # -- control plane (db.rs) ---------------------------------------------

    async def latest_schema_version(self) -> Optional[str]:
        rows = await self.session.execute(ST_LATEST_SCHEMA_VERSION)
        return str(rows[0][0]) if rows else None

    async def get_index_version(self, keyspace: str, index: str) -> Optional[str]:
        """Index version from `{index}_index` in scylla_tables
        (db.rs:342-365)."""
        rows = await self.session.execute(
            ST_GET_INDEX_VERSION, (keyspace, f"{index}_index")
        )
        return str(rows[0][0]) if rows else None

    async def get_index_target_type(
        self, keyspace: str, table: str, column: str
    ) -> Optional[int]:
        """Dimensions from the column type regex (db.rs:366-398)."""
        rows = await self.session.execute(
            ST_GET_INDEX_TARGET_TYPE, (keyspace, table, column)
        )
        if not rows:
            return None
        m = VECTOR_TYPE_RE.match(str(rows[0][0]))
        if not m:
            return None
        dims = int(m["dimensions"])
        return dims if dims > 0 else None

    async def get_index_params(
        self, keyspace: str, index: str
    ) -> tuple[int, int, int]:
        """Stubbed to defaults, matching the reference (db.rs:400-410)."""
        p = IndexParams(dimensions=1)
        return p.connectivity, p.expansion_add, p.expansion_search

    async def is_valid_index(self, keyspace: str, table: str) -> bool:
        """Guard against reading a half-applied schema (db.rs:412-441):
        schema agreement before and after the metadata reads, keyspace /
        base-table / CDC-log existence in between."""
        version_begin = await self.session.await_schema_agreement()
        if version_begin is None:
            return False
        tables = self.session.keyspace_tables(keyspace)
        if tables is None:  # keyspace missing
            return False
        if table not in tables:  # see module docstring: intent, not :424
            return False
        if f"{table}_scylla_cdc_log" not in tables:
            return False
        version_end = await self.session.check_schema_agreement()
        return version_end is not None and version_begin == version_end

    async def get_indexes(self) -> list[IndexMetadata]:
        """Discover CUSTOM indexes and assemble metadata
        (db.rs:318-341 + monitor_indexes.rs:90-146 assembly)."""
        out = []
        rows = await self.session.execute(ST_GET_INDEXES)
        for keyspace, index, table, options in rows:
            target = (options or {}).get("target")
            if target is None:
                continue
            if not await self.is_valid_index(keyspace, table):
                log.debug("index %s.%s not valid yet; skipping", keyspace, index)
                continue
            version = await self.get_index_version(keyspace, index)
            dims = await self.get_index_target_type(keyspace, table, target)
            if version is None or dims is None:
                log.debug("index %s.%s metadata incomplete; skipping", keyspace, index)
                continue
            conn, e_add, e_search = await self.get_index_params(keyspace, index)
            tables = self.session.keyspace_tables(keyspace) or {}
            meta_t = tables.get(table, {})
            pk_cols = tuple(meta_t.get("partition_key", ())) + tuple(
                meta_t.get("clustering_key", ())
            )
            out.append(
                IndexMetadata(
                    index_id=IndexId.from_parts(keyspace, index),
                    params=IndexParams(
                        dimensions=dims,
                        connectivity=conn,
                        expansion_add=e_add,
                        expansion_search=e_search,
                    ),
                    version=version,
                    key_columns=pk_cols,
                    kind="ann",
                )
            )
        return out

    # -- data plane (db_index.rs) -------------------------------------------

    async def get_db_index(self, metadata: IndexMetadata) -> EmbeddingStream:
        keyspace = metadata.index_id.keyspace_name
        index = metadata.index_id.index_name
        tables = self.session.keyspace_tables(keyspace) or {}
        # table resolution: the discovery row carried it; re-derive from
        # the index name by convention `{index}` on `{table}` is not
        # available here, so locate the indexed table via system_schema
        rows = await self.session.execute(ST_GET_INDEXES)
        table = target = None
        for ks, ix, tb, options in rows:
            if ks == keyspace and ix == index:
                table, target = tb, (options or {}).get("target")
                break
        if table is None or target is None:
            raise LookupError(f"index {keyspace}.{index} not found")
        meta_t = tables.get(table, {})
        pk_columns = tuple(meta_t.get("partition_key", ())) + tuple(
            meta_t.get("clustering_key", ())
        )
        if not pk_columns:
            raise LookupError(f"table {keyspace}.{table} has no schema")

        stream = EmbeddingStream(pk_columns)
        asyncio.get_running_loop().create_task(
            self._feed(stream, keyspace, table, pk_columns, target),
            name=f"scylla-feed-{keyspace}.{index}",
        )
        return stream

    async def _feed(
        self,
        stream: EmbeddingStream,
        keyspace: str,
        table: str,
        pk_columns: tuple[str, ...],
        target: str,
    ) -> None:
        """Initial parallel scan + CDC poller → stream, then close."""
        try:
            cdc_task = asyncio.get_running_loop().create_task(
                self._consume_cdc(stream, keyspace, table, pk_columns, target)
            )
            await self._initial_scan(stream, keyspace, table, pk_columns, target)
            # scan done; CDC keeps feeding until the stream is stopped
            # (db_index.rs:121-127 drains then stops the cdc reader)
            await cdc_task
        except Exception:  # noqa: BLE001 — log-and-drop (engine idiom)
            log.exception("feed for %s.%s failed", keyspace, table)
        finally:
            await stream.close()

    async def _initial_scan(
        self,
        stream: EmbeddingStream,
        keyspace: str,
        table: str,
        pk_columns: tuple[str, ...],
        target: str,
    ) -> None:
        """Token-range full scan, `shards × 3` ranges in flight
        (db_index.rs:217-258)."""
        query = range_scan_query(keyspace, table, pk_columns, target)
        parallelism = max(self.session.nr_shards(), 1) * SMUGE_FACTOR
        sem = asyncio.Semaphore(parallelism)
        n_pk = len(pk_columns)

        async def scan_range(begin: int, end: int) -> None:
            async with sem:
                if stream.stopped:
                    return
                try:
                    rows = await self.session.execute(query, (begin, end))
                except Exception as exc:  # noqa: BLE001
                    # reference: log and skip the range (db_index.rs:222-224)
                    log.warning(
                        "unable to scan range (%d, %d): %s", begin, end, exc
                    )
                    return
                for row in rows:
                    emb = self._parse_scan_row(row, n_pk)
                    if emb is not None:
                        await stream.put(emb)

        await asyncio.gather(
            *(scan_range(b, e) for b, e in fullscan_ranges(self.session.ring_tokens()))
        )

    @staticmethod
    def _parse_scan_row(row: tuple, n_pk: int) -> Optional[DbEmbedding]:
        """(pk..., embedding, writetime µs) → DbEmbedding
        (db_index.rs:297-375: malformed rows are logged and skipped)."""
        if len(row) != n_pk + 2:
            log.debug("scan row: bad column count %d != %d", len(row), n_pk + 2)
            return None
        *pk, embedding, writetime = row
        if writetime is None or embedding is None:
            log.debug("scan row: missing writetime/embedding")
            return None
        if any(v is None for v in pk):
            log.debug("scan row: missing a primary key column")
            return None
        try:
            vec = np.asarray(embedding, dtype=np.float32)
        except (TypeError, ValueError):
            log.debug("scan row: bad embedding element type")
            return None
        return DbEmbedding(
            primary_key=tuple(pk),
            embedding=vec,
            timestamp=Timestamp(int(writetime)),
        )

    async def _consume_cdc(
        self,
        stream: EmbeddingStream,
        keyspace: str,
        table: str,
        pk_columns: tuple[str, ...],
        target: str,
    ) -> None:
        """Poll the CDC log and map rows to DbEmbedding events
        (db_index.rs:389-459): embedding column None → tombstone,
        timestamp from the cdc$time timeuuid."""
        query = cdc_log_query(keyspace, table, pk_columns, target)
        cursor = uuid_mod.UUID(int=0)
        n_pk = len(pk_columns)
        while not stream.stopped:
            try:
                rows = await self.session.execute(query, (cursor,))
            except Exception as exc:  # noqa: BLE001
                log.warning("cdc poll failed for %s.%s: %s", keyspace, table, exc)
                rows = []
            for row in rows:
                if len(row) != n_pk + 3:
                    log.debug("cdc row: bad column count")
                    continue
                tu, _operation, *pk, embedding = row
                if not isinstance(tu, uuid_mod.UUID):
                    tu = uuid_mod.UUID(str(tu))
                # Advance the cursor by TIMEUUID ordering (60-bit
                # timestamp first, bytes as tiebreak) — the server's
                # `"cdc$time" > ?` filter orders the same way, while raw
                # UUID.int ordering leads with time_low and can pick a
                # non-max row, re-fetching everything above it forever.
                if (tu.time, tu.bytes) > (cursor.time, cursor.bytes):
                    cursor = tu
                if any(v is None for v in pk):
                    log.debug("cdc row: missing a primary key column")
                    continue
                vec = (
                    np.asarray(embedding, dtype=np.float32)
                    if embedding is not None
                    else None
                )
                await stream.put(
                    DbEmbedding(
                        primary_key=tuple(pk),
                        embedding=vec,
                        timestamp=timeuuid_to_timestamp(tu),
                    )
                )
            await asyncio.sleep(CDC_POLL_S)
