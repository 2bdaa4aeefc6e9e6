"""ScyllaDB source adapter — the live-cluster implementation of DbSource.

Maps the reference's control/data planes (src/db.rs, src/db_index.rs)
onto the DbSource/EmbeddingStream seam:

  latest_schema_version  ← SELECT state_id FROM system.group0_history
                           LIMIT 1                      (db.rs:299-316)
  get_indexes            ← SELECT ... FROM system_schema.indexes WHERE
                           kind='CUSTOM' (options['target'] → column),
                           dimensions parsed from the column type
                           `vector<float, N>`           (db.rs:318-398)
  get_db_index           ← initial token-ring full scan (ranges split
                           per db_index.rs:268-295, parallelism =
                           shards×3 per :253-258) + CDC consumer on the
                           table's cdc_log               (db_index.rs:77-130)

The python Scylla/Cassandra driver is not present in this environment
and no cluster is reachable (zero egress), so this module is an adapter
skeleton: the protocol mapping and CQL statements are in place, and
construction raises a clear error when the driver is missing.  All
pipeline behaviour above this seam is exercised through MemDb
(tests/test_ingest.py), exactly as the reference tested through its
db_basic mock.
"""

from __future__ import annotations

from typing import Optional

from ..types import IndexMetadata
from .source import EmbeddingStream

# CQL statement surface (reference: src/db.rs Statements :250-257)
ST_LATEST_SCHEMA_VERSION = (
    "SELECT state_id FROM system.group0_history LIMIT 1"
)
ST_GET_CUSTOM_INDEXES = (
    "SELECT keyspace_name, index_name, table_name, options "
    "FROM system_schema.indexes WHERE kind = 'CUSTOM' ALLOW FILTERING"
)
ST_GET_COLUMN_TYPE = (
    "SELECT type FROM system_schema.columns "
    "WHERE keyspace_name = ? AND table_name = ? AND column_name = ?"
)
ST_GET_INDEX_VERSION = (
    "SELECT version FROM system_schema.scylla_tables "
    "WHERE keyspace_name = ? AND table_name = ?"
)

# column type carrying the embedding, `vector<float, N>` (db.rs:374-398)
VECTOR_TYPE_RE = r"^vector<float, (\d+)>$"


class ScyllaSource:
    """DbSource over a live ScyllaDB cluster (requires the cassandra/
    scylla python driver; unavailable in this build environment)."""

    def __init__(self, uri: str) -> None:
        try:
            import cassandra  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env dependent
            raise RuntimeError(
                "ScyllaSource requires the cassandra/scylla driver; "
                "use MemDb or FileSource in driverless environments "
                "(the full ingestion pipeline is source-agnostic above "
                "the DbSource seam)"
            ) from exc
        self.uri = uri
        raise NotImplementedError(
            "live-cluster adapter pending a driver-enabled environment"
        )

    async def latest_schema_version(self) -> Optional[str]:  # pragma: no cover
        raise NotImplementedError

    async def get_indexes(self) -> list[IndexMetadata]:  # pragma: no cover
        raise NotImplementedError

    async def get_db_index(
        self, metadata: IndexMetadata
    ) -> EmbeddingStream:  # pragma: no cover
        raise NotImplementedError
