"""vector_store_tpu — a TPU-native vector & text search framework.

A ground-up JAX/XLA/Pallas re-design of the capability set of
swasik/vector-store-text (ScyllaDB's vector-store sidecar + its text-search
fork): an ANN engine as a device-resident graph index driven by batched
jitted steps, a per-index actor runtime, a CDC-style ingestion pipeline
and a REST front — see SURVEY.md for the component-by-component mapping.

Public surface (mirrors reference src/lib.rs:267-295):
    run(addr, factory)      — start engine + HTTP server
    new_index_factory(...)  — default backend factory
    wait_for_shutdown()     — SIGINT/SIGTERM latch
"""

__version__ = "0.1.0"

from .types import (  # noqa: F401
    AnnResult,
    DbEmbedding,
    IndexId,
    IndexMetadata,
    IndexParams,
    Limit,
    PrimaryKey,
    Timestamp,
    primary_key,
)
