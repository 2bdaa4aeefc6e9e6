"""Multi-chip sharding: mesh helpers + document-sharded index (SURVEY §7.5)."""

from .mesh import SHARD_AXIS, make_mesh  # noqa: F401
from .sharded_index import ShardedSlotIndex  # noqa: F401
from .sharded_ivf import ShardedIvfIndex  # noqa: F401
