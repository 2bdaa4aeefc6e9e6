"""Device index kernels — the usearch-HNSW replacement (SURVEY §7.1)."""

from .graph import GraphConfig, GraphState, init, grow  # noqa: F401
from .index import SlotIndex, config_from_params  # noqa: F401
from .search import search  # noqa: F401
from .build import insert, delete  # noqa: F401
from . import bruteforce, distance, topk  # noqa: F401
