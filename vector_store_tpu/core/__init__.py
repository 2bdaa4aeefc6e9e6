"""Device index kernels — the usearch-HNSW replacement (SURVEY §7.1)."""

from . import bruteforce, build, distance, graph, search, topk  # noqa: F401
from .graph import GraphConfig, GraphState, grow, init  # noqa: F401
from .index import SlotIndex, config_from_params  # noqa: F401
