"""Host runtime: actors, registry, factory seam, batching (SURVEY §7.2)."""

from .actor import (  # noqa: F401
    Add,
    AddOrReplace,
    Ann,
    Count,
    IndexHandle,
    Remove,
    Search,
    spawn_index_actor,
)
from .ann_index import AnnIndexBackend, AnnIndexFactory  # noqa: F401
from .batcher import MicroBatcher  # noqa: F401
from .engine import EngineHandle, new_engine  # noqa: F401
from .factory import IndexFactory  # noqa: F401
from .keymap import KeyMap  # noqa: F401
