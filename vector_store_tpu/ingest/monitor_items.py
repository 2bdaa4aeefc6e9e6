"""Item monitor — the LWW bridge from an embedding stream to an index actor.

Port of the reference's monitor_items actor (src/monitor_items.rs):
drains `DbEmbedding` events, keeps `{PrimaryKey: Timestamp}` and applies
last-writer-wins — stale timestamps are dropped (:56-71); an event with
an embedding is an add_or_replace, a None embedding a remove (:72-79);
the task terminates when the stream closes (:40-42).
"""

from __future__ import annotations

import asyncio
import logging

from ..engine.actor import IndexHandle
from ..types import Timestamp
from .source import EmbeddingStream

log = logging.getLogger("vst.monitor_items")


async def run(stream: EmbeddingStream, index: IndexHandle) -> None:
    """Bridge loop; returns when the stream ends."""
    seen: dict = {}
    while True:
        ev = await stream.get()
        if ev is None:
            log.debug("monitor_items: stream closed, terminating")
            return
        prev: Timestamp | None = seen.get(ev.primary_key)
        if prev is not None and ev.timestamp < prev:
            continue  # stale write, drop (monitor_items.rs:61-66)
        seen[ev.primary_key] = ev.timestamp
        try:
            if ev.embedding is not None:
                await index.add_or_replace(ev.primary_key, ev.embedding)
            else:
                await index.remove(ev.primary_key)
        except RuntimeError:
            # index handle closed under us (engine del_index) — stop
            log.debug("monitor_items: index handle closed, terminating")
            return


def spawn(stream: EmbeddingStream, index: IndexHandle) -> asyncio.Task:
    return asyncio.get_running_loop().create_task(
        run(stream, index), name="monitor-items"
    )
