"""Micro-batching frontend for device queries.

The reference throttles per-index concurrency with semaphores
(2 in-flight for opensearch: src/index/opensearch.rs:109-113; 2×rayon
threads for usearch: src/index/usearch.rs:115-118) because its backends
process one query per call.  A TPU wants the opposite: *coalesce*
concurrent requests into one fixed-shape batched device step.  The
micro-batcher collects requests for up to `window_s` (or until
`max_batch`), pads to the shape bucket and runs one device call in a
worker thread, then fans results back out to each caller's future.
"""

from __future__ import annotations

import asyncio
from typing import Any, Callable, Sequence


class MicroBatcher:
    """Coalesce awaitable submissions into batched flush calls.

    flush_fn(items) -> sequence of per-item results; runs in the default
    executor so the event loop keeps serving while the device steps.
    """

    def __init__(
        self,
        flush_fn: Callable[[list], Sequence[Any]],
        max_batch: int = 256,
        window_s: float = 0.002,
    ) -> None:
        self._flush_fn = flush_fn
        self._max_batch = max_batch
        self._window_s = window_s
        self._pending: list[tuple[Any, asyncio.Future]] = []
        self._flusher: asyncio.Task | None = None
        self._closed = False

    async def submit(self, item: Any) -> Any:
        if self._closed:
            raise RuntimeError("batcher closed")
        fut = asyncio.get_running_loop().create_future()
        self._pending.append((item, fut))
        if len(self._pending) >= self._max_batch:
            self._spawn_flush(immediate=True)
        else:
            self._spawn_flush(immediate=False)
        return await fut

    def _spawn_flush(self, immediate: bool) -> None:
        if self._flusher is None or self._flusher.done():
            self._flusher = asyncio.get_running_loop().create_task(
                self._flush_after(0 if immediate else self._window_s)
            )
        elif immediate:
            # batch is full — flush now rather than waiting out the window
            self._flusher.cancel()
            self._flusher = asyncio.get_running_loop().create_task(
                self._flush_after(0)
            )

    async def _flush_after(self, delay: float) -> None:
        if delay:
            await asyncio.sleep(delay)
        batch, self._pending = self._pending[: self._max_batch], self._pending[
            self._max_batch :
        ]
        if not batch:
            return
        if self._pending:  # leftover beyond max_batch → next round
            self._spawn_flush(immediate=len(self._pending) >= self._max_batch)
        items = [it for it, _ in batch]
        loop = asyncio.get_running_loop()
        try:
            results = await loop.run_in_executor(None, self._flush_fn, items)
            for (_, fut), res in zip(batch, results):
                if not fut.done():
                    fut.set_result(res)
        except Exception as exc:  # noqa: BLE001 — propagate to callers
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(exc)

    async def close(self) -> None:
        self._closed = True
        while self._pending or (self._flusher and not self._flusher.done()):
            if self._flusher:
                try:
                    await self._flusher
                except asyncio.CancelledError:
                    pass
            if self._pending and (self._flusher is None or self._flusher.done()):
                self._spawn_flush(immediate=True)
