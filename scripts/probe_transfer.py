"""Microbenchmark host->device transfer + donated-update dispatch cost
over the axon tunnel, to size ingest blocks (scripts/, not shipped).

Observed 2026-08-17: the same exact-scan ingest path that moved
58k vec/s in an earlier session ran at ~900 vec/s — ~4.8s per
4096x768 f32 block.  This probe separates the candidate costs:
  (a) raw device_put at several block sizes,
  (b) the donated dynamic_update_slice step at two bank sizes,
so the fix targets the real bottleneck (transfer chunking vs step).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

D = 768


def t_put(rows: int, dtype) -> float:
    x = np.random.default_rng(0).standard_normal((rows, D)).astype(dtype)
    jnp.asarray(x).block_until_ready()  # warm path
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        jnp.asarray(x + 1).block_until_ready()  # +1: defeat caching
        best = min(best, time.time() - t0)
    mb = x.nbytes / 1e6
    print(
        f"device_put rows={rows:6d} {np.dtype(dtype).name:8s} "
        f"{mb:7.1f}MB  {best * 1e3:8.1f}ms  {mb / best:8.1f} MB/s",
        flush=True,
    )
    return best


def t_update(cap: int, block: int) -> None:
    @jax.jit
    def step(bank, blk, off):
        return jax.lax.dynamic_update_slice(bank, blk, (off, 0))

    step2 = jax.jit(step, donate_argnums=(0,))
    bank = jnp.zeros((cap, D), jnp.float32)
    blk = jnp.ones((block, D), jnp.float32)
    bank = step2(bank, blk, jnp.int32(0))
    bank.block_until_ready()
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        bank = step2(bank, blk, jnp.int32(i * block))
        bank.block_until_ready()
        best = min(best, time.time() - t0)
    print(
        f"donated update cap={cap} block={block}: {best * 1e3:8.1f}ms",
        flush=True,
    )


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    for rows in (1024, 2048, 4096, 8192, 16384):
        t_put(rows, np.float32)
    t_put(4096, np.int8)
    import ml_dtypes

    t_put(4096, ml_dtypes.bfloat16)
    t_put(16384, ml_dtypes.bfloat16)
    t_update(1 << 17, 4096)
    t_update(1 << 20, 4096)
