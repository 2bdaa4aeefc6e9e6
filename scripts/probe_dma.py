#!/usr/bin/env python
"""Pure-DMA streaming ceiling: HBM→VMEM block copies at varying block
sizes, with and without the probe-scan's per-block matvec.

Isolates what bounds the fused kernel (~145GB/s observed): per-copy
overhead at B=384 blocks, or the scoring compute on the critical path.
Usage: python scripts/probe_dma.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 768
NBUF = 4


def _kernel(q_ref, vec_hbm, out, *, nblocks: int, score: bool, nbuf: int):
    B = vec_hbm.shape[1]

    def body(vbuf, acc, sems):
        def dma(slot, i):
            return pltpu.make_async_copy(
                vec_hbm.at[i], vbuf.at[slot], sems.at[slot]
            )

        depth = min(nbuf, nblocks)
        for s in range(depth - 1):
            dma(s % nbuf, s).start()
        for s in range(nblocks):
            slot = s % nbuf
            if s + depth - 1 < nblocks:
                dma((s + depth - 1) % nbuf, s + depth - 1).start()
            dma(slot, s).wait()
            if score:
                x = vbuf[slot].astype(jnp.float32)
                qv = q_ref[s % 8, :]
                dots = jnp.dot(x, qv, preferred_element_type=jnp.float32)
                acc[0, :] = acc[0, :] + jnp.min(dots)
            else:
                acc[0, :] = acc[0, :] + vbuf[slot][0, :8].astype(jnp.float32)

        out[0, :] = acc[0, :]

    pl.run_scoped(
        body,
        vbuf=pltpu.VMEM((nbuf, B, D), vec_hbm.dtype),
        acc=pltpu.VMEM((1, 8), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((nbuf,)),
    )


@functools.partial(jax.jit, static_argnames=("score", "nbuf"))
def stream(q, bank, score, nbuf):
    nblocks = bank.shape[0]
    kern = functools.partial(
        _kernel, nblocks=nblocks, score=score, nbuf=nbuf
    )
    return pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((8, D), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 8), lambda g: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
    )(q, bank)


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    total = 512 << 20  # 512MB bank
    q = jnp.asarray(np.random.default_rng(0).normal(size=(8, D)), jnp.float32)
    for B in (128, 384, 768, 1536, 3072):
        nblocks = total // (B * D)
        bank = jnp.zeros((nblocks, B, D), dtype=jnp.int8)
        for score in (False, True):
            for nbuf in (2, 4, 8):
                out = stream(q, bank, score, nbuf)
                jax.block_until_ready(out)
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    jax.block_until_ready(stream(q, bank, score, nbuf))
                    best = min(best, time.time() - t0)
                gbs = nblocks * B * D / best / 1e9
                print(
                    f"# B={B:5d} ({B * D >> 10:5d}KB) score={int(score)} "
                    f"nbuf={nbuf}: {gbs:.0f} GB/s",
                    flush=True,
                )
        del bank


if __name__ == "__main__":
    main()
