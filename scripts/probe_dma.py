#!/usr/bin/env python
"""Pure-DMA streaming ceiling: HBM→VMEM block copies at varying block
sizes, with and without the probe-scan's per-block matvec.

Isolates what bounds the fused kernel (~145GB/s observed at B=384): the
per-copy overhead at small block sizes, or scoring on the critical
path.  Each dispatch streams the whole bank once (grid × 64-block
unroll); reps are dependency-chained through the query argument so the
wall clock covers real execution, not dispatch pipelining.
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
UNROLL = 64  # blocks per grid program


def _kernel(q_ref, vec_hbm, out, *, score: bool, nbuf: int):
    B = vec_hbm.shape[1]
    gi = pl.program_id(0)

    def body(vbuf, acc, sems):
        def dma(slot, i):
            return pltpu.make_async_copy(
                vec_hbm.at[gi * UNROLL + i], vbuf.at[slot], sems.at[slot]
            )

        depth = min(nbuf, UNROLL)
        for s in range(depth - 1):
            dma(s % nbuf, s).start()
        acc[0, :] = jnp.zeros((8,), jnp.float32)
        for s in range(UNROLL):
            slot = s % nbuf
            if s + depth - 1 < UNROLL:
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
    grid = bank.shape[0] // UNROLL
    kern = functools.partial(_kernel, score=score, nbuf=nbuf)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, D), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 8), lambda g: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
    )(q, bank)


@functools.partial(jax.jit, static_argnames=("score", "nbuf", "reps"))
def chain(q, bank, score, nbuf, reps):
    # each rep's query depends on the previous rep's output through a
    # REAL data dependency (not x*0, which XLA folds away and then CSEs
    # the identical pallas calls): executions serialize, so wall clock =
    # reps x true streaming time + one tunnel roundtrip
    out = None
    for _ in range(reps):
        out = stream(q, bank, score, nbuf)
        q = q.at[0, 0].add(out[0, 0] * 1e-30)
    return out


def _timed(q, bank, score, nbuf, reps):
    # one fetch syncs (block_until_ready does NOT wait on the axon
    # tunnel); min over 3 trials strips one-sided scheduling noise
    out = chain(q, bank, score, nbuf, reps)
    float(np.asarray(out)[0, 0])
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = chain(q, bank, score, nbuf, reps)
        float(np.asarray(out)[0, 0])
        best = min(best, time.time() - t0)
    return best


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    q = jnp.asarray(np.random.default_rng(0).normal(size=(8, D)), jnp.float32)
    for B in (384, 768, 1536):
        nblocks = max((256 << 20) // (B * D), UNROLL) // UNROLL * UNROLL
        bank_bytes = nblocks * B * D
        bank = jnp.asarray(
            np.random.default_rng(1).integers(
                -127, 127, size=(nblocks, B, D), dtype=np.int8
            )
        )
        for score in (True, False):
            for nbuf in (4,):
                # slope method: T(reps) = reps*T_pass + roundtrip; the
                # difference cancels the tunnel latency
                lo, hi = 2, 10
                t_lo = _timed(q, bank, score, nbuf, lo)
                t_hi = _timed(q, bank, score, nbuf, hi)
                t_pass = (t_hi - t_lo) / (hi - lo)
                rt = t_lo - lo * t_pass
                gbs = bank_bytes / t_pass / 1e9
                print(
                    f"# B={B:5d} ({B * D >> 10:5d}KB) score={int(score)} "
                    f"nbuf={nbuf}: {gbs:.0f} GB/s  "
                    f"(pass={t_pass * 1e3:.2f}ms of {bank_bytes >> 20}MB, "
                    f"roundtrip={rt * 1e3:.1f}ms)",
                    flush=True,
                )
        del bank


if __name__ == "__main__":
    main()
