"""Fused gather+score for graph beam search — a Pallas TPU kernel.

The XLA expand round (core/search.py::_expand_round) gathers the beam's
candidate vectors to a [Q, B*R, D] HBM transient and reads it back for
the distance matvec: every candidate row crosses HBM three times
(source read + gather write + matvec read).  This kernel streams each
candidate row HBM -> VMEM by async DMA (a depth-`nbuf` ring so copies
overlap each other), scores the collected [BR, D] block against the
query with one matvec, and writes only the [Q, BR] distances — the
row bytes cross HBM exactly once and the transient never exists.

Reference role: the inner distance loop of usearch's beam search
(/root/reference/src/index/usearch.rs:274-277).  Whether it beats the
XLA gather on real hardware is an open question measured by bench.py's
A/B gate (the gather is descriptor-rate-bound either way; this kernel
removes the bandwidth half, not the descriptor half — see
ARCHITECTURE.md "graph backend" notes).

Layout (one grid step per group of QG queries):

  grid            (Q/QG,)
  scalar-prefetch cand [Q, BR] int32   candidate slot per (query, lane),
                                       pre-clipped to [0, C) by the
                                       wrapper (sentinels masked outside)
  inputs          q     [Q, D] f32     preprocessed queries ([QG, D] block)
                  vectors [C, D]       storage dtype, stays in HBM
                  scl_g [Q/QG, QG, BR] f32  pre-gathered dequant scales
  outputs         dist [Q, BR] f32     ([QG, BR] block)
  scratch         cand_buf [BR, D] row landing zone, nbuf DMA sems

Per query (QG python-unrolled): a fori_loop walks the BR candidate
rows with a depth-`nbuf` DMA ring (issue row j+depth-1, wait row j),
then one [BR, D] @ [D] matvec scores the block.  Rows land in their
own cand_buf row, so ring slots never collide on memory — the ring
bounds DMA-queue depth via the nbuf semaphores only.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float("inf")

QG = 8  # queries per grid step
NBUF = 8  # DMA ring depth (single rows are small; deeper ring hides issue)


def _kernel(cand_ref, q_ref, vec_hbm, scl_ref, out_d, *,
            br: int, space: str, quantized: bool, qg: int, nbuf: int):
    D = vec_hbm.shape[1]
    gi = pl.program_id(0)

    def body(cand_buf, sems):
        for l in range(qg):
            def dma(j):
                c = cand_ref[gi * qg + l, j]
                return pltpu.make_async_copy(
                    vec_hbm.at[pl.ds(c, 1), :],
                    cand_buf.at[pl.ds(j, 1), :],
                    sems.at[j % nbuf],
                )

            depth = min(nbuf, br)
            for s in range(depth - 1):
                dma(s).start()

            def step(j, _):
                @pl.when(j + depth - 1 < br)
                def _issue():
                    dma(j + depth - 1).start()

                dma(j).wait()
                return _

            jax.lax.fori_loop(0, br, step, None)

            x = cand_buf[:, :].astype(jnp.float32)  # [BR, D]
            qv = q_ref[l, :]  # [D] — static sublane pick
            dots = jnp.dot(x, qv, preferred_element_type=jnp.float32)
            sc = scl_ref[0, l, :]  # [BR]
            if quantized:
                dots = dots * sc
            if space == "l2":
                x_sq = jnp.sum(x * x, axis=-1)
                if quantized:
                    x_sq = x_sq * sc * sc
                q_sq = jnp.sum(qv * qv)
                d = q_sq + x_sq - 2.0 * dots
            elif space == "dot":
                d = -dots
            else:  # cosine: rows unit-norm at ingest, dist = 1 - cos
                d = 1.0 - dots
            out_d[l, :] = d

    pl.run_scoped(
        body,
        cand_buf=pltpu.VMEM((br, D), vec_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((nbuf,)),
    )


def gather_score_fused(
    vectors: jnp.ndarray,  # [C, D] storage dtype (f32 / bf16 / int8)
    scales: jnp.ndarray,  # [C] f32 per-row dequant scale
    queries_prep: jnp.ndarray,  # [Q, D] preprocessed, Q % qg == 0
    cand_safe: jnp.ndarray,  # [Q, BR] i32, pre-clipped to [0, C)
    space: str,
    quantized: bool,
    interpret: bool | None = None,
    qg: int = QG,
    nbuf: int = NBUF,
) -> jnp.ndarray:
    """Fused candidate gather+score; returns distances [Q, BR] f32.

    The caller clips sentinel ids into range before the call and masks
    their distances after (same contract as core/graph.py::gather_rows).
    Unjitted — composes inside the caller's jit (search._expand_round).
    """
    if interpret is None:
        interpret = os.environ.get("VST_PALLAS_INTERPRET") == "1"
    Q, D = queries_prep.shape
    br = cand_safe.shape[1]
    if Q % qg:
        raise ValueError(f"query batch must be a multiple of {qg}, got {Q}")

    # pre-gather the per-candidate scales (4B/row vs the 768B vector row)
    scl_g = jnp.take(scales, cand_safe, axis=0).reshape(Q // qg, qg, br)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Q // qg,),
        in_specs=[
            pl.BlockSpec(
                (qg, D), lambda g, cand: (g, 0), memory_space=pltpu.VMEM
            ),
            # the vector bank stays in HBM (it is the stream source)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, qg, br),
                lambda g, cand: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (qg, br), lambda g, cand: (g, 0), memory_space=pltpu.VMEM
        ),
    )
    kern = functools.partial(
        _kernel, br=br, space=space, quantized=quantized, qg=qg, nbuf=nbuf
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Q, br), jnp.float32),
        interpret=interpret,
    )(cand_safe, queries_prep.astype(jnp.float32), vectors, scl_g)
