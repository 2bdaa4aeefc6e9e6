"""Fused gather+score for graph beam search — a Pallas TPU kernel.

The XLA expand round (core/search.py::_expand_round) gathers the beam's
candidate vectors to a [Q, B*R, D] HBM transient and reads it back for
the distance matvec: every candidate row crosses HBM three times
(source read + gather write + matvec read).  This kernel streams
candidate rows HBM -> VMEM by async DMA (a depth-`nbuf` ring so copies
overlap compute), scores them against the query, and writes only the
[Q, BR] distances — the transient never exists.

Mosaic tiling contract (the round-3 lesson): an f32 HBM memref is tiled
(8, 128) over its minor two dims, and a DMA slice along a TILED dim
must be tile-aligned — `vec.at[pl.ds(c, 1), :]` on a [C, D] bank is
rejected ("Slice shape along dimension 0 must be aligned to tiling (8),
but is 1").  The fix: view the bank as [C/T, T, D] (a free bitcast —
identical memory layout — with T = sublanes-per-tile = 32 // itemsize),
so the dynamic index lands on the UNTILED leading dim and each DMA
moves one whole [T, D] tile block.  The wanted row is then selected in
VMEM with a one-hot sum over the T sublanes (no dynamic sublane
indexing, which has the same alignment rule).  Cost: each candidate
pays a T-row read (8x bytes for f32, 32x for int8) — whether the
removed transient still wins on real hardware is measured by bench.py's
A/B gate, and the XLA path remains the default.

Round-4 compile-time lesson: the first fix python-unrolled an 8-query
group inside the kernel and Mosaic took ~4 min to compile the 8 copies
of the DMA loop; one query per grid step compiles the body once and
lets the pipeline revolve the [1, D] query / [1, BR] output blocks.

Reference role: the inner distance loop of usearch's beam search
(/root/reference/src/index/usearch.rs:274-277).

Layout (one grid step per query):

  grid            (Q,)
  inputs          cand [Q, BR] int32   candidate slot per (query, lane),
                                       pre-clipped to [0, C) by the
                                       wrapper (sentinels masked outside).
                                       Streamed as per-query [1, BR] SMEM
                                       blocks — NOT scalar-prefetch: the
                                       prefetch operand lands in SMEM
                                       wholesale, and at serving shapes
                                       Q*BR*4 B blows the ~1 MB SMEM
                                       budget ("Allocation (size=2097152)
                                       would exceed memory (size=1048576)
                                       ... prefetched SMEM operand 0",
                                       the round-4 on-chip lesson).  A
                                       blocked SMEM operand keeps only
                                       one query's BR*4 B resident.
  inputs          q     [Q, 1, D] f32  preprocessed queries ([1, 1, D]
                                       block; the singleton middle axis
                                       satisfies Mosaic's block-shape
                                       rule for per-query blocks)
                  vectors [C/T, T, D]  storage dtype, stays in HBM
                  scl_g [Q, 1, BR] f32 pre-gathered dequant scales
  outputs         dist [Q, 1, BR] f32  ([1, 1, BR] block)
  scratch         blk_buf  [nbuf, T, D]  DMA ring landing slots
                  row_buf  [BR, 1, D] f32 selected, dequant-ready rows

A fori_loop walks the BR candidates with a depth-`nbuf` DMA ring (issue
block j+depth-1 into slot (j+depth-1) % nbuf, wait block j); after each
wait the wanted sublane is one-hot-selected out of the landed [T, D]
block and parked in row_buf — the select overlaps the in-flight copies
— then one [BR, D] matvec scores everything.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float("inf")

NBUF = 8  # DMA ring depth (block copies are small; deeper ring hides issue)


def sublanes_per_tile(dtype) -> int:
    """Rows per (sublane, lane) tile for a given storage dtype: the TPU
    tile is (8, 128) f32 / (16, 128) bf16 / (32, 128) int8 — i.e. 32
    bytes of sublanes."""
    return 32 // jnp.dtype(dtype).itemsize


def _kernel(cand_ref, q_ref, vec_hbm, scl_ref, out_d, *,
            br: int, space: str, quantized: bool, nbuf: int, t: int):
    def body(blk_buf, row_buf, sems):
        def dma(j):
            c = cand_ref[0, 0, j]
            return pltpu.make_async_copy(
                vec_hbm.at[pl.ds(jax.lax.div(c, t), 1), :, :],
                blk_buf.at[pl.ds(jax.lax.rem(j, nbuf), 1), :, :],
                sems.at[jax.lax.rem(j, nbuf)],
            )

        depth = min(nbuf, br)
        for s in range(depth - 1):
            dma(s).start()

        def step(j, _):
            @pl.when(j + depth - 1 < br)
            def _issue():
                dma(j + depth - 1).start()

            dma(j).wait()
            # one-hot select of the wanted sublane out of the landed
            # [T, D] block (dynamic sublane indexing has the same
            # tile-alignment rule the DMA had; the masked sum does not).
            # Overlaps the ring's in-flight copies.
            sub = jax.lax.rem(cand_ref[0, 0, j], t)
            x = blk_buf[pl.ds(jax.lax.rem(j, nbuf), 1), :, :].astype(
                jnp.float32
            )  # [1, T, D]
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (1, t, 1), 1) == sub
            ).astype(jnp.float32)
            row_buf[pl.ds(j, 1), :, :] = jnp.sum(x * oh, axis=1, keepdims=True)
            return _

        jax.lax.fori_loop(0, br, step, None)

        xs = row_buf[:, 0, :]  # [BR, D] f32 selected rows
        qv = q_ref[0, 0, :]  # [D]
        dots = jnp.dot(xs, qv, preferred_element_type=jnp.float32)
        sc = scl_ref[0, 0, :]  # [BR]
        if quantized:
            dots = dots * sc
        if space == "l2":
            x_sq = jnp.sum(xs * xs, axis=-1)
            if quantized:
                x_sq = x_sq * sc * sc
            q_sq = jnp.sum(qv * qv)
            d = q_sq + x_sq - 2.0 * dots
        elif space == "dot":
            d = -dots
        else:  # cosine: rows unit-norm at ingest, dist = 1 - cos
            d = 1.0 - dots
        out_d[0, 0, :] = d

    pl.run_scoped(
        body,
        blk_buf=pltpu.VMEM((nbuf, t, vec_hbm.shape[2]), vec_hbm.dtype),
        row_buf=pltpu.VMEM((br, 1, vec_hbm.shape[2]), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((nbuf,)),
    )


def gather_score_fused(
    vectors: jnp.ndarray,  # [C, D] storage dtype (f32 / bf16 / int8)
    scales: jnp.ndarray,  # [C] f32 per-row dequant scale
    queries_prep: jnp.ndarray,  # [Q, D] preprocessed
    cand_safe: jnp.ndarray,  # [Q, BR] i32, pre-clipped to [0, C)
    space: str,
    quantized: bool,
    interpret: bool | None = None,
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
    C = vectors.shape[0]
    br = cand_safe.shape[1]
    t = sublanes_per_tile(vectors.dtype)
    if C % t:
        # graph capacities are powers of two >= 4096 (core/graph.py init/
        # grow), so this only trips on hand-built banks
        raise ValueError(f"bank rows ({C}) must be a multiple of tile {t}")
    if D % 128:
        # Mosaic pads the bank's lane dim to 128 in HBM and rejects a
        # narrower DMA slice ("Slice shape along dimension 2 must be
        # aligned to tiling (128)").  search._expand_round falls back to
        # the XLA path for these dims; direct callers must too.
        raise ValueError(f"dim ({D}) must be a multiple of 128 lanes")
    # tile-aligned view: identical memory layout, dynamic DMA index on
    # the untiled leading dim (see module docstring)
    vec3 = vectors.reshape(C // t, t, D)

    # pre-gather the per-candidate scales (4B/row vs the 768B vector row)
    scl_g = jnp.take(scales, cand_safe, axis=0)

    # Mosaic block-shape rule: a block's minor two dims must be (8k, 128k)
    # or equal the array's.  Per-query (1, D)/(1, BR) blocks violate the
    # sublane half, so give every per-query operand a singleton middle
    # axis — [Q, 1, D] with block (1, 1, D) — whose minor dims match the
    # array exactly.
    kern = functools.partial(
        _kernel, br=br, space=space, quantized=quantized, nbuf=nbuf, t=t
    )
    out = pl.pallas_call(
        kern,
        grid=(Q,),
        in_specs=[
            # per-query candidate ids: a [1, BR] SMEM block per grid step
            # (see module docstring — scalar-prefetch would put the whole
            # [Q, BR] array in SMEM and overflow it at serving shapes)
            pl.BlockSpec((1, 1, br), lambda g: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, D), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            # the vector bank stays in HBM (it is the stream source)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1, br), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, br), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Q, 1, br), jnp.float32),
        interpret=interpret,
    )(
        cand_safe.reshape(Q, 1, br),
        queries_prep.astype(jnp.float32).reshape(Q, 1, D),
        vec3,
        scl_g.reshape(Q, 1, br),
    )
    return out.reshape(Q, br)
