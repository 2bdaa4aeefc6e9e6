"""Fused gather+score kernel for graph beam search — interpret-mode
tests on the CPU mesh (the real-chip path is A/B'd by bench.py's graph
phase, which keeps whichever of fused/XLA is faster)."""

import dataclasses

import numpy as np
import pytest

from vector_store_tpu.core import SlotIndex
from vector_store_tpu.core.search import search_impl
from vector_store_tpu.types import IndexParams


def _build(dtype, n=2500, d=128):
    idx = SlotIndex(
        IndexParams(dimensions=d, space="cosine", dtype=dtype),
        initial_capacity=4096,
    )
    rng = np.random.default_rng(4)
    x = rng.normal(size=(n, d)).astype(np.float32)
    idx.add(x)
    return idx, x


def test_kernel_matches_reference_scoring():
    """gather_score_fused ≡ gather + matvec on random candidate sets,
    all spaces, quantized and not."""
    import jax.numpy as jnp

    from vector_store_tpu.core.graph_pallas import gather_score_fused

    rng = np.random.default_rng(0)
    C, D, Q, BR = 512, 256, 16, 64
    for space, quant in [
        ("cosine", False), ("l2", False), ("dot", False), ("cosine", True)
    ]:
        if quant:
            v8 = rng.integers(-127, 128, size=(C, D)).astype(np.int8)
            scl = rng.uniform(0.005, 0.02, size=(C,)).astype(np.float32)
            vecs = jnp.asarray(v8)
            rows_f = v8.astype(np.float32) * scl[:, None]
        else:
            rows_f = rng.normal(size=(C, D)).astype(np.float32)
            if space == "cosine":
                rows_f /= np.linalg.norm(rows_f, axis=1, keepdims=True)
            vecs = jnp.asarray(rows_f)
            scl = np.ones((C,), np.float32)
        q = rng.normal(size=(Q, D)).astype(np.float32)
        if space == "cosine":
            q /= np.linalg.norm(q, axis=1, keepdims=True)
        cand = rng.integers(0, C, size=(Q, BR)).astype(np.int32)
        got = np.asarray(
            gather_score_fused(
                vecs, jnp.asarray(scl), jnp.asarray(q), jnp.asarray(cand),
                space, quant, interpret=True,
            )
        )
        g = rows_f[cand]  # [Q, BR, D]
        dots = np.einsum("qd,qbd->qb", q, g)
        if space == "l2":
            ref = (q * q).sum(-1)[:, None] + (g * g).sum(-1) - 2 * dots
        elif space == "dot":
            ref = -dots
        else:
            ref = 1.0 - dots
        err = np.max(np.abs(got - ref))
        assert err < (2e-2 if quant else 1e-3), (space, quant, err)


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_fused_search_tracks_xla_path(monkeypatch, dtype):
    """End-to-end beam search with fused_gather=True must surface the
    same neighbourhoods as the XLA gather path.  Exact id equality is
    NOT required — the kernel scores in f32 while the XLA path scores
    in the compute dtype, and the beam's tie-breaks can diverge — so
    the contract is top-k overlap plus self-lookup."""
    import jax.numpy as jnp

    monkeypatch.setenv("VST_PALLAS_INTERPRET", "1")
    idx, x = _build(dtype)
    rng = np.random.default_rng(9)
    qi = rng.choice(len(x), 16, replace=False)
    q = x[qi] + 0.01 * rng.normal(size=(16, x.shape[1])).astype(np.float32)
    qd = jnp.asarray(q.astype(np.float32))

    d0, i0 = search_impl(idx.state, qd, idx.cfg, 10)
    cfg_f = dataclasses.replace(idx.cfg, fused_gather=True)
    d1, i1 = search_impl(idx.state, qd, cfg_f, 10)

    i0, i1 = np.asarray(i0), np.asarray(i1)
    overlap = np.mean(
        [len(set(i0[r]) & set(i1[r])) / 10.0 for r in range(len(i0))]
    )
    assert overlap >= 0.9, overlap
    assert (i1[:, 0] == qi).all()  # self-lookup top-1 through the kernel


def test_fused_search_ragged_batch_falls_back(monkeypatch):
    """A batch not divisible by the query group must trace the XLA path
    (static shape check), not crash."""
    import jax.numpy as jnp

    monkeypatch.setenv("VST_PALLAS_INTERPRET", "1")
    idx, x = _build("float32", n=600)
    cfg_f = dataclasses.replace(idx.cfg, fused_gather=True)
    q = jnp.asarray(x[:3].astype(np.float32))  # 3 % 8 != 0
    d, i = search_impl(idx.state, q, cfg_f, 5)
    assert (np.asarray(i)[:, 0] == np.arange(3)).all()


def test_fused_search_composes_with_shard_map(monkeypatch):
    """The fused expand kernel must trace and run inside the sharded
    search's shard_map (queries replicated, bank sharded): every shard
    runs the kernel over its local bank, then gid-merge as usual."""
    import jax

    from vector_store_tpu.shard import ShardedSlotIndex, make_mesh
    from vector_store_tpu.types import IndexParams

    monkeypatch.setenv("VST_PALLAS_INTERPRET", "1")
    assert len(jax.devices()) == 8
    idx = ShardedSlotIndex(
        IndexParams(dimensions=32, space="cosine"),
        mesh=make_mesh(8),
        initial_capacity_per_shard=512,
    )
    rng = np.random.default_rng(11)
    x = rng.normal(size=(800, 32)).astype(np.float32)
    gids = idx.add(x)

    d0, i0 = idx.search(x[:16], 5)
    idx.cfg = dataclasses.replace(idx.cfg, fused_gather=True)
    d1, i1 = idx.search(x[:16], 5)

    assert (i1[:, 0] == gids[:16]).all()  # self-lookup through the kernel
    overlap = np.mean(
        [len(set(i0[r]) & set(i1[r])) / 5.0 for r in range(len(i0))]
    )
    assert overlap >= 0.9, overlap
