"""Checkpoint/restore round-trip (the gap the reference left open, SURVEY §5)."""

import os
import tempfile

import numpy as np
import pytest

from vector_store_tpu.core import SlotIndex, persist
from vector_store_tpu.types import IndexParams


def test_snapshot_roundtrip(rng):
    idx = SlotIndex(
        IndexParams(dimensions=16, space="l2", dtype="float32"),
        initial_capacity=2048,
    )
    x = rng.normal(size=(500, 16)).astype(np.float32)
    slots = idx.add(x)
    idx.remove(slots[:50])

    d0, i0 = idx.search(x[100], 5)

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "snap.npz")
        persist.save(path, idx, keymap_blob={"hello": 1})
        restored, blob = persist.load(path)

    assert blob == {"hello": 1}
    assert restored.count() == 450
    d1, i1 = restored.search(x[100], 5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(d0, d1, rtol=1e-5)

    # restored index accepts further writes
    more = restored.add(rng.normal(size=(10, 16)).astype(np.float32))
    assert restored.count() == 460
    assert more[0] == 500


def test_snapshot_roundtrip_int8(rng):
    """Quantized banks round-trip exactly (raw int8 values + scales)."""
    idx = SlotIndex(
        IndexParams(dimensions=16, space="cosine", dtype="int8"),
        initial_capacity=2048,
    )
    x = rng.normal(size=(200, 16)).astype(np.float32)
    idx.add(x)
    d0, i0 = idx.search(x[42], 3)

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "snap8.npz")
        persist.save(path, idx)
        restored, _ = persist.load(path)
        # int8 banks snapshot in native width — the file must be nearer
        # 1 byte/dim than the 4 bytes/dim an f32 cast would produce
        raw = 2048 * 16  # capacity × dims bytes at 1 B/dim
        assert os.path.getsize(path) < 3 * raw
    assert restored.state.vectors.dtype.name == "int8"
    d1, i1 = restored.search(x[42], 3)
    assert i1[0] == i0[0] == 42


def test_snapshot_preserves_exact_mode_block(rng):
    """Exact-mode indexes restore with their big ingest block.

    Regression: round 1 hardcoded insert_block=256 on load, so a
    restored exact index silently reverted to small-block ingest."""
    idx = SlotIndex(
        IndexParams(dimensions=8, space="l2", dtype="float32"),
        exact=True,
    )
    x = rng.normal(size=(100, 8)).astype(np.float32)
    idx.add(x)
    assert idx.insert_block >= 4096

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "snap_exact.npz")
        persist.save(path, idx)
        restored, _ = persist.load(path)
    assert restored._exact is True
    assert restored.insert_block == idx.insert_block
    d, i = restored.search(x[7], 1)
    assert i[0] == 7


@pytest.mark.slow
def test_bm25_snapshot_roundtrip(tmp_path):
    """Text-index checkpoint: scores, expansions, and df bookkeeping all
    survive a save -> load cycle (single-chip and sharded)."""
    from vector_store_tpu.text.bm25 import BM25Index
    from vector_store_tpu.text.sharded_bm25 import ShardedBM25Index

    src = BM25Index()
    s0 = src.add("the quick brown fox jumps over the lazy dog")
    s1 = src.add("appliance parts and apple catalogs")
    s2 = src.add("tensor processing units score text")
    src.remove(s1)
    src.add("a quick brown cat sleeps")  # reuses no slot; frontier grows
    path = str(tmp_path / "bm25.npz")
    src.save(path)

    for cls, kw in ((BM25Index, {}), (ShardedBM25Index, {"n_devices": 4})):
        idx = cls.load(path, **kw)
        assert idx.count() == src.count()
        want = src.search(["quick fox", "tensor units"], 4)
        got = idx.search(["quick fox", "tensor units"], 4)
        for w, g in zip(want, got):
            assert [s for s, _ in w] == [s for s, _ in g]
            np.testing.assert_allclose(
                [x for _, x in w], [x for _, x in g], rtol=1e-5
            )
        # removed doc's unique terms must not expand (df rebuilt at 0)
        assert idx.expand_prefix("applianc", 5) == []
        assert set(idx.expand_prefix("quic", 5)) == set(
            src.expand_prefix("quic", 5)
        )
        # phrase sequences restored (host verify path)
        assert {h[0] for h in idx.search(['"quick brown"'], 5)[0]} == {
            h[0] for h in src.search(['"quick brown"'], 5)[0]
        }
        # post-load mutations keep working
        s_new = idx.add("fox fox fox")
        assert idx.search(["fox"], 1)[0][0][0] == s_new
        assert s2 in {h[0] for h in idx.search(["tensor"], 3)[0]}


def test_fused_gather_default_and_env_override(monkeypatch):
    """fused_gather defaults per backend (OFF on this CPU harness, ON on
    a real TPU) and VST_GRAPH_FUSED forces it either way."""
    from vector_store_tpu.core.index import config_from_params, default_fused_gather

    monkeypatch.delenv("VST_GRAPH_FUSED", raising=False)
    assert default_fused_gather() is False  # conftest pins JAX_PLATFORMS=cpu
    monkeypatch.setenv("VST_GRAPH_FUSED", "1")
    assert default_fused_gather() is True
    assert config_from_params(IndexParams(dimensions=16)).fused_gather is True
    monkeypatch.setenv("VST_GRAPH_FUSED", "0")
    assert default_fused_gather() is False


def test_snapshot_load_rederives_fused_gather(rng, monkeypatch):
    """fused_gather is execution policy, not index data: a snapshot
    written with it ON (e.g. on a TPU host) must load with the LOADING
    backend's default, or a CPU restore would die inside Mosaic."""
    monkeypatch.setenv("VST_GRAPH_FUSED", "1")
    idx = SlotIndex(IndexParams(dimensions=16), initial_capacity=2048)
    assert idx.cfg.fused_gather is True
    # adds would trip the (unavailable-on-cpu) kernel — snapshot empty
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "snap.npz")
        persist.save(path, idx)
        monkeypatch.delenv("VST_GRAPH_FUSED")
        restored, _ = persist.load(path)
    assert restored.cfg.fused_gather is False
    # and the restored index is actually usable on this backend
    restored.add(rng.normal(size=(32, 16)).astype(np.float32))
    d, i = restored.search(np.zeros(16, np.float32), 3)
    assert len(i) == 3
