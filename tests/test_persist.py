"""Checkpoint/restore round-trip (the gap the reference left open, SURVEY §5)."""

import os
import tempfile

import numpy as np

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
