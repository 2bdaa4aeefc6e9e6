"""Native component tests: CPU HNSW baseline, fvecs IO, keymap."""

import os
import tempfile

import numpy as np
import pytest

from vector_store_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_hnsw_baseline_recall(rng):
    n, d, q, k = 3000, 32, 64, 10
    x = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    h = native.HnswBaseline(d, m=16, ef_construction=128, space="l2")
    h.add(x)
    assert len(h) == n
    _, ids = h.search(queries, k, ef=128)
    # exact via numpy
    d2 = ((queries[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    exact = np.argsort(d2, axis=1)[:, :k]
    hits = sum(
        len(set(ids[i].tolist()) & set(exact[i].tolist())) for i in range(q)
    )
    assert hits / (q * k) >= 0.9

    # remove top hit of query 0 → disappears
    top = int(ids[0, 0])
    h.remove(top)
    assert len(h) == n - 1
    _, ids2 = h.search(queries[:1], k, ef=128)
    assert top not in ids2[0].tolist()


def test_fvecs_roundtrip(rng):
    x = rng.normal(size=(100, 16)).astype(np.float32)
    with tempfile.NamedTemporaryFile(suffix=".fvecs", delete=False) as f:
        path = f.name
        for row in x:
            f.write(np.int32(16).tobytes())
            f.write(row.tobytes())
    try:
        got = native.read_fvecs(path, 200, 16)
        np.testing.assert_array_equal(got, x)
    finally:
        os.unlink(path)


def test_native_keymap():
    m = native.NativeKeyMap()
    assert m.bind(100, 0) == -1
    assert m.bind(200, 1) == -1
    assert m.bind(100, 2) == 0  # displaced old slot
    assert m.slot_of(100) == 2
    assert m.key_of(1) == 200
    assert m.key_of(0) is None
    assert len(m) == 2
    assert m.unbind(200) == 1
    assert m.unbind(999) == -1
    assert len(m) == 1

    keys = np.array([7, 8, 9], dtype=np.uint64)
    slots = np.array([10, 11, 12], dtype=np.int32)
    displaced = m.bind_batch(keys, slots)
    assert displaced.tolist() == [-1, -1, -1]
    assert m.slot_of(8) == 11


def test_fastjson_parse_floats_roundtrip():
    import json

    emb = list(np.linspace(-3, 3, 768).astype(float))
    body = json.dumps({"embedding": emb, "limit": 10}).encode()
    out = native.parse_json_floats(body, b"embedding", 8192)
    assert out is not None and out.shape == (768,)
    assert np.allclose(out, np.asarray(emb, np.float32))
    assert native.parse_json_int(body, b"limit", 1) == 10


def test_fastjson_falls_back_on_structural_surprises():
    cases = [
        b'{"x": 1}',                                     # key absent -> None
        b'{"embedding": [1], "y": {"embedding": [2]}}',  # not unique
        b'{"embedding": [1, null]}',                     # non-number
        b'{"embedding": "nope"}',                        # not an array
        b'not json at all',
    ]
    for body in cases:
        assert native.parse_json_floats(body, b"embedding", 16) is None, body
    # key present only as a VALUE -> fall back, never misparse
    assert native.parse_json_floats(b'{"x": "embedding"}', b"embedding", 4) is None
    # empty array parses as empty (route treats it as a dims error)
    out = native.parse_json_floats(b'{"embedding": []}', b"embedding", 4)
    assert out is not None and len(out) == 0
    # over-cap -> None (fallback handles long embeddings)
    assert native.parse_json_floats(b'{"embedding": [1,2,3]}', b"embedding", 2) is None
    # malformed ints -> None; absent -> default
    assert native.parse_json_int(b'{"limit": 1.5}', b"limit", 1) is None
    assert native.parse_json_int(b'{"limit": -2}', b"limit", 1) is None
    assert native.parse_json_int(b'{"x": 0}', b"limit", 7) == 7
