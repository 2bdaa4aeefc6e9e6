"""Int8 quantized index tests (BASELINE config 3: memory parity mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vector_store_tpu.core import SlotIndex
from vector_store_tpu.core.quantize import dequantize_rows, quantize_rows
from vector_store_tpu.types import IndexParams


def test_quantize_roundtrip(rng):
    x = rng.normal(size=(64, 32)).astype(np.float32)
    q, s = quantize_rows(jnp.asarray(x))
    assert q.dtype == jnp.int8
    back = np.asarray(dequantize_rows(q, s))
    # max error ≤ scale/2 per element
    err = np.abs(back - x)
    bound = np.asarray(s)[:, None] * 0.5 + 1e-6
    assert (err <= bound).all()


@pytest.mark.parametrize("space", ["l2", "cosine"])
def test_int8_index_recall(rng, space):
    n, d, q, k = 4000, 32, 64, 10
    x = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    idx = SlotIndex(
        IndexParams(dimensions=d, space=space, dtype="int8"),
        initial_capacity=8192,
    )
    assert idx.state.vectors.dtype == jnp.int8
    idx.add(x)
    _, approx = idx.search(queries, k)

    # oracle: full-precision index on the same data
    ref = SlotIndex(
        IndexParams(dimensions=d, space=space, dtype="float32"),
        initial_capacity=8192,
        exact=True,
    )
    ref.add(x)
    _, exact = ref.search(queries, k)
    hits = sum(
        len(set(approx[j].tolist()) & set(exact[j].tolist())) for j in range(q)
    )
    recall = hits / (q * k)
    assert recall >= 0.9, f"int8 recall@{k}={recall:.3f} ({space})"


def test_int8_memory_is_quarter(rng):
    idx8 = SlotIndex(
        IndexParams(dimensions=64, dtype="int8"), initial_capacity=4096
    )
    idx32 = SlotIndex(
        IndexParams(dimensions=64, dtype="float32"), initial_capacity=4096
    )
    assert idx8.state.vectors.nbytes * 4 == idx32.state.vectors.nbytes
