"""Graph index build/search tests: identity, replace, remove, recall.

Ports the behavioural content of the reference's usearch unit test
(src/index/usearch.rs:313-426) to the slot level, plus the recall-vs-
brute-force oracle the reference never had (SURVEY §4 gap).
"""

import numpy as np
import pytest

from vector_store_tpu.core import SlotIndex
from vector_store_tpu.types import IndexParams


def test_small_identity_l2():
    """add 3 vectors, top-1 identity — reference usearch.rs:322-372."""
    idx = SlotIndex(IndexParams(dimensions=3, space="l2"), initial_capacity=1024)
    slots = idx.add(np.array([[1, 1, 1], [2, -2, 2], [3, 3, 3]], dtype=np.float32))
    assert idx.count() == 3
    d, i = idx.search(np.array([2.2, -2.2, 2.2], dtype=np.float32), 1)
    assert i[0] == slots[1]

    # replace semantics = remove + add (engine does this via keymap)
    idx.remove(slots[2:3])
    new_slot = idx.add(np.array([[2.1, -2.1, 2.1]], dtype=np.float32))
    d, i = idx.search(np.array([2.2, -2.2, 2.2], dtype=np.float32), 1)
    assert i[0] == new_slot[0]

    # remove → next-best returned (usearch.rs:400-424)
    idx.remove(new_slot)
    assert idx.count() == 2
    d, i = idx.search(np.array([2.2, -2.2, 2.2], dtype=np.float32), 1)
    assert i[0] == slots[1]


def test_fewer_results_than_k():
    idx = SlotIndex(IndexParams(dimensions=4, space="l2"), initial_capacity=1024)
    idx.add(np.eye(4, dtype=np.float32)[:2])
    d, i = idx.search(np.ones((4,), dtype=np.float32), 10)
    assert (i >= 0).sum() == 2
    assert np.isinf(d[2:]).all()


def test_empty_index_search():
    idx = SlotIndex(IndexParams(dimensions=8), initial_capacity=1024)
    d, i = idx.search(np.ones((8,), dtype=np.float32), 3)
    assert (i == -1).all()


def test_capacity_growth(rng):
    idx = SlotIndex(IndexParams(dimensions=8, space="l2"), initial_capacity=512)
    x = rng.normal(size=(1500, 8)).astype(np.float32)
    idx.add(x)
    assert idx.count() == 1500
    assert idx.capacity >= 1500
    # nearest of a stored point is itself
    d, i = idx.search(x[1234], 1)
    assert i[0] == 1234


@pytest.mark.parametrize("space", ["l2", "cosine"])
def test_recall_vs_bruteforce(rng, space):
    """recall@10 ≥ 0.95 against the exact oracle (BASELINE.md target)."""
    n, d, q, k = 4000, 32, 64, 10
    x = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(q, d)).astype(np.float32)
    idx = SlotIndex(IndexParams(dimensions=d, space=space), initial_capacity=8192)
    idx.add(x)
    _, approx = idx.search(queries, k)
    _, exact = idx.exact_search(queries, k)
    hits = sum(
        len(set(approx[j].tolist()) & set(exact[j].tolist())) for j in range(q)
    )
    recall = hits / (q * k)
    assert recall >= 0.95, f"recall@{k}={recall:.3f} ({space})"


def test_recall_under_churn(rng):
    """deletes + reinserts keep recall (BASELINE config 4 in miniature)."""
    n, d, k = 2000, 16, 10
    x = rng.normal(size=(n, d)).astype(np.float32)
    idx = SlotIndex(IndexParams(dimensions=d, space="l2"), initial_capacity=8192)
    slots = idx.add(x)
    # delete a third, insert replacements
    dead = rng.choice(n, size=n // 3, replace=False)
    idx.remove(slots[dead])
    x2 = rng.normal(size=(len(dead), d)).astype(np.float32)
    idx.add(x2)
    assert idx.count() == n
    queries = rng.normal(size=(32, d)).astype(np.float32)
    _, approx = idx.search(queries, k)
    _, exact = idx.exact_search(queries, k)
    hits = sum(
        len(set(approx[j].tolist()) & set(exact[j].tolist())) for j in range(32)
    )
    recall = hits / (32 * k)
    assert recall >= 0.9, f"churn recall@{k}={recall:.3f}"
    # no tombstoned slot may surface
    assert not np.isin(approx, slots[dead]).any()
