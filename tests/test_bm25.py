"""BM25 scoring correctness vs a numpy oracle + incremental device updates."""

import numpy as np

from vector_store_tpu.text import tokenizer
from vector_store_tpu.text.bm25 import B, K1, BM25Index

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "a quick brown cat sleeps all day",
    "dogs and cats living together",
    "the fox is quick and the dog is lazy",
    "completely unrelated text about tensor processing units",
    "brown bears eat quick salmon",
]


def np_bm25(docs: list[str], query: str) -> np.ndarray:
    """Reference BM25 with the same tokenizer/idf convention."""
    toks = [tokenizer.term_ids(d) for d in docs]
    n = len(docs)
    avg = max(sum(len(t) for t in toks) / n, 1.0)
    scores = np.zeros(n)
    q_terms = list(dict.fromkeys(tokenizer.term_ids(query)))
    for t in q_terms:
        df = sum(1 for d in toks if t in d)
        idf = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for j, d in enumerate(toks):
            tf = d.count(t)
            scores[j] += idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(d) / avg))
    return scores


def test_bm25_matches_numpy_oracle():
    idx = BM25Index()
    for d in DOCS:
        idx.add(d)
    for query in ("quick fox", "lazy dog", "tensor units", "brown"):
        got = idx.search([query], k=len(DOCS))[0]
        want = np_bm25(DOCS, query)
        want_rank = [int(i) for i in np.argsort(-want) if want[i] > 0]
        got_rank = [slot for slot, _ in got]
        assert got_rank == want_rank, f"{query}: {got_rank} != {want_rank}"
        for slot, score in got:
            np.testing.assert_allclose(score, want[slot], rtol=1e-4)


def test_bm25_incremental_updates_visible():
    idx = BM25Index()
    for d in DOCS[:3]:
        idx.add(d)
    assert idx.search(["fox"], 3)[0][0][0] == 0
    # queries flush device arrays; later adds must still become visible
    s = idx.add("fox fox fox fox")
    hits = idx.search(["fox"], 3)[0]
    assert hits[0][0] == s  # the fox-stuffed doc dominates
    idx.remove(s)
    hits = idx.search(["fox"], 3)[0]
    assert hits[0][0] == 0 and all(h[0] != s for h in hits)
