"""Document-sharded BM25 (text/sharded_bm25.py) on the 8-device CPU mesh.

Parity target: the sharded index must be observationally identical to
the single-chip BM25Index — same flat slot ids, same scores — because
the shard deal is an internal layout choice (slot s → shard s % S).
"""

import numpy as np

from vector_store_tpu.text.bm25 import BM25Index
from vector_store_tpu.text.sharded_bm25 import ShardedBM25Index

from test_bm25 import DOCS, np_bm25


def test_sharded_matches_numpy_oracle_and_single_chip():
    sh = ShardedBM25Index(n_devices=8)
    single = BM25Index()
    for d in DOCS:
        assert sh.add(d) == single.add(d)  # identical flat slot allocation
    for query in ("quick fox", "lazy dog", "tensor units", "brown"):
        got = sh.search([query], k=len(DOCS))[0]
        want = np_bm25(DOCS, query)
        want_rank = [int(i) for i in np.argsort(-want) if want[i] > 0]
        assert [slot for slot, _ in got] == want_rank, query
        for slot, score in got:
            np.testing.assert_allclose(score, want[slot], rtol=1e-4)
        ref = single.search([query], k=len(DOCS))[0]
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in ref], rtol=1e-5
        )


def test_sharded_incremental_updates_visible():
    """Dirty-row scatter must land on the right (shard, row) cell."""
    idx = ShardedBM25Index(n_devices=8)
    for d in DOCS[:3]:
        idx.add(d)
    assert idx.search(["fox"], 3)[0][0][0] == 0
    # post-query adds go through the incremental scatter path
    s = idx.add("fox fox fox fox")
    hits = idx.search(["fox"], 3)[0]
    assert hits[0][0] == s
    idx.remove(s)
    hits = idx.search(["fox"], 3)[0]
    assert hits[0][0] == 0 and all(h[0] != s for h in hits)


def test_sharded_operators_and_phrases():
    """Device masks and host-side phrase verify both key off flat slots."""
    idx = ShardedBM25Index(n_devices=4)
    s0 = idx.add("the quick brown fox jumps over the lazy dog")
    s1 = idx.add("a quick brown cat sleeps all day")
    s2 = idx.add("the brown bear eats quick salmon")

    hits = idx.search(["quick -fox"], 5)[0]
    got = {h[0] for h in hits}
    assert s0 not in got and {s1, s2} <= got

    hits = idx.search(["brown +cat"], 5)[0]
    assert {h[0] for h in hits} == {s1}

    hits = idx.search(['"quick brown"'], 5)[0]
    assert {h[0] for h in hits} == {s0, s1}

    # AST path (parens + infix) verifies host-side over sharded top-k
    got = {h[0] for h in idx.search(["(cat | salmon) + brown"], 5)[0]}
    assert got == {s1, s2}


def test_sharded_growth_reuploads_stacked_banks():
    """Crossing the per-shard row bucket forces a full stacked re-upload;
    pre-growth documents must stay queryable with exact scores."""
    rng = np.random.default_rng(3)
    vocab = [f"term{i}" for i in range(30)]
    idx = ShardedBM25Index(n_devices=4, initial_capacity=1024)
    idx.MIN_SHARD_ROWS = 4  # shrink the bucket floor so growth is reachable
    docs = []
    probe = "term7 term11"
    for _ in range(20):
        docs.append(" ".join(rng.choice(vocab, size=6, replace=True)))
        idx.add(docs[-1])
    idx.search([probe], 5)  # materialize pre-growth device arrays
    rows_before = idx._dev_rows
    while idx._dev_rows == rows_before:
        docs.append(" ".join(rng.choice(vocab, size=6, replace=True)))
        idx.add(docs[-1])
        idx.search([probe], 5)
    got = idx.search([probe], k=10)[0]
    want = np_bm25(docs, probe)
    for slot, score in got:
        np.testing.assert_allclose(score, want[slot], rtol=1e-3)
    kth = sorted(want, reverse=True)[len(got) - 1] if got else 0.0
    assert all(s >= kth - 1e-4 for _, s in got)


def test_sharded_random_churn_matches_oracle():
    """The single-chip churn fuzz (test_bm25.py) over the sharded index:
    add/remove storms keep df/avg-len global and the scatter protocol
    must land every mutation on the right (shard, row) cell."""
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(14)]
    idx = ShardedBM25Index(n_devices=8)
    live: dict[int, str] = {}
    for step in range(24):
        if live and rng.random() < 0.35:
            for slot in rng.choice(
                list(live), size=min(2, len(live)), replace=False
            ):
                idx.remove(int(slot))
                live.pop(int(slot))
        else:
            for _ in range(int(rng.integers(1, 4))):
                words = rng.choice(
                    vocab, size=int(rng.integers(2, 9)), replace=True
                )
                text = " ".join(words)
                live[idx.add(text)] = text
        if not live or step % 4:
            continue
        q = " ".join(
            rng.choice(vocab, size=int(rng.integers(1, 4)), replace=False)
        )
        k = min(5, len(live))
        got = idx.search([q], k)[0]
        slots = sorted(live)
        want = np_bm25([live[s] for s in slots], q)
        by_slot = {s: want[j] for j, s in enumerate(slots)}
        for slot, score in got:
            assert slot in live, f"step {step}: dead slot {slot}"
            np.testing.assert_allclose(
                score, by_slot[slot], rtol=1e-3, atol=1e-5
            )
        scores = sorted(want, reverse=True)
        kth = scores[k - 1] if len(scores) >= k else 0.0
        returned = [s for _, s in got]
        assert all(
            s >= kth - 1e-4 for s in returned
        ), f"step {step}: sub-k result {returned} vs kth={kth}"
