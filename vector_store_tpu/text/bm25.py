"""TPU-scored BM25 text index.

Replaces the OpenSearch/Lucene backend of the reference (src/index/
opensearch.rs:157-210) with a device-resident scorer: documents live in
HBM as fixed-shape hashed-term-id arrays and a whole query batch is
scored against every document in one jitted pass — term-match counting
is a VPU-wide equality reduction, streamed chunk-by-chunk like the
brute-force vector scan.

    tokens  [C, L]  int32 hashed term ids, 0-padded (PAD)
    length  [C]     int32 true token count (BM25 length norm)
    valid   [C]     bool

Scoring is standard BM25 (k1=1.2, b=0.75) with idf from live document
frequencies tracked host-side at add/remove time.  Exact tf — the hash
only folds the vocabulary (collisions merge rare terms, the standard
hashed-vocabulary trade).
"""

from __future__ import annotations

import functools
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

from ..core.topk import INF, SENTINEL
from . import tokenizer

K1 = 1.2
B = 0.75
PAD = 0

MAX_DOC_TOKENS = 256  # L: tokens kept per document (head truncation)
MAX_QUERY_TERMS = 16  # T: query terms scored (first T unique)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _score_topk(
    tokens: jnp.ndarray,  # [C, L] int32
    length: jnp.ndarray,  # [C] int32
    valid: jnp.ndarray,  # [C] bool
    q_terms: jnp.ndarray,  # [Q, T] int32, PAD-padded
    q_idf: jnp.ndarray,  # [Q, T] f32 (0 for PAD)
    avg_len: jnp.ndarray,  # [] f32
    k: int,
    chunk: int = 1 << 13,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """BM25 top-k: returns (score[Q,k] descending, ids[Q,k])."""
    C, L = tokens.shape
    Q, T = q_terms.shape
    n_chunks = -(-C // chunk)
    pad = n_chunks * chunk - C
    if pad:
        tokens = jnp.pad(tokens, ((0, pad), (0, 0)), constant_values=PAD)
        length = jnp.pad(length, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    tok_c = tokens.reshape(n_chunks, chunk, L)
    len_c = length.reshape(n_chunks, chunk)
    val_c = valid.reshape(n_chunks, chunk)

    init = (
        jnp.full((Q, k), -INF),
        jnp.full((Q, k), SENTINEL, dtype=jnp.int32),
    )

    def body(carry, inp):
        best_s, best_i = carry
        toks, lens, vals, cidx = inp
        # tf[q, c, t] = occurrences of query term t in doc c
        eq = toks[None, :, :, None] == q_terms[:, None, None, :]  # [Q,c,L,T]
        tf = jnp.sum(eq, axis=2).astype(jnp.float32)  # [Q, c, T]
        norm = 1.0 - B + B * (lens.astype(jnp.float32) / avg_len)  # [c]
        denom = tf + (K1 * norm)[None, :, None]
        s = jnp.sum(q_idf[:, None, :] * tf * (K1 + 1.0) / denom, axis=-1)
        s = jnp.where(vals[None, :], s, -INF)
        cs, ci = jax.lax.top_k(s, min(k, chunk))
        ci = ci + cidx * chunk
        ci = jnp.where(jnp.isinf(cs), SENTINEL, ci)
        ms = jnp.concatenate([best_s, cs], axis=-1)
        mi = jnp.concatenate([best_i, ci], axis=-1)
        ns, pos = jax.lax.top_k(ms, k)
        ni = jnp.take_along_axis(mi, pos, axis=-1)
        return (ns, ni), None

    (best_s, best_i), _ = jax.lax.scan(
        body, init, (tok_c, len_c, val_c, jnp.arange(n_chunks, dtype=jnp.int32))
    )
    return best_s, best_i


class BM25Index:
    """Slot-addressed text index (the SlotIndex analogue for text).

    Host keeps tokenisation, document frequencies and slot allocation;
    the device keeps token arrays and does all scoring.
    """

    QUERY_BUCKETS = (1, 8, 32, 128)

    def __init__(self, initial_capacity: int = 1 << 14) -> None:
        cap = max(initial_capacity, 1024)
        self._tokens = np.zeros((cap, MAX_DOC_TOKENS), dtype=np.int32)
        self._length = np.zeros((cap,), dtype=np.int32)
        self._valid = np.zeros((cap,), dtype=bool)
        self._frontier = 0
        self._size = 0
        self._df: Counter = Counter()  # term id → doc frequency
        self._total_len = 0
        # device arrays are the scoring source of truth; host mutations
        # accumulate in `_dirty_slots` and flush as one row scatter per
        # query (not a full re-upload — documents are long-lived)
        self._dirty_slots: set[int] = set()
        self._dev = None  # (tokens, length, valid) device arrays
        self._dev_rows = 0  # device array row count (grows with frontier)

    # -- mutation ---------------------------------------------------------

    def _grow(self, need: int) -> None:
        cap = self._tokens.shape[0]
        if need <= cap:
            return
        new_cap = cap
        while new_cap < need:
            new_cap *= 2
        self._tokens = np.pad(self._tokens, ((0, new_cap - cap), (0, 0)))
        self._length = np.pad(self._length, (0, new_cap - cap))
        self._valid = np.pad(self._valid, (0, new_cap - cap))

    def add(self, text: str) -> int:
        """Insert a document, returns its slot."""
        ids = tokenizer.term_ids(text)
        slot = self._frontier
        self._grow(slot + 1)
        kept = ids[:MAX_DOC_TOKENS]
        self._tokens[slot, : len(kept)] = kept
        self._tokens[slot, len(kept):] = PAD
        self._length[slot] = len(ids)
        self._valid[slot] = True
        self._frontier += 1
        self._size += 1
        self._df.update(set(ids))
        self._total_len += len(ids)
        self._dirty_slots.add(slot)
        return slot

    def remove(self, slot: int) -> None:
        if not (0 <= slot < self._frontier) or not self._valid[slot]:
            return
        ids = [t for t in self._tokens[slot] if t != PAD]
        self._df.subtract(set(ids))
        self._total_len -= int(self._length[slot])
        self._valid[slot] = False
        self._size -= 1
        self._dirty_slots.add(slot)

    def count(self) -> int:
        return self._size

    # -- query ------------------------------------------------------------

    def _device_arrays(self):
        # pad device rows to a power-of-two bucket so growth (full upload)
        # is a doubling event, not a per-add one; padded rows score as
        # invalid (host _valid is False beyond the frontier)
        rows = 1 << max(self._frontier, 1024).bit_length()
        rows = min(rows, self._tokens.shape[0])
        if self._dev is None or self._dev_rows != rows:
            # (re)size: full upload — happens on first query after growth,
            # amortised by the doubling host capacity
            self._dev = (
                jnp.asarray(self._tokens[:rows]),
                jnp.asarray(self._length[:rows]),
                jnp.asarray(self._valid[:rows]),
            )
            self._dev_rows = rows
            self._dirty_slots.clear()
        elif self._dirty_slots:
            # incremental: scatter only the mutated rows
            slots = np.fromiter(self._dirty_slots, dtype=np.int32)
            slots = slots[slots < rows]
            tok, length, valid = self._dev
            idx = jnp.asarray(slots)
            self._dev = (
                tok.at[idx].set(jnp.asarray(self._tokens[slots])),
                length.at[idx].set(jnp.asarray(self._length[slots])),
                valid.at[idx].set(jnp.asarray(self._valid[slots])),
            )
            self._dirty_slots.clear()
        return self._dev

    def _idf(self, term: int) -> float:
        n, df = max(self._size, 1), self._df.get(term, 0)
        return float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))

    def search(self, texts: list[str], k: int) -> list[list[tuple[int, float]]]:
        """Batch of query strings → per query [(slot, score) descending]."""
        if self._size == 0:
            return [[] for _ in texts]
        Q = len(texts)
        b = next((x for x in self.QUERY_BUCKETS if Q <= x), Q)
        q_terms = np.zeros((b, MAX_QUERY_TERMS), dtype=np.int32)
        q_idf = np.zeros((b, MAX_QUERY_TERMS), dtype=np.float32)
        for j, text in enumerate(texts):
            uniq = list(dict.fromkeys(tokenizer.term_ids(text)))[:MAX_QUERY_TERMS]
            q_terms[j, : len(uniq)] = uniq
            q_idf[j, : len(uniq)] = [self._idf(t) for t in uniq]
        tokens, length, valid = self._device_arrays()
        avg = np.float32(max(self._total_len / max(self._size, 1), 1.0))
        scores, ids = _score_topk(
            tokens, length, valid, jnp.asarray(q_terms), jnp.asarray(q_idf), jnp.float32(avg), k
        )
        scores, ids = np.asarray(scores), np.asarray(ids)
        out = []
        for j in range(Q):
            hits = [
                (int(s), float(sc))
                for s, sc in zip(ids[j], scores[j])
                if s != 2**31 - 1 and np.isfinite(sc) and sc > 0
            ]
            out.append(hits)
        return out
