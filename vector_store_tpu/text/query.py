"""simple_query_string subset parser.

The reference's search surface is Lucene ``simple_query_string`` over
``article_content`` (reference: src/index/opensearch.rs:181-194), which
supports operators beyond bag-of-words.  This parser implements the
subset that matters for parity:

  word            scored term (OR is the default combinator)
  +word           required: documents missing it are excluded
  -word           forbidden: documents containing it are excluded
  "a b c"         phrase: all words required, in-order adjacency
                  verified host-side against the stored token sequence
  -"a b c"        negated phrase: documents containing the exact
                  sequence are excluded (host-side check)
  |               recognised and ignored (OR is already the default)

Not implemented (documented non-goals): parentheses, prefix ``*``,
fuzziness ``~N``.  Unknown syntax degrades to plain terms — the same
lenient posture simple_query_string takes on invalid input.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from . import tokenizer

# one lexeme: optional +/- prefix, then a quoted phrase or a bare word
_LEXEME = re.compile(r'([+-]?)("([^"]*)"|[^\s|"]+)')


@dataclass
class ParsedQuery:
    """Normalised query: everything the scorer and filters need."""

    terms: list[int] = field(default_factory=list)  # scored term ids (unique)
    required: list[int] = field(default_factory=list)  # must be present
    forbidden: list[int] = field(default_factory=list)  # must be absent
    phrases: list[list[int]] = field(default_factory=list)  # in-order runs
    neg_phrases: list[list[int]] = field(default_factory=list)

    @property
    def has_operators(self) -> bool:
        return bool(
            self.required or self.forbidden or self.phrases or self.neg_phrases
        )


def parse(text: str) -> ParsedQuery:
    q = ParsedQuery()
    seen: set[int] = set()

    def score(ids: list[int]) -> None:
        for t in ids:
            if t not in seen:
                seen.add(t)
                q.terms.append(t)

    for m in _LEXEME.finditer(text):
        sign, whole, phrase_body = m.group(1), m.group(2), m.group(3)
        if whole == "|":
            continue
        is_phrase = whole.startswith('"')
        ids = tokenizer.term_ids(phrase_body if is_phrase else whole)
        if not ids:
            continue
        if sign == "-":
            if is_phrase and len(ids) > 1:
                q.neg_phrases.append(ids)
            else:
                q.forbidden.extend(t for t in ids if t not in q.forbidden)
        elif is_phrase and len(ids) > 1:
            q.phrases.append(ids)
            q.required.extend(t for t in ids if t not in q.required)
            score(ids)
        elif sign == "+":
            q.required.extend(t for t in ids if t not in q.required)
            score(ids)
        else:
            score(ids)
    return q


def phrase_in(seq, phrase: list[int]) -> bool:
    """True if `phrase` occurs as a contiguous run in token sequence `seq`."""
    n, m = len(seq), len(phrase)
    if m == 0 or n < m:
        return False
    first = phrase[0]
    for i in range(n - m + 1):
        if seq[i] == first and list(seq[i : i + m]) == phrase:
            return True
    return False
