"""Property-based test of the vectorized phrase-occurrence kernel
(query._phrase_occurrences) against an obviously-correct naive scan —
pure numpy, no Spark session. Random token docs + random in-corpus and
out-of-corpus patterns exercise composite-key encoding, duplicate
tokens in the phrase, overlap counting, and candidate restriction."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from capsbm25.query import _phrase_occurrences


def _term_data_from_docs(docs_tokens: dict[int, list[str]]) -> dict:
    """Build the (docs, tfs, dls, pos_flat, bounds) per-term structure
    _merge_term_rows produces, from plain token lists."""
    per_term: dict[str, dict[int, list[int]]] = {}
    for doc_id, toks in docs_tokens.items():
        for pos, t in enumerate(toks):
            per_term.setdefault(t, {}).setdefault(doc_id, []).append(pos)
    out = {}
    for t, by_doc in per_term.items():
        ids = np.array(sorted(by_doc), dtype=np.int64)
        tfs = np.array([len(by_doc[d]) for d in ids], dtype=np.int64)
        dls = np.array([len(docs_tokens[d]) for d in ids], dtype=np.int64)
        pos = np.concatenate(
            [np.array(by_doc[d], dtype=np.int64) for d in ids]
        )
        bounds = np.concatenate(([0], np.cumsum(tfs)))
        out[t] = (ids, tfs, dls, pos, bounds)
    return out


def _naive_occurrences(docs_tokens, phrase):
    hits = {}
    L = len(phrase)
    for d, toks in docs_tokens.items():
        n = sum(
            1
            for i in range(len(toks) - L + 1)
            if toks[i:i + L] == phrase
        )
        if n:
            hits[d] = n
    return hits


VOCAB = ["a", "b", "c", "aa"]


@settings(max_examples=200, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=1, max_size=30),
        min_size=1, max_size=8,
    ),
    phrase=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=4),
    # sparse doc ids exercise the rank (not raw id) key encoding
    id_stride=st.integers(min_value=1, max_value=10_000_000),
)
def test_phrase_occurrences_matches_naive(docs, phrase, id_stride):
    docs_tokens = {i * id_stride: toks for i, toks in enumerate(docs)}
    term_data = _term_data_from_docs(docs_tokens)
    if any(t not in term_data for t in phrase):
        return  # out-of-vocab phrases are rejected before the kernel
    # candidates = docs containing ALL distinct phrase tokens (what the
    # callers compute by posting intersection)
    cand = None
    for t in sorted(set(phrase)):
        ids = term_data[t][0]
        cand = ids if cand is None else np.intersect1d(
            cand, ids, assume_unique=True
        )
    want = _naive_occurrences(docs_tokens, phrase)
    hit_docs, counts = _phrase_occurrences(phrase, term_data, cand)
    got = dict(zip(hit_docs.tolist(), counts.tolist()))
    assert got == want


def test_phrase_occurrences_empty_candidates():
    td = _term_data_from_docs({0: ["a", "b"]})
    hits, counts = _phrase_occurrences(
        ["a", "b"], td, np.array([], dtype=np.int64)
    )
    assert hits.size == 0 and counts.size == 0
