"""Pure-Python BM25 oracle — the "true program" of the differential-test
pattern (analog of /root/reference/chatgpt_baseline.py: a naive,
obviously-correct implementation the engine must match exactly;
comparison pattern from /root/reference/utils/test-correctness.sh:36-40).

Semantics pinned here (and mirrored by the engine):
  doc        = one transcript turn
  doc_id     = dense rank under stable (conv_id, turn_idx) ordering
  tokens     = regex [a-z0-9]+ on lowercased text
  BM25       = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  idf        = ln(1 + (N - df + 0.5) / (df + 0.5))
  k1=1.2 b=0.75; OR semantics over query terms; duplicate query terms
  count once; ties broken by ascending doc_id.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from capsbm25.tokenize import tokenize_py


class OracleIndex:
    def __init__(self, transcripts: pd.DataFrame, k1: float = 1.2, b: float = 0.75):
        self.k1, self.b = k1, b
        ordered = transcripts.sort_values(
            ["conv_id", "turn_idx"], kind="mergesort"
        ).reset_index(drop=True)
        self.doc_meta = ordered[["conv_id", "turn_idx"]]
        self.docs: list[list[str]] = [tokenize_py(t) for t in ordered["text"]]
        self.N = len(self.docs)
        self.dl = [len(d) for d in self.docs]
        self.avgdl = (sum(self.dl) / self.N) if self.N else 0.0
        # postings: term -> {doc_id: tf}, doc ids ascending by construction
        self.postings: dict[str, dict[int, int]] = defaultdict(dict)
        for doc_id, toks in enumerate(self.docs):
            for term, tf in Counter(toks).items():
                self.postings[term][doc_id] = tf

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def cf(self, term: str) -> int:
        return sum(self.postings.get(term, {}).values())

    def idf(self, term: str) -> float:
        df = self.df(term)
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def score_doc(self, terms: list[str], doc_id: int,
                  boosts: dict[str, float] | None = None) -> float:
        # fixed summation order (sorted unique terms) for bit-stable floats
        s = 0.0
        dl = self.dl[doc_id]
        denom_norm = self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        for t in sorted(set(terms)):
            tf = self.postings.get(t, {}).get(doc_id)
            if tf:
                c = self.idf(t) * (tf * (self.k1 + 1.0)) / (tf + denom_norm)
                if boosts:
                    c *= boosts.get(t, 1.0)
                s += c
        return s

    def topk(
        self, query_text: str, k: int, conjunctive: bool = False,
        doc_filter: set[int] | None = None,
        boosts: dict[str, float] | None = None,
        offset: int = 0,
    ) -> list[tuple[int, float]]:
        terms = sorted(set(tokenize_py(query_text)))
        cand: set[int] = set()
        if conjunctive:
            if not terms or any(t not in self.postings for t in terms):
                return []
            cand = set(self.postings[terms[0]].keys())
            for t in terms[1:]:
                cand &= self.postings[t].keys()
        else:
            for t in terms:
                cand.update(self.postings.get(t, {}).keys())
        if doc_filter is not None:
            # Lucene filter semantics: restricts candidates only —
            # scores (idf/avgdl/N) stay corpus-global
            cand &= doc_filter
        scored = [(d, self.score_doc(terms, d, boosts)) for d in cand]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[offset:offset + k]

    def hit_count(self, query_text: str, conjunctive: bool = False) -> int:
        """Total matching docs (mirrors query.hit_count): OR = any
        term, AND = all distinct terms; OOV term under AND -> 0."""
        terms = sorted(set(tokenize_py(query_text)))
        if not terms:
            return 0
        if conjunctive:
            if any(t not in self.postings for t in terms):
                return 0
            cand = set(self.postings[terms[0]].keys())
            for t in terms[1:]:
                cand &= self.postings[t].keys()
            return len(cand)
        cand: set[int] = set()
        for t in terms:
            cand |= self.postings.get(t, {}).keys()
        return len(cand)

    def synonym_topk(self, query_text: str, k: int
                     ) -> list[tuple[int, float]]:
        """Lucene SynonymQuery semantics (mirrors query.synonym_topk):
        per '|'-group, tf = sum of member tfs per doc, df = max member
        df, BM25 saturation over the blended tf; groups sum."""
        groups = []
        for chunk in query_text.split():
            members: set[str] = set()
            for m in chunk.split("|"):
                members.update(tokenize_py(m))
            if members:
                groups.append(sorted(members))
        per_doc: dict[int, float] = defaultdict(float)
        for members in groups:
            df_g = max((self.df(t) for t in members), default=0)
            idf_g = math.log(
                1.0 + (self.N - df_g + 0.5) / (df_g + 0.5))
            tf_g: dict[int, int] = defaultdict(int)
            for t in members:
                for d, tf in self.postings.get(t, {}).items():
                    tf_g[d] += tf
            for d, tf in tf_g.items():
                denom = tf + self.k1 * (
                    1.0 - self.b + self.b * self.dl[d] / self.avgdl)
                per_doc[d] += idf_g * tf * (self.k1 + 1.0) / denom
        scored = sorted(per_doc.items(), key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def explain(self, query_text: str, doc_ids: list[int]
                ) -> list[tuple[int, str, int, int, int, int, float, float]]:
        """(query_id-less) explain rows: (term, doc, tf, dl, df, idf,
        contrib) for every matching (term, doc) pair — mirrors
        query.explain_scores."""
        out = []
        for t in sorted(set(tokenize_py(query_text))):
            post = self.postings.get(t, {})
            for d in sorted(set(doc_ids)):
                tf = post.get(d)
                if not tf:
                    continue
                dl = self.dl[d]
                denom = tf + self.k1 * (
                    1.0 - self.b + self.b * dl / self.avgdl)
                out.append((t, d, tf, dl, self.df(t), self.idf(t),
                            self.idf(t) * tf * (self.k1 + 1.0) / denom))
        return out

    def boolean_topk(self, must: str, should: str, must_not: str, k: int,
                     doc_filter: set[int] | None = None,
                     doc_exclude: set[int] | None = None,
                     min_should_match: int = 0,
                     ) -> list[tuple[int, float]]:
        """Lucene BooleanQuery semantics (mirrors query.boolean_topk):
        candidates contain ALL must terms (or ANY should term when no
        must clause); docs with ANY must_not term drop; score = BM25
        over matched must+should terms, corpus-global stats."""
        m = sorted(set(tokenize_py(must or "")))
        x = set(tokenize_py(must_not or ""))
        if set(m) & x:
            return []
        s = sorted(set(tokenize_py(should or "")) - set(m) - x)
        if not m and not s:
            return []
        if m:
            if any(t not in self.postings for t in m):
                return []
            cand = set(self.postings[m[0]].keys())
            for t in m[1:]:
                cand &= self.postings[t].keys()
        else:
            cand = set()
            for t in s:
                cand.update(self.postings.get(t, {}).keys())
        if min_should_match:
            if min_should_match > len(s):
                return []
            cand = {
                d for d in cand
                if sum(1 for t in s if d in self.postings.get(t, {}))
                >= min_should_match
            }
        for t in x:
            cand -= self.postings.get(t, {}).keys()
        if doc_filter is not None:
            cand &= doc_filter
        if doc_exclude is not None:
            cand -= doc_exclude
        scored = [(d, self.score_doc(m + s, d)) for d in cand]
        scored.sort(key=lambda t_: (-t_[1], t_[0]))
        return scored[:k]

    def phrase_topk(self, query_text: str, k: int,
                    doc_filter: set[int] | None = None,
                    ) -> list[tuple[int, float]]:
        """Docs containing the query tokens consecutively in order,
        ranked by BM25 over the phrase's distinct terms. doc_filter:
        Lucene filter semantics (candidates only, stats corpus-global)."""
        phrase = tokenize_py(query_text)
        if not phrase:
            return []
        n = len(phrase)
        hits = []
        for doc_id, toks in enumerate(self.docs):
            if doc_filter is not None and doc_id not in doc_filter:
                continue
            if any(toks[i:i + n] == phrase for i in range(len(toks) - n + 1)):
                hits.append(doc_id)
        scored = [(d, self.score_doc(phrase, d)) for d in hits]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def near_topk(self, query_text: str, window: int, k: int,
                  ordered: bool = False,
                  doc_filter: set[int] | None = None,
                  ) -> list[tuple[int, float]]:
        """Proximity oracle, brute force: all distinct query terms
        within a `window`-token span (ordered: positions in term
        order), scored like phrase_topk (BM25 over distinct terms)."""
        import itertools

        distinct = list(dict.fromkeys(tokenize_py(query_text)))
        if not distinct:
            return []
        hits = []
        for doc_id, toks in enumerate(self.docs):
            if doc_filter is not None and doc_id not in doc_filter:
                continue
            pos = {
                t: [i for i, x in enumerate(toks) if x == t]
                for t in distinct
            }
            if any(not p for p in pos.values()):
                continue
            for combo in itertools.product(*(pos[t] for t in distinct)):
                if max(combo) - min(combo) > window - 1:
                    continue
                if ordered and any(
                    combo[i] >= combo[i + 1]
                    for i in range(len(combo) - 1)
                ):
                    continue
                hits.append(doc_id)
                break
        scored = [(d, self.score_doc(distinct, d)) for d in hits]
        scored.sort(key=lambda t_: (-t_[1], t_[0]))
        return scored[:k]

    def phrase_topk_pdf(self, queries: pd.DataFrame,
                        doc_filter: set[int] | None = None) -> pd.DataFrame:
        rows = []
        for q in queries.itertuples(index=False):
            for rank, (doc_id, score) in enumerate(
                self.phrase_topk(q.text, int(q.k), doc_filter=doc_filter), 1
            ):
                rows.append((int(q.query_id), doc_id, score, rank))
        return pd.DataFrame(rows, columns=["query_id", "doc_id", "score", "rank"])

    def topk_pdf(
        self, queries: pd.DataFrame, conjunctive: bool = False,
        doc_filter: set[int] | None = None,
    ) -> pd.DataFrame:
        rows = []
        for q in queries.itertuples(index=False):
            hits = self.topk(q.text, int(q.k), conjunctive=conjunctive,
                             doc_filter=doc_filter)
            for rank, (doc_id, score) in enumerate(hits, 1):
                rows.append((int(q.query_id), doc_id, score, rank))
        return pd.DataFrame(rows, columns=["query_id", "doc_id", "score", "rank"])
