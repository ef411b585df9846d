"""Query-string parser: one user-facing string per query, composed
over the engine's clause surfaces (the Lucene classic-QueryParser
+/- prefix subset).

Syntax (whitespace-separated clauses):

  term            bare term            -> SHOULD (default_operator="or")
  +term           required             -> MUST
  -term           prohibited           -> MUST_NOT
  term^2.5        boosted term (Lucene ^boost)
  "a b c"         exact phrase (positional index required)
  "a b c"~2       proximity phrase: tokens in ORDER within
                  len(phrase)+slop positions (ordered-NEAR analog of
                  Lucene's sloppy PhraseQuery; equal at slop=0, and a
                  documented deviation above it — Lucene's slop counts
                  move operations, this counts span slack)
  wild*  w?ld     wildcard / prefix expansion
  term~  term~1   fuzzy (Levenshtein <= N; ~ alone = 2, Lucene's default)
  /so.t/          regexp clause (Lucene RegexpQuery syntax, round 7):
  /s.*(m|t)/^2    docs containing ANY dictionary term the pattern
                  FULLY matches (anchored) — the Java-regex/RE2 common
                  subset regexp_topk accepts (lowercase, no backslash
                  escapes / lookaround / backreferences; braces only
                  as {m}/{m,}/{m,n} quantifiers); constant-score like
                  the other expansion clauses; the pattern itself may
                  not contain whitespace or `/` (neither is in the
                  accepted charset)
  [a TO b]        term range (Lucene TermRangeQuery, round 7): docs
  {a TO b}        containing ANY dictionary term in the range — [ ]
  [a TO b}^2      inclusive, { } exclusive, mixed allowed; `*` opens
                  a side ([a TO *]); TO must be uppercase (Lucene);
                  constant-score like the other expansion clauses
  (a b)  +(a b)   boolean group, ONE nesting level (round 7): members
  -(c d) (a b)^2  combine by OR — `+( )` is satisfied by ANY member
                  (Lucene BooleanQuery-as-MUST), `-( )` excludes docs
                  matching ANY member, `^boost` scales every member;
                  members may be any clause shape above, but signs
                  inside a group and nested groups raise
  field:value     field clause (round 7): `text:...` re-dispatches to
  +conv_id:c7^2   the default-field shapes above (Lucene's field-
                  scoped sub-query); any OTHER field is a METADATA
                  match — exact, unanalyzed equality against that
                  column of the engine's per-doc metadata
                  (query_string_topk's doc_fields frame, e.g.
                  load_doc_stats' conv_id / turn_idx) — constant-score
                  like the expansion clauses; +field:v filters,
                  -field:v excludes (Lucene keyword-field TermQuery)
  f:[2 TO 10]     metadata RANGE clause (Lucene IntPoint/LongPoint
  f:{a TO z}^2    range analog, round 7): bounds compare in the
                  metadata column's OWN type — numeric columns
                  numerically (10 > 2, not "10" < "2"), timestamps as
                  timestamps, strings lexicographically; [ ] / { }
                  inclusivity, `*` opens a side, same roles/boost as
                  field equality; an unparseable bound for the
                  column's type raises

  a AND b         operator keywords (round 7 — Lucene classic
  a OR b NOT c    QueryParserBase.addClause semantics, exactly;
  a && b  || !c   whitespace-separated && / || / ! aliases and glued
                  !term accepted like Lucene's lexer): AND
                  promotes BOTH neighbouring clauses to MUST (the
                  preceding one retroactively, unless prohibited);
                  OR leaves neighbours optional (and under
                  default_operator="and" demotes the preceding clause
                  to SHOULD); NOT prohibits the next clause like `-`.
                  Operators bind between top-level clause units of any
                  shape (term, phrase, group, range, field, regexp);
                  Lucene quirks mirrored: `a OR +b` ignores the `+`
                  under default_operator="and", `-a AND b` does not
                  promote the prohibited `-a`. Misplaced operators
                  (leading/trailing/doubled, NOT NOT, a sign on a
                  keyword, operators inside a group) raise; under
                  default_operator="and" a ( ) group adjacent to OR
                  raises (the flattened group has no single-clause
                  occur)

A multi-token bare chunk contributes one clause PER TOKEN (same
role/boost). Unsupported classic-parser syntax raises ValueError
rather than silently mis-parsing: the TO
keyword outside a range, | or stray [ ] { } inside a bare chunk (a range
must be its own whitespace-separated chunk; synonym groups have a
dedicated surface: synonym_topk), a quoted /
wildcarded / empty metadata-field value (keyword fields are
unanalyzed — only exact equality is supported), a `:` that is not a
legal field prefix, nested or
signed-member groups, `-( )` under default_operator="and" (the
default operator applies INSIDE groups, and NOT-of-AND has no
per-member exclusion form), malformed
quote/suffix shapes (a quote inside a bare chunk, anything but
~slop^boost glued to a closing quote, anything but ^boost glued to a
closing paren, a second ^boost), a sloppy
phrase repeating a token (the proximity engine needs distinct terms
— slop=0 exact phrases support repeats), and any query string on a
chargram index (word tokenizers only).

SCORING (per doc): sum over its matching positive clauses of
  term clause    -> BM25 contribution x boost (corpus-global stats)
  phrase clause  -> BM25 over the phrase's distinct terms x boost
                    (phrase_topk's scoring), for docs containing it
  fuzzy/wildcard/regexp/range -> boost as a CONSTANT (Lucene's default
                    CONSTANT_SCORE_REWRITE for multi-term queries:
                    per-expanded-term idf is unstable, so an expansion
                    clause scores flat)
  field clause   -> boost as a CONSTANT (Lucene scores keyword-field
                    term queries via their own field statistics, which
                    metadata columns don't carry — a filter-shaped
                    clause scores flat, as with ES constant_score)
Docs must match every MUST group (any member satisfies a `+( )`
group; a bare MUST clause is its own singleton group), no MUST_NOT
clause, and at least one positive clause. Ties break doc_id ASC.
Returns the engine-wide (query_id, doc_id, score, rank) result shape.

Scale shape: one In(term)-pruned narrow pass scores ALL term clauses
of the batch (decode streams per posting row; nothing collected);
phrase / NEAR / fuzzy / wildcard / regexp / range clauses batch into
their existing surfaces (one call per kind — per distinct window for
proximity, per distinct max_edits for fuzzy, one batched call for
all ranges) with the full-match k, so each inherits
its surface's scale path (chunked candidate masks, bounded expansion
rewrite, dictionary pruning); ALL metadata field clauses evaluate in
one pushed-predicate scan of the doc_fields frame (posting payloads
never read); the combine is one groupBy over
(query, doc) contribution rows plus the two-phase salted top-k. A
clause kind absent from the batch costs nothing.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from capsbm25.catalog import arrow_collect, pdf_frame
from capsbm25.codec import delta_decode
from capsbm25.config import BuildConfig
from capsbm25.query import (
    MAX_EXPANSIONS_DEFAULT,
    term_doc_ids,
    RESULT_SCHEMA,
    _decode_posting,
    _salted_topk,
    _term_df_map,
    fuzzy_topk,
    near_topk,
    phrase_topk,
    regexp_topk,
    term_range_topk,
    validate_regexp_pattern,
    wildcard_topk,
)
from capsbm25.scoring import idf as idf_fn
from capsbm25.scoring import term_scores
from capsbm25.tokenize import tokenize_py

# full-match k for clause sub-calls: every surface's top-k clamps, so
# int32-max returns the entire match set ranked
_ALL_MATCHES_K = (1 << 31) - 1

# a chunk is a parenthesized group (one nesting level — [^()] bars
# nesting) plus whatever is glued to the closing paren, a quoted
# phrase plus WHATEVER is glued to the closing quote (validated
# against _QUOTED_RE below — anything else raises instead of
# re-matching as spurious bare terms), a bracketed term range plus
# whatever is glued to the closing bracket (validated against
# _RANGE_RE — the range body contains a space around TO, so it needs
# its own alternative), or a bare \S+ run; every non-space character
# lands in exactly one chunk, so nothing is silently skipped
_CHUNK_RE = re.compile(
    r'([+!-]?)(\([^()]*\)\S*|"[^"]*"\S*'
    r'|(?:[A-Za-z_][A-Za-z0-9_]*:)?[\[{][^\[\]{}]*[\]}]\S*|\S+)')
# legal glued suffix after a closing paren: ^boost only
_GROUP_RE = re.compile(r'^\(([^()]*)\)(?:\^(\d+(?:\.\d+)?))?$')
# legal glued suffix after a closing quote: ~slop then ^boost, each
# optional, in that order (Lucene's "a b"~2^3)
_QUOTED_RE = re.compile(r'^"[^"]*"(?:~\d+)?(?:\^\d+(?:\.\d+)?)?$')
_BOOST_RE = re.compile(r"^(.*?)\^(\d+(?:\.\d+)?)$", re.S)
# term range chunk: [lo TO hi] / {lo TO hi} / mixed, optional glued
# ^boost; bounds are raw single tokens (Lucene does not analyze range
# endpoints), `*` = open side
_RANGE_RE = re.compile(
    r'^([\[{])\s*(\S+)\s+TO\s+(\S+)\s*([\]}])(?:\^(\d+(?:\.\d+)?))?$')
_FUZZ_RE = re.compile(r"^(.+?)~(\d*)$", re.S)
# regexp clause: /pattern/ plus optional glued ^boost (Lucene
# RegexpQuery syntax); the pattern body is validated against
# regexp_topk's Java/RE2 common subset (which admits neither '/' nor
# whitespace, so [^/]+ cannot under-capture a legal pattern)
_REGEX_CLAUSE_RE = re.compile(r"^/([^/]+)/(?:\^(\d+(?:\.\d+)?))?$")
_PHRASE_RE = re.compile(r'^"([^"]*)"(?:~(\d+))?$', re.S)
_REJECT_RE = re.compile(r"[()\[\]{}|:]")
_KEYWORDS = {"AND", "OR", "NOT", "TO"}
# field clause prefix: identifier + colon + non-empty rest (round 7);
# the value's own charset is validated in _parse_simple_chunk
_FIELD_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", re.S)
# the indexed default field — `text:...` strips the prefix and
# re-dispatches to the normal clause shapes (Lucene field-scoped query
# on the default field is the query itself)
_TEXT_FIELD = "text"


def parse_query_string(
    text: str, cfg: BuildConfig, default_operator: str = "or",
) -> list[dict]:
    """One query string -> clause list. Each clause: dict(role, kind,
    value, boost, extra, gid) with role in {must, should, not}, kind
    in {term, phrase, fuzzy, wildcard, regexp, range, field,
    field_range}; extra = slop
    (phrase), edits (fuzzy), or (include_lower, include_upper) for
    range, whose value is the (lo, hi) bound pair (None = open side);
    a field clause's value is the (field, value) pair (exact
    unanalyzed metadata equality — `text:` re-dispatches to the
    default-field shapes instead). gid is the BOOLEAN GROUP the clause belongs to: clauses
    sharing a gid satisfy their role together (a MUST group needs ANY
    member to match — Lucene's `+(a b)`; a NOT group's members each
    exclude); a bare clause is its own singleton group. Grouping
    supports ONE nesting level — `+(a b)`, `-(c d)`, `(a b)^boost` —
    with members combined by OR inside (the classic parser's behavior
    under default_operator="or"); under default_operator="and" a
    positive group flattens to per-member MUST singletons (Lucene
    applies the default operator inside groups) and `-(...)`
    raises (NOT of an AND-group is not expressible as per-member
    exclusion). Signs inside a group and nested groups raise.
    Pure function — unit-testable without Spark."""
    if default_operator not in ("or", "and"):
        raise ValueError("default_operator must be 'or' or 'and'")
    if cfg.tokenizer == "chargram":
        raise ValueError(
            "query strings require a word-tokenizer index — a phrase "
            "clause re-tokenized over chargrams silently spans the "
            "joining spaces; use substring_topk on chargram indexes"
        )
    text = text or ""
    if text.count('"') % 2:
        raise ValueError(f"unbalanced quote in query string {text!r}")
    default_role = "should" if default_operator == "or" else "must"
    clauses: list[dict] = []
    gid_counter = [0]

    def next_gid() -> int:
        gid_counter[0] += 1
        return gid_counter[0] - 1

    # operator-keyword state (round 7 — Lucene classic AND/OR/NOT,
    # QueryParserBase.addClause semantics): `conj` is the pending
    # conjunction BEFORE the next clause unit, `neg` a pending NOT
    # modifier, `prev` the last emitted unit's clause span for the
    # retroactive occur adjustment (AND promotes the PRECEDING unit
    # to MUST; under default_operator="and", OR demotes it to SHOULD)
    conj: str | None = None
    neg = False
    prev: dict | None = None
    _OP_ALIAS = {"AND": "AND", "&&": "AND", "OR": "OR", "||": "OR",
                 "NOT": "NOT", "!": "NOT"}
    for sign, chunk in _CHUNK_RE.findall(text):
        if chunk in _OP_ALIAS:
            op = _OP_ALIAS[chunk]
            if sign:
                raise ValueError(
                    f"sign on operator keyword {sign}{chunk}: "
                    "modifiers and conjunctions do not combine"
                )
            if op == "NOT":
                if neg:
                    raise ValueError("NOT NOT is not supported")
                neg = True
                continue
            chunk = op
            if neg or conj is not None:
                raise ValueError(
                    f"misplaced operator {chunk!r}: two operators in "
                    "a row"
                )
            if prev is None:
                raise ValueError(f"leading operator {chunk!r}")
            conj = chunk.lower()
            continue
        if sign == "!":
            # Lucene's ! modifier glued to its clause (!term, !(a b));
            # the lexer emits it as a separate token, so it behaves
            # exactly like the - prefix
            sign = "-"
            if chunk.startswith(("+", "-")):
                # '!-a' / '!+a': without this the inner modifier was
                # re-analyzed as the chunk's own sign and NOT(-a)
                # silently parsed as -a — every other glued double
                # modifier raises (round-7 advice)
                raise ValueError(
                    f"double modifier on !{chunk!r}: one "
                    "modifier per clause (Lucene's grammar)"
                )
        if chunk.startswith("!"):
            raise ValueError(
                f"double modifier on {sign}{chunk!r}: one "
                "modifier per clause (Lucene's grammar)"
            )
        if sign and neg:
            raise ValueError(
                f"NOT combined with {sign!r} on {chunk!r}: one "
                "modifier per clause (Lucene's grammar)"
            )
        # Lucene addClause: adjust the PREVIOUS unit's occur first
        # (skipped when it is prohibited, exactly as Lucene does)
        if prev is not None and not prev["not"]:
            if conj == "and":
                for c in clauses[prev["start"]:prev["end"]]:
                    c["role"] = "must"
            elif conj == "or" and default_operator == "and":
                if prev["group"]:
                    raise ValueError(
                        "a ( ) group followed by OR under "
                        "default_operator='and' is unsupported: the "
                        "group flattens to per-member MUST singletons "
                        "(Lucene applies the default operator inside "
                        "groups) and has no single-clause demotion"
                    )
                for c in clauses[prev["start"]:prev["end"]]:
                    c["role"] = "should"
        # occur for THIS unit. OR mode: required iff `+` or introduced
        # by AND; AND mode: required unless prohibited or introduced
        # by OR — Lucene IGNORES `+` after OR in AND mode (`+a OR b`
        # parses as `a OR b`), a documented classic-parser quirk we
        # mirror for parity
        prohibited = neg or sign == "-"
        if default_operator == "or":
            required = sign == "+" or (conj == "and" and not prohibited)
        else:
            required = not prohibited and conj != "or"
        role = "not" if prohibited else (
            "must" if required else "should")
        start = len(clauses)
        if chunk.startswith("("):
            if default_operator == "and" and conj == "or":
                raise ValueError(
                    "OR before a ( ) group under "
                    "default_operator='and' is unsupported: the group "
                    "flattens to per-member MUST singletons and has "
                    "no single-clause occur"
                )
            gm = _GROUP_RE.match(chunk)
            if not gm:
                raise ValueError(
                    f"malformed group {chunk!r}: after the closing "
                    "paren only ^boost may follow, and groups do not "
                    "nest"
                )
            body, gboost = gm.group(1), float(gm.group(2) or 1.0)
            if gboost <= 0:
                raise ValueError(f"boost must be > 0 in {chunk!r}")
            members = _CHUNK_RE.findall(body)
            if not members:
                raise ValueError(f"empty group {chunk!r}")
            if any(s for s, _ in members):
                raise ValueError(
                    f"sign inside group {chunk!r}: +/- apply to the "
                    "whole group (one nesting level)"
                )
            if default_operator == "and":
                if role == "not":
                    raise ValueError(
                        f"-( ) group {chunk!r} with "
                        "default_operator='and' is unsupported: the "
                        "default operator applies inside groups, and "
                        "NOT-of-AND is not a per-member exclusion"
                    )
                # AND inside the group: every member required — each
                # CLAUSE is its own MUST singleton (flattening is the
                # exact semantics, not an approximation; a multi-token
                # member's tokens each bind separately, like bare
                # chunks under AND)
                for _, mchunk in members:
                    _parse_simple_chunk(
                        mchunk, "must", cfg, clauses, next_gid, gboost)
            else:
                gid = next_gid()
                for _, mchunk in members:
                    _parse_simple_chunk(
                        mchunk, role, cfg, clauses, lambda: gid, gboost)
        else:
            _parse_simple_chunk(chunk, role, cfg, clauses, next_gid, 1.0)
        # an analyzer-emptied chunk adds no clauses: the conjunction
        # is consumed (its retroactive adjustment already ran) but
        # `prev` keeps pointing at the last REAL unit, like Lucene's
        # null-query return in addClause
        if len(clauses) > start:
            prev = {"start": start, "end": len(clauses),
                    "not": role == "not",
                    "group": (chunk.startswith("(")
                              and default_operator == "and")}
        conj, neg = None, False
    if conj is not None or neg:
        raise ValueError(
            f"trailing operator in query string {text!r}"
        )
    return clauses


def _parse_simple_chunk(chunk: str, role: str, cfg: BuildConfig,
                        clauses: list, gid_fn,
                        boost_mult: float) -> None:
    """Parse one non-group chunk into clause dicts appended to
    `clauses` (a bare multi-token chunk contributes one clause per
    token with the same role/boost). gid_fn is called once per
    appended clause: at top level it mints a FRESH gid each time, so
    each token of a multi-token chunk is its own singleton group
    (all tokens bind under MUST — pre-round-7 and Lucene-under-AND
    behavior); inside an OR group it returns the group's fixed gid,
    so every member token shares the group's any-member semantics.
    boost_mult: the enclosing group's ^boost (1.0 at top level) —
    multiplies the clause's own."""
    if chunk[0] in "[{":
        rm = _RANGE_RE.match(chunk)
        if not rm:
            raise ValueError(
                f"malformed range clause {chunk!r}: expected "
                "[lo TO hi] / {lo TO hi} (TO uppercase, single-token "
                "bounds, * for an open side), optionally ^boost"
            )
        br_lo, lo, hi, br_hi, rboost = rm.groups()
        boost = float(rboost or 1.0)
        if boost <= 0:
            raise ValueError(f"boost must be > 0 in {chunk!r}")
        # bounds are NOT analyzed (Lucene TermRangeQuery semantics) —
        # only case-folded to the index's lowercase term space
        lo = None if lo == "*" else lo.lower()
        hi = None if hi == "*" else hi.lower()
        if lo is None and hi is None:
            raise ValueError(
                f"range {chunk!r} is open on both sides — it would "
                "match the whole dictionary"
            )
        if any(c in '"^~()' for c in (lo or "") + (hi or "")):
            raise ValueError(
                f"unsupported character in range bound of {chunk!r}"
            )
        clauses.append({"role": role, "kind": "range",
                        "value": (lo, hi),
                        "boost": boost * boost_mult,
                        "extra": (br_lo == "[", br_hi == "]"),
                        "gid": gid_fn()})
        return
    fdm = _FIELD_RE.match(chunk)
    if fdm:
        fname, rest = fdm.groups()
        if fname == _TEXT_FIELD:
            # the default field: the rest is an ordinary clause (term /
            # wildcard / fuzzy / ^boost); a nested field prefix raises
            # here, so the re-dispatch cannot recurse more than once
            if _FIELD_RE.match(rest):
                raise ValueError(
                    f"nested field prefix in {chunk!r}"
                )
            _parse_simple_chunk(rest, role, cfg, clauses, gid_fn,
                                boost_mult)
            return
        if rest[0] in "[{":
            # metadata RANGE clause (round 7): fname:[lo TO hi] — the
            # Lucene Point-range analog; bounds compare in the metadata
            # COLUMN's own type (numeric fields numerically, timestamps
            # as timestamps — converted engine-side where the dtype is
            # known), NOT lexicographically
            rm = _RANGE_RE.match(rest)
            if not rm:
                raise ValueError(
                    f"malformed metadata range in {chunk!r}: expected "
                    "field:[lo TO hi] / field:{lo TO hi} (TO uppercase, "
                    "single-token bounds, * for an open side), "
                    "optionally ^boost"
                )
            br_lo, lo, hi, br_hi, rboost = rm.groups()
            boost = float(rboost or 1.0)
            if boost <= 0:
                raise ValueError(f"boost must be > 0 in {chunk!r}")
            # metadata bounds stay VERBATIM (no case folding — the
            # column is unanalyzed; '*' opens a side)
            lo = None if lo == "*" else lo
            hi = None if hi == "*" else hi
            if lo is None and hi is None:
                raise ValueError(
                    f"range {chunk!r} is open on both sides — it "
                    "would match every doc with a non-NULL value"
                )
            if any(c in '"^~()' for c in (lo or "") + (hi or "")):
                raise ValueError(
                    f"unsupported character in range bound of {chunk!r}"
                )
            clauses.append({"role": role, "kind": "field_range",
                            "value": (fname, lo, hi),
                            "boost": boost * boost_mult,
                            "extra": (br_lo == "[", br_hi == "]"),
                            "gid": gid_fn()})
            return
        m = _BOOST_RE.match(rest)
        value, boost = (m.group(1), float(m.group(2))) \
            if m and m.group(2) else (rest, 1.0)
        if boost <= 0:
            raise ValueError(f"boost must be > 0 in {chunk!r}")
        # metadata values are UNANALYZED (keyword-field semantics):
        # exact equality only — no quotes, wildcards, fuzziness,
        # or a second field prefix
        if len(value) > 1 and value[0] == "/" and value[-1] == "/":
            raise ValueError(
                f"regexp on a metadata field in {chunk!r}: keyword "
                "fields match by exact equality only — /re/ clauses "
                "apply to the default text field"
            )
        if not value or any(c in '"^~()[]{}|:*? ' for c in value):
            raise ValueError(
                f"unsupported metadata-field value in {chunk!r}: "
                "exact unanalyzed equality only (no quotes, wildcards, "
                "~, or a second ':'); use text: for analyzed clauses"
            )
        clauses.append({"role": role, "kind": "field",
                        "value": (fname, value),
                        "boost": boost * boost_mult,
                        "extra": None, "gid": gid_fn()})
        return
    if chunk.startswith("/"):
        rm = _REGEX_CLAUSE_RE.match(chunk)
        if not rm:
            raise ValueError(
                f"malformed regexp clause {chunk!r}: expected "
                "/pattern/ optionally followed by ^boost (the pattern "
                "may not contain '/' or whitespace)"
            )
        pat = validate_regexp_pattern(rm.group(1))
        boost = float(rm.group(2) or 1.0)
        if boost <= 0:
            raise ValueError(f"boost must be > 0 in {chunk!r}")
        clauses.append({"role": role, "kind": "regexp", "value": pat,
                        "boost": boost * boost_mult, "extra": 0,
                        "gid": gid_fn()})
        return
    if chunk.startswith('"'):
        if not _QUOTED_RE.match(chunk):
            raise ValueError(
                f"malformed phrase clause {chunk!r}: after the "
                "closing quote only ~slop then ^boost may follow"
            )
    else:
        if '"' in chunk:
            raise ValueError(
                f"quote inside bare clause {chunk!r}: a phrase "
                "must be its own whitespace-separated chunk"
            )
        if chunk in _KEYWORDS:
            raise ValueError(
                f"operator keyword {chunk!r} here is not supported: "
                "AND/OR/NOT work between top-level clauses only (a "
                "group's members have one shared occur — use nested "
                "+/- instead), and TO is only valid inside a range"
            )
        if _REJECT_RE.search(chunk):
            raise ValueError(
                f"unsupported syntax in {chunk!r}: a field prefix must "
                "be identifier: with a bare value, ( ) groups and "
                "[a TO b] ranges must be whitespace-separated chunks, "
                "and synonym groups have a dedicated surface "
                "(synonym_topk)"
            )
    m = _BOOST_RE.match(chunk)
    body, boost = (m.group(1), float(m.group(2))) if m and m.group(2) \
        else (chunk, 1.0)
    if boost <= 0:
        raise ValueError(f"boost must be > 0 in {chunk!r}")
    boost *= boost_mult
    if "^" in body and not body.startswith('"'):
        # 'foo^2.5^3' et al: after one boost strip a bare body may
        # not still contain ^ — tokenizing it would emit the boost
        # digits as spurious terms
        raise ValueError(
            f"malformed boost in {chunk!r}: one ^boost suffix per "
            "clause"
        )
    pm = _PHRASE_RE.match(body)
    if pm:
        toks = tokenize_py(pm.group(1), cfg)
        slop = int(pm.group(2) or 0)
        if not toks:
            return
        if slop > 0 and len(set(toks)) != len(toks):
            raise ValueError(
                f"sloppy phrase {chunk!r} repeats a token: the "
                "proximity engine (ordered NEAR) needs distinct "
                "terms — a documented deviation from Lucene's "
                "sloppy PhraseQuery; slop=0 exact phrases support "
                "repeats"
            )
        if len(toks) == 1:  # 1-token phrase degrades to a term
            clauses.append({"role": role, "kind": "term",
                            "value": toks[0], "boost": boost,
                            "extra": 0, "gid": gid_fn()})
            return
        clauses.append({"role": role, "kind": "phrase",
                        "value": " ".join(toks), "boost": boost,
                        "extra": slop, "gid": gid_fn()})
        return
    if "*" in body or "?" in body:
        if "~" in body:
            raise ValueError(
                f"{chunk!r}: a clause cannot be both wildcard "
                "and fuzzy"
            )
        clauses.append({"role": role, "kind": "wildcard",
                        "value": body.lower(), "boost": boost,
                        "extra": 0, "gid": gid_fn()})
        return
    fm = _FUZZ_RE.match(body)
    if fm:
        edits = int(fm.group(2)) if fm.group(2) else 2
        if not 0 <= edits <= 2:
            raise ValueError(
                f"{chunk!r}: fuzzy edits must be 0..2 (the Lucene "
                "bound)"
            )
        toks = tokenize_py(fm.group(1), cfg)
        if len(toks) != 1:
            raise ValueError(
                f"fuzzy clause {chunk!r} must be a single term"
            )
        if edits == 0:  # ~0 is an exact term (Lucene)
            clauses.append({"role": role, "kind": "term",
                            "value": toks[0], "boost": boost,
                            "extra": 0, "gid": gid_fn()})
        else:
            clauses.append({"role": role, "kind": "fuzzy",
                            "value": toks[0], "boost": boost,
                            "extra": edits, "gid": gid_fn()})
        return
    for t in tokenize_py(body, cfg):
        clauses.append({"role": role, "kind": "term", "value": t,
                        "boost": boost, "extra": 0, "gid": gid_fn()})


# fused per-doc contribution shape: contributions pre-summed, matched
# MUST-group bits pre-OR'd (mb), prohibited flag pre-OR'd (xn)
_CONTRIB_SCHEMA = ("query_id int, doc_id long, contrib double, "
                   "mb long, cb long, xn int")

# a query-string task re-compresses its per-doc accumulator at this
# many raw (doc, contrib) pairs (same bound as the expansion combine)
_QS_COMBINE_CHUNK = 4_000_000

# MUST groups are tracked as bits of one int64 bitmask; 62 groups per
# query is far past any real classic-parser query (Lucene's whole-query
# default maxClauseCount is 1024); beyond it we raise loudly rather
# than mis-count
_MAX_MUST_BITS = 62


def _term_contribs(spark, postings, rows: pd.DataFrame, N, avgdl, cfg,
                    df_map: dict | None = None):
    """One narrow pass scoring every term clause of the batch:
    In(term)-pruned scan, broadcast clause join, per-row decode ->
    BM25 x boost (0 for MUST_NOT rows — only membership matters).

    Emits the FUSED per-doc shape (round 7): the kernel combines
    per (query, doc) in-task with the chunk-bounded accumulator —
    contributions pre-summed, matched MUST groups pre-OR'd into the
    `mb` bitmask (rows carry each clause's driver-assigned must bit),
    the prohibited flag pre-OR'd into `xn` — so the combine stage is
    one plain sum/bit_or/max aggregate over distinct-doc rows instead
    of two count_distincts over one row per (clause, posting entry)."""
    qdf = pdf_frame(spark, rows)
    terms = sorted(rows["term"].unique().tolist())
    filtered = postings.where(F.col("term").isin(terms))
    if "pos" in filtered.columns:
        filtered = filtered.drop("pos")
    if df_map is None:
        df_map = _term_df_map(filtered)
    # explicit projection (Catalyst cannot prune through mapInPandas):
    # block_max/cf/df would otherwise ride the Arrow transfer unused
    matched = filtered.select("term", "doc_ids", "tfs", "dls").join(
        F.broadcast(qdf), "term")
    k1, b = cfg.k1, cfg.b

    def gen(it):
        # qid -> [docs, contrib, mb, xn chunks, raw-since-compress]
        acc: dict = {}

        def compress(ent):
            docs = np.concatenate(ent[0])
            order = np.argsort(docs, kind="stable")
            d = docs[order]
            new = np.ones(d.size, dtype=bool)
            new[1:] = d[1:] != d[:-1]
            starts = np.flatnonzero(new)
            ent[0] = [d[starts]]
            ent[1] = [np.add.reduceat(
                np.concatenate(ent[1])[order], starts)]
            ent[2] = [np.bitwise_or.reduceat(
                np.concatenate(ent[2])[order], starts)]
            ent[3] = [np.bitwise_or.reduceat(
                np.concatenate(ent[3])[order], starts)]
            ent[4] = 0  # raw appended since last compress (quadratic
            #             re-trigger guard — see _term_expansion_topk)

        for pdf in it:
            for row in pdf.itertuples(index=False):
                is_not = row.role == "not"
                if is_not:
                    # membership only — skip the tf/dl varint decodes
                    # (a MUST_NOT stopword is the largest posting in
                    # the batch and its contribution is hardcoded 0)
                    docs = delta_decode(row.doc_ids)
                    if not docs.size:
                        continue
                    contrib = np.zeros(docs.size, np.float64)
                else:
                    docs, tfs, dls = _decode_posting(row)
                    if not docs.size:
                        continue
                    tidf = float(idf_fn(N, df_map[row.term]))
                    contrib = term_scores(
                        tfs, dls, tidf, avgdl, k1, b) * float(row.boost)
                ent = acc.setdefault(
                    int(row.query_id), [[], [], [], [], 0])
                ent[0].append(docs.astype(np.int64))
                ent[1].append(contrib)
                ent[2].append(np.full(docs.size, int(row.mbit),
                                      np.int64))
                ent[3].append(np.full(docs.size, 1 if is_not else 0,
                                      np.int64))
                ent[4] += docs.size
                if ent[4] >= _QS_COMBINE_CHUNK:
                    compress(ent)
        for qid, ent in acc.items():
            compress(ent)
            uniq = ent[0][0]
            yield pd.DataFrame(
                {"query_id": np.full(uniq.size, qid, np.int32),
                 "doc_id": uniq,
                 "contrib": ent[1][0],
                 "mb": ent[2][0],
                 "cb": np.zeros(uniq.size, np.int64),
                 "xn": ent[3][0].astype(np.int32)})

    return matched.mapInPandas(gen, schema=_CONTRIB_SCHEMA)


# raw contribution mass (Σ df over the batch's term clause rows) above
# which the combine+top-k tail fuses into one applyInPandas exchange —
# the same crossover as query._FUSED_TOPK_MIN_ROWS (below it, the JVM
# hash agg + salted windows beat the python-worker constants)
_QS_FUSED_MIN_ROWS = 4_000_000

# required-clause pushdown gate (round 8, measured on one index at two
# scales — BENCH/r08/qs_filter_gate_exp.log): the mask's cost is
# CAPPED (<= 4M-id collect + a searchsorted per entry) while the
# expansion membership it prunes grows with the corpus, so above
# _QS_FILTER_MIN_N turns the filter wins even at modest selectivity
# (10.5M turns, 35%-of-corpus must union: 11.8-20.5s closed ->
# 10.8-11.8s open). Below it the membership is small enough that the
# collect+mask overhead shows (1.05M: 4.0-4.7 closed vs 4.45-4.6
# open), so mid-size corpora keep the strict N/_QS_FILTER_N_DIV
# selectivity requirement.
_QS_FILTER_N_DIV = 16
_QS_FILTER_MIN_N = 4_000_000


def _popcount64(v: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR) — the numpy twin of the JVM
    combine's bit_count(mb)."""
    v = v.astype(np.uint64)
    v = v - ((v >> np.uint64(1)) & np.uint64(0x5555555555555555))
    v = (v & np.uint64(0x3333333333333333)) + (
        (v >> np.uint64(2)) & np.uint64(0x3333333333333333))
    v = (v + (v >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((v * np.uint64(0x0101010101010101))
            >> np.uint64(56)).astype(np.int64)


def _qs_fused_combine(contribs: DataFrame, meta_by_qid: dict) -> DataFrame:
    """Fused per-doc combine + phase-1 salted top-k for the
    query-string tail (the _fused_combine_topk idiom): one
    applyInPandas over (query_id, doc_id % salt) groups sums each
    doc's contributions, ORs its must/constant bitmasks and prohibited
    flag, applies the MUST-satisfaction + MUST_NOT filters on the
    complete per-doc state, converts constant-clause bits to score,
    and keeps the group-local top-k by (score DESC, doc_id ASC). Every
    global top-k doc wins its own salt bucket (salt is a pure doc_id
    function — all partials of a doc meet), so phase 2 (_rank_page
    over <= salt x k rows per query) returns exactly what the legacy
    groupBy + filter + _salted_topk tail would — with ONE exchange of
    the contribution rows instead of two, and numpy reductions instead
    of a Tungsten sort of the full scored set. Deterministic float
    accumulation: lexsort by (doc, contrib) + reduceat, the kernel's
    idiom. meta_by_qid: qid -> (n_must, k, cboosts) — driver-side, in
    the task closure (tiny), so no broadcast join is needed at all."""
    from capsbm25.query import _TOPK_SALT, _rank_page

    def combine(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(key[0])
        n_must, k, cboosts = meta_by_qid[qid]

        def empty():
            return pd.DataFrame(
                {"query_id": np.array([], np.int32),
                 "doc_id": np.array([], np.int64),
                 "score": np.array([], np.float64),
                 "k": np.array([], np.int32)})

        if k <= 0:
            return empty()
        d0 = pdf["doc_id"].to_numpy(np.int64)
        c0 = pdf["contrib"].to_numpy()
        order = np.lexsort((c0, d0))
        d, c = d0[order], c0[order]
        new = np.ones(d.size, dtype=bool)
        new[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(new)
        uniq = d[starts]
        score = np.add.reduceat(c, starts)
        mb = np.bitwise_or.reduceat(
            pdf["mb"].to_numpy(np.int64)[order], starts)
        cb = np.bitwise_or.reduceat(
            pdf["cb"].to_numpy(np.int64)[order], starts)
        xn = np.maximum.reduceat(
            pdf["xn"].to_numpy(np.int64)[order], starts)
        keep = (xn == 0) & (_popcount64(mb) == n_must)
        if not keep.all():
            uniq, score, cb = uniq[keep], score[keep], cb[keep]
        if not uniq.size:
            return empty()
        for i, b in enumerate(cboosts):
            score = score + b * ((cb >> i) & 1)
        if uniq.size > k:
            # top-k by (score DESC, doc_id ASC): partition on score,
            # resolve the boundary tie group by doc_id (the
            # _fused_combine_topk idiom)
            cut = np.partition(score, uniq.size - k)[uniq.size - k]
            above = score > cut
            need_ties = k - int(above.sum())
            tie_docs = np.sort(uniq[score == cut])[:need_ties]
            sel = above | (np.isin(uniq, tie_docs) & (score == cut))
            uniq, score = uniq[sel], score[sel]
        return pd.DataFrame(
            {"query_id": np.full(uniq.size, qid, np.int32),
             "doc_id": uniq,
             "score": score.astype(np.float64),
             "k": np.full(uniq.size, k, np.int32)})

    local = (
        contribs.withColumn(
            "salt", F.pmod(F.col("doc_id"), F.lit(_TOPK_SALT)))
        .groupBy("query_id", "salt")
        .applyInPandas(combine, schema="query_id int, doc_id long, "
                                       "score double, k int")
    )
    return _rank_page(local)


_RANGEABLE_INTS = {"tinyint", "smallint", "int", "bigint"}


def _convert_bound(fname: str, bound: str | None, dtype: str):
    """One metadata comparison value (range bound OR equality literal)
    -> a Python literal of the COLUMN's Spark type, so the comparison
    runs natively (numerics compare numerically, never
    lexicographically) and pushes to the metadata source's scan.
    Raises on a value the type can't parse — a silent NULL comparison
    would make the clause match nothing and mis-answer the query."""
    if bound is None:
        return None
    try:
        if dtype in _RANGEABLE_INTS:
            return int(bound)
        if dtype in ("float", "double"):
            return float(bound)
        if dtype in ("timestamp", "timestamp_ntz", "date"):
            ts = pd.Timestamp(bound)
            return ts.date() if dtype == "date" else ts.to_pydatetime()
        if dtype == "string":
            return bound
    except (ValueError, OverflowError) as exc:
        raise ValueError(
            f"value {bound!r} does not parse as the {dtype} "
            f"type of metadata field {fname!r}"
        ) from exc
    raise ValueError(
        f"metadata field {fname!r} has type {dtype}, which field "
        "clauses do not support (numeric, string, timestamp, date)"
    )


def _subcall_contribs(spark, result: DataFrame, sid_map: pd.DataFrame,
                      constant: bool) -> DataFrame:
    """Map a clause sub-call's rows back to the parent FUSED shape
    (query_id, doc_id, contrib, mb, xn): score x boost for scoring
    clauses (phrase — result carries a score), flat boost for
    constant-score ones (expansion — docs_only membership); mb = the
    clause's must bit (0 unless role=must), xn = 1 for MUST_NOT. The
    sub-call results are already distinct per (sid, doc), so no
    further in-task combine is needed."""
    mdf = F.broadcast(pdf_frame(spark, sid_map).select(
        F.col("sid").cast("int"), F.col("orig_qid").cast("int"),
        "role", F.col("mbit").cast("long").alias("mbit"),
        F.col("cbit").cast("long").alias("cbit"),
        F.col("boost").cast("double")))
    # constant clauses score through the idempotent cb bit (their
    # membership frames may carry cross-task duplicates — see
    # _expansion_doc_ids distinct=False); scoring clauses (phrase)
    # are already distinct per (sid, doc) and sum their contrib
    contrib = (F.lit(0.0) if constant
               else F.when(F.col("role") != "not",
                           F.col("score") * F.col("boost"))
                     .otherwise(F.lit(0.0)))
    return (
        result.withColumnRenamed("query_id", "sid")
        .join(mdf, "sid")
        .select(
            F.col("orig_qid").alias("query_id"), "doc_id",
            contrib.cast("double").alias("contrib"),
            F.col("mbit").alias("mb"),
            F.col("cbit").alias("cb"),
            F.when(F.col("role") == "not", F.lit(1))
             .otherwise(F.lit(0)).cast("int").alias("xn"),
        )
    )


def query_string_topk(
    spark: SparkSession,
    postings: DataFrame,
    queries: pd.DataFrame,
    N: int,
    avgdl: float,
    cfg: BuildConfig | None = None,
    default_operator: str = "or",
    doc_filter: DataFrame | None = None,
    doc_exclude: DataFrame | None = None,
    dictionary: DataFrame | None = None,
    max_expansions: int | None = MAX_EXPANSIONS_DEFAULT,
    doc_fields: DataFrame | None = None,
) -> DataFrame:
    """Top-k over user-facing query STRINGS (see the module docstring
    for syntax and scoring). queries: pandas (query_id, text, k);
    returns (query_id, doc_id, score, rank), ties by doc_id.

    doc_filter / doc_exclude apply batch-globally at the combine stage
    (Lucene filter + liveDocs: candidates restricted, scoring stats
    stay corpus-global). Phrase clauses need a positional index;
    expansion clauses accept the persisted `dictionary` and the
    bounded `max_expansions` rewrite like their dedicated surfaces.

    doc_fields: per-doc metadata frame (doc_id + one column per
    queryable field), e.g. load_doc_stats(spark, out) for
    conv_id / turn_idx / dl — required when the batch contains
    metadata field clauses (`conv_id:c42`); a clause naming a column
    absent from it raises. ALL field clauses of the batch evaluate in
    ONE scan of this frame (equality predicates pushed to its source),
    so a field clause costs one metadata read, never a postings pass."""
    cfg = cfg or BuildConfig()
    term_rows, phrase_cl, fuzzy_cl, wild_cl = [], [], [], []
    rx_cl, range_cl, field_cl, frange_cl, meta = [], [], [], [], []
    for q in queries.itertuples(index=False):
        qid, k = int(q.query_id), int(q.k)
        clauses = parse_query_string(q.text, cfg, default_operator)
        # MUST satisfaction counts boolean GROUPS, not clauses: a
        # `+(a b)` group is satisfied by ANY member, so a doc needs
        # one distinct matched gid per must-group (a bare must clause
        # is its own singleton group — identical to the old count)
        must_gids = sorted({c["gid"] for c in clauses
                            if c["role"] == "must"})
        if len(must_gids) > _MAX_MUST_BITS:
            raise ValueError(
                f"query {qid} has {len(must_gids)} MUST groups; the "
                f"fused combine tracks at most {_MAX_MUST_BITS} "
                "(Lucene's whole-query default maxClauseCount is 1024 "
                "— split the query)"
            )
        bit = {g: 1 << i for i, g in enumerate(must_gids)}
        # constant-score (expansion) clauses score through an
        # IDEMPOTENT per-clause bit (cb) instead of a summed contrib,
        # so their membership frames need no global dedup — bit_or
        # absorbs cross-task duplicates; the boost per bit rides the
        # query meta as an array and converts to score at the hits
        # stage (a pure codegen expression, no extra shuffle)
        cboosts: list[float] = []
        cbits: dict[int, int] = {}  # clause index in list -> cbit
        for ci, c in enumerate(clauses):
            if (c["kind"] in ("fuzzy", "wildcard", "regexp", "range",
                              "field", "field_range")
                    and c["role"] != "not"):
                if len(cboosts) >= _MAX_MUST_BITS:
                    raise ValueError(
                        f"query {qid} has more than {_MAX_MUST_BITS} "
                        "constant-score clauses — split the query"
                    )
                cbits[ci] = 1 << len(cboosts)
                cboosts.append(float(c["boost"]))
        meta.append((qid, len(must_gids), k, cboosts))
        for ci, c in enumerate(clauses):
            rec = (qid, c["gid"], c["role"], c["value"], c["boost"],
                   c["extra"], bit.get(c["gid"], 0)
                   if c["role"] == "must" else 0, cbits.get(ci, 0))
            {"term": term_rows, "phrase": phrase_cl, "fuzzy": fuzzy_cl,
             "wildcard": wild_cl, "regexp": rx_cl, "range": range_cl,
             "field": field_cl,
             "field_range": frange_cl}[c["kind"]].append(rec)
    if not (term_rows or phrase_cl or fuzzy_cl or wild_cl or rx_cl
            or range_cl or field_cl or frange_cl):
        return spark.createDataFrame([], RESULT_SCHEMA)
    if field_cl or frange_cl:
        fnames = ({r[3][0] for r in field_cl}
                  | {r[3][0] for r in frange_cl})
        if doc_fields is None:
            raise ValueError(
                "the batch contains metadata field clauses "
                f"({sorted(fnames)}) but no "
                "doc_fields frame was given — pass "
                "doc_fields=load_doc_stats(spark, out) (or any "
                "(doc_id, metadata...) frame)"
            )
        valid = set(doc_fields.columns) - {"doc_id"}
        bad = sorted(fnames - valid)
        if bad:
            raise ValueError(
                f"unknown metadata field(s) {bad}: doc_fields has "
                f"{sorted(valid)} (use text: for the indexed field)"
            )

    cols = ["orig_qid", "gid", "role", "value", "boost", "extra",
            "mbit", "cbit"]

    # Round 7 — required-clause pushdown into the expansion clauses
    # (Lucene's "required clauses drive the iteration"): every FINAL
    # hit of a query must match each of its MUST groups, so when every
    # expansion-carrying query has at least one MUST group of plain
    # terms, the union of one chosen (smallest-Σdf) must group's doc
    # sets per query is a SUPERSET of every possible hit — shipped as
    # a doc_filter into the fuzzy/wildcard sub-calls, where it becomes
    # an in-kernel broadcast mask (_expansion_masks), so the expansion
    # membership frame shrinks from match-mass to candidate-mass.
    # Bounded: built only when the chosen groups' Σdf <= 4M (the
    # kernel-filter cap); correctness never depends on it (a doc
    # outside the union fails its must group at the combine anyway)
    # — PROVIDED the group is pure-term: a MUST group that also
    # carries an expansion/phrase/field member is satisfied by ANY
    # member, so its term-docs union is NOT a hit superset (a doc
    # matching only the non-term member is a legitimate hit) and such
    # groups are ineligible for the pushdown.
    exp_filter = None
    shared_dfm: dict | None = None
    if fuzzy_cl or wild_cl or rx_cl or range_cl:
        exp_qids = ({r[0] for r in fuzzy_cl} | {r[0] for r in wild_cl}
                    | {r[0] for r in rx_cl} | {r[0] for r in range_cl})
        non_term_gids = {(r[0], r[1])
                         for lst in (phrase_cl, fuzzy_cl, wild_cl,
                                     rx_cl, range_cl, field_cl,
                                     frange_cl)
                         for r in lst}
        must_groups: dict[int, dict[int, list[str]]] = {}
        for (qid, gid, role, value, _b, _e, _m, _c) in term_rows:
            if (role == "must" and qid in exp_qids
                    and (qid, gid) not in non_term_gids):
                must_groups.setdefault(qid, {}).setdefault(
                    gid, []).append(value)
        if exp_qids and all(q in must_groups for q in exp_qids):
            # one df aggregate over ALL batch terms: the same map
            # feeds _term_contribs below (the gate's must terms are a
            # subset), so the batch pays one In(term) scan+groupBy
            # for df, not two
            all_terms = sorted({r[3] for r in term_rows})
            shared_dfm = dfm = _term_df_map(
                postings.where(F.col("term").isin(all_terms)))
            chosen: set[str] = set()
            for q in exp_qids:
                best = min(must_groups[q].values(),
                           key=lambda ts: sum(dfm.get(t, 0) for t in ts))
                chosen.update(best)
            est = sum(dfm.get(t, 0) for t in chosen)
            # selectivity gate — see the constants' comment above: the
            # bounded mask always wins at large corpora, and only at
            # strong selectivity below them
            if 0 < est <= 4_000_000 and (
                    est <= N // _QS_FILTER_N_DIV
                    or N >= _QS_FILTER_MIN_N):
                # collect the id union ONCE (Arrow-batched) and pass
                # the ARRAY down: the lazy plan would re-run its scan
                # + bounded collect inside EVERY expansion sub-call's
                # _prep_doc_sets (up to three concurrent identical
                # jobs), and a LocalRelation round-trip would pay a
                # driver->JVM serialize per sub-call — an ndarray
                # doc_filter broadcasts straight from the driver.
                # ASYNC (round 8): the decode + collect is seconds at
                # 10M+ turns and only the EXPANSION thunks consume it
                # — building it on a thread lets the term-contribs
                # cascade start immediately; the expansion thunks
                # resolve it lazily (_prep_doc_sets), AFTER their
                # own eager dictionary match — both overlap the build
                def _build_exp_filter(chosen=frozenset(chosen)):
                    ids = np.unique(arrow_collect(
                        term_doc_ids(postings, sorted(chosen))
                    )["doc_id"].to_numpy(np.int64))
                    return ids if ids.size else None

                from concurrent.futures import ThreadPoolExecutor

                _filter_pool = ThreadPoolExecutor(max_workers=1)
                exp_filter = _filter_pool.submit(_build_exp_filter)
                _filter_pool.shutdown(wait=False)

    # each thunk builds one clause-kind's contribution frame(s); they
    # run on a small thread pool (round 7) because every sub-surface
    # call contains DRIVER-blocking steps (df/stats collects, the
    # eager expansion-dictionary match) that otherwise serialize four
    # independent job cascades — Spark job submission is thread-safe,
    # and the frames are unioned in a FIXED order below so the plan
    # (and the float summation shape) stays deterministic
    thunks: list = []
    est_mass = 0
    if term_rows:
        tpdf = pd.DataFrame(term_rows, columns=cols).rename(
            columns={"orig_qid": "query_id", "value": "term"})
        # the per-term df map is hoisted out of the term thunk: the
        # SAME collect _term_contribs would run inside it also yields
        # the batch's raw contribution mass (Σ df over term clause
        # rows), which size-routes the combine tail below — no extra
        # job, just earlier
        if shared_dfm is None:
            shared_dfm = _term_df_map(postings.where(
                F.col("term").isin(sorted(tpdf["term"].unique()))))
        est_mass = int(sum(shared_dfm.get(t, 0) for t in tpdf["term"]))
        thunks.append(lambda: [_term_contribs(
            spark, postings,
            tpdf[["query_id", "role", "term", "boost", "mbit"]],
            N, avgdl, cfg, df_map=shared_dfm)])

    def run_group(cl, key_fn, call):
        """Batch one clause kind through its surface, one call per
        distinct key (window / max_edits), synthetic sequential ids."""
        pdf = pd.DataFrame(cl, columns=cols)
        pdf["sid"] = np.arange(len(pdf), dtype=np.int32)
        out = []
        for key, grp in pdf.groupby(pdf.apply(key_fn, axis=1)):
            sub = pd.DataFrame(
                {"query_id": grp["sid"].to_numpy(np.int32),
                 "text": grp["value"].tolist(),
                 "k": np.full(len(grp), _ALL_MATCHES_K, np.int32)})
            res, constant = call(key, sub)
            res = res.select("query_id", "doc_id") if constant \
                else res.select("query_id", "doc_id", "score")
            out.append(_subcall_contribs(
                spark, res,
                grp[["sid", "orig_qid", "role", "boost", "mbit",
                     "cbit"]],
                constant))
        return out

    if phrase_cl:
        # slop=0 -> exact phrase; slop>0 -> ordered NEAR with window =
        # len(phrase)+slop (grouped by window so each distinct slack
        # is one call)
        def phrase_key(r):
            return 0 if r["extra"] == 0 \
                else len(r["value"].split()) + int(r["extra"])

        def phrase_call(key, sub):
            if key == 0:
                return phrase_topk(spark, postings, sub, N, avgdl, cfg,
                                   ), False
            return near_topk(spark, postings, sub, N, avgdl, cfg,
                             window=int(key), ordered=True), False

        thunks.append(
            lambda: run_group(phrase_cl, phrase_key, phrase_call))
    if fuzzy_cl:
        # docs_only: constant-score clauses need MEMBERSHIP, not the
        # summed-tf ranking — skips the expansion aggregate and both
        # top-k windows per sub-call
        thunks.append(lambda: run_group(
            fuzzy_cl, lambda r: int(r["extra"]),
            lambda key, sub: (fuzzy_topk(
                spark, postings, sub, cfg, max_edits=int(key),
                dictionary=dictionary, max_expansions=max_expansions,
                docs_only="raw", doc_filter=exp_filter,
            ), True)))
    if wild_cl:
        thunks.append(lambda: run_group(
            wild_cl, lambda r: 0,
            lambda key, sub: (wildcard_topk(
                spark, postings, sub, cfg, dictionary=dictionary,
                max_expansions=max_expansions, docs_only="raw",
                doc_filter=exp_filter,
            ), True)))
    if rx_cl:
        thunks.append(lambda: run_group(
            rx_cl, lambda r: 0,
            lambda key, sub: (regexp_topk(
                spark, postings, sub, cfg, dictionary=dictionary,
                max_expansions=max_expansions, docs_only="raw",
                doc_filter=exp_filter,
            ), True)))
    if range_cl:
        # ONE call batches every range clause: term_range_topk takes
        # per-query bounds + inclusivity columns, so no per-key split
        # is needed (constant-score membership like fuzzy/wildcard)
        def run_ranges():
            pdf = pd.DataFrame(range_cl, columns=cols)
            pdf["sid"] = np.arange(len(pdf), dtype=np.int32)
            sub = pd.DataFrame(
                {"query_id": pdf["sid"].to_numpy(np.int32),
                 "lo": [v[0] for v in pdf["value"]],
                 "hi": [v[1] for v in pdf["value"]],
                 "include_lower": [e[0] for e in pdf["extra"]],
                 "include_upper": [e[1] for e in pdf["extra"]],
                 "k": np.full(len(pdf), _ALL_MATCHES_K, np.int32)})
            res = term_range_topk(
                spark, postings, sub, cfg, dictionary=dictionary,
                max_expansions=max_expansions, docs_only="raw",
                doc_filter=exp_filter,
            ).select("query_id", "doc_id")
            return [_subcall_contribs(
                spark, res,
                pdf[["sid", "orig_qid", "role", "boost", "mbit",
                     "cbit"]],
                True)]

        thunks.append(run_ranges)
    if field_cl or frange_cl:
        # ONE scan of the metadata frame evaluates EVERY field clause
        # of the batch — equality AND range: the coarse OR of the
        # predicates pushes to the metadata source's scan, and each
        # surviving row explodes into the clause ids it satisfies.
        # Range bounds convert to the column's OWN Spark type first
        # (numerics compare numerically — Lucene Point-range
        # semantics). Rows are already distinct per (clause, doc) —
        # doc_fields is one row per doc — and the idempotent cb bit
        # absorbs anything anyway.
        def run_fields():
            pdf = pd.DataFrame(field_cl + frange_cl, columns=cols)
            pdf["sid"] = np.arange(len(pdf), dtype=np.int32)
            dtypes = dict(doc_fields.dtypes)
            preds = []
            for r in pdf.itertuples(index=False):
                col = F.col(r.value[0])
                if len(r.value) == 2:  # equality clause
                    # the literal converts to the column's OWN type
                    # exactly like range bounds: a native comparison
                    # pushes to the parquet scan, and an int column
                    # matched as a string would diverge from the same
                    # value in a range clause (cast("string") also
                    # breaks on doubles: "100" != "100.0")
                    b = _convert_bound(r.value[0], r.value[1],
                                       dtypes[r.value[0]])
                    preds.append((int(r.sid), col == F.lit(b)))
                    continue
                fname, lo, hi = r.value
                inc_lo, inc_hi = r.extra
                dt = dtypes[fname]
                p = None
                if lo is not None:
                    b = _convert_bound(fname, lo, dt)
                    p = col >= F.lit(b) if inc_lo else col > F.lit(b)
                if hi is not None:
                    b = _convert_bound(fname, hi, dt)
                    c2 = col <= F.lit(b) if inc_hi else col < F.lit(b)
                    p = c2 if p is None else (p & c2)
                preds.append((int(r.sid), p))
            coarse = preds[0][1]
            for _, p in preds[1:]:
                coarse = coarse | p
            sid_arr = F.array(*[
                F.when(p, F.lit(s)).cast("int") for s, p in preds])
            res = (
                doc_fields.where(coarse)
                .select(F.col("doc_id").cast("long").alias("doc_id"),
                        F.explode(sid_arr).alias("query_id"))
                .where(F.col("query_id").isNotNull())
            )
            return [_subcall_contribs(
                spark, res,
                pdf[["sid", "orig_qid", "role", "boost", "mbit",
                     "cbit"]],
                True)]

        thunks.append(run_fields)

    if len(thunks) == 1:
        part_lists = [thunks[0]()]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
            futures = [ex.submit(t) for t in thunks]
            # result order == thunk order (term, phrase, fuzzy,
            # wildcard, regexp, range, field) regardless of
            # completion order
            part_lists = [f.result() for f in futures]
    parts: list[DataFrame] = [p for lst in part_lists for p in lst]
    contribs = parts[0]
    for p in parts[1:]:
        contribs = contribs.unionByName(p)
    # size-routed fused tail (round 8): above _QS_FUSED_MIN_ROWS of raw
    # term-contribution mass the combined frame is tens of millions of
    # rows, and the legacy tail below moves it across THREE exchanges
    # (groupBy hash agg, then _salted_topk's salt window + global
    # window). One applyInPandas does combine + filters + local top-k
    # in a single exchange (_qs_fused_combine); the per-query meta
    # rides the task closure, so the qmeta broadcast join disappears
    # too. Filter/exclude batches keep the legacy tail (their joins
    # must apply before any top-k cut).
    if (est_mass >= _QS_FUSED_MIN_ROWS and doc_filter is None
            and doc_exclude is None):
        meta_by_qid = {int(m[0]): (int(m[1]), int(m[2]), list(m[3]))
                       for m in meta}
        return _qs_fused_combine(contribs, meta_by_qid)
    # explicit schema: cboosts is all-empty when no constant-score
    # clauses exist in the batch and inference can't type []
    qmeta = F.broadcast(pdf_frame(
        spark,
        pd.DataFrame(meta,
                     columns=["query_id", "n_must", "k", "cboosts"]),
        ddl="query_id int, n_must long, k long, "
            "cboosts array<double>"))
    # fused combine (round 7): the producers pre-summed contributions
    # and pre-OR'd the per-doc MUST-group bitmask and prohibited flag,
    # so this is one plain hash aggregate — popcount(bit_or) replaces
    # the old count_distinct-over-(clause, posting-entry) rows. A doc
    # surviving xnot == 0 necessarily matched >= 1 positive clause
    # (its rows exist and are not all MUST_NOT), preserving the old
    # score-not-null condition.
    per_doc = contribs.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("score0"),
        F.bit_or("mb").alias("mb"),
        F.bit_or("cb").alias("cb"),
        F.max("xn").alias("xnot"),
    )
    # constant-clause bits -> score: Σ over set bits of that clause's
    # boost (whole-stage-codegen higher-order fns, nothing collected)
    const_score = F.expr(
        "IF(size(cboosts) = 0, 0d, aggregate("
        "transform(cboosts, (b, i) -> IF(((cb >> i) & 1) = 1, b, 0d)),"
        " 0d, (acc, x) -> acc + x))")
    hits = (
        per_doc.join(qmeta, "query_id")
        .where((F.col("xnot") == 0)
               & (F.bit_count("mb") == F.col("n_must")))
        .withColumn("score", F.col("score0")
                    + F.coalesce(const_score, F.lit(0.0)))
    )
    if doc_filter is not None:
        hits = hits.join(doc_filter.select("doc_id"), "doc_id",
                         "left_semi")
    if doc_exclude is not None:
        hits = hits.join(doc_exclude.select("doc_id"), "doc_id",
                         "left_anti")
    return _salted_topk(
        hits, [F.desc("score"), F.asc("doc_id")],
        ["query_id", "doc_id", F.col("score").cast("double"),
         F.col("rank").cast("int")],
    )
