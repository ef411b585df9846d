"""Generative differential test of parse_query_string: build random
query strings CONSTRUCTIVELY from known clause components, then assert
the parser recovers exactly the constructed clause list. Catches the
silent-misparse class (spurious clauses, dropped clauses, wrong
role/boost/extra) over a far wider input space than the hand-written
shape tests. Pure Python — no Spark session."""

from hypothesis import given, settings
from hypothesis import strategies as st

from capsbm25.config import BuildConfig
from capsbm25.parser import parse_query_string

CFG = BuildConfig()

# terms the word tokenizer keeps intact: lowercase alnum, start with a
# letter so they never read as a number and are < max_token_len
_term = st.from_regex(r"[a-z][a-z0-9]{0,9}", fullmatch=True).filter(
    lambda t: t.upper() not in ("AND", "OR", "NOT", "TO"))
_sign = st.sampled_from(["", "+", "-"])
_boost = st.one_of(st.none(), st.integers(1, 9),
                   st.tuples(st.integers(1, 9), st.integers(0, 9)))


def _boost_sfx(b):
    if b is None:
        return "", 1.0
    if isinstance(b, tuple):
        return f"^{b[0]}.{b[1]}", float(f"{b[0]}.{b[1]}")
    return f"^{b}", float(b)


_ROLE = {"": "should", "+": "must", "-": "not"}


@st.composite
def _term_clause(draw):
    s, t, b = draw(_sign), draw(_term), draw(_boost)
    sfx, bv = _boost_sfx(b)
    return (f"{s}{t}{sfx}",
            [{"role": _ROLE[s], "kind": "term", "value": t,
              "boost": bv, "extra": 0}])


@st.composite
def _fuzzy_clause(draw):
    s, t, b = draw(_sign), draw(_term), draw(_boost)
    e = draw(st.sampled_from(["~", "~0", "~1", "~2"]))
    sfx, bv = _boost_sfx(b)
    edits = 2 if e == "~" else int(e[1:])
    kind = "term" if edits == 0 else "fuzzy"
    return (f"{s}{t}{e}{sfx}",
            [{"role": _ROLE[s], "kind": kind, "value": t,
              "boost": bv, "extra": edits}])


@st.composite
def _wildcard_clause(draw):
    s, b = draw(_sign), draw(_boost)
    head, tail = draw(_term), draw(_term)
    w = draw(st.sampled_from(["*", "?"]))
    sfx, bv = _boost_sfx(b)
    pat = f"{head}{w}{tail if draw(st.booleans()) else ''}"
    return (f"{s}{pat}{sfx}",
            [{"role": _ROLE[s], "kind": "wildcard", "value": pat,
              "boost": bv, "extra": 0}])


@st.composite
def _phrase_clause(draw):
    s, b = draw(_sign), draw(_boost)
    toks = draw(st.lists(_term, min_size=1, max_size=4, unique=True))
    slop = draw(st.sampled_from(["", "~1", "~3"]))
    sfx, bv = _boost_sfx(b)
    chunk = f'{s}"{" ".join(toks)}"{slop}{sfx}'
    sl = int(slop[1:]) if slop else 0
    if len(toks) == 1:
        want = [{"role": _ROLE[s], "kind": "term", "value": toks[0],
                 "boost": bv, "extra": 0}]
    else:
        want = [{"role": _ROLE[s], "kind": "phrase",
                 "value": " ".join(toks), "boost": bv, "extra": sl}]
    return chunk, want


@st.composite
def _multi_token_bare(draw):
    # 'a.b' splits into one term clause per token, same role/boost
    s, b = draw(_sign), draw(_boost)
    toks = draw(st.lists(_term, min_size=2, max_size=3))
    sfx, bv = _boost_sfx(b)
    return (f"{s}{'.'.join(toks)}{sfx}",
            [{"role": _ROLE[s], "kind": "term", "value": t,
              "boost": bv, "extra": 0} for t in toks])


@st.composite
def _range_clause(draw):
    # [lo TO hi] / {lo TO hi} / mixed, * opens one side (round 7)
    s, b = draw(_sign), draw(_boost)
    lo, hi = draw(_term), draw(_term)
    open_side = draw(st.sampled_from([None, "lo", "hi"]))
    lo_s = "*" if open_side == "lo" else lo
    hi_s = "*" if open_side == "hi" else hi
    br_lo = draw(st.sampled_from("[{"))
    br_hi = draw(st.sampled_from("]}"))
    sfx, bv = _boost_sfx(b)
    return (f"{s}{br_lo}{lo_s} TO {hi_s}{br_hi}{sfx}",
            [{"role": _ROLE[s], "kind": "range",
              "value": (None if open_side == "lo" else lo,
                        None if open_side == "hi" else hi),
              "boost": bv, "extra": (br_lo == "[", br_hi == "]")}])


@st.composite
def _field_clause(draw):
    # fname:value metadata clause; text: re-dispatches to a term
    # clause on the default field (round 7)
    s, b = draw(_sign), draw(_boost)
    sfx, bv = _boost_sfx(b)
    if draw(st.booleans()):
        t = draw(_term)
        return (f"{s}text:{t}{sfx}",
                [{"role": _ROLE[s], "kind": "term", "value": t,
                  "boost": bv, "extra": 0}])
    fname = draw(st.from_regex(r"[a-z_][a-z0-9_]{0,9}",
                               fullmatch=True).filter(
        lambda f: f != "text"))
    # values stay unanalyzed: mixed case must round-trip verbatim
    value = draw(st.from_regex(r"[A-Za-z][A-Za-z0-9_.-]{0,9}",
                               fullmatch=True))
    return (f"{s}{fname}:{value}{sfx}",
            [{"role": _ROLE[s], "kind": "field",
              "value": (fname, value), "boost": bv, "extra": None}])


@st.composite
def _field_range_clause(draw):
    # fname:[lo TO hi] metadata range (round 7): bounds verbatim,
    # bracket inclusivity, * opens one side
    s, b = draw(_sign), draw(_boost)
    fname = draw(st.from_regex(r"[a-z_][a-z0-9_]{0,9}",
                               fullmatch=True).filter(
        lambda f: f != "text"))
    lo, hi = draw(_term), draw(st.from_regex(r"[A-Z0-9][A-Za-z0-9.-]{0,8}",
                                             fullmatch=True))
    open_side = draw(st.sampled_from([None, "lo", "hi"]))
    lo_s = "*" if open_side == "lo" else lo
    hi_s = "*" if open_side == "hi" else hi
    br_lo = draw(st.sampled_from("[{"))
    br_hi = draw(st.sampled_from("]}"))
    sfx, bv = _boost_sfx(b)
    return (f"{s}{fname}:{br_lo}{lo_s} TO {hi_s}{br_hi}{sfx}",
            [{"role": _ROLE[s], "kind": "field_range",
              "value": (fname,
                        None if open_side == "lo" else lo,
                        None if open_side == "hi" else hi),
              "boost": bv, "extra": (br_lo == "[", br_hi == "]")}])


_simple_clause = st.one_of(_term_clause(), _fuzzy_clause(),
                           _wildcard_clause(), _phrase_clause(),
                           _multi_token_bare(), _range_clause(),
                           _field_clause(), _field_range_clause())


@st.composite
def _group_clause(draw):
    # (m1 m2)^boost with a whole-group sign: members are unsigned
    # simple clauses sharing one gid; the group boost multiplies each
    # member's own (round-7 grouping)
    s, b = draw(_sign), draw(_boost)
    members = draw(st.lists(_simple_clause, min_size=1, max_size=3))
    members = [(c, ws) for c, ws in members
               if not c.startswith(("+", "-")) and ws]
    if not members:
        members = [("g0", [{"role": "should", "kind": "term",
                            "value": "g0", "boost": 1.0, "extra": 0}])]
    sfx, bv = _boost_sfx(b)
    chunk = f"{s}({' '.join(c for c, _ in members)}){sfx}"
    want = [dict(w, role=_ROLE[s], boost=w["boost"] * bv)
            for _, ws in members for w in ws]
    return chunk, want


_clause = st.one_of(_simple_clause, _group_clause())


def _with_gids(clauses):
    """Expected gid assignment (round 7): a fresh gid per APPENDED
    CLAUSE at top level — so each token of a multi-token bare chunk is
    its own singleton group (all tokens bind under MUST, the
    Lucene-under-AND behavior) — while an OR group mints ONE gid up
    front that every member clause shares (any-member semantics)."""
    want = []
    ctr = 0
    for chunk, ws in clauses:
        if chunk.lstrip("+-").startswith("("):
            gid, ctr = ctr, ctr + 1
            want.extend(dict(w, gid=gid) for w in ws)
        else:
            for w in ws:
                want.append(dict(w, gid=ctr))
                ctr += 1
    return want


@given(st.lists(_clause, min_size=0, max_size=6),
       st.sampled_from([" ", "  ", "\t", " \t "]))
@settings(max_examples=300, deadline=None)
def test_constructed_strings_parse_exactly(clauses, sep):
    text = sep.join(c for c, _ in clauses)
    want = _with_gids(clauses)
    got = parse_query_string(text, CFG)
    assert got == want, text


@given(st.lists(_simple_clause, min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_default_operator_and_promotes_bare(clauses):
    text = " ".join(c for c, _ in clauses)
    got = parse_query_string(text, CFG, default_operator="and")
    want = [dict(w, role="must") if w["role"] == "should" else w
            for w in _with_gids(clauses)]
    assert got == want, text
