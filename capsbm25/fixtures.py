"""Deterministic synthetic transcript corpus + reference query set.

Implements FIXTURES.md §1-2 (the graft analog of the reference's seeded
input generator /root/reference/utils/gen_rand_seq.py:9-16). All
randomness is counter-based (splitmix64 over (seed, conv, turn, pos)),
so any subrange of conversations generates identically regardless of
batching — this lets Spark workers generate bench-scale corpora in
parallel with zero coordination and byte-identical results.

Schema (binding, per BASELINE.json input_hint):
  conv_id:string, turn_idx:int32, role:string, text:string,
  tool:string, ts:timestamp
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

VOCAB_SIZE = 5000
VOCAB = np.array([f"w{i:04d}" for i in range(VOCAB_SIZE)])
HOT_TERM = "hotterm"
OOV_TERM = "zzqqxxnotinvocab"
ZIPF_S = 1.1
EPOCH = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)
TS_STEP_S = 7

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant set).

    uint64 wraparound is the point — suppress numpy overflow warnings."""
    with np.errstate(over="ignore"):
        z = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


def _h(seed: int, *streams: np.ndarray | int) -> np.ndarray:
    acc = np.asarray(_U64(seed))
    for k, s in enumerate(streams):
        acc = _splitmix64(
            acc.astype(_U64) ^ (np.asarray(s).astype(_U64) + _U64(0x100 + k))
        )
    return acc


# Zipf(s=1.1) CDF over vocabulary ranks, precomputed once.
_ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
_pmf = _ranks ** (-ZIPF_S)
_pmf /= _pmf.sum()
_ZIPF_CDF = np.cumsum(_pmf)


def turns_per_conv(conv_idx: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic turns-per-conversation in [2, 12]."""
    return (2 + (_h(seed, conv_idx, 1) % _U64(11))).astype(np.int64)


def conv_row_offsets(n_convs: int, seed: int) -> np.ndarray:
    """Global row index of the first turn of each conv (+ total at end)."""
    tpc = turns_per_conv(np.arange(n_convs, dtype=np.int64), seed)
    out = np.zeros(n_convs + 1, dtype=np.int64)
    np.cumsum(tpc, out=out[1:])
    return out


def gen_rows(conv_lo: int, conv_hi: int, row_offset_lo: int, seed: int) -> pd.DataFrame:
    """Generate all turns for conversations [conv_lo, conv_hi).

    row_offset_lo = global row index of conv_lo's first turn (from
    conv_row_offsets); needed so ts stays globally consistent.
    """
    convs = np.arange(conv_lo, conv_hi, dtype=np.int64)
    tpc = turns_per_conv(convs, seed)
    n_rows = int(tpc.sum())
    if n_rows == 0:
        return _empty_pdf()

    conv_of_row = np.repeat(convs, tpc)
    first_row = np.repeat(np.cumsum(tpc) - tpc, tpc)
    turn_idx = (np.arange(n_rows, dtype=np.int64) - first_row).astype(np.int64)
    global_row = row_offset_lo + np.arange(n_rows, dtype=np.int64)

    hrow = _h(seed, conv_of_row, turn_idx, 2)

    # roles: user/assistant cycle; system at turn 0 of every 7th conv;
    # 'tool' role replaces ~20% of assistant turns (hash-chosen).
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    is_sys = (turn_idx == 0) & (conv_of_row % 7 == 0)
    role[is_sys] = "system"
    is_tool = (role == "assistant") & ((hrow % _U64(5)) == _U64(0))
    role[is_tool] = "tool"
    tools = np.array(["search", "code", "browse"], dtype=object)
    tool = np.where(is_tool, tools[(hrow % _U64(3)).astype(np.int64)], "none")

    # per-turn token count 5..80; ~2% empty turns
    n_toks = (5 + (_h(seed, conv_of_row, turn_idx, 3) % _U64(76))).astype(np.int64)
    empty = (hrow % _U64(50)) == _U64(0)
    n_toks[empty] = 0

    # flat token sampling via inverse-CDF Zipf on counter-based uniforms
    tok_row = np.repeat(np.arange(n_rows, dtype=np.int64), n_toks)
    tok_pos = np.arange(tok_row.size, dtype=np.int64) - np.repeat(
        np.cumsum(n_toks) - n_toks, n_toks
    )
    hu = _h(seed, conv_of_row[tok_row], turn_idx[tok_row], tok_pos, 4)
    u = (hu >> _U64(11)).astype(np.float64) / float(1 << 53)
    rank = np.searchsorted(_ZIPF_CDF, u, side="right")
    tokens = VOCAB[np.minimum(rank, VOCAB_SIZE - 1)].astype(object)

    # ~10% of tokens get mixed case + punctuation wrappers
    deco = (hu % _U64(10)) == _U64(0)
    if deco.any():
        decorated = np.char.add(
            np.char.capitalize(tokens[deco].astype(str)), ","
        ).astype(object)
        tokens[deco] = decorated

    # hot term: injected into ~30% of non-empty turns at position 0
    hot = ((hrow % _U64(10)) < _U64(3)) & ~empty
    first_tok_of_row = np.concatenate(([0], np.cumsum(n_toks)[:-1]))
    tokens[first_tok_of_row[hot]] = HOT_TERM

    # rare terms (df=1): ~1/97 of non-empty turns end with a unique token
    rare = ((hrow % _U64(97)) == _U64(3)) & ~empty
    last_tok_of_row = np.cumsum(n_toks) - 1
    rare_rows = np.flatnonzero(rare)
    if rare_rows.size:
        tokens[last_tok_of_row[rare_rows]] = np.array(
            [f"rare{global_row[r]}tok" for r in rare_rows], dtype=object
        )

    # join tokens per row
    text = np.full(n_rows, "", dtype=object)
    if tok_row.size:
        s = pd.Series(tokens)
        joined = s.groupby(tok_row).agg(" ".join)
        text[joined.index.to_numpy()] = joined.to_numpy()

    ts = pd.to_datetime(
        np.datetime64(EPOCH.replace(tzinfo=None))
        + global_row * np.timedelta64(TS_STEP_S, "s")
    )
    return pd.DataFrame(
        {
            "conv_id": pd.Series(
                [f"conv{seed:04d}-{c:06d}" for c in conv_of_row], dtype="string"
            ).astype(object),
            "turn_idx": turn_idx.astype(np.int32),
            "role": pd.array(role, dtype=object),
            "text": pd.array(text, dtype=object),
            "tool": pd.array(tool, dtype=object),
            "ts": ts,
        }
    )


def _empty_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": pd.Series(dtype=object),
            "turn_idx": pd.Series(dtype=np.int32),
            "role": pd.Series(dtype=object),
            "text": pd.Series(dtype=object),
            "tool": pd.Series(dtype=object),
            "ts": pd.Series(dtype="datetime64[ns]"),
        }
    )


def gen_transcripts_pdf(n_convs: int, seed: int = 42) -> pd.DataFrame:
    """Local (single-process) generation — tests and oracles."""
    return gen_rows(0, n_convs, 0, seed)


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def gen_transcripts_spark(spark, n_convs: int, seed: int = 42, partitions: int = 32):
    """Distributed generation via mapInPandas — identical rows to
    gen_transcripts_pdf for the same (n_convs, seed)."""
    offsets = conv_row_offsets(n_convs, seed)
    bounds = np.linspace(0, n_convs, partitions + 1).astype(np.int64)
    tasks = [
        (int(bounds[i]), int(bounds[i + 1]), int(offsets[bounds[i]]))
        for i in range(partitions)
        if bounds[i] < bounds[i + 1]
    ]
    task_df = spark.createDataFrame(tasks, "lo long, hi long, row_off long").repartition(
        len(tasks)
    )

    def gen(batches):
        for pdf in batches:
            for lo, hi, row_off in pdf.itertuples(index=False):
                yield gen_rows(int(lo), int(hi), int(row_off), seed)

    return task_df.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def gen_queries(seed: int = 42) -> list[tuple[int, str, int]]:
    """The reference query set (FIXTURES.md §2): 30 deterministic queries."""
    qs: list[tuple[int, str, int]] = []
    # 10 single-term: hot, rare (df<=1), OOV, + 7 vocab terms across ranks
    single = [HOT_TERM, "rare7tok", OOV_TERM] + [
        VOCAB[int(_h(seed, np.asarray(i), 7) % _U64(VOCAB_SIZE))] for i in range(7)
    ]
    for i, t in enumerate(single):
        qs.append((i, t, 10))
    # 10 two-term
    for i in range(10):
        a = VOCAB[int(_h(seed, np.asarray(i), 8) % _U64(VOCAB_SIZE))]
        b = VOCAB[int(_h(seed, np.asarray(i), 9) % _U64(VOCAB_SIZE))]
        qs.append((10 + i, f"{a} {b}", 10))
    # 10 of 3-5 terms
    for i in range(10):
        n = 3 + int(_h(seed, np.asarray(i), 10) % _U64(3))
        terms = [
            VOCAB[int(_h(seed, np.asarray(i), 11, np.asarray(j)) % _U64(VOCAB_SIZE))]
            for j in range(n)
        ]
        qs.append((20 + i, " ".join(terms), 10))
    # edge k values
    qs[3] = (3, qs[3][1], 1)
    qs[4] = (4, qs[4][1], 100)
    return qs


def queries_pdf(seed: int = 42) -> pd.DataFrame:
    return pd.DataFrame(gen_queries(seed), columns=["query_id", "text", "k"]).astype(
        {"query_id": np.int32, "k": np.int32}
    )
