"""Training-data-pipeline operators over the driver tables
(documents / embeddings / events) — the operations a 100 TB pretraining
corpus pipeline needs, expressed Spark-first (built-in columnar
expressions wherever possible; Arrow kernels only where built-ins can't
express the semantics).

Every operator here has a DuckDB-SQL oracle in __spark_entry__.py.
Portability note: cross-engine hash parity is achieved by using md5
(identical hex output in Spark and DuckDB) rather than engine-native
hash functions; a real deployment would swap xxhash64 for speed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from capsbm25.catalog import arrow_collect
from capsbm25.config import BuildConfig
from capsbm25.tokenize import tokens_expr

_CFG = BuildConfig()

# 50 most common English stopwords (public knowledge) for quality/langid
EN_STOPWORDS = (
    "the of and a to in is you that it he was for on are as with his they i "
    "at be this have from or one had by word but not what all were we when "
    "your can said there use an each which she do how their if"
).split()


def shingles(toks_col_name: str, n: int = 3) -> Column:
    """Distinct n-gram shingle array from a token-array column
    (built-in exprs only — stays in whole-stage codegen)."""
    t = toks_col_name
    # guard: sequence(1, 0) in Spark DESCENDS ([1, 0]) rather than being
    # empty, and slice(_, 0, _) throws — short docs need the CASE arm
    return F.array_distinct(
        F.expr(
            f"CASE WHEN size({t}) >= {n} THEN "
            f"transform(sequence(1, size({t}) - {n - 1}),"
            f" i -> concat_ws(' ', slice({t}, i, {n}))) "
            f"ELSE CAST(array() AS array<string>) END"
        )
    )


def _doc_grams(docs: DataFrame, n: int = 3) -> DataFrame:
    return docs.select(
        "doc_id", tokens_expr(F.col("text"), _CFG).alias("toks")
    ).select("doc_id", shingles("toks", n).alias("grams"))


def minhash_signatures(docs: DataFrame, n_hashes: int = 8,
                       grams: DataFrame | None = None) -> DataFrame:
    """MinHash signature per doc: h_i = min over shingles of
    md5(i || '|' || shingle). Lexicographic min over a uniform hex hash
    is a valid permutation-min proxy, and md5 hex is identical across
    engines (cross-checkable in SQL). grams: optional precomputed
    _doc_grams(docs) frame (pass a persisted one to share the
    tokenize->shingle scan with other pipeline stages)."""
    g = (grams if grams is not None else _doc_grams(docs)).where(
        F.size("grams") > 0)

    # NB: the lambda must take exactly ONE argument — PySpark interprets
    # a two-parameter lambda in F.transform as (element, array_index),
    # which would silently clobber a loop variable bound via default arg.
    def hashed(i: int):
        prefix = f"{i}|"
        return lambda x: F.md5(F.concat(F.lit(prefix), x))

    sig = [
        F.array_min(F.transform(F.col("grams"), hashed(i))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return g.select("doc_id", *sig)


def minhash_lsh_pairs(
    docs: DataFrame, n_hashes: int = 8, bands: int = 4,
    grams: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band bucket
    (shingle -> minhash -> band -> bucket-join). Returns distinct
    (doc1, doc2) candidate pairs, doc1 < doc2."""
    if not 1 <= bands <= n_hashes or n_hashes % bands:
        # bands > n_hashes would make every band hash a CONSTANT
        # (rows_per_band = 0): every doc shares every bucket and the
        # join silently degenerates to all-pairs O(n^2); a non-divisor
        # silently ignores the top n_hashes % bands signatures
        raise ValueError(
            f"bands must divide n_hashes with 1 <= bands <= n_hashes "
            f"(got n_hashes={n_hashes}, bands={bands})"
        )
    sig = minhash_signatures(docs, n_hashes, grams=grams)
    rows_per_band = n_hashes // bands
    # ALL band buckets in one select + explode — a per-band union would
    # re-execute the tokenize->shingle->minhash tree once per band
    # (bands full input scans at 100 TB); this shape is one scan per
    # join side (asserted in tests/test_dataops.py plan test)
    band_hashes = [
        F.md5(F.concat_ws(
            "|", F.lit(str(b)),
            *[F.col(f"mh{i}")
              for i in range(b * rows_per_band, (b + 1) * rows_per_band)],
        ))
        for b in range(bands)
    ]
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_hashes)).alias("bucket")
    )
    a, c = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(c, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )


def minhash_dedup_verified(
    docs: DataFrame, threshold: float = 0.8, n_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """Full MinHash near-dup pipeline: LSH candidate pairs verified by
    exact shingle Jaccard >= threshold. The candidate step makes the
    O(n^2) pair space O(candidates); verification removes LSH false
    positives — this is the standard production near-dup shape.
    Returns (doc1, doc2, jac_r).

    The tokenize->shingle frame is computed ONCE and persisted: the
    signature/banding stage and BOTH exact-verify join sides read the
    cached grams, so the corpus text is scanned a single time instead
    of three (at 100 TB each avoided full-corpus scan is the dominant
    cost; plan-asserted in tests/test_dataops.py). MEMORY_AND_DISK so
    an over-memory gram frame spills instead of evicting + recomputing.
    NOTE the cache's lifetime: the cache manager holds the persisted
    plan strongly, so it lives until session end (or
    spark.catalog.clearCache()) — there is no earlier safe release
    point inside this function because the returned joins execute
    lazily against it. Callers running MANY dedup passes in one
    session should clearCache() between passes (one pass pins one
    tokenize->shingle frame of the corpus)."""
    from pyspark import StorageLevel

    g = _doc_grams(docs).persist(StorageLevel.MEMORY_AND_DISK)
    cand = minhash_lsh_pairs(docs, n_hashes, bands, grams=g)
    a = g.select(F.col("doc_id").alias("doc1"), F.col("grams").alias("g1"))
    b = g.select(F.col("doc_id").alias("doc2"), F.col("grams").alias("g2"))
    inter = F.size(F.array_intersect(F.col("g1"), F.col("g2")))
    uni = F.size(F.array_union(F.col("g1"), F.col("g2")))
    return (
        cand.join(a, "doc1")
        .join(b, "doc2")
        .select(
            "doc1",
            "doc2",
            F.round(inter.cast("double") / F.greatest(uni, F.lit(1)), 6).alias(
                "jac_r"
            ),
        )
        .where(F.col("jac_r") >= threshold)
    )


def simhash_bits(docs: DataFrame, n_bits: int = 32) -> DataFrame:
    """SimHash fingerprint as a bit string: bit_j = sign of the sum over
    shingles of (bit_j(md5(shingle)) ? +1 : -1). Bit j is extracted from
    the hex digest arithmetically (hex char -> nibble -> bit), which
    both engines evaluate identically."""
    g = _doc_grams(docs).select(
        "doc_id", F.explode("grams").alias("gram")
    ).withColumn("h", F.md5("gram"))
    j = F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("j")
    # instr + explicit floor: identical semantics in Spark and DuckDB
    # (CAST(double AS INT) truncates in Spark but ROUNDS in DuckDB)
    bits = g.select("doc_id", "h", j).withColumn(
        "nib",
        F.expr("instr('0123456789abcdef', substr(h, CAST(floor(j/4) AS INT) + 1, 1)) - 1"),
    ).withColumn(
        "bit", F.expr("CAST(floor(nib / pow(2, 3 - j % 4)) AS INT) % 2")
    )
    agg = bits.groupBy("doc_id", "j").agg(
        (F.sum(F.col("bit") * 2 - 1)).alias("s")
    )
    return agg.groupBy("doc_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("j"), (F.col("s") >= 0).cast("int").alias("b")))
                ),
                lambda st: st["b"].cast("string"),
            ),
        ).alias("simhash")
    )


def simhash_bits_kernel(docs: DataFrame, n_bits: int = 32) -> DataFrame:
    """SimHash as ONE Arrow kernel — the 100 TB shape.

    The expression form (simhash_bits below, kept as the DuckDB-parity
    cross-check) explodes grams x n_bits rows through two shuffled
    groupBys — a 32x row blowup per gram. Here each batch md5s every
    DISTINCT gram once, unpacks the leading 32 bits with numpy, and
    sign-sums contributions per doc with add.reduceat: zero shuffle,
    zero row blowup, bit-identical output (tested)."""
    import hashlib

    import numpy as np
    import pandas as pd

    from capsbm25.tokenize import make_series_tokenizer

    if n_bits % 8 or not 8 <= n_bits <= 128:
        # the byte-sliced digest unpack needs whole bytes within md5's
        # 16; other widths would silently emit wrong-length
        # fingerprints (or crash) — the expression form (simhash_bits)
        # handles any n_bits <= 128
        raise ValueError(
            "simhash_bits_kernel needs n_bits in {8,16,...,128}; use "
            f"simhash_bits for other widths (got {n_bits})"
        )
    # the shared Series tokenizer — NOT an inline regex copy — so the
    # kernel cannot drift from tokens_expr / the build kernels
    tokenize = make_series_tokenizer(_CFG)
    nb = n_bits

    def kernel(it):
        for pdf in it:
            toks = tokenize(pdf["text"])
            doc_rows, gram_list = [], []
            for i, tl in enumerate(toks):
                if len(tl) < 3:
                    continue
                grams = list(dict.fromkeys(
                    " ".join(tl[j:j + 3]) for j in range(len(tl) - 2)
                ))
                doc_rows.append((i, len(grams)))
                gram_list.extend(grams)
            if not gram_list:
                yield pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                    "simhash": pd.Series(dtype=object)})
                continue
            codes, uniq = pd.factorize(
                np.asarray(gram_list, dtype=object), sort=False
            )
            # md5 each DISTINCT gram once; first nb bits of the hex
            # digest, MSB-first — identical to the SQL nibble extraction
            dig = b"".join(
                hashlib.md5(g.encode()).digest()[: nb // 8] for g in uniq
            )
            bits = np.unpackbits(
                np.frombuffer(dig, dtype=np.uint8).reshape(-1, nb // 8),
                axis=1,
            ).astype(np.int32)
            contrib = bits[codes] * 2 - 1            # (n_grams, nb)
            sizes = np.array([r[1] for r in doc_rows], dtype=np.int64)
            starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
            sums = np.add.reduceat(contrib, starts, axis=0)
            ge = (sums >= 0).astype(np.uint8)
            strings = [
                "".join("1" if b else "0" for b in row) for row in ge
            ]
            ids = pdf["doc_id"].to_numpy()
            out_ids = ids[[r[0] for r in doc_rows]]
            out_hash = strings
            yield pd.DataFrame({"doc_id": out_ids, "simhash": out_hash})

    return docs.select("doc_id", "text").mapInPandas(
        kernel, schema="doc_id long, simhash string"
    )


def winnow_fingerprints(docs: DataFrame, k: int = 8, w: int = 5) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the MOSS rolling-hash scheme): hash every char k-gram of the
    token-normalized text, slide a window of w hashes, keep the min per
    window, emit the distinct mins as the doc's fingerprint set. Two
    docs sharing a substring of length >= k + w - 1 are guaranteed to
    share a fingerprint. Pure built-in exprs (codegen, zero shuffle
    until the caller aggregates); md5 keeps it DuckDB-cross-checkable.
    Returns (doc_id, fp) exploded rows."""
    norm = F.concat_ws(" ", tokens_expr(F.col("text"), _CFG))
    d = docs.select("doc_id", norm.alias("nrm"))
    d = d.where(F.length("nrm") >= k)
    grams = F.expr(
        f"transform(sequence(1, length(nrm) - {k} + 1),"
        f" i -> md5(substr(nrm, i, {k})))"
    )
    d = d.select("doc_id", grams.alias("hs")).where(F.size("hs") >= w)
    wins = F.expr(
        f"transform(sequence(1, size(hs) - {w} + 1),"
        f" j -> array_min(slice(hs, j, {w})))"
    )
    return d.select(
        "doc_id", F.explode(F.array_distinct(wins)).alias("fp")
    )


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above threshold.

    Brute-force O(n^2) self-join — the exact baseline. The scale path is
    LSH bucketing first (ann_lsh_buckets below) to shrink the join."""
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, z: acc + z
        )

    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    cos = dot(F.col("a.v"), F.col("b.v")) / (
        F.sqrt(dot(F.col("a.v"), F.col("a.v"))) * F.sqrt(dot(F.col("b.v"), F.col("b.v")))
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec1"),
            F.col("b.vec_id").alias("vec2"),
            F.round(cos, 5).alias("cos_r"),
        )
        .where(F.col("cos_r") >= threshold)
    )


def embedding_neardup_lsh(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    n_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs — the SCALE path.

    The exact baseline (embedding_neardup_pairs) is an all-pairs O(n^2)
    self-join. Here candidates are generated by a bucketed self-join on
    random-hyperplane LSH signatures (vectors sharing ANY of n_tables
    sign-pattern buckets), then verified with the exact cosine — so the
    join space is O(candidates) and every emitted pair is exact. Output
    is a SUBSET of the exact baseline with recall governed by
    n_planes/n_tables (for cos >= 0.95 the per-table collision
    probability is (1 - acos(0.95)/pi)^n_planes ~ 0.49 at n_planes=8,
    so 6 tables give ~1 - (1-0.49)^6 ~ 0.98 recall).

    Scope note (honest limits of angular LSH): this is the production
    shape for HIGH thresholds (~0.9+), where near-dup detection
    actually operates. Below ~0.7 the OR-amplified collision
    probability for random pairs approaches 1 before recall does, so
    candidates stop being a reduction — for low thresholds keep the
    exact join (embedding_neardup_pairs) or band on another key. The
    driver entry therefore keeps the exact form (its synthetic
    embeddings top out at cos ~0.5 — no true near-dups); the scale
    path is proven in tests/test_dataops.py on clone-perturbed vectors
    (candidates << all pairs AND output == exact)."""
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    b = ann_lsh_buckets(v, "v", n_planes, n_tables, seed)
    cand = (
        b.alias("a").join(
            b.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec1"), F.col("b.vec_id").alias("vec2"))
        .distinct()
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, z: acc + z
        )

    a = v.select(F.col("vec_id").alias("vec1"), F.col("v").alias("v1"))
    c = v.select(F.col("vec_id").alias("vec2"), F.col("v").alias("v2"))
    cos = dot(F.col("v1"), F.col("v2")) / (
        F.sqrt(dot(F.col("v1"), F.col("v1"))) * F.sqrt(dot(F.col("v2"), F.col("v2")))
    )
    return (
        cand.join(a, "vec1")
        .join(c, "vec2")
        .select("vec1", "vec2", F.round(cos, 5).alias("cos_r"))
        .where(F.col("cos_r") >= threshold)
    )


def substring_scan(docs: DataFrame, pattern: str) -> DataFrame:
    """Non-indexed substring occurrence count — the full-scan fallback
    for patterns shorter than the chargram index's gram size (where
    query.substring_topk cannot answer), and the obviously-correct
    baseline for it everywhere else. Exact OVERLAP-counting semantics,
    identical to the index path: every start position is tested. Pure
    built-in exprs (codegen; column-pruned scan); matches case-
    insensitively like the chargram index. Returns (doc_id, n_occ) for
    docs with >= 1 occurrence."""
    pat = pattern.lower()
    if not pat:
        raise ValueError("empty pattern")
    L = len(pat)
    hay = F.lower(F.coalesce(F.col("text"), F.lit("")))
    starts = F.sequence(F.lit(1), F.length(hay) - (L - 1))
    n_occ = F.when(
        F.length(hay) >= L,
        F.size(F.filter(starts, lambda i: hay.substr(i, F.lit(L)) == pat)),
    ).otherwise(F.lit(0))
    return (
        docs.select("doc_id", n_occ.cast("long").alias("n_occ"))
        .where(F.col("n_occ") > 0)
    )


def langid_heuristic(docs: DataFrame) -> DataFrame:
    """n-gram-free language-ID heuristic: English stopword hit ratio.
    (The corpus is synthetic; the point is the operator shape.)"""
    toks = tokens_expr(F.col("text"), _CFG)
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    return docs.select(
        "doc_id",
        F.when(F.size(toks) == 0, F.lit("unknown"))
        .when(n_stop.cast("double") / F.greatest(F.size(F.array_distinct(toks)), F.lit(1)) >= 0.05, "en")
        .otherwise("other")
        .alias("lang_pred"),
    )


def events_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per-user session ids split on inactivity gaps,
    then per-session aggregates. Pure window functions.

    Scale bound: Window.partitionBy(user_id) makes ONE task hold one
    user's full event history — the standard shape, correct for human
    users (bounded events/user), but a pathological key (a bot id, a
    null-ish default id) concentrates in a single task. At 100 TB,
    either pre-filter such keys, or split them by a coarse time bucket
    first and stitch sessions across bucket boundaries in a second
    (cheap, boundary-rows-only) pass; AQE skew handling does not apply
    to window partitions."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # the gap test is NATIVE NTZ INTERVAL arithmetic: ts - prev_ts is
    # an exact day-time interval compared against the threshold
    # interval. The previous cast-to-timestamp-to-long route applied
    # the session timezone per-wall-time, so across a DST transition
    # the offset changed by an hour mid-difference (phantom-hour gaps,
    # session-tz-dependent output); timestampdiff/date_trunc coerce
    # NTZ through the session tz the same way. Interval comparison is
    # also full-precision — it matches the DuckDB oracle's fractional
    # epoch() difference exactly, where any seconds truncation
    # disagrees by one on sub-second boundaries.
    sess = (
        events.withColumn("_prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (F.col("_prev_ts").isNull()
             | ((F.col("ts") - F.col("_prev_ts"))
                > F.expr(f"INTERVAL {int(gap_minutes) * 60} SECONDS"))
             ).cast("int"))
        .withColumn("session_id", F.sum("new_sess").over(w))
        .drop("_prev_ts")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value_r"),
    )


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windowed counts by event_type."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value_r"))
    )


def binary_features(docs: DataFrame) -> DataFrame:
    """Multimodal-column plumbing: treat payloads as opaque binary and
    run a vectorized Arrow kernel over them (schema/partitioning/batch
    shape are the real thing; the 'decode' is a deterministic stand-in —
    image/audio codecs aren't in this container, see decode_stub)."""
    import pandas as pd

    with_bin = docs.select(
        "doc_id", F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload")
    )

    def kernel(it):
        for pdf in it:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payload.map(len).astype("int64"),
                    "head_hex": payload.map(lambda b: bytes(b)[:8].hex()),
                }
            )

    return with_bin.mapInPandas(kernel, schema="doc_id long, n_bytes long, head_hex string")


def _lsh_planes(seed: int, n_tables: int, n_planes: int, dim: int):
    """Deterministic seeded hyperplanes, cached per worker. Generated
    INSIDE the executor from (seed, dim): no driver-side .first() to
    discover dim, no O(n_tables x n_planes x dim) literal arrays in the
    Catalyst plan (which blew up past dim ~256), no broadcast needed —
    every worker derives identical planes from the same seed."""
    import numpy as np

    key = (seed, n_tables, n_planes, dim)
    cache = _lsh_planes.__dict__.setdefault("cache", {})
    if key not in cache:
        rng = np.random.default_rng(seed)
        cache[key] = rng.standard_normal((n_tables, n_planes, dim))
    return cache[key]


def ann_lsh_buckets(
    df: DataFrame,
    vec_col: str,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """(vec_id, bucket) rows: n_tables sign-pattern LSH buckets per
    vector, computed in one vectorized Arrow kernel (plan size is
    independent of embedding dim — works at dim 768/1536/4096)."""
    import numpy as np

    @F.pandas_udf("array<string>")
    def buckets_of(vs: pd.Series) -> pd.Series:
        if vs.empty:
            return pd.Series([], dtype=object)
        V = np.asarray(vs.tolist(), dtype=np.float64)  # (B, dim)
        planes = _lsh_planes(seed, n_tables, n_planes, V.shape[1])
        bits = (V @ planes.reshape(-1, V.shape[1]).T) >= 0  # (B, T*P)
        chars = np.where(bits, "1", "0")
        out = []
        for r in range(chars.shape[0]):
            row = chars[r]
            out.append([
                str(t) + "".join(row[t * n_planes:(t + 1) * n_planes])
                for t in range(n_tables)
            ])
        return pd.Series(out)

    # drop null embeddings BEFORE the kernel: one NULL in a batch makes
    # np.asarray raise ('inhomogeneous shape') and aborts the whole
    # job, where the expression-based cosine paths just null-propagate
    return df.where(F.col(vec_col).isNotNull()).select(
        "vec_id", F.explode(buckets_of(F.col(vec_col))).alias("bucket")
    )


def ann_lsh_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate nearest neighbours via random-hyperplane LSH.

    Scale path for similarity search: each vector is hashed into
    n_tables sign-pattern buckets by a vectorized Arrow kernel
    (seeded hyperplanes derived per worker — see _lsh_planes; plan size
    is independent of embedding dim, no driver-side dim probe);
    candidates = vectors sharing ANY bucket with the query; exact cosine
    is then computed only on candidates. At 10^12 rows the bucket join
    replaces the O(n) full scan of the brute-force baseline
    (embedding_neardup_pairs); recall is tunable via n_planes/n_tables.

    Returns (vec_id, cos_r) for the top-k candidates — a subset of the
    exact answer; tests measure recall against the brute-force oracle.
    """
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    buckets = ann_lsh_buckets(v, "v", n_planes, n_tables, seed)

    qb = buckets.where(F.col("vec_id") == query_vec_id).select("bucket").distinct()
    cand_ids = (
        buckets.join(F.broadcast(qb), "bucket")
        .where(F.col("vec_id") != query_vec_id)
        .select("vec_id")
        .distinct()
    )

    qv = v.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, z: acc + z
        )

    return (
        v.join(cand_ids, "vec_id")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                dot(F.col("v"), F.col("qv"))
                / (F.sqrt(dot(F.col("v"), F.col("v")))
                   * F.sqrt(dot(F.col("qv"), F.col("qv")))),
                5,
            ).alias("cos_r"),
        )
        .orderBy(F.desc("cos_r"), F.asc("vec_id"))
        .limit(k)
    )


def ann_ivf_topk(
    emb: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_sample: int = 4096,
    seed: int = 42,
) -> DataFrame:
    """Approximate nearest neighbours via IVF (inverted-file) cells —
    the second standard ANN scale path next to LSH (ann_lsh_topk).

    Train: k-means centroids on a bounded seeded sample, fit on the
    driver with numpy (the same sanctioned small-sample driver work as
    the samplesort splitters). Assign: one vectorized Arrow kernel maps
    every vector to its nearest-centroid cell (plan size independent of
    dim). Query: probe the n_probe cells nearest the query vector and
    compute exact cosine only inside them — at 10^12 rows the cell
    filter replaces the full scan, recall tunable via n_probe.
    """
    import numpy as np

    # null embeddings would abort the Arrow kernels (np.asarray on a
    # list containing None); drop them like the LSH path
    v = emb.where(F.col("embedding").isNotNull()).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    sample_pdf = arrow_collect(
        v.select("v")
        .orderBy(F.xxhash64("vec_id", F.lit(seed)))
        .limit(train_sample)
    )
    if sample_pdf.empty:
        # empty input: no neighbours (the LSH sibling degrades the
        # same way instead of crashing on a 0-row norm)
        return emb.sparkSession.createDataFrame(
            [], "vec_id long, cos_r double")
    X = np.asarray(sample_pdf["v"].tolist(), dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    kc = min(n_centroids, len(X))
    C = X[rng.choice(len(X), size=kc, replace=False)]
    for _ in range(10):  # spherical k-means on the sample
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(kc):
            m = assign == j
            if m.any():
                c = X[m].mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)

    @F.pandas_udf("int")
    def cell_of(vs: pd.Series) -> pd.Series:
        import numpy as _np

        if vs.empty:
            return pd.Series([], dtype="int32")
        V = _np.asarray(vs.tolist(), dtype=_np.float64)
        V = V / _np.maximum(_np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.Series(_np.argmax(V @ C.T, axis=1).astype("int32"))

    cells = v.withColumn("cell", cell_of("v"))
    qv_pdf = v.where(F.col("vec_id") == query_vec_id).toPandas()
    if qv_pdf.empty:
        # unknown query id: empty result, like the LSH sibling
        return emb.sparkSession.createDataFrame(
            [], "vec_id long, cos_r double")
    # Arrow-backed cells come back as read-only numpy views — copy
    q = np.array(qv_pdf["v"].iloc[0], dtype=np.float64, copy=True)
    q /= max(np.linalg.norm(q), 1e-12)
    probe = [int(c) for c in np.argsort(-(C @ q))[:n_probe]]

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, z: acc + z
        )

    qv = v.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    return (
        cells.where(F.col("cell").isin(probe))
        .where(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(
                dot(F.col("v"), F.col("qv"))
                / (F.sqrt(dot(F.col("v"), F.col("v")))
                   * F.sqrt(dot(F.col("qv"), F.col("qv")))),
                5,
            ).alias("cos_r"),
        )
        .orderBy(F.desc("cos_r"), F.asc("vec_id"))
        .limit(k)
    )


def decode_stub(payload: bytes, media_type: str):
    """Media decode stub — the real decode (PIL/librosa/av) is not
    available in this container. The Spark-side plumbing (binary column,
    Arrow batch kernel, schema) is real and tested via binary_features."""
    raise NotImplementedError(
        f"media decode for {media_type!r} requires codec libraries not "
        "present in this environment; wire PIL/soundfile/av here."
    )
