"""Build/query configuration.

Knob parity with the reference (/root/reference):
  num_part_ids      ~ subproblem count p_ = min(8192, n/16)
                      (include/Suffix_Array.hpp:42, src/Suffix_Array.cpp:24)
  samples_per_part  ~ pivot oversampling 32*ln(n) (src/Suffix_Array.cpp:27)
  max_token_len     ~ bounded comparison context max_context
                      (include/Suffix_Array.hpp:36)
The reference oversubscribes subproblems (8192) vs threads for load
balance; we do the same: num_part_ids >> shuffle partitions.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class BuildConfig:
    # --- partitioning (the samplesort graft) ---
    # None = ADAPTIVE: resolved from the corpus size at build time
    # (resolve_parts). The round-4 fixed 512 made parts-per-wave >> task
    # count at small corpora, and the partitionBy(part_id) layout then
    # paid ~3ms/file writer init + listing cost for hundreds of files a
    # 32-task wave would have written as 32 — measured ~3-4s of the
    # sf0.1 bench wall. Adaptive keeps file count ~= task count until
    # the corpus genuinely needs more range granularity.
    num_part_ids: int | None = None  # logical range partitions (oversubscribed)
    shuffle_partitions: int = 32     # physical Spark shuffle partitions
    samples_per_part: int = 32       # splitter oversampling per logical part
    sample_fraction: float | None = None  # None = derived from corpus estimate
    seed: int = 42

    # --- skew / salting ---
    # a term is "hot" when its share of sampled (term, doc_id) pairs
    # exceeds hot_share_threshold; it gets salt_buckets-way salting with
    # a dedicated reserved part-id range and a merge fix-up pass
    # (the analog of compute_partition_boundary_lcp,
    #  /root/reference/src/Suffix_Array.cpp:431-447).
    hot_share_threshold: float = 0.005
    max_salt_buckets: int = 32

    # --- tokenizer ---
    # "regex": lowercase + token_pattern runs (the word-granular index).
    # "chargram": lowercase + ALL overlapping chargram_n-char windows,
    #   position = char offset — the char-granular index mode behind
    #   substring_topk (the graft analog of the reference suffix array's
    #   any-byte-substring search, Suffix_Array.cpp:252-297). Index size
    #   is O(total chars), the same asymptotic as a suffix array.
    tokenizer: str = "regex"
    chargram_n: int = 3
    token_pattern: str = "[a-z0-9]+"
    max_token_len: int | None = None  # truncate tokens (max_context analog)
    use_pandas_tokenizer: bool = False  # False = JVM regexp_extract_all (faster)

    # --- posting encoding ---
    block_size: int = 128            # entries per block-max block
    # store in-document token positions (delta+varint per pair) —
    # enables phrase queries (the functional analog of the reference's
    # substring match-range, Suffix_Array.cpp:252-297) at the cost of
    # one extra varint stream roughly the size of the tf stream x avg tf
    index_positions: bool = False

    # --- BM25 ---
    k1: float = 1.2
    b: float = 0.75

    # --- build orchestration / resume ---
    num_waves: int = 4               # partition-grained checkpoint waves

    # --- misc ---
    extra: dict = field(default_factory=dict)

    # adaptive-partitioning shape: ~2048 docs of posting mass per
    # logical part (matches the hand-tuned 512 parts at 1.05M turns,
    # the scale where the partitioned layout starts paying for itself)
    DOCS_PER_PART = 2048

    def resolve_parts(self, n_docs: int) -> "BuildConfig":
        """Resolve num_part_ids from the corpus size (no-op when the
        caller pinned it). Floor: shuffle_partitions * num_waves, so
        each wave writes ~one part dir per task — the file count of an
        unpartitioned layout. Cap: grows with configured parallelism
        (16 parts/task of oversubscription headroom) up to the
        reference's 8192 subproblem cap (Suffix_Array.hpp:42)."""
        if self.num_part_ids is not None:
            return self
        import dataclasses

        floor_parts = max(1, self.shuffle_partitions * self.num_waves)
        cap = min(8192, max(512, 16 * self.shuffle_partitions))
        eff = max(floor_parts, min(cap, n_docs // self.DOCS_PER_PART))
        return dataclasses.replace(self, num_part_ids=int(eff))

    @property
    def parts_per_wave(self) -> int:
        if self.num_part_ids is None:
            raise ValueError(
                "num_part_ids is adaptive (None) — call resolve_parts(N) first"
            )
        return max(1, -(-self.num_part_ids // self.num_waves))

    # Fields that MUST match between build and query time: they shape the
    # persisted postings (tokenization, block alignment) or the scores
    # (k1/b). Persisted into corpus_stats.json at build, adopted at query
    # via load_build_config — a caller's mismatched cfg would silently
    # misalign block slicing against stored block_max and skew scores.
    PERSISTED_FIELDS = (
        "block_size", "k1", "b", "token_pattern", "max_token_len",
        "index_positions", "tokenizer", "chargram_n",
    )

    def persist_dict(self) -> dict:
        return {f: getattr(self, f) for f in self.PERSISTED_FIELDS}

    def adopt(self, persisted: dict) -> "BuildConfig":
        """Return a copy with the index's persisted build-time fields
        applied over this config's runtime knobs."""
        import dataclasses

        known = {k: v for k, v in persisted.items()
                 if k in self.PERSISTED_FIELDS}
        return dataclasses.replace(self, **known)
