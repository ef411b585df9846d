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
    num_part_ids: int = 512          # logical range partitions (oversubscribed)
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

    @property
    def parts_per_wave(self) -> int:
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
