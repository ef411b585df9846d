"""Term-space partition planning — the samplesort graft itself.

Maps the reference's splitter machinery onto the (term, doc_id) domain:

* sample_pivots / select_pivots (/root/reference/src/Suffix_Array.cpp:
  187-222, oversampling 32*ln n at :27)  ->  seeded sample of pairs,
  tf-weighted quantile splitters chosen on the driver.
* locate_pivots + partition_sub_subarrays (:225-249, :300-368, the
  "shuffle plan")  ->  a vectorized searchsorted kernel assigning each
  (term, doc_id) pair a logical part_id, then one Spark hash exchange
  on part_id.
* Zipf head terms (which plain range partitioning would dump onto one
  reducer) get **salting**: a hot term owns a reserved contiguous range
  of part ids and its pairs spread as base + doc_id % n_buckets; the
  partial postings are stitched by a merge fix-up pass — the analog of
  compute_partition_boundary_lcp (:431-447).

The plan is a plain serializable object recorded in the build manifest
(lineage: the exact shuffle plan that produced an index is auditable).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass

import numpy as np
import pandas as pd

from capsbm25.config import BuildConfig


@dataclass
class PartitionPlan:
    splitters: list[str]                     # n_normal-1 term cut points
    hot_terms: dict[str, tuple[int, int]]    # term -> (base_part, n_buckets)
    num_parts: int
    n_normal: int
    seed: int = 42

    def assign(self, terms: np.ndarray, doc_ids: np.ndarray) -> np.ndarray:
        """Vectorized part-id assignment (no per-row Python)."""
        t = np.asarray(terms, dtype=object)
        part = np.searchsorted(
            np.array(self.splitters, dtype=object), t, side="right"
        ).astype(np.int32)
        if self.hot_terms and t.size:
            # one factorize + dict lookups over the DISTINCT terms —
            # a per-hot-term object-equality scan costs n_hot full
            # passes over every pair in the batch
            codes, uniq = pd.factorize(t, sort=False)
            base_u = np.fromiter(
                (self.hot_terms.get(u, (-1, 1))[0] for u in uniq),
                dtype=np.int64, count=len(uniq),
            )
            nb_u = np.fromiter(
                (self.hot_terms.get(u, (-1, 1))[1] for u in uniq),
                dtype=np.int64, count=len(uniq),
            )
            base_r = base_u[codes]
            hot = base_r >= 0
            if hot.any():
                ids = np.asarray(doc_ids)[hot].astype(np.int64)
                part[hot] = (base_r[hot] + ids % nb_u[codes][hot]).astype(
                    np.int32
                )
        return part

    def is_hot(self, term: str) -> bool:
        return term in self.hot_terms

    def to_json(self) -> str:
        return json.dumps(
            {
                "splitters": self.splitters,
                "hot_terms": {k: list(v) for k, v in self.hot_terms.items()},
                "num_parts": self.num_parts,
                "n_normal": self.n_normal,
                "seed": self.seed,
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "PartitionPlan":
        d = json.loads(s)
        return cls(
            splitters=d["splitters"],
            hot_terms={k: tuple(v) for k, v in d["hot_terms"].items()},
            num_parts=d["num_parts"],
            n_normal=d["n_normal"],
            seed=d["seed"],
        )


def plan_from_sample(sample: pd.DataFrame, cfg: BuildConfig) -> PartitionPlan:
    """Build the plan from a driver-collected sample of (term, tf) pairs.

    Weighted by tf so splitters balance posting-entry mass, not distinct
    terms (the reference balances suffix count per partition the same
    way — regular sampling of the sorted run, Suffix_Array.cpp:187-194).
    """
    if sample.empty:
        return PartitionPlan([], {}, cfg.num_part_ids, cfg.num_part_ids, cfg.seed)
    agg = sample.groupby("term", sort=True)["tf"].sum()
    total = float(agg.sum())
    shares = agg / total

    # hot-term detection + bucket budget (at most half the part space).
    # Adaptive floor: any term heavier than ~1.5 partition quanta MUST be
    # salted — otherwise quantile cuts repeat on it, dedup collapses the
    # repeats, and one reducer inherits several quanta of a single term
    # (observed as a 4x heavy first wave at bench scale).
    thr = min(cfg.hot_share_threshold, 1.5 / max(cfg.num_part_ids, 1))
    hot_candidates = shares[shares > thr].sort_values(ascending=False)
    budget = cfg.num_part_ids // 2
    hot: dict[str, int] = {}
    for term, share in hot_candidates.items():
        nb = int(min(cfg.max_salt_buckets, max(2, math.ceil(share * cfg.num_part_ids))))
        if budget - nb < 0:
            # this candidate doesn't fit the remaining budget — but a
            # LATER, smaller candidate (still above thr: it MUST be
            # salted, per the floor rationale above) might, so keep
            # scanning instead of forfeiting salting for the tail
            continue
        hot[term] = nb
        budget -= nb

    n_hot_parts = sum(hot.values())
    n_normal = cfg.num_part_ids - n_hot_parts

    # tf-weighted quantile splitters over non-hot terms
    normal = agg.drop(index=list(hot)).sort_index()
    cuts: list[str] = []
    if len(normal) > 1 and n_normal > 1:
        w = normal.to_numpy(dtype=np.float64)
        cw = np.cumsum(w) / w.sum()
        terms_sorted = normal.index.to_numpy(dtype=object)
        for i in range(1, n_normal):
            j = int(np.searchsorted(cw, i / n_normal, side="left"))
            cuts.append(str(terms_sorted[min(j, len(terms_sorted) - 1)]))
    splitters = sorted(set(cuts))

    base = n_normal
    hot_terms: dict[str, tuple[int, int]] = {}
    for term in sorted(hot):  # deterministic layout
        hot_terms[term] = (base, hot[term])
        base += hot[term]
    return PartitionPlan(
        splitters=splitters,
        hot_terms=hot_terms,
        num_parts=cfg.num_part_ids,
        n_normal=n_normal,
        seed=cfg.seed,
    )
