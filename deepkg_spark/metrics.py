"""Multiset P/R/F1 scorer — the correctness oracle of the engine.

Re-implements (from scratch) the matching semantics of the reference's
UIE_torch/uie/evaluation/scorer.py:
- Metric.count_instance (scorer.py:79-111): per-document MULTISET match — each
  predicted tuple consumes at most one remaining gold tuple (one-gold-one-match
  removal, scorer.py:101-107).
- safe_div / compute_f1 (scorer.py:44-63): 0-denominator guards.
- string-level tuple (pred, subj_type, subj, obj_type, obj) and offset-level
  tuple with (subj_start, obj_start) — scorer.py:292-313.

Two implementations, cross-checked by tests:
1. ``PRF1`` / ``score_python`` — driver-side reference implementation.
2. ``score_frames``          — distributed: groupBy tuple-counts on both
   sides, full outer join, tp = sum(least(gold_n, pred_n)). Multiset-min is
   exactly the one-gold-one-match semantics, but expressed as one shuffle per
   side + one join — scales to arbitrarily many documents.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Hashable, Iterable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def safe_div(a: float, b: float) -> float:
    return a / b if b != 0.0 else 0.0


@dataclass
class PRF1:
    tp: float = 0.0
    gold_num: float = 0.0
    pred_num: float = 0.0

    def count_instance(
        self,
        gold_list: Iterable[Hashable],
        pred_list: Iterable[Hashable],
        mode: str = "normal",
    ) -> None:
        """Per-document matching in the reference's three modes
        (scorer.py:79-111):
        - 'normal'     multiset match: each pred consumes one remaining gold
                       copy (one-gold-one-match removal);
        - 'set'        both sides deduplicated before exact-set matching;
        - 'multimatch' every pred that occurs in gold counts, gold copies are
                       NOT consumed (gold_num still counts the full list).
        """
        gold_list = list(gold_list)
        pred_list = list(pred_list)
        if mode == "set":
            gold_list = list(dict.fromkeys(gold_list))
            pred_list = list(dict.fromkeys(pred_list))
        self.gold_num += len(gold_list)
        self.pred_num += len(pred_list)
        if mode == "multimatch":
            gold_set = set(gold_list)
            self.tp += sum(1 for p in pred_list if p in gold_set)
            return
        remaining = list(gold_list)
        for p in pred_list:
            if p in remaining:
                self.tp += 1
                remaining.remove(p)

    @property
    def precision(self) -> float:
        return safe_div(self.tp, self.pred_num)

    @property
    def recall(self) -> float:
        return safe_div(self.tp, self.gold_num)

    @property
    def f1(self) -> float:
        return safe_div(2 * self.precision * self.recall, self.precision + self.recall)

    def as_dict(self, prefix: str = "") -> dict[str, float]:
        return {
            f"{prefix}P": self.precision,
            f"{prefix}R": self.recall,
            f"{prefix}F1": self.f1,
            f"{prefix}tp": self.tp,
            f"{prefix}gold": self.gold_num,
            f"{prefix}pred": self.pred_num,
        }


def score_python(
    gold: Iterable[tuple],
    pred: Iterable[tuple],
    doc_key_len: int = 0,
    mode: str = "normal",
    variant: str = "strict",
) -> PRF1:
    """Reference-style scoring. When doc_key_len > 0, the first doc_key_len
    tuple fields group records per document and matching happens within each
    document (scorer semantics: per-sentence count_instance).

    `variant` (scorer.py:380-435): 'strict' matches full typed tuples;
    'boundary' drops the type fields before matching — for the engine's
    triple tuples (subj, subj_type, pred, obj, obj_type[, offsets...]) the
    type fields are positions 1 and 4 within the record."""

    def project(t: tuple) -> tuple:
        if variant == "strict":
            return t
        return tuple(v for i, v in enumerate(t) if i not in (1, 4))

    m = PRF1()
    if doc_key_len == 0:
        m.count_instance([project(t) for t in gold], [project(t) for t in pred], mode)
        return m
    gdocs: dict[tuple, list] = {}
    pdocs: dict[tuple, list] = {}
    for t in gold:
        gdocs.setdefault(t[:doc_key_len], []).append(project(t[doc_key_len:]))
    for t in pred:
        pdocs.setdefault(t[:doc_key_len], []).append(project(t[doc_key_len:]))
    for k in set(gdocs) | set(pdocs):
        m.count_instance(gdocs.get(k, []), pdocs.get(k, []), mode)
    return m


def multiset_counts(gold: Iterable[tuple], pred: Iterable[tuple]) -> PRF1:
    """Counter-based equivalent (min of multiplicities) — identical result to
    count_instance because multiset intersection == one-gold-one-match."""
    g, p = Counter(gold), Counter(pred)
    m = PRF1(
        tp=float(sum(min(c, p[k]) for k, c in g.items())),
        gold_num=float(sum(g.values())),
        pred_num=float(sum(p.values())),
    )
    return m


def score_frames(gold: DataFrame, pred: DataFrame, keys: list[str]) -> dict[str, float]:
    """Distributed multiset P/R/F1 over tuple columns `keys`.

    Plan: two partial+final hash aggs (map-side combine free) + one join on
    the tuple key + single-row final agg. The join key is the full tuple, so
    skew is bounded by duplicate-tuple multiplicity, not document count.
    """
    g = gold.groupBy(*keys).agg(F.count(F.lit(1)).alias("gold_n"))
    p = pred.groupBy(*keys).agg(F.count(F.lit(1)).alias("pred_n"))
    j = g.join(p, on=keys, how="full_outer").select(
        F.coalesce("gold_n", F.lit(0)).alias("gold_n"),
        F.coalesce("pred_n", F.lit(0)).alias("pred_n"),
    )
    row = j.agg(
        F.sum(F.least("gold_n", "pred_n")).alias("tp"),
        F.sum("gold_n").alias("gold_num"),
        F.sum("pred_n").alias("pred_num"),
    ).collect()[0]
    m = PRF1(
        tp=float(row["tp"] or 0),
        gold_num=float(row["gold_num"] or 0),
        pred_num=float(row["pred_num"] or 0),
    )
    return m.as_dict()
