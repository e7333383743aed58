"""Mention detection (NER stage).

Reference semantics (citations into /root/reference/):
- GlobalPointer span decoding: per-class span-pair score cube [C, L, L],
  boundary rows/cols masked to -inf, spans emitted where score > threshold,
  CLOSED intervals (surface = text[start:end+1]) —
  ExtractionEntities/inference.py:48-80 and data_processing/data_process.py:12-15.
- The scorer itself is pluggable (reference uses trained BERT weights we do
  not ship); the default deterministic PatternSpanScorer assigns score +1.0 to
  spans matching the mention grammar and -inf elsewhere, which makes the
  decode path exactly reproducible and oracle-checkable.

Two physical strategies:
1. ``mentions_udf(df)``   — Arrow-batched ``mapInPandas`` (the execution shape
   mandated by the north star: batch in, span records out, no per-row Python).
   One narrow stage: scan -> mapInPandas -> explode. No shuffle.
2. ``mentions_frame(df)`` — pure JVM path via ``regexp_extract_all`` + explode
   (whole-stage codegen; preferred at 100 TB for this grammar because it never
   leaves Tungsten). Unit tests assert both produce identical rows.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (mention_type, regex). No backslashes -> identical under Java regex and RE2,
# and safe inside single-quoted SQL literals in both engines.
MENTION_PATTERNS: list[tuple[str, str]] = [
    ("module", "mod[0-9]+"),
    ("function", "fn[0-9]+"),
    ("class", "(Cls|Base)[0-9]+"),
]

MENTION_SCHEMA = (
    "repo string, path string, lang string, mention_type string, "
    "surface string, start_idx int, end_idx int"
)


# ---------------------------------------------------------------- UDF path

def decode_global_pointer(
    scores: np.ndarray, threshold: float = 0.0
) -> list[tuple[int, int, int]]:
    """GlobalPointer decode over a dense [C, L, L] cube.

    Faithful to inference.py:67-79: mask boundary rows/cols to -inf, keep
    upper triangle (start <= end), emit (class, start, end) where
    score > threshold. Used by tests to prove the sparse fast path below is
    equivalent; production batches never materialize the cube.
    """
    s = scores.copy()
    s[:, [0, -1]] = -np.inf
    s[:, :, [0, -1]] = -np.inf
    out = []
    for c, i, j in zip(*np.where(s > threshold)):
        if i <= j:
            out.append((int(c), int(i), int(j)))
    return out


class PatternSpanScorer:
    """Deterministic span scorer: +1.0 on grammar matches, -inf elsewhere.

    score_spans() is the sparse equivalent of building the [C, L, L] cube and
    running decode_global_pointer; score_cube() materializes the dense cube
    for the equivalence unit test.
    """

    def __init__(self, patterns: list[tuple[str, str]] | None = None):
        self.patterns = [(t, re.compile(p)) for t, p in (patterns or MENTION_PATTERNS)]

    def score_spans(self, text: str) -> list[tuple[str, int, int, str]]:
        spans = []
        for mtype, rx in self.patterns:
            for m in rx.finditer(text):
                # closed interval: end_idx inclusive (data_process.py:14)
                spans.append((mtype, m.start(), m.end() - 1, m.group(0)))
        return spans

    def score_cube(self, text: str, pad: int = 1) -> np.ndarray:
        """Dense [C, L+2*pad, L+2*pad] cube with CLS/SEP-style boundary pads."""
        length = len(text) + 2 * pad
        cube = np.full((len(self.patterns), length, length), -np.inf)
        for ci, (_, rx) in enumerate(self.patterns):
            for m in rx.finditer(text):
                cube[ci, m.start() + pad, m.end() - 1 + pad] = 1.0
        return cube


def mentions_udf(corpus: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched mention extraction: mapInPandas, one narrow stage."""
    patterns = MENTION_PATTERNS

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = PatternSpanScorer(patterns)  # per-task init, broadcast-free
        for pdf in batches:
            rows: dict[str, list] = {
                k: [] for k in ("repo", "path", "lang", "mention_type",
                                "surface", "start_idx", "end_idx")
            }
            for repo, path, lang, content in zip(
                pdf["repo"], pdf["path"], pdf["lang"], pdf["content"]
            ):
                for mtype, s, e, surf in scorer.score_spans(content):
                    rows["repo"].append(repo)
                    rows["path"].append(path)
                    rows["lang"].append(lang)
                    rows["mention_type"].append(mtype)
                    rows["surface"].append(surf)
                    rows["start_idx"].append(s)
                    rows["end_idx"].append(e)
            yield pd.DataFrame(rows)

    return corpus.select("repo", "path", "lang", "content").mapInPandas(
        extract, schema=MENTION_SCHEMA
    )


# ---------------------------------------------------------------- JVM path

def mentions_frame(corpus: DataFrame) -> DataFrame:
    """JVM-side mention extraction (regexp_extract_all + explode).

    Stays inside whole-stage codegen; no offsets (regexp_extract_all yields
    matches only) — offset-level work uses mentions_udf.
    """
    structs = ", ".join(
        f"transform(regexp_extract_all(content, '{rx}', 0), "
        f"x -> struct('{mtype}' AS mention_type, x AS surface))"
        for mtype, rx in MENTION_PATTERNS
    )
    return (
        corpus.select(
            "repo",
            "path",
            "lang",
            F.explode(F.expr(f"flatten(array({structs}))")).alias("m"),
        )
        .select("repo", "path", "lang", "m.mention_type", "m.surface")
    )


def mentions_duck_sql(corpus_rel: str = "corpus") -> str:
    """DuckDB oracle equivalent of mentions (no offsets), for the driver."""
    parts = [
        f"SELECT repo, path, lang, '{mtype}' AS mention_type, "
        f"unnest(regexp_extract_all(content, '{rx}', 0)) AS surface "
        f"FROM {corpus_rel}"
        for mtype, rx in MENTION_PATTERNS
    ]
    return " UNION ALL ".join(parts)
