"""Mention detection: UDF path == JVM path == DuckDB oracle; dense decode
equivalence with the sparse fast path."""

from collections import Counter

from deepkg_spark.operators.mentions import (
    PatternSpanScorer,
    decode_global_pointer,
    mentions_duck_sql,
    mentions_frame,
    mentions_udf,
)
from deepkg_spark.sources.corpus import corpus_sql, load_corpus
from tests.compare import compare_spark_duck, duck_connect


def test_dense_sparse_decode_equivalence():
    scorer = PatternSpanScorer()
    text = 'import mod7\ndef fn12(x):\n    return mod7.call(x)\nclass Cls12(Base52):\n    pass\n'
    sparse = {(t, s, e) for t, s, e, _ in scorer.score_spans(text)}
    cube = scorer.score_cube(text, pad=1)
    names = [t for t, _ in scorer.patterns]
    dense = {(names[c], i - 1, j - 1) for c, i, j in decode_global_pointer(cube)}
    # module: mod7 (import) + mod7 (return) = 2; function: fn12; class: Cls12, Base52
    assert sparse == dense and len(sparse) == 5


def test_closed_interval_surface():
    scorer = PatternSpanScorer()
    text = "import mod42\n"
    [(mtype, s, e, surf)] = scorer.score_spans(text)
    assert mtype == "module" and text[s : e + 1] == surf == "mod42"


def test_udf_equals_frame(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    cols = ["repo", "path", "lang", "mention_type", "surface"]
    u = Counter(tuple(r) for r in mentions_udf(corpus).select(*cols).collect())
    f = Counter(tuple(r) for r in mentions_frame(corpus).select(*cols).collect())
    assert u == f and sum(u.values()) > 0


def test_frame_matches_duckdb(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    con = duck_connect(sf_dir)
    con.execute(f"CREATE VIEW corpus AS {corpus_sql()}")
    compare_spark_duck(mentions_frame(corpus), con, mentions_duck_sql())
