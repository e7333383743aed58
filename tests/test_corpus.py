"""Corpus source: engine portability + sha256 invariant."""

from pyspark.sql import functions as F

from deepkg_spark.sources.corpus import corpus_sql, load_corpus, scaled_corpus
from tests.compare import compare_spark_duck, duck_connect


def test_corpus_matches_duckdb(spark, sf_dir):
    df = load_corpus(spark, sf_dir)
    con = duck_connect(sf_dir)
    compare_spark_duck(df, con, corpus_sql())


def test_sha256_invariant(spark, sf_dir):
    """content is never mutated: sha gathered at scan == sha after pipeline."""
    df = load_corpus(spark, sf_dir).withColumn("sha", F.sha2("content", 256))
    before = {r["path"]: r["sha"] for r in df.select("path", "sha").collect()}
    # run content through a projection-heavy plan and re-hash
    after = {
        r["path"]: r["sha"]
        for r in df.select("path", F.sha2("content", 256).alias("sha")).collect()
    }
    assert before == after and len(before) > 0


def test_scaled_corpus_deterministic(spark):
    a = {tuple(r) for r in scaled_corpus(spark, 50, partitions=2).collect()}
    b = {tuple(r) for r in scaled_corpus(spark, 50, partitions=7).collect()}
    assert a == b and len(a) == 50
