"""Phrase-mining statistics vs DuckDB oracle."""

from deepkg_spark.operators.phrases import (
    idf,
    idf_duck_sql,
    neighbor_entropy,
    neighbor_entropy_duck_sql,
    ngram_stats,
    ngram_stats_duck_sql,
    phrase_candidates,
    phrase_candidates_duck_sql,
    pmi,
    pmi_duck_sql,
)
from tests.compare import compare_spark_duck, duck_connect


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


def test_ngram_stats(spark, sf_dir):
    con = duck_connect(sf_dir)
    compare_spark_duck(
        ngram_stats(_docs(spark, sf_dir), 3), con, ngram_stats_duck_sql("documents", 3)
    )


def test_pmi(spark, sf_dir):
    con = duck_connect(sf_dir)
    compare_spark_duck(pmi(_docs(spark, sf_dir), 3), con, pmi_duck_sql("documents", 3))


def test_idf(spark, sf_dir):
    con = duck_connect(sf_dir)
    compare_spark_duck(idf(_docs(spark, sf_dir), 2), con, idf_duck_sql("documents", 2))


def test_entropy(spark, sf_dir):
    con = duck_connect(sf_dir)
    compare_spark_duck(
        neighbor_entropy(_docs(spark, sf_dir), 2),
        con,
        neighbor_entropy_duck_sql("documents", 2),
    )


def test_candidates(spark, sf_dir):
    con = duck_connect(sf_dir)
    compare_spark_duck(
        phrase_candidates(_docs(spark, sf_dir)),
        con,
        phrase_candidates_duck_sql("documents"),
    )
