"""Format round-trips: parquet / JSONL / TSV corpus, Iceberg seam."""

import tempfile

from deepkg_spark.sources.corpus import load_corpus
from deepkg_spark.sources.io import (
    iceberg_available,
    read_corpus_csv,
    read_corpus_jsonl,
    read_corpus_parquet,
    write_corpus,
    write_table,
)


def _canon(df):
    return {tuple(r) for r in df.collect()}


def test_jsonl_roundtrip(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    with tempfile.TemporaryDirectory() as tmp:
        write_corpus(corpus, f"{tmp}/c", fmt="jsonl")
        back = read_corpus_jsonl(spark, f"{tmp}/c")
        assert _canon(back) == _canon(corpus)


def test_csv_roundtrip(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    with tempfile.TemporaryDirectory() as tmp:
        write_corpus(corpus, f"{tmp}/c", fmt="csv")
        back = read_corpus_csv(spark, f"{tmp}/c")
        assert _canon(back) == _canon(corpus)


def test_parquet_roundtrip(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    with tempfile.TemporaryDirectory() as tmp:
        write_corpus(corpus, f"{tmp}/c", fmt="parquet")
        back = read_corpus_parquet(spark, f"{tmp}/c")
        assert _canon(back) == _canon(corpus)


def test_iceberg_seam_falls_back(spark, sf_dir):
    """No Iceberg jars in this image: the seam must detect that and fall
    back to parquet rather than fail."""
    corpus = load_corpus(spark, sf_dir).limit(10)
    assert iceberg_available(spark) is False
    where = write_table(corpus, "kg.corpus_sample", spark)
    assert where.startswith("parquet:")
    assert spark.read.parquet(where.split(":", 1)[1]).count() == 10
