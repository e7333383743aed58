"""Dedup suite vs DuckDB oracles + semantic sanity checks."""

from pyspark.sql import functions as F

from deepkg_spark.operators.dedup import (
    dedup_exact,
    dedup_exact_duck_sql,
    embedding_neardup,
    embedding_neardup_duck_sql,
    jaccard_pairs,
    jaccard_pairs_duck_sql,
    minhash_lsh_pairs,
    minhash_lsh_pairs_duck_sql,
    minhash_signatures,
    minhash_signatures_duck_sql,
    simhash,
    simhash_duck_sql,
    simhash_pairs,
    simhash_pairs_duck_sql,
)
from tests.compare import compare_spark_duck, duck_connect

# duplicate-injected corpus: every doc_id < 20 re-appears shifted by 100000,
# and doc_id < 10 re-appears with one token appended (near-dup, not exact)
_DUP_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 20
UNION ALL
SELECT doc_id + 200000 AS doc_id, concat(text, ' zzz') AS text
FROM documents WHERE doc_id < 10
"""


def _docs(spark, sf_dir):
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView("documents")
    return spark.sql(_DUP_SQL)


def _con(sf_dir):
    con = duck_connect(sf_dir)
    con.execute(f"CREATE VIEW dup_docs AS {_DUP_SQL}")
    return con


def test_dedup_exact(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    con = _con(sf_dir)
    compare_spark_duck(dedup_exact(docs), con, dedup_exact_duck_sql("dup_docs"))
    # the 20 injected exact dups are found, keeping the original id
    got = {(r["keep_doc_id"], r["n_docs"]) for r in dedup_exact(docs).collect()}
    assert len(got) == 20 and all(k < 20 and n == 2 for k, n in got)


def test_minhash_signatures(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    con = _con(sf_dir)
    compare_spark_duck(
        minhash_signatures(docs), con, minhash_signatures_duck_sql("dup_docs")
    )


def test_minhash_lsh_pairs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    con = _con(sf_dir)
    df = minhash_lsh_pairs(docs, tau=0.5)
    compare_spark_duck(df, con, minhash_lsh_pairs_duck_sql("dup_docs", tau=0.5))
    pairs = {(r["doc_a"], r["doc_b"]) for r in df.collect()}
    # every exact dup (jaccard 1.0) must be caught by LSH
    assert all((i, i + 100000) in pairs for i in range(20))
    # near-dups (one appended token) should mostly be caught too
    near = sum((i, i + 200000) in pairs for i in range(10))
    assert near >= 8


def test_simhash_and_pairs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    con = _con(sf_dir)
    compare_spark_duck(simhash(docs), con, simhash_duck_sql("dup_docs"))
    df = simhash_pairs(docs, max_hamming=3)
    compare_spark_duck(df, con, simhash_pairs_duck_sql("dup_docs", max_hamming=3))
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in df.collect()}
    assert all(pairs.get((i, i + 100000)) == 0 for i in range(20))


def test_jaccard_pairs(spark, sf_dir):
    docs = _docs(spark, sf_dir).filter(
        (F.col("doc_id") < 60) | (F.col("doc_id") >= 100000)
    )
    docs.createOrReplaceTempView("jac_docs")
    con = _con(sf_dir)
    con.execute(
        "CREATE VIEW jac_docs AS SELECT * FROM dup_docs "
        "WHERE doc_id < 60 OR doc_id >= 100000"
    )
    df = jaccard_pairs(docs, tau=0.5)
    compare_spark_duck(df, con, jaccard_pairs_duck_sql("jac_docs", tau=0.5))
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in df.collect()}
    assert all(exact.get((i, i + 100000)) == 1.0 for i in range(20))


def test_embedding_neardup(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    con = duck_connect(sf_dir)
    df = embedding_neardup(emb, tau=0.8)
    compare_spark_duck(df, con, embedding_neardup_duck_sql("embeddings", tau=0.8))


def test_substring_spans_semantics(spark):
    """Hand-built corpus with known duplicated runs: the merged spans are
    exactly the planted shared substrings (token indices, end exclusive)."""
    from deepkg_spark.operators.dedup import substring_spans, substring_spans_duck_sql

    rows = [
        (1, "a b c d e f g h i j k l m"),          # shares a..j with doc 2
        (2, "x a b c d e f g h i j z q w"),
        (3, "p q r s t u v w"),                     # whole doc inside doc 4
        (4, "p q r s t u v w extra tail here now"),
        (5, "short doc"),                           # < 8 tokens: no windows
        (6, "m m m m m m m m m m m m m m m m"),     # within-doc repetition
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in substring_spans(docs).collect()
    }
    assert got == {
        (1, 0, 10, 10),   # 'a b c d e f g h i j'
        (2, 1, 11, 10),
        (3, 0, 8, 8),     # 'p q r s t u v w'
        (4, 0, 8, 8),
        (6, 0, 16, 16),   # self-repeated doc entirely flagged
    }
    # oracle agreement on the same tiny frame
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") t(doc_id, text)"
    )
    oracle = {
        tuple(r) for r in con.execute(substring_spans_duck_sql("d")).fetchall()
    }
    assert got == oracle


def test_substring_spans_and_stats_oracle(spark, sf_dir):
    """Full sf-fixture oracle comparison for both contract queries."""
    from deepkg_spark.operators.dedup import (
        substring_spans,
        substring_spans_duck_sql,
        substring_stats,
        substring_stats_duck_sql,
    )

    docs = _docs(spark, sf_dir)
    con = _con(sf_dir)
    compare_spark_duck(substring_spans(docs), con, substring_spans_duck_sql("dup_docs"))
    compare_spark_duck(substring_stats(docs), con, substring_stats_duck_sql("dup_docs"))
    # the 20 planted full copies must be flagged end-to-end (dup_frac == 1.0
    # for any copied doc long enough to have windows)
    stats = {r["doc_id"]: r for r in substring_stats(docs).collect()}
    for base in range(20):
        twin = stats.get(100000 + base)
        if twin is not None and twin["n_tokens"] >= 8:
            assert twin["dup_frac"] == 1.0


def test_substring_clean(spark, sf_dir):
    """Clean transform vs oracle + policy semantics: a doc fully inside
    another loses everything; unique docs pass through verbatim."""
    from deepkg_spark.operators.dedup import substring_clean, substring_clean_duck_sql

    rows = [
        (1, "a b c d e f g h i j k l m"),
        (2, "x a b c d e f g h i j z q w"),
        (3, "p q r s t u v w"),
        (4, "p q r s t u v w extra tail here now"),
        (5, "short doc"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in substring_clean(docs).collect()}
    assert got[1]["clean_text"] == "k l m"
    assert got[2]["clean_text"] == "x z q w"
    assert got[3]["clean_text"] == "" and got[3]["kept_tokens"] == 0
    assert got[4]["clean_text"] == "extra tail here now"
    assert got[5]["clean_text"] == "short doc" and got[5]["kept_tokens"] == 2
    # fixture-scale oracle comparison
    dup = _docs(spark, sf_dir)
    con = _con(sf_dir)
    compare_spark_duck(substring_clean(dup), con, substring_clean_duck_sql("dup_docs"))
