"""Entity linking: exact broadcast join, BM25-as-join, dense cosine top-K."""

from pyspark.sql import functions as F

from deepkg_spark.operators.linking import (
    bm25_duck_sql,
    bm25_topn,
    dense_topk_duck_sql,
    dense_topk_frame,
    dense_topk_udf,
    link_exact,
)
from tests.compare import compare_spark_duck, duck_connect


def _queries_df(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").alias("qid"), F.col("text").alias("qtext"))
        .filter(F.col("qid") < 30)
    )


def _dict_df(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("term_id"), F.col("p_name").alias("name")
    )


def test_link_exact_broadcast(spark, sf_dir):
    mentions = spark.createDataFrame(
        [("Widget A",), ("widget a",), ("nope",)], ["surface"]
    )
    alias = spark.createDataFrame([(1, "widget a"), (2, "other")], ["term_id", "name"])
    rows = {(r["surface"], r["term_id"]) for r in link_exact(mentions, alias).collect()}
    assert rows == {("Widget A", 1), ("widget a", 1), ("nope", None)}
    plan = link_exact(mentions, alias)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bm25_matches_duckdb(spark, sf_dir):
    q, d = _queries_df(spark, sf_dir), _dict_df(spark, sf_dir)
    q.createOrReplaceTempView("bm25_queries")
    d.createOrReplaceTempView("bm25_dict")
    con = duck_connect(sf_dir)
    con.execute(
        "CREATE VIEW bm25_queries AS SELECT doc_id AS qid, text AS qtext "
        "FROM documents WHERE doc_id < 30"
    )
    con.execute(
        "CREATE VIEW bm25_dict AS SELECT p_partkey AS term_id, p_name AS name FROM part"
    )
    compare_spark_duck(
        bm25_topn(q, d, topn=5), con, bm25_duck_sql("bm25_queries", "bm25_dict", topn=5)
    )


def test_dense_topk_frame_matches_duckdb(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    con = duck_connect(sf_dir)
    con.execute(
        "CREATE VIEW dq AS SELECT vec_id AS qid, embedding AS qvec FROM embeddings "
        "WHERE vec_id % 20 = 0"
    )
    con.execute("CREATE VIEW dc AS SELECT vec_id AS cid, embedding AS cvec FROM embeddings")
    compare_spark_duck(dense_topk_frame(q, c, k=5), con, dense_topk_duck_sql("dq", "dc", k=5))


def test_dense_udf_equals_frame(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    a = {tuple(r) for r in dense_topk_frame(q, c, k=5).collect()}
    b = {tuple(r) for r in dense_topk_udf(q, c, k=5).collect()}
    assert a == b and len(a) > 0


def test_bm25_class_compression_equals_naive_on_adversarial_inputs(spark):
    """The score-equivalence class compression inside bm25_topn must be
    bit-identical to naive doc-at-a-time scoring — including rank tie-breaks
    by term_id ACROSS classes (equal rounded scores from different
    signatures). Tiny vocab + duplicated names force heavy class collisions
    and cross-class ties; the reference is the DuckDB oracle SQL evaluated
    over the same rows."""
    import duckdb

    from deepkg_spark.operators.linking import bm25_duck_sql, bm25_topn
    from tests.compare import canon_rows

    # vocab of 3 symbols, many duplicate multisets, names of length 1-3
    vocab = ["aa", "bb", "cc"]
    names = []
    k = 0
    for x in vocab:
        for y in vocab:
            for z in vocab + [""]:
                names.append((k, f"{x} {y} {z}".strip()))
                k += 1
    # duplicate every dictionary entry once more under new ids (pure ties)
    names += [(k + i, n) for i, (_, n) in enumerate(names)]
    queries = [
        (0, "aa"), (1, "aa bb"), (2, "cc cc aa"), (3, "bb bb"),
        (4, "aa bb cc"), (5, "zz"), (6, "cc"),
    ]

    qdf = spark.createDataFrame(queries, "qid long, qtext string")
    ddf = spark.createDataFrame(names, "term_id long, name string")
    got = bm25_topn(qdf, ddf, topn=4)
    s = [tuple(r) for r in got.collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE q(qid BIGINT, qtext VARCHAR)")
    con.executemany("INSERT INTO q VALUES (?, ?)", queries)
    con.execute("CREATE TABLE d(term_id BIGINT, name VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", names)
    rel = con.sql(bm25_duck_sql("q", "d", topn=4))
    dd = rel.fetchall()

    assert len(s) == len(dd)
    assert canon_rows([c.lower() for c in got.columns], s) == canon_rows(
        [c.lower() for c in rel.columns], dd
    )


def test_bm25_shuffle_fallback_matches_broadcast_path(spark, monkeypatch):
    """With BROADCAST_DICT_MAX forced to 0 the dictionary-derived sides must
    take the shuffle-join path (no broadcast hint) and produce identical
    results — guards the large-dictionary fallback the docstring promises."""
    import deepkg_spark.operators.linking as lk

    qdf = spark.createDataFrame(
        [(0, "aa bb"), (1, "bb cc"), (2, "aa")], "qid long, qtext string"
    )
    ddf = spark.createDataFrame(
        [(1, "aa bb"), (2, "bb"), (3, "cc aa"), (4, "bb cc")],
        "term_id long, name string",
    )
    expected = sorted(tuple(r) for r in lk.bm25_topn(qdf, ddf, topn=3).collect())
    monkeypatch.setattr(lk, "BROADCAST_DICT_MAX", 0)
    got_df = lk.bm25_topn(qdf, ddf, topn=3)
    got = sorted(tuple(r) for r in got_df.collect())
    assert got == expected


def test_rescore_repeat_boost(spark, sf_dir):
    """ES repeat-boost (ES_Model.py:94-99): with duplicate dictionary names
    the boosted rescore doubles the normalized score of repeated candidates
    and matches the DuckDB oracle; repeat_score=1 stays bit-identical to the
    plain length-norm rescore."""
    from pyspark.sql import functions as F

    from deepkg_spark.operators.linking import (
        bm25_duck_sql,
        bm25_topn,
        rescore_length_norm,
        rescore_length_norm_duck_sql,
    )
    from tests.compare import compare_spark_duck, duck_connect

    q = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").alias("qid"), F.col("text").alias("qtext"))
        .filter(F.col("qid") < 30)
    )
    spark.read.parquet(f"{sf_dir}/part.parquet").createOrReplaceTempView("part")
    dup_sql = (
        "SELECT p_partkey AS term_id, p_name AS name FROM part "
        "UNION ALL SELECT p_partkey + 100000, p_name FROM part WHERE p_partkey <= 100"
    )
    d = spark.sql(dup_sql)
    ranked = bm25_topn(q, d, topn=5)
    boosted = rescore_length_norm(ranked, q, d, topn=5, repeat_score=2.0)
    con = duck_connect(sf_dir)
    q_rel = "(SELECT doc_id AS qid, text AS qtext FROM documents WHERE doc_id < 30)"
    compare_spark_duck(
        boosted,
        con,
        rescore_length_norm_duck_sql(
            bm25_duck_sql(q_rel, f"({dup_sql})", topn=5),
            q_rel, f"({dup_sql})", topn=5, repeat_score=2.0,
        ),
    )
    plain = rescore_length_norm(ranked, q, d, topn=5, repeat_score=1.0)
    b = {(r["qid"], r["term_id"]): r["norm_score"] for r in boosted.collect()}
    p = {(r["qid"], r["term_id"]): r["norm_score"] for r in plain.collect()}
    fired = [k for k in b.keys() & p.keys() if b[k] != p[k]]
    assert fired, "boost never fired — planted duplicates missing from candidates"
    doubled = [k for k in b.keys() & p.keys()
               if abs(b[k] - 2 * p[k]) < 2e-6]
    assert doubled, "boosted scores are not doubled normalized scores"


def test_bm25_cache_scoped_to_most_recent_call(spark, sf_dir):
    """Repeated bm25_topn calls in one session hold at most one cached
    postings/doclen pair (earlier pairs are unpersisted on the next call),
    and release_bm25_caches() drops the last pair too."""
    from pyspark.sql import functions as F

    from deepkg_spark.operators.linking import (
        _BM25_CACHES,
        bm25_topn,
        release_bm25_caches,
    )

    q = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("qid"), F.col("text").alias("qtext")
    ).limit(20)
    d = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("term_id"), F.col("p_name").alias("name")
    )

    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    release_bm25_caches()
    base = n_persistent()
    first = bm25_topn(q, d, topn=3)
    assert first.count() > 0
    after_one = n_persistent()
    # postings, doclen, classes (the score-equivalence class table joined
    # back after the qid aggregation)
    assert len(_BM25_CACHES) == 3
    for _ in range(3):
        assert bm25_topn(q, d, topn=3).count() > 0
    # the persisted-RDD count must not grow with call count
    assert n_persistent() <= after_one
    assert len(_BM25_CACHES) == 3
    release_bm25_caches()
    assert len(_BM25_CACHES) == 0
    assert n_persistent() <= base + (after_one - base)  # nothing new leaked
