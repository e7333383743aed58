"""Text analysis + ANN operators vs DuckDB oracles."""

from pyspark.sql import functions as F

from deepkg_spark.operators.linking import dense_topk_frame
from deepkg_spark.operators.similarity import recall_at_k, rp_lsh_topk, rp_lsh_topk_duck_sql
from deepkg_spark.operators.textstats import (
    fingerprints,
    fingerprints_duck_sql,
    lang_id,
    lang_id_duck_sql,
    quality_score,
    quality_score_duck_sql,
    token_counts,
    token_counts_duck_sql,
)
from tests.compare import compare_spark_duck, duck_connect


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


def test_lang_id(spark, sf_dir):
    con = duck_connect(sf_dir)
    compare_spark_duck(lang_id(_docs(spark, sf_dir)), con, lang_id_duck_sql("documents"))


def test_quality_score(spark, sf_dir):
    con = duck_connect(sf_dir)
    df = quality_score(_docs(spark, sf_dir))
    compare_spark_duck(df, con, quality_score_duck_sql("documents"))
    vals = [r["quality"] for r in df.collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_token_counts(spark, sf_dir):
    con = duck_connect(sf_dir)
    compare_spark_duck(
        token_counts(_docs(spark, sf_dir)), con, token_counts_duck_sql("documents")
    )


def test_fingerprints(spark, sf_dir):
    con = duck_connect(sf_dir)
    df = fingerprints(_docs(spark, sf_dir))
    compare_spark_duck(df, con, fingerprints_duck_sql("documents"))
    # shared-content property: identical docs share all fingerprints
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 5)
    dup = docs.union(docs.select(F.col("doc_id") + 1000, "text"))
    fps = fingerprints(dup).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    for i in range(5):
        assert by_doc[i] == by_doc[i + 1000]


def _qc(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    return q, c


def test_rp_lsh_matches_duckdb(spark, sf_dir):
    q, c = _qc(spark, sf_dir)
    dim = len(q.select("qvec").head()[0])
    con = duck_connect(sf_dir)
    con.execute(
        "CREATE VIEW lq AS SELECT vec_id AS qid, embedding AS qvec FROM embeddings "
        "WHERE vec_id % 10 = 0"
    )
    con.execute("CREATE VIEW lc AS SELECT vec_id AS cid, embedding AS cvec FROM embeddings")
    compare_spark_duck(
        rp_lsh_topk(q, c, k=5), con, rp_lsh_topk_duck_sql("lq", "lc", dim=dim, k=5)
    )


def test_rp_lsh_recall_and_self_hit(spark, sf_dir):
    q, c = _qc(spark, sf_dir)
    approx = rp_lsh_topk(q, c, k=5).cache()
    exact = dense_topk_frame(q, c, k=5).cache()
    # a query is always in its own bucket -> self-match always retrieved
    self_hits = approx.filter(F.col("qid") == F.col("cid")).count()
    assert self_hits == q.count()
    r = recall_at_k(approx, exact, k=5)
    assert 0.2 <= r <= 1.0  # approximate, but deterministic given pinned planes


def test_pq_codes(spark, sf_dir):
    """PQ code assignment vs oracle + reconstruction-quality sanity: the
    per-vector MSE equals the numpy-computed distance to the chosen
    sub-centroids, and codes always pick the argmin-L2 centroid."""
    import numpy as np

    from deepkg_spark.operators.similarity import _pq_cents, pq_codes, pq_codes_duck_sql
    from tests.compare import compare_spark_duck, duck_connect

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    con = duck_connect(sf_dir)
    compare_spark_duck(pq_codes(emb, dim=64), con, pq_codes_duck_sql("embeddings", dim=64))

    cents = _pq_cents(64)
    rows = emb.limit(20).collect()
    got = {r["vec_id"]: r for r in pq_codes(emb.limit(20), dim=64).collect()}
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        codes, err = [], 0.0
        for s in range(8):
            sv = v[s * 8 : (s + 1) * 8]
            d2 = ((cents[s] - sv) ** 2).sum(axis=1)
            j = int(np.argmin(d2))
            codes.append(str(j))
            err += float(d2[j])
        g = got[r["vec_id"]]
        assert g["codes"] == ",".join(codes), r["vec_id"]
        assert abs(g["mse"] - round(err / 64.0, 6)) <= 2e-6


def test_ivf_pq_topk(spark, sf_dir):
    """IVF+PQ ADC search vs oracle; every emitted adist equals the numpy
    asymmetric distance (query to the candidate's code reconstruction), and
    compressed recall@5 vs the exact ranking is nonzero but below IVF-flat
    (quantization costs recall — that ordering is the sanity invariant)."""
    import numpy as np

    from deepkg_spark.operators.similarity import (
        _pq_cents,
        ivf_pq_topk,
        ivf_pq_topk_duck_sql,
        ivf_topk,
        recall_at_k,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    con = duck_connect(sf_dir)
    compare_spark_duck(
        ivf_pq_topk(q, c, k=5, dim=64),
        con,
        ivf_pq_topk_duck_sql(
            "(SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 10 = 0)",
            "(SELECT vec_id AS cid, embedding AS cvec FROM embeddings)",
            dim=64,
            k=5,
        ),
    )

    cents = _pq_cents(64)
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    for r in ivf_pq_topk(q, c, k=5, dim=64).limit(40).collect():
        qv, cv = vecs[r["qid"]], vecs[r["cid"]]
        d = 0.0
        for s in range(8):
            sv = cv[s * 8 : (s + 1) * 8]
            j = int(np.argmin(((cents[s] - sv) ** 2).sum(axis=1)))
            d += float(((qv[s * 8 : (s + 1) * 8] - cents[s][j]) ** 2).sum())
        assert abs(r["adist"] - round(d, 6)) <= 2e-6, (r["qid"], r["cid"])

    exact = dense_topk_frame(q, c, k=5)
    r_pq = recall_at_k(ivf_pq_topk(q, c, k=5, dim=64), exact, 5)
    r_ivf = recall_at_k(ivf_topk(q, c, k=5, dim=64), exact, 5)
    assert 0.0 < r_pq <= r_ivf <= 1.0, (r_pq, r_ivf)


def test_ivf_pq_refine_topk(spark, sf_dir):
    """Refined compressed search vs oracle; refined results are a subset of
    the ADC shortlist with EXACT scores (each emitted score equals the true
    inner product), and refine recall@5 >= plain ADC recall@5 (re-ranking
    the shortlist exactly can only help at the same code budget)."""
    from deepkg_spark.operators.similarity import (
        ivf_pq_refine_topk,
        ivf_pq_refine_duck_sql,
        ivf_pq_topk,
        recall_at_k,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    con = duck_connect(sf_dir)
    compare_spark_duck(
        ivf_pq_refine_topk(q, c, k=5, shortlist=25, dim=64),
        con,
        ivf_pq_refine_duck_sql(
            "(SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 10 = 0)",
            "(SELECT vec_id AS cid, embedding AS cvec FROM embeddings)",
            dim=64,
            k=5,
            shortlist=25,
        ),
    )

    refined = ivf_pq_refine_topk(q, c, k=5, shortlist=25, dim=64)
    short = {
        (r["qid"], r["cid"])
        for r in ivf_pq_topk(q, c, k=25, dim=64).select("qid", "cid").collect()
    }
    exact_scores = {
        (r["qid"], r["cid"]): r["score"]
        for r in dense_topk_frame(q, c, k=10**6).collect()
    }
    rows = refined.collect()
    assert rows
    for r in rows:
        assert (r["qid"], r["cid"]) in short
        assert abs(r["score"] - exact_scores[(r["qid"], r["cid"])]) < 1e-9

    exact = dense_topk_frame(q, c, k=5)
    r_ref = recall_at_k(refined, exact, 5)
    r_adc = recall_at_k(ivf_pq_topk(q, c, k=5, dim=64), exact, 5)
    assert 0.0 < r_adc <= r_ref <= 1.0, (r_adc, r_ref)
