"""AutoPhrase-style quality-classifier loop: determinism + promotion."""

from deepkg_spark.operators.phrases import phrase_candidates, phrase_quality_scores


def _quality_set(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    top = phrase_candidates(docs, min_freq=5, min_len=2, max_n=2, topk=10)
    return docs, {r["ngram"] for r in top.collect()}


def test_quality_loop_deterministic(spark, sf_dir):
    docs, quality = _quality_set(spark, sf_dir)
    a = phrase_quality_scores(docs, quality)
    b = phrase_quality_scores(docs, quality)
    assert a.equals(b) and len(a) > 0


def test_quality_loop_promotes_and_ranks(spark, sf_dir):
    docs, quality = _quality_set(spark, sf_dir)
    out = phrase_quality_scores(docs, quality, threshold=0.6)
    # seeded quality phrases stay in the pool
    seeded = out[out["round_promoted"] == 0]
    assert set(seeded["ngram"]) == quality
    # ranking is by prob desc then ngram asc
    probs = list(out["prob"])
    assert probs == sorted(probs, reverse=True) or len(set(probs)) < len(probs)
    # classifier separates: mean prob of quality pool > mean of never-promoted
    inq = out[out["is_quality"]]["prob"].mean()
    outq = out[~out["is_quality"]]["prob"].mean()
    assert inq > outq


def test_boosted_stumps_deterministic_and_separates():
    """The GBDT stand-in: deterministic across fits, and it actually learns
    an axis-aligned separation a single linear pass can't."""
    import numpy as np

    from deepkg_spark.operators.phrases import _fit_boosted_stumps

    rng = np.random.RandomState(0)
    X = rng.standard_normal((400, 2))
    # interval target: positive iff |x0| > 0.8 — additive in stumps (two
    # splits on one feature) but NOT linearly separable
    y = (np.abs(X[:, 0]) > 0.8).astype(np.float64)
    m1 = _fit_boosted_stumps(X, y, n_estimators=50)(X)
    m2 = _fit_boosted_stumps(X, y, n_estimators=50)(X)
    assert np.array_equal(m1, m2)
    acc = ((m1 > 0) == (y > 0.5)).mean()
    assert acc > 0.95  # stumps compose into the non-linear boundary
    # a single linear fit cannot: best linear accuracy on this target ~0.6
    w = np.linalg.lstsq(
        np.hstack([X, np.ones((len(X), 1))]), 2 * y - 1, rcond=None
    )[0]
    lin_acc = (((np.hstack([X, np.ones((len(X), 1))]) @ w) > 0) == (y > 0.5)).mean()
    assert acc > lin_acc + 0.2


def test_quality_loop_stumps_vs_logistic(spark, sf_dir):
    """The default scorer is now boosted stumps; its ranking differs from
    the logistic stand-in (different inductive bias) while both stay
    deterministic."""
    from deepkg_spark.operators.phrases import (
        ngram_stats,
        phrase_candidates,
        phrase_quality_scores,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    stats = ngram_stats(docs, 3).cache()
    quality = {
        r["ngram"]
        for r in phrase_candidates(
            docs, min_freq=5, min_len=2, max_n=2, topk=10, stats=stats
        ).collect()
    }
    stumps = phrase_quality_scores(docs, quality, stats=stats, classifier="stumps")
    logistic = phrase_quality_scores(docs, quality, stats=stats, classifier="logistic")
    stats.unpersist()
    assert not stumps["prob"].equals(logistic["prob"])
    # determinism of the default path is covered by test_quality_loop_deterministic
    assert (stumps["prob"] <= 1.0).all() and (stumps["prob"] >= 0.0).all()


def test_quality_loop_stumps_q_exact_oracle(spark, sf_dir):
    """Round 5: the registered ph_quality_loop (classifier="stumps_q") must
    match its DuckDB oracle EXACTLY — training loop included. This is the
    local replica of the driver's hash check for the last formerly
    rows-only query: rational-sigmoid link + 2^-24-grid quantized sums make
    every margin bit-identical across numpy and DuckDB (see
    _fit_boosted_stumps_q), and the recursive-CTE oracle unrolls all five
    promotion rounds."""
    import importlib

    from tests.compare import compare_spark_duck, duck_connect

    entrymod = importlib.import_module("__spark_entry__")
    df = entrymod.queries()["ph_quality_loop"](spark, sf_dir)
    compare_spark_duck(df, duck_connect(sf_dir), entrymod.oracle_sql()["ph_quality_loop"])


def test_stumps_q_exercises_promotion(spark, sf_dir):
    """threshold=0.6 in the registered query is below the top negative-pool
    scores, so the promotion recursion genuinely executes (at least one
    non-seed candidate gets promoted in some round) — without this the
    multi-round unrolled oracle would only ever certify its fixpoint
    branch."""
    from deepkg_spark.operators.phrases import phrase_candidates, phrase_quality_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    quality = {
        r["ngram"]
        for r in phrase_candidates(docs, min_freq=5, min_len=2, max_n=2, topk=10).collect()
    }
    out = phrase_quality_scores(docs, quality, classifier="stumps_q", threshold=0.6)
    assert (out["round_promoted"] > 0).any()
    assert set(out[out["round_promoted"] == 0]["ngram"]) == quality
