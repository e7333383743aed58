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
