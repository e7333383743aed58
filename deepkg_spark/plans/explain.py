"""Physical-plan audit: dump .explain("formatted") for the key operators and
assert the plan properties the engine is designed around.

Run `python -m deepkg_spark.plans.explain` to regenerate PLANS.md — the
checked-in evidence that:
- scans push filters/projections down (PushedFilters / ReadSchema),
- dictionary-sized join sides broadcast (BroadcastHashJoin),
- narrow pipelines stay inside WholeStageCodegen with zero exchanges,
- aggregations are partial+final (two HashAggregate levels).
"""

from __future__ import annotations

import io
import sys


def _via_capture(df, mode: str) -> str:
    buf = io.StringIO()
    stdout = sys.stdout
    sys.stdout = buf
    try:
        df.explain(mode)
    finally:
        sys.stdout = stdout
    return buf.getvalue()


def checks(plan: str, required: list[str], forbidden: list[str] = ()) -> list[str]:
    problems = []
    for r in required:
        if r not in plan:
            problems.append(f"MISSING {r}")
    for f in forbidden:
        if f in plan:
            problems.append(f"UNEXPECTED {f}")
    return problems


def main() -> None:
    from pyspark.sql import functions as F

    from deepkg_spark.operators.canonicalize import canonical_entities
    from deepkg_spark.operators.dedup import minhash_signatures
    from deepkg_spark.operators.linking import bm25_topn, link_exact
    from deepkg_spark.operators.mentions import mentions_frame
    from deepkg_spark.operators.relations import triples_frame
    from deepkg_spark.session import get_spark
    from deepkg_spark.sources.corpus import load_corpus

    spark = get_spark(app_name="plan-audit", master="local[4]", shuffle_partitions=4)
    sf = "/root/testdata/sf0.001"
    corpus = load_corpus(spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    part = spark.read.parquet(f"{sf}/part.parquet").select(
        F.col("p_partkey").alias("term_id"), F.col("p_name").alias("name")
    )

    sections = []

    def audit(title: str, df, required: list[str], forbidden: list[str] = ()):
        p = _via_capture(df, "formatted")
        probs = checks(p, required, forbidden)
        status = "OK" if not probs else "; ".join(probs)
        sections.append(f"## {title}\n\nAudit: {status}\n\n```\n{p}\n```\n")

    # pushdown: only 3 of 5 documents columns are read for the corpus
    audit(
        "corpus scan (column pruning)",
        corpus,
        required=["ReadSchema: struct<doc_id:bigint"],
        forbidden=["Exchange", "source", "n_chars"],
    )
    # triples: narrow, zero exchanges, whole-stage codegen ("[codegen id"
    # spans in formatted mode)
    audit(
        "triples_frame (narrow, codegen)",
        triples_frame(corpus),
        required=["[codegen id"],
        forbidden=["Exchange"],
    )
    audit(
        "mentions_frame (narrow, codegen)",
        mentions_frame(corpus),
        required=["[codegen id"],
        forbidden=["Exchange"],
    )
    # exact linking: dictionary side broadcast
    mentions = mentions_frame(corpus)
    alias = part.select(F.col("term_id"), F.col("name"))
    audit(
        "link_exact (broadcast dictionary)",
        link_exact(mentions, alias),
        required=["BroadcastHashJoin"],
        forbidden=["SortMergeJoin"],
    )
    # canonicalize: partial+final hash aggregate
    audit(
        "canonical_entities (partial+final agg)",
        canonical_entities(mentions, n_salts=4),
        required=["HashAggregate"],
    )
    # minhash signatures: single shuffle, algebraic mins
    audit(
        "minhash_signatures (one exchange)",
        minhash_signatures(docs),
        required=["HashAggregate", "Exchange"],
    )
    # bm25: broadcast stat sides; the scored pairs cross exactly ONE
    # hash-partitioning exchange (qid) that serves both the aggregation and
    # the ranking window — the single-shuffle property the operator is
    # built around
    q = docs.select(F.col("doc_id").alias("qid"), F.col("text").alias("qtext"))
    import re

    bm25_plan = _via_capture(bm25_topn(q, part, topn=5), "formatted")
    # single-column qid exchanges (the scored-pairs shuffle); the (qid, term)
    # exchange earlier belongs to the tiny query-token tf aggregation
    n_qid_exchanges = len(re.findall(r"hashpartitioning\(qid#\d+L?, \d+\)", bm25_plan))
    probs = checks(bm25_plan, ["BroadcastHashJoin", "Window"])
    if n_qid_exchanges != 1:
        probs.append(f"EXPECTED 1 single-col qid exchange, saw {n_qid_exchanges}")
    sections.append(
        "## bm25_topn (broadcast stats, one qid shuffle, windowed top-N)\n\n"
        f"Audit: {'OK' if not probs else '; '.join(probs)}\n\n```\n{bm25_plan}\n```\n"
    )

    # dedup fingerprints: window min runs on ONE exchange by doc_id
    from deepkg_spark.operators.textstats import fingerprints

    audit(
        "fingerprints (winnowing window, single partitioning)",
        fingerprints(docs),
        required=["Window"],
        forbidden=["SortMergeJoin"],
    )

    # event extraction: one narrow Arrow stage over the corpus, no shuffle
    from deepkg_spark.operators.sel import sel_roundtrip_events

    audit(
        "sel_roundtrip_events (narrow Arrow stage, no shuffle)",
        sel_roundtrip_events(corpus),
        required=["MapInPandas"],
        forbidden=["Exchange"],
    )

    # wordpiece roundtrip: explode + scalar exprs, zero exchanges, codegen
    from deepkg_spark.operators.textstats import wordpieces

    audit(
        "wordpieces (narrow, codegen, no shuffle)",
        wordpieces(docs),
        required=["[codegen id"],
        forbidden=["Exchange"],
    )

    # embedding near-dup: candidates come from the LSH-bucket equi-join —
    # no all-pairs CartesianProduct / BroadcastNestedLoopJoin anywhere
    from deepkg_spark.operators.dedup import embedding_neardup_lsh, plant_neardups

    emb_full = spark.read.parquet(f"{sf}/embeddings.parquet")
    audit(
        "dedup_embedding (LSH bucket equi-join, no cross product)",
        embedding_neardup_lsh(plant_neardups(emb_full), tau=0.8),
        required=["Join"],
        forbidden=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )

    # IVF ANN: cell assignment is a narrow argmax expression, search is an
    # equi-join on cell id — never an all-pairs product
    from deepkg_spark.operators.similarity import ivf_topk

    emb_ivf = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv_ivf = emb_ivf.limit(8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    cv_ivf = emb_ivf.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    audit(
        "ivf_topk (cell equi-join, no cross product)",
        ivf_topk(qv_ivf, cv_ivf, k=3, dim=64),
        required=["Join", "Window"],
        forbidden=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )

    # dense top-K JVM path: candidate side broadcast, no sort-merge
    from deepkg_spark.operators.linking import dense_topk_frame

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    qv = emb.limit(8).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    cv = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    audit(
        "dense_topk_frame (broadcast NLJ, no sort-merge)",
        dense_topk_frame(qv, cv, k=3),
        required=["BroadcastNestedLoopJoin"],
        forbidden=["SortMergeJoin"],
    )

    # curation family
    from deepkg_spark.operators.curation import (
        decontaminate,
        pack_sequences,
        repetition_stats,
        sample_stratified,
        unigram_logprob,
    )
    from deepkg_spark.operators.textstats import lang_id

    # stratified sampling is a pure narrow filter: NO exchange of any kind
    audit(
        "sample_stratified (zero-shuffle narrow filter)",
        sample_stratified(
            docs.select("doc_id", F.lit("en").alias("stratum")), {"en": 500}
        ),
        required=["Filter"],
        forbidden=["Exchange"],
    )
    # decontamination: eval-side distinct hashes broadcast, never a product
    ev_docs = docs.filter(F.col("doc_id") % 20 == 0)
    tr_docs = docs.filter(F.col("doc_id") % 20 != 0)
    audit(
        "decontaminate (broadcast eval hashes, no cross product)",
        decontaminate(tr_docs, ev_docs, n=5),
        required=["BroadcastHashJoin"],
        forbidden=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )
    # repetition stats: two partial+final aggs, one tagged explode
    audit(
        "repetition_stats (partial+final aggs, single explode)",
        repetition_stats(docs),
        required=["HashAggregate", "Generate"],
        forbidden=["CartesianProduct"],
    )
    # unigram LM: capped vocab broadcast; token join is never sort-merge
    audit(
        "unigram_logprob (broadcast top-V vocab)",
        unigram_logprob(docs, top_v=20),
        required=["BroadcastHashJoin"],
        forbidden=["SortMergeJoin"],
    )
    # packing: exactly one shuffle (shard) into a grouped Arrow stage
    audit(
        "pack_sequences (one shard exchange into grouped Arrow stage)",
        pack_sequences(docs, budget=128, shard_size=50),
        required=["FlatMapGroupsInPandas"],
        forbidden=["SortMergeJoin", "CartesianProduct"],
    )
    # offset strategies: one narrow Arrow stage each — scan -> mapInPandas,
    # zero exchanges
    from deepkg_spark.operators.mentions import head_spans_udf
    from deepkg_spark.operators.offsets import (
        closest_pairs_frame,
        longer_first_frame,
    )

    audit(
        "closest_pairs_frame (narrow Arrow stage, no shuffle)",
        closest_pairs_frame(docs),
        required=["MapInPandas"],
        forbidden=["Exchange"],
    )
    audit(
        "longer_first_frame (narrow Arrow stage, no shuffle)",
        longer_first_frame(docs),
        required=["MapInPandas"],
        forbidden=["Exchange"],
    )
    audit(
        "head_spans_udf (narrow Arrow stage, no shuffle)",
        head_spans_udf(corpus, head="biaffine"),
        required=["MapInPandas"],
        forbidden=["Exchange"],
    )
    # production offset strategies: the per-record occurrence re-matching
    # happens inside the SAME narrow Arrow stage — strategy choice never
    # introduces a shuffle
    from deepkg_spark.operators.relations import triples_udf as _t_udf

    audit(
        "triples_udf offset_strategy=closest (narrow Arrow stage)",
        _t_udf(corpus, offset_strategy="closest"),
        required=["MapInPandas"],
        forbidden=["Exchange"],
    )
    # ES repeat-boost rescore: candidate list re-ranked via broadcast-joined
    # dims + windows — never a cartesian or sort-merge join
    from deepkg_spark.operators.linking import rescore_length_norm

    # DSIR: bucket models broadcast (B rows), train side narrow; the only
    # 1-row cross joins are broadcast scalars
    from deepkg_spark.operators.curation import dsir_logratio

    # (the gram->bucket-model joins must broadcast; the final zero-gram-doc
    # re-attach joins corpus-sized sides on doc_id, where a shuffle join IS
    # the correct 100 TB plan — only cartesians are forbidden)
    audit(
        "dsir_logratio (broadcast bucket models, narrow train side)",
        dsir_logratio(
            docs.filter(F.col("doc_id") % 20 != 0),
            docs.filter(F.col("doc_id") % 20 == 0),
            n=2,
        ),
        required=["BroadcastHashJoin"],
        forbidden=["CartesianProduct"],
    )
    # PageRank round: contrib join + partial-aggregable groupBy(dst); the
    # dangling scalar rides a 1-row broadcast, never a cartesian blowup
    from deepkg_spark.operators.graph import _pagerank_round

    _pr_edges = docs.selectExpr("doc_id AS src", "(doc_id * 7) % 50 AS dst")
    _pr_verts = _pr_edges.selectExpr("src AS v").union(
        _pr_edges.selectExpr("dst AS v")
    ).distinct()
    _pr_deg = _pr_edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    _pr_r0 = _pr_verts.select("v", F.lit(0.01).alias("rank"))
    audit(
        "pagerank single round (equi-join + hash agg, no cartesian)",
        _pagerank_round(_pr_verts, _pr_edges, _pr_deg, _pr_r0, 100, 0.85),
        required=["HashAggregate"],
        forbidden=["CartesianProduct"],
    )
    audit(
        "rescore repeat-boost (broadcast dims, window re-rank)",
        rescore_length_norm(
            bm25_topn(
                docs.selectExpr("doc_id AS qid", "text AS qtext").limit(20),
                part, topn=5,
            ),
            docs.selectExpr("doc_id AS qid", "text AS qtext").limit(20),
            part, topn=5, repeat_score=2.0,
        ),
        required=["BroadcastHashJoin", "Window"],
        forbidden=["CartesianProduct", "SortMergeJoin"],
    )

    # exact-substring dedup: narrow window explode, uniform-hash agg +
    # equi-join back, islands merge on PER-DOC windows — no cross product
    from deepkg_spark.operators.dedup import substring_spans

    audit(
        "substring_spans (hash agg + equi-join, per-doc windows)",
        substring_spans(docs),
        required=["HashAggregate", "Window"],
        forbidden=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )
    # as-of join: union-tag running-last — ONE user_id partitioning, a
    # window, and NO join operator of any kind in the plan
    from deepkg_spark.operators.events import asof_join

    events = spark.read.parquet(f"{sf}/events.parquet")
    audit(
        "ev_asof_join (union + per-user window, zero joins)",
        asof_join(events),
        required=["Window", "Union"],
        forbidden=["Join", "CartesianProduct"],
    )

    # exact quantiles: melt -> (col,val) partial-aggregable counts -> per-
    # column windows; NO value-buffering percentile aggregate in the plan
    from deepkg_spark.operators.curation import profile_quantiles

    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    audit(
        "profile_quantiles (count-based, per-column windows, no percentile buffer)",
        profile_quantiles(li, num_cols=("l_quantity", "l_extendedprice")),
        required=["HashAggregate", "Window"],
        forbidden=["CartesianProduct", "percentile"],
    )
    # ExactSubstr clean: tokens equi-join their doc's spans (range pred on
    # an equi key, never a cross product), position-sorted reassembly
    from deepkg_spark.operators.dedup import substring_clean

    audit(
        "substring_clean (doc_id equi-join + sorted reassembly, no cross product)",
        substring_clean(docs),
        required=["HashAggregate"],
        forbidden=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )
    # heavy hitters: global top-k via TakeOrdered — per-partition top-k
    # merge, never a global sort materialization
    from deepkg_spark.operators.textstats import top_terms

    audit(
        "top_terms (TakeOrdered global top-k, no global sort)",
        top_terms(docs, k=20),
        required=["TakeOrderedAndProject"],
        forbidden=["CartesianProduct"],
    )

    # PQ codes: one narrow projection — ZERO exchanges of any kind
    from deepkg_spark.operators.similarity import pq_codes

    audit(
        "ann_pq_codes (single narrow projection, zero shuffle)",
        pq_codes(emb_full, dim=64),
        required=["Project"],
        forbidden=["Exchange", "Join"],
    )

    # IVF+PQ ADC search: candidates reduced to (cell, m codes) narrowly;
    # the only join is the cell equi-join (never a cross product), ranking
    # is a per-qid window — raw cvec floats never shuffle (the exchanges
    # carry qid lookup tables and 8 int codes per candidate)
    from deepkg_spark.operators.similarity import ivf_pq_topk

    ivfq = emb_full.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    ivfc = emb_full.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    audit(
        "ann_ivf_pq (cell equi-join over codes, no cross product)",
        ivf_pq_topk(ivfq, ivfc, k=5, dim=64),
        required=["Window"],
        forbidden=["CartesianProduct", "BroadcastNestedLoopJoin"],
    )

    # factored scorer heads: scan -> Arrow mapInPandas -> rows, no shuffle
    from deepkg_spark.operators.head_factored import head_spans_factored

    audit(
        "ner_head_factored (narrow Arrow stage, no shuffle)",
        head_spans_factored(corpus, head="rotary_gp"),
        required=["MapInPandas"],
        forbidden=["Exchange", "Join"],
    )

    # distant supervision: broadcast trie inside the Arrow stage — the plan
    # itself is one narrow stage (dictionary rides a python broadcast)
    from deepkg_spark.operators.distant import distant_supervision

    tiny_dict = spark.createDataFrame(
        [("import mod1", "phrase", True)], "surface string, type string, is_core boolean"
    )
    audit(
        "ner_distant_dp (broadcast trie, narrow Arrow stage)",
        distant_supervision(docs, tiny_dict),
        required=["MapInPandas"],
        forbidden=["Exchange", "SortMergeJoin"],
    )

    with open("PLANS.md", "w") as f:
        f.write(
            "# PLANS — physical-plan audit (regenerate: python -m "
            "deepkg_spark.plans.explain)\n\n" + "\n".join(sections)
        )
    bad = [s for s in sections if "Audit: OK" not in s]
    print(f"plan audit: {len(sections) - len(bad)}/{len(sections)} OK")
    for s in bad:
        print(s.splitlines()[0], "->", s.splitlines()[2])
    spark.stop()


if __name__ == "__main__":
    main()
