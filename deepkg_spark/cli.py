"""spark-submit entry point.

Deploy:
    cd /root/repo && python -c "import shutil; shutil.make_archive('/tmp/deepkg_spark', 'zip', '.', 'deepkg_spark')"
    spark-submit --master <cluster> --py-files /tmp/deepkg_spark.zip \\
        deepkg_spark/cli.py --job graph --sf-dir /data/sfX --out /data/out

Jobs:
    triples     corpus -> triple extraction -> parquet
    graph       corpus -> triples -> node + edge tables (partitioned)
    incremental corpus -> triples with checkpoint manifest (resumable;
                re-running after a kill completes only pending splits)
    dedup       documents -> minhash-LSH near-dup pairs + duplicate clusters
                (connected components) -> parquet
    link        documents x dictionary parquet (term_id, name) -> BM25 top-N
                candidates -> parquet
    profile     table validation: per-column null/distinct/min-max stats +
                exact interpolated quantiles for the numeric columns ->
                parquet + JSON summary (the pre-ingest data-quality gate)
    curate      end-to-end training-data curation: quality + repetition
                gates -> near-dup collapse (LSH pairs -> connected
                components, keep min doc_id) -> eval-set n-gram
                decontamination -> stratified language sampling -> next-fit
                sequence packing -> parquet + per-stage funnel counts
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description="deepkg_spark job runner")
    ap.add_argument(
        "--job",
        choices=["triples", "graph", "incremental", "dedup", "link", "curate",
                 "profile"],
        required=True,
    )
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-splits", type=int, default=32)
    ap.add_argument("--offset-strategy", default="first",
                    choices=["first", "closest", "longer_first"],
                    help="triples: offset-mapping strategy (reference "
                    "map_config); non-'first' strategies run the Arrow UDF "
                    "path with per-record occurrence re-matching")
    ap.add_argument("--job-id", default="kg")
    ap.add_argument("--tau", type=float, default=0.5, help="dedup jaccard threshold")
    ap.add_argument("--dict", dest="dict_path", default=None,
                    help="link: parquet with (term_id, name); defaults to part table")
    ap.add_argument("--topn", type=int, default=5)
    ap.add_argument("--qmin", type=float, default=0.3, help="curate: min quality score")
    ap.add_argument("--rmax", type=float, default=0.5,
                    help="curate: max duplicate-3-gram fraction")
    ap.add_argument("--budget", type=int, default=512, help="curate: tokens per bin")
    ap.add_argument("--shard-size", type=int, default=1000,
                    help="curate: docs per packing shard")
    ap.add_argument("--table", default=None,
                    help="profile: table name under --sf-dir (default lineitem)")
    args = ap.parse_args()

    # imports resolve from --py-files on executors and driver alike
    from pyspark.sql import SparkSession

    from deepkg_spark.checkpoint import run_incremental
    from deepkg_spark.operators.graph import edge_table, node_table, write_graph
    from deepkg_spark.operators.relations import triples_frame
    from deepkg_spark.sources.corpus import load_corpus

    spark = SparkSession.builder.appName(f"deepkg-{args.job}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.job == "dedup":
        from pyspark.sql import functions as F

        from deepkg_spark.operators.dedup import minhash_lsh_pairs
        from deepkg_spark.operators.graph import connected_components

        docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        pairs = minhash_lsh_pairs(docs, tau=args.tau)
        pairs.write.mode("overwrite").parquet(f"{args.out}/pairs")
        clusters = connected_components(
            docs.select(F.col("doc_id").alias("v")),
            spark.read.parquet(f"{args.out}/pairs").select(
                F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
            ),
        )
        clusters.write.mode("overwrite").parquet(f"{args.out}/clusters")
        n_pairs = spark.read.parquet(f"{args.out}/pairs").count()
        n_clusters = (
            spark.read.parquet(f"{args.out}/clusters").select("component").distinct().count()
        )
        print(json.dumps({"job": "dedup", "pairs": n_pairs, "clusters": n_clusters}))
        spark.stop()
        return

    if args.job == "profile":
        from deepkg_spark.operators.curation import profile_quantiles, profile_table

        table = args.table or "lineitem"
        df = spark.read.parquet(f"{args.sf_dir}/{table}.parquet")
        kinds = dict(df.dtypes)
        # Spark renders decimals as decimal(p,s); dates have no timestamp
        # prefix — both must still land in the numeric/ts stats legs.
        num = tuple(c for c, t in kinds.items()
                    if t in ("bigint", "int", "smallint", "tinyint", "double",
                             "float") or t.startswith("decimal"))
        ts = tuple(c for c, t in kinds.items()
                   if t.startswith("timestamp") or t == "date")
        strc = tuple(c for c, t in kinds.items() if t == "string")
        skipped = sorted(set(kinds) - set(num) - set(ts) - set(strc))
        prof = profile_table(df, num_cols=num, str_cols=strc, ts_cols=ts)
        prof.write.mode("overwrite").parquet(f"{args.out}/profile")
        if num:
            q = profile_quantiles(df, num_cols=num)
            q.write.mode("overwrite").parquet(f"{args.out}/quantiles")
        n_cols = spark.read.parquet(f"{args.out}/profile").count()
        print(json.dumps({"job": "profile", "table": table, "columns": n_cols,
                          "num_cols": len(num), "skipped_cols": skipped}))
        spark.stop()
        return

    if args.job == "curate":
        from pyspark.sql import functions as F

        from deepkg_spark.checkpoint import run_staged
        from deepkg_spark.operators.curation import curate_stages

        all_docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        # hold out every 20th doc as the eval split; curate the rest
        ev = all_docs.filter(F.col("doc_id") % 20 == 0)
        docs = all_docs.filter(F.col("doc_id") % 20 != 0).persist()
        n0 = docs.count()

        # stage-boundary checkpointing (data first, manifest second): a
        # killed run re-invoked with the same --out resumes after the last
        # completed stage — the cross-document stages (dedup/decontaminate/
        # pack) make split-level resume semantically wrong here, so the
        # stage IS the unit of idempotent replay. Each stage's parquet under
        # --out doubles as the cache the old per-stage .persist() provided.
        counts, packed = run_staged(
            spark,
            curate_stages(
                docs, ev,
                qmin=args.qmin, rmax=args.rmax, tau=args.tau,
                budget=args.budget, shard_size=args.shard_size,
            ),
            args.out,
            job_id=args.job_id if args.job_id != "kg" else "curate",
        )
        n_bins = packed.select("shard", "bin").distinct().count()
        print(
            json.dumps(
                {
                    "job": "curate",
                    "input": n0,
                    "after_quality": counts["gate"],
                    "after_dedup": counts["dedup"],
                    "after_decontaminate": counts["decontaminate"],
                    "after_sample": counts["sample"],
                    "bins": n_bins,
                }
            )
        )
        spark.stop()
        return

    if args.job == "link":
        from pyspark.sql import functions as F

        from deepkg_spark.operators.linking import bm25_topn

        q = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
            F.col("doc_id").alias("qid"), F.col("text").alias("qtext")
        )
        dict_path = args.dict_path or f"{args.sf_dir}/part.parquet"
        d = spark.read.parquet(dict_path)
        if "term_id" not in d.columns:
            d = d.select(
                F.col("p_partkey").alias("term_id"), F.col("p_name").alias("name")
            )
        ranked = bm25_topn(q, d, topn=args.topn)
        ranked.write.mode("overwrite").parquet(f"{args.out}/candidates")
        n = spark.read.parquet(f"{args.out}/candidates").count()
        print(json.dumps({"job": "link", "candidates": n}))
        spark.stop()
        return

    corpus = load_corpus(spark, args.sf_dir)

    if args.job == "triples":
        if args.offset_strategy == "first":
            df = triples_frame(corpus)  # JVM whole-stage-codegen path
        else:
            from deepkg_spark.operators.relations import triples_udf

            df = triples_udf(corpus, offset_strategy=args.offset_strategy)
        df.write.mode("overwrite").parquet(f"{args.out}/triples")
        n = spark.read.parquet(f"{args.out}/triples").count()
        print(json.dumps({"job": "triples", "rows": n,
                          "offset_strategy": args.offset_strategy}))
    elif args.job == "graph":
        # both tables consume the same triple stream: cache the extraction
        # so the two writes don't each re-run the scan+regex stage
        t = triples_frame(corpus).persist()
        write_graph(node_table(t), edge_table(t), args.out)
        t.unpersist()
        n_nodes = spark.read.parquet(f"{args.out}/nodes").count()
        n_edges = spark.read.parquet(f"{args.out}/edges").count()
        print(json.dumps({"job": "graph", "nodes": n_nodes, "edges": n_edges}))
    else:
        stats = run_incremental(
            spark, corpus, triples_frame, args.out, args.job_id,
            n_splits=args.n_splits,
        )
        print(json.dumps({"job": "incremental", **stats}))

    spark.stop()


if __name__ == "__main__":
    main()
