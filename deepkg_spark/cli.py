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
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description="deepkg_spark job runner")
    ap.add_argument(
        "--job",
        choices=["triples", "graph", "incremental", "dedup", "link"],
        required=True,
    )
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-splits", type=int, default=32)
    ap.add_argument("--job-id", default="kg")
    ap.add_argument("--tau", type=float, default=0.5, help="dedup jaccard threshold")
    ap.add_argument("--dict", dest="dict_path", default=None,
                    help="link: parquet with (term_id, name); defaults to part table")
    ap.add_argument("--topn", type=int, default=5)
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
        df = triples_frame(corpus)
        df.write.mode("overwrite").parquet(f"{args.out}/triples")
        n = spark.read.parquet(f"{args.out}/triples").count()
        print(json.dumps({"job": "triples", "rows": n}))
    elif args.job == "graph":
        t = triples_frame(corpus)
        write_graph(node_table(t), edge_table(t), args.out)
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
