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
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(description="deepkg_spark job runner")
    ap.add_argument("--job", choices=["triples", "graph", "incremental"], required=True)
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-splits", type=int, default=32)
    ap.add_argument("--job-id", default="kg")
    args = ap.parse_args()

    # imports resolve from --py-files on executors and driver alike
    from pyspark.sql import SparkSession

    from deepkg_spark.checkpoint import run_incremental
    from deepkg_spark.operators.graph import edge_table, node_table, write_graph
    from deepkg_spark.operators.relations import triples_frame
    from deepkg_spark.sources.corpus import load_corpus

    spark = SparkSession.builder.appName(f"deepkg-{args.job}").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
