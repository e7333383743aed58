"""Bucketed-table co-location: joins and aggs on the bucket key skip the
shuffle entirely, and results equal the unbucketed plan.

Runs in a subprocess with its own SparkSession so the managed-table
warehouse lives in a temp dir (the shared test session would drop
spark-warehouse/ into the repo root).
"""

import json
import pathlib
import subprocess
import sys
import tempfile

REPO_ROOT = str(pathlib.Path(__file__).resolve().parents[1])

SCRIPT = r"""
import json, sys
sys.path.insert(0, sys.argv[3])  # repo root from the parent (python -c has no __file__)
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from deepkg_spark.sources.io import write_bucketed

warehouse, sf_dir = sys.argv[1], sys.argv[2]
spark = (
    SparkSession.builder.master("local[2]")
    .appName("bucket-test")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the issue
    .config("spark.sql.sources.bucketing.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
stats = docs.select("doc_id", F.length("text").alias("n_chars"))
write_bucketed(docs, "docs_b", "doc_id", n_buckets=4, sort_col="doc_id")
write_bucketed(stats, "stats_b", "doc_id", n_buckets=4, sort_col="doc_id")

a = spark.table("docs_b")
b = spark.table("stats_b")
joined = a.join(b, "doc_id")
plan = joined._jdf.queryExecution().executedPlan().toString()
agg = a.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
agg_plan = agg._jdf.queryExecution().executedPlan().toString()

plain = docs.join(stats, "doc_id")
same = sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))

print(json.dumps({
    "join_has_exchange": "Exchange" in plan,
    "agg_has_exchange": "Exchange" in agg_plan,
    "results_equal": same,
    "rows": joined.count(),
}))
spark.stop()
"""


def test_bucketed_join_skips_shuffle(sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        out = subprocess.run(
            [sys.executable, "-c", SCRIPT, f"{tmp}/warehouse", sf_dir, REPO_ROOT],
            capture_output=True, text=True, timeout=420,
        )
        assert out.returncode == 0, out.stderr[-3000:]
        payload = [l for l in out.stdout.splitlines() if l.startswith("{")]
        res = json.loads(payload[-1])
        assert res["join_has_exchange"] is False, "bucketed join still shuffles"
        assert res["agg_has_exchange"] is False, "bucketed agg still shuffles"
        assert res["results_equal"] is True
        assert res["rows"] > 0
