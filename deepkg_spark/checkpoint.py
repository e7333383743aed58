"""Per-split checkpoint manifest + exact resume (required by north_rule).

The reference's nearest analogue is pickle-resume of fitted stats
(Normalization/recall/model/BM25_Model.py:88-130) and best-checkpoint logic
(ExtractionEntities/main.py:145-163); neither survives partial failure over a
partitioned corpus. This module provides the cluster-scale version:

- The corpus is bucketed into ``n_splits`` deterministic splits by
  pmod(h32(repo/path), n_splits) — stable across runs AND cluster sizes.
- One Spark job processes ALL pending splits at once (pending = anti-join of
  splits against the manifest), so resume granularity is the split but the
  scheduler still sees a single wide job — no driver-side per-split loop.
- Output is written with dynamic partition overwrite on the split column, so
  re-processing a split after a crash is idempotent (the half-written split
  directory is atomically replaced).
- The manifest row carries lineage + counters:
    (job_id, split_id, row_count, checksum, status, attempt)
  where checksum is an order-independent content digest
  (sum of md5-derived row hashes mod 2^61) — verifiable on resume.
- Commit order: data first, manifest second. A crash between the two replays
  the split (idempotent); a manifest row therefore PROVES its split's data is
  complete.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepkg_spark.functions.hashing import spark_h32

SPLIT_COL = "split_id"
_CHECK_MOD = (1 << 61) - 1


def split_expr(n_splits: int, key_expr: str = "concat_ws('/', repo, path)") -> str:
    return f"pmod({spark_h32(key_expr)}, {n_splits})"


def _row_digest(cols: list[str]) -> str:
    concat = "concat_ws(chr(31), " + ", ".join(f"CAST({c} AS STRING)" for c in cols) + ")"
    return spark_h32(f"md5({concat})")


def read_manifest(spark: SparkSession, manifest_path: str, job_id: str) -> DataFrame:
    schema = (
        "job_id string, split_id int, row_count long, checksum long, "
        "status string, attempt int"
    )
    if os.path.exists(manifest_path):
        df = spark.read.schema(schema).parquet(manifest_path)
        return df.filter((F.col("job_id") == job_id) & (F.col("status") == "ok"))
    return spark.createDataFrame([], schema)


def run_incremental(
    spark: SparkSession,
    corpus: DataFrame,
    pipeline_fn,
    out_dir: str,
    job_id: str,
    n_splits: int = 32,
    only_splits: set[int] | None = None,
) -> dict:
    """Process pending splits of `corpus` through `pipeline_fn`, commit data +
    manifest. `pipeline_fn(df) -> DataFrame` must keep repo+path columns
    (split is re-derived from them, so the pipeline never needs to thread
    bookkeeping columns). `only_splits` restricts processing — the test hook
    simulating a run killed partway (those splits commit; the rest stay
    pending for the next invocation).

    Returns counters: {pending, processed, rows}.
    """
    manifest_path = f"{out_dir}/_manifest"
    data_path = f"{out_dir}/data"
    done = read_manifest(spark, manifest_path, job_id).select(SPLIT_COL).distinct()

    src = corpus.withColumn(SPLIT_COL, F.expr(split_expr(n_splits)).cast("int"))
    pending_df = src.join(done, SPLIT_COL, "left_anti")
    if only_splits is not None:
        pending_df = pending_df.filter(F.col(SPLIT_COL).isin(list(only_splits)))

    pend_splits = [r[0] for r in pending_df.select(SPLIT_COL).distinct().collect()]
    if not pend_splits:
        return {"pending": 0, "processed": 0, "rows": 0}

    result = pipeline_fn(pending_df.drop(SPLIT_COL)).withColumn(
        SPLIT_COL, F.expr(split_expr(n_splits)).cast("int")
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    result.write.mode("overwrite").partitionBy(SPLIT_COL).parquet(data_path)

    out_cols = [c for c in result.columns if c != SPLIT_COL]
    stats = (
        spark.read.parquet(data_path)
        .filter(F.col(SPLIT_COL).isin(pend_splits))
        .groupBy(SPLIT_COL)
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            (F.sum(F.expr(_row_digest(out_cols))) % _CHECK_MOD).alias("checksum"),
        )
        .select(
            F.lit(job_id).alias("job_id"),
            F.col(SPLIT_COL),
            "row_count",
            "checksum",
            F.lit("ok").alias("status"),
            F.lit(1).alias("attempt"),
        )
    )
    stats.write.mode("append").parquet(manifest_path)
    rows = sum(
        r["row_count"]
        for r in spark.read.parquet(manifest_path)
        .filter((F.col("job_id") == job_id) & (F.col(SPLIT_COL).isin(pend_splits)))
        .select("row_count")
        .collect()
    )
    return {"pending": len(pend_splits), "processed": len(pend_splits), "rows": rows}
