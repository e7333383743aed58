"""Structured Streaming ingestion for the KG pipeline.

The reference is entirely batch (SURVEY.md 2.9: no streaming operators
anywhere in the tree); this module is the engine's incremental-ingestion
addition: new corpus files landing in a directory are picked up by a file
stream, run through the SAME stateless extraction plan (mentions/triples are
narrow per-document transforms -> streaming-safe with no watermarks needed),
and committed append-only. foreachBatch gives exactly-once-per-epoch sinks
and a place to update the checkpoint manifest.

Also includes the watermarked event-window aggregation pattern (late-data
tolerant) over the events table shape, since a production ingest monitors its
own throughput/event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def stream_triples(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    transform=None,
):
    """File-stream corpus -> extraction plan -> append parquet sink.

    Returns the started StreamingQuery; callers use availableNow semantics
    (q.processAllAvailable()) in tests / trigger(availableNow=True) in prod.
    `transform` defaults to the triple extractor and must be a stateless
    DataFrame -> DataFrame function (narrow ops only).
    """
    from deepkg_spark.operators.relations import triples_frame

    transform = transform or triples_frame
    src = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    out = transform(src)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    return (
        out.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_dedup_exact(docs_stream: DataFrame):
    """Custom stateful streaming operator: exact dedup ACROSS micro-batches
    via applyInPandasWithState. State per content hash = number of copies
    seen so far; only a hash's first-ever row is emitted. This is the
    streaming twin of operators/dedup.dedup_exact — late duplicates arriving
    in any later micro-batch are suppressed.

    Input stream must carry (doc_id long, text string). Output:
    (content_md5 string, doc_id long).
    """
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hashed = docs_stream.withColumn("content_md5", F.md5("text"))

    def dedup(key, pdfs, state: GroupState):
        seen = state.get[0] if state.exists else 0
        first = None
        n = 0
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                # min across ALL Arrow chunks of the group — a group can span
                # chunks, and chunk order must not pick the representative
                m = int(pdf["doc_id"].min())
                first = m if first is None else min(first, m)
        if seen == 0 and n > 0:
            yield pd.DataFrame({"content_md5": [key[0]], "doc_id": [first]})
        state.update((seen + n,))

    return hashed.groupBy("content_md5").applyInPandasWithState(
        dedup,
        outputStructType="content_md5 string, doc_id long",
        stateStructType="n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(events_stream: DataFrame) -> DataFrame:
    """Watermarked 5-minute windows sliding by 1 minute over events(ts,
    event_type, value): late data beyond 10 minutes is dropped."""
    return (
        # event-time must be TIMESTAMP (session-TZ, pinned UTC) — the test
        # data ships TIMESTAMP_NTZ, which watermarks reject
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes", "1 minute"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )


def stream_interval_join(
    clicks_stream: DataFrame,
    views_stream: DataFrame,
    max_lag: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Stream-stream watermarked interval join: attribute each click event to
    the view of the SAME event_type that happened at most `max_lag` before
    it. Both sides carry watermarks so state for expired windows is dropped
    (bounded state — required for an unbounded run).

    clicks(ts, event_type, value) x views(ts, event_type, value)
      -> (event_type, view_ts, click_ts, view_value, click_value)
    """
    c = (
        clicks_stream.withColumn("click_ts", F.col("ts").cast("timestamp"))
        .withColumnRenamed("value", "click_value")
        .select("click_ts", "event_type", "click_value")
        .withWatermark("click_ts", watermark)
    )
    v = (
        views_stream.withColumn("view_ts", F.col("ts").cast("timestamp"))
        .withColumnRenamed("value", "view_value")
        .select("view_ts", F.col("event_type").alias("v_event_type"), "view_value")
        .withWatermark("view_ts", watermark)
    )
    return c.join(
        v,
        F.expr(
            f"""event_type = v_event_type AND
            view_ts <= click_ts AND
            view_ts >= click_ts - INTERVAL {max_lag}"""
        ),
    ).select("event_type", "view_ts", "click_ts", "view_value", "click_value")
