"""Event analytics: tumbling-window aggregation and sessionization.

The reference has no streaming/event operators (SURVEY.md 2.9); these cover
the engine's monitoring surface (a production ingest watches its own event
stream) and exercise Spark's time-window operators with exact DuckDB twins.

Portability notes: window starts are exported as epoch seconds (BIGINT) —
cross-engine timestamp rendering differs, epoch arithmetic does not. The
events table ships TIMESTAMP_NTZ; session TZ is pinned UTC so
unix_timestamp(cast(ts as timestamp)) == duckdb epoch(ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUND = 6


def windowed_counts(events: DataFrame, minutes: int = 5) -> DataFrame:
    """(win_start, event_type, n, sum_value): tumbling windows via Spark's
    window() operator, start exported as epoch seconds."""
    secs = minutes * 60
    return (
        events.withColumn("tts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("tts", f"{minutes} minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value"), ROUND).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).cast("bigint").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def windowed_counts_duck_sql(events_rel: str = "events", minutes: int = 5) -> str:
    secs = minutes * 60
    return f"""
SELECT CAST(floor(epoch(ts) / {secs}) * {secs} AS BIGINT) AS win_start,
       event_type, CAST(count(*) AS BIGINT) AS n,
       round(sum(value), {ROUND}) AS sum_value
FROM {events_rel}
GROUP BY 1, 2
""".strip()


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """(user_id, session_start, n_events, sum_value): a new session starts
    when the gap to the user's previous event exceeds gap_seconds — the
    classic lag + running-sum sessionization (no UDF, two window functions).
    """
    events.withColumn(
        "ep", F.unix_timestamp(F.col("ts").cast("timestamp")).cast("bigint")
    ).createOrReplaceTempView("_ev_sess")
    return events.sparkSession.sql(
        f"""
WITH g AS (
  SELECT user_id, ep,
         value,
         CASE WHEN ep - lag(ep) OVER (PARTITION BY user_id ORDER BY ep) > {gap_seconds}
              OR lag(ep) OVER (PARTITION BY user_id ORDER BY ep) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM _ev_sess
), s AS (
  SELECT user_id, ep, value,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ep
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM g
)
SELECT user_id, CAST(min(ep) AS BIGINT) AS session_start,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), {ROUND}) AS sum_value
FROM s GROUP BY user_id, session_no
"""
    )


def sessionize_duck_sql(events_rel: str = "events", gap_seconds: int = 1800) -> str:
    return f"""
WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep, value FROM {events_rel}),
g AS (
  SELECT user_id, ep, value,
         CASE WHEN ep - lag(ep) OVER (PARTITION BY user_id ORDER BY ep) > {gap_seconds}
              OR lag(ep) OVER (PARTITION BY user_id ORDER BY ep) IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM e
), s AS (
  SELECT user_id, ep, value,
         sum(is_start) OVER (PARTITION BY user_id ORDER BY ep
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM g
)
SELECT user_id, CAST(min(ep) AS BIGINT) AS session_start,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), {ROUND}) AS sum_value
FROM s GROUP BY user_id, session_no
""".strip()
