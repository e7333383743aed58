"""Skew hardening: a pathologically hot key through the salted aggregation
and the linking join — results must be exact and salt-invariant."""

from pyspark.sql import functions as F

from deepkg_spark.operators.canonicalize import (
    canonical_entities,
    salted_repartition,
)
from deepkg_spark.operators.linking import link_exact


def _skewed_mentions(spark, n=20000, hot_frac=0.6):
    """60% of all mentions share ONE surface ('self') — the code-corpus hot
    identifier case the reference never faces (SURVEY.md §4 item 1)."""
    hot = int(n * hot_frac)
    return spark.range(n).selectExpr(
        f"IF(id < {hot}, 'self', concat('ident_', CAST(id % 500 AS STRING))) AS surface",
        "'identifier' AS mention_type",
    )


def test_salted_agg_exact_under_skew(spark):
    m = _skewed_mentions(spark)
    got = {
        (r["norm_surface"], r["n_mentions"], r["n_variants"])
        for r in canonical_entities(m, n_salts=32).collect()
    }
    hot = [g for g in got if g[0] == "self"]
    assert hot == [("self", 12000, 1)]
    assert len(got) == 501
    # salt-count invariance on the skewed input
    got1 = {tuple(r) for r in canonical_entities(m, n_salts=1).collect()}
    got32 = {tuple(r) for r in canonical_entities(m, n_salts=32).collect()}
    assert got1 == got32


def test_salted_repartition_spreads_hot_key(spark):
    m = _skewed_mentions(spark, n=8000)
    salted = salted_repartition(m, "surface", n_salts=16)
    # the hot key fans out over many (key, salt) groups
    n_salts = (
        salted.filter(F.col("surface") == "self").select("_salt").distinct().count()
    )
    assert n_salts == 16
    # and over multiple physical partitions (AQE coalescing would legally
    # merge this tiny test shuffle back to 1 — disable it for the assertion)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        parts = (
            salted_repartition(m, "surface", n_salts=16)
            .withColumn("pid", F.spark_partition_id())
            .filter(F.col("surface") == "self")
            .select("pid")
            .distinct()
            .count()
        )
        assert parts > 1
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")


def test_broadcast_join_immune_to_skew(spark):
    """Linking joins keep the big skewed side shuffle-free via broadcast."""
    m = _skewed_mentions(spark)
    alias = spark.createDataFrame(
        [("self", 1), ("ident_7", 2)], ["name", "term_id"]
    ).select("term_id", "name")
    out = link_exact(m, alias)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    agg = out.groupBy("term_id").count().collect()
    got = {r["term_id"]: r["count"] for r in agg}
    assert got[1] == 12000 and got[2] == 16
