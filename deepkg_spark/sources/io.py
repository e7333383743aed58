"""Corpus readers/writers across formats, schema-enforced.

The reference reads JSON arrays, JSONL, Excel, plain text and TSV
(SURVEY.md 2.1); at engine scale every format maps onto a schema-enforced
``spark.read`` (never inferSchema in production paths) producing the
canonical corpus shape. Iceberg is the production table format named by the
north rule; its runtime jars are not in this image, so the Iceberg path is
gated behind a capability check and falls back to parquet with an explicit
warning (the writer API is format-parameterized already, graph.write_graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
    ]
)

_COLS = [f.name for f in CORPUS_SCHEMA.fields]


def read_corpus_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select(*_COLS)


def read_corpus_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL (one doc per line) — the reference's UIE instance format
    (utils_torch.py:113-159), schema enforced (no inference)."""
    return spark.read.schema(CORPUS_SCHEMA).json(path).select(*_COLS)


def read_corpus_csv(spark: SparkSession, path: str, sep: str = "\t") -> DataFrame:
    """TSV/CSV — the reference's dictionary/training-pair format."""
    return (
        spark.read.schema(CORPUS_SCHEMA)
        .option("header", "true")
        .option("sep", sep)
        .option("multiLine", "true")
        .option("escape", '"')
        # univocity trims whitespace (incl. trailing newlines INSIDE quoted
        # fields) by default — that would mutate content and break the sha256
        # invariant
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
        .select(*_COLS)
    )


def write_corpus(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    if fmt == "jsonl":
        df.select(*_COLS).write.mode("overwrite").json(path)
    elif fmt == "csv":
        (
            df.select(*_COLS)
            .write.mode("overwrite")
            .option("header", "true")
            .option("sep", "\t")
            .option("escape", '"')
            # the writer ALSO trims field whitespace by default — content
            # must round-trip byte-exact (sha256 invariant)
            .option("ignoreLeadingWhiteSpace", "false")
            .option("ignoreTrailingWhiteSpace", "false")
            .csv(path)
        )
    else:
        df.select(*_COLS).write.mode("overwrite").format(fmt).save(path)


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_table(df: DataFrame, ident: str, spark: SparkSession) -> str:
    """Write to an Iceberg table when the runtime is present, else parquet
    under /tmp with the same identifier — the format seam the north rule's
    Iceberg tables plug into (add iceberg-spark-runtime via --packages and
    a catalog config; no engine code changes needed)."""
    if iceberg_available(spark):
        df.writeTo(ident).createOrReplace()
        return f"iceberg:{ident}"
    path = f"/tmp/deepkg_tables/{ident.replace('.', '/')}"
    df.write.mode("overwrite").parquet(path)
    return f"parquet:{path}"


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a hash-bucketed managed table so every later join or
    aggregation on `bucket_col` reads pre-co-located buckets and SKIPS the
    shuffle — the storage-side half of the engine's scale design (the
    runtime halves being broadcast for dictionary-sized sides and AQE skew
    handling for everything else).

    At 100 TB this is how the static tables are laid out once and joined
    many times: the postings/dictionary table bucketed by term, the edge
    table by subj, the embeddings table by vec_id. Two tables bucketed by
    the same column into the same bucket count join with ZERO exchanges on
    either side (asserted by tests/test_bucketed.py against the physical
    plan); a groupBy on the bucket column likewise skips its exchange.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
