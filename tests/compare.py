"""Local replica of the driver's Spark-vs-DuckDB oracle comparison.

The driver sorts columns by name, then value-hashes rows order-insensitively.
This harness does the same (with float rounding) so oracle mismatches are
caught in pytest before a round's CORRECTNESS check runs.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v: Any, ndigits: int = 6) -> Any:
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, ndigits)
    if isinstance(v, list):
        return tuple(_norm(x, ndigits) for x in v)
    return v


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_spark_duck(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Assert spark result == duckdb result (schema names, counts, values)."""
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = [c.lower() for c in rel.columns]
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"schema mismatch: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"row count {len(s_rows)} vs {len(d_rows)}"
    sc, dc = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    mism = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mism, f"{len(mism)} row mismatches; first: {mism[0]}"
