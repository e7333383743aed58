"""Graph materialization: node & edge tables from the triple stream.

The reference stops at JSON prediction files (UIE_torch submission sinks,
process_data.py:160-228); this stage is the engine's addition for the KG
use-case: canonical, content-addressed node ids and partitioned columnar
node/edge tables.

Scale design:
- node_id = md5(normalized_name | type): content-derived, stable across runs
  and cluster sizes (never monotonically_increasing_id).
- nodes: union of subject/object endpoints -> salt-tolerant two-level agg
  (groupBy on the full (name, type) key; in/out degree via conditional sums
  in ONE aggregation — no self-join).
- edges keep (repo, path) provenance; writes partition by pred so predicate-
  filtered scans prune files (write_graph uses parquet; Iceberg catalog jars
  are not in this image — the writer is format-parameterized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _nid(name_col: str, type_col: str):
    return F.md5(
        F.concat_ws("|", F.lower(F.trim(F.col(name_col))), F.col(type_col))
    )


def edge_table(triples: DataFrame) -> DataFrame:
    """(src_id, dst_id, pred, subj, obj, repo, path)."""
    return triples.select(
        _nid("subj", "subj_type").alias("src_id"),
        _nid("obj", "obj_type").alias("dst_id"),
        "pred",
        "subj",
        "obj",
        "repo",
        "path",
    )


def node_table(triples: DataFrame) -> DataFrame:
    """(node_id, norm_name, node_type, n_out, n_in) — one shuffle total."""
    endpoints = triples.select(
        F.lower(F.trim(F.col("subj"))).alias("norm_name"),
        F.col("subj_type").alias("node_type"),
        F.lit(1).alias("is_out"),
    ).unionByName(
        triples.select(
            F.lower(F.trim(F.col("obj"))).alias("norm_name"),
            F.col("obj_type").alias("node_type"),
            F.lit(0).alias("is_out"),
        )
    )
    return endpoints.groupBy("norm_name", "node_type").agg(
        F.sum("is_out").cast("bigint").alias("n_out"),
        F.sum(1 - F.col("is_out")).cast("bigint").alias("n_in"),
    ).select(
        F.md5(F.concat_ws("|", "norm_name", "node_type")).alias("node_id"),
        "norm_name",
        "node_type",
        "n_out",
        "n_in",
    )


def node_table_duck_sql(triples_rel: str) -> str:
    return f"""
SELECT md5(concat(norm_name, '|', node_type)) AS node_id, norm_name, node_type,
       CAST(sum(is_out) AS BIGINT) AS n_out,
       CAST(sum(1 - is_out) AS BIGINT) AS n_in
FROM (
  SELECT lower(trim(subj)) AS norm_name, subj_type AS node_type, 1 AS is_out
  FROM {triples_rel}
  UNION ALL
  SELECT lower(trim(obj)), obj_type, 0 FROM {triples_rel}
)
GROUP BY norm_name, node_type
""".strip()


def edge_table_duck_sql(triples_rel: str) -> str:
    return f"""
SELECT md5(concat(lower(trim(subj)), '|', subj_type)) AS src_id,
       md5(concat(lower(trim(obj)), '|', obj_type)) AS dst_id,
       pred, subj, obj, repo, path
FROM {triples_rel}
""".strip()


def write_graph(
    nodes: DataFrame, edges: DataFrame, out_dir: str, fmt: str = "parquet"
) -> None:
    """Materialize node/edge tables, partitioned for pruned scans."""
    nodes.write.mode("overwrite").format(fmt).partitionBy("node_type").save(
        f"{out_dir}/nodes"
    )
    edges.write.mode("overwrite").format(fmt).partitionBy("pred").save(
        f"{out_dir}/edges"
    )


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """(v, component) — component = MIN vertex id reachable in the undirected
    graph. The missing last step of every dedup pipeline: LSH emits duplicate
    PAIRS; collapsing them into clusters is a connected-components problem.

    Algorithm: iterative hash-min label propagation — each round every vertex
    takes min(own label, neighbor labels); one equi-join + one groupBy(min)
    per round, converging in <= graph-diameter rounds with an early-exit
    convergence probe (count of lowered labels). Dedup-cluster graphs have
    tiny diameters, so 2-4 rounds is typical; the per-round plan is all
    partial-aggregable shuffles on vertex id (no collect of edges, no driver
    graph). For adversarially long chains at 100 TB, swap in the
    large-star/small-star contraction — same DataFrame-only shape.

    vertices(v long), edges(a long, b long). Deterministic (min is
    order-free).
    """
    sym = (
        edges.selectExpr("a AS src", "b AS dst")
        .unionByName(edges.selectExpr("b AS src", "a AS dst"))
        .persist()
    )
    # localCheckpoint (not persist): iterative algorithms grow the logical
    # plan every round — without truncating lineage, analysis/planning cost
    # explodes exponentially with iteration count
    labels = vertices.select("v", F.col("v").alias("label")).localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["dst"] == labels["v"])
            .select(F.col("src").alias("v"), "label")
        )
        new_labels = (
            labels.select("v", "label")
            .unionByName(nbr)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.label") < F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(last round lowered {changed} labels) — the graph has a longer "
            "diameter than hash-min propagation affords; raise max_iter or "
            "use a star-contraction variant"
        )
    sym.unpersist()
    return labels.select("v", F.col("label").alias("component"))


def connected_components_duck_sql(
    verts_sql: str, pairs_sql: str, prelude_ctes: str = ""
) -> str:
    """Recursive-CTE oracle: min reachable id per vertex. `pairs_sql` may
    carry its own WITH clause (DuckDB allows nested WITH in a CTE body);
    `prelude_ctes` injects fixture CTEs after the RECURSIVE keyword."""
    pre = f"{prelude_ctes}," if prelude_ctes else ""
    return f"""
WITH RECURSIVE {pre}
verts AS ({verts_sql}),
pairs AS ({pairs_sql}),
sym AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
reach(v, r) AS (
  SELECT v, v FROM verts
  UNION
  SELECT s.src, reach.r FROM sym s JOIN reach ON s.dst = reach.v
)
SELECT v, CAST(min(r) AS BIGINT) AS component FROM reach GROUP BY v
""".strip()
