"""Graph operators: integer-exact PageRank over an edge DataFrame.

The reference has no graph surface (two fixed MR jobs); this covers the
"iterative algorithms" gap row alongside k-means and connected components
(SURVEY.md §2.2). Like those, the iteration is bit-reproducible: ranks are
quantized integers (scale 1e9) and every update uses integer floor
division, so any engine — and the DuckDB oracle's unrolled CTEs — produces
the identical bigint ranks regardless of partitioning or summation order.

Scale posture: each iteration is (edges ⋈ ranks on src) → partial-sum by
dst — the canonical Pregel-as-joins shape. Edges shuffle once per
iteration on src/dst only (~tens of bytes per edge); ranks are one row per
node. Out-degrees are computed once and cached with the edge list. For a
fixed small iteration count the lineage stays shallow; beyond ~10
iterations checkpoint the rank table to cut lineage (same argument as
clustering.py's label propagation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    damping_pct: int = 85,
) -> DataFrame:
    """Simplified PageRank (no dangling-mass redistribution) over directed
    ``edges(src, dst)``; returns (node, rank) with rank quantized to
    SCALE=1e9.

    rank_0 = SCALE div N
    rank_{i+1} = ((100-d)·SCALE div (100·N))
                 + (d · Σ_{src→node} (rank_i div outdeg(src))) div 100

    All divisions are integer floor on non-negative values, so Spark's
    ``div`` and DuckDB's ``//`` agree exactly. N enters as a broadcast
    scalar aggregate (no driver-side count — the plan stays lazy and
    distributed end-to-end).
    """
    # edges feed degree computation plus one join per iteration, and the
    # node set twice. Eager localCheckpoint (not just persist) both reuses
    # the materialized partitions AND truncates lineage, so the final plan
    # references the checkpointed RDD instead of replaying the
    # edge-producing subtree once per consumer (same rationale as
    # clustering.py's label-propagation loop).
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_total = nodes.agg(F.count(F.lit(1)).alias("n_total"))
    nodes_n = nodes.crossJoin(F.broadcast(n_total)).localCheckpoint(
        eager=True
    )
    deg = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )

    base_num = (100 - damping_pct) * SCALE
    ranks = nodes_n.select(
        "node", "n_total", F.expr(f"{SCALE} div n_total").alias("rank")
    )
    for _ in range(iters):
        contrib = (
            edges.join(deg, "src")
            .join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .select("dst", F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes_n.join(contrib, nodes_n["node"] == contrib["dst"], "left")
            .select(
                "node",
                "n_total",
                (
                    F.expr(f"{base_num} div (100 * n_total)")
                    + F.expr(
                        f"({damping_pct} * coalesce(contrib, 0)) div 100"
                    )
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.col("rank").cast("long").alias("rank"))
