"""Graph query: PageRank over the customer↔supplier trade graph, with an
unrolled-CTE DuckDB oracle that replicates the quantized-integer iteration
bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.operators import graph
from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table


def _pagerank_oracle(iters: int = 2, damping_pct: int = 85) -> str:
    base_num = (100 - damping_pct) * graph.SCALE
    ctes = [
        """
        pairs AS (SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
                         's' || CAST(l.l_suppkey AS VARCHAR) AS snode
                  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        edges AS (SELECT cnode AS src, snode AS dst FROM pairs
                  UNION ALL SELECT snode, cnode FROM pairs),
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        r0 AS (SELECT node, {scale} // n AS rank FROM nodes, nn)
        """.format(scale=graph.SCALE)
    ]
    for i in range(1, iters + 1):
        ctes.append(
            """
        c{i} AS (SELECT e.dst AS node, SUM(r.rank // d.deg) AS contrib
                 FROM edges e JOIN deg d ON d.src = e.src
                 JOIN r{prev} r ON r.node = e.src GROUP BY e.dst),
        r{i} AS (SELECT nd.node,
                        {base} // (100 * n)
                          + ({d} * COALESCE(c.contrib, 0)) // 100 AS rank
                 FROM nodes nd CROSS JOIN nn
                 LEFT JOIN c{i} c ON c.node = nd.node)
            """.format(i=i, prev=i - 1, base=base_num, d=damping_pct)
        )
    return "WITH {} SELECT node, CAST(rank AS BIGINT) AS rank FROM r{}".format(
        ",".join(ctes), iters
    )


@query("pagerank_trade_graph", oracle=_pagerank_oracle())
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (2 quantized-integer iterations, d=0.85) over the
    bidirectional customer↔supplier graph induced by lineitem⋈orders.
    Node ids are prefixed ('c'/'s') so the key spaces can't collide."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "cnode"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "snode"
            ),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("cnode").alias("src"), F.col("snode").alias("dst")
    ).union(
        pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    )
    return graph.pagerank(edges, iters=2)


def _ppr_oracle(
    nationkey: int = 7, iters: int = 2, damping_pct: int = 85
) -> str:
    base_num = (100 - damping_pct) * graph.SCALE
    ctes = [
        """
        pairs AS (SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS cnode,
                         's' || CAST(l.l_suppkey AS VARCHAR) AS snode
                  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        edges AS (SELECT cnode AS src, snode AS dst FROM pairs
                  UNION ALL SELECT snode, cnode FROM pairs),
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        seeds AS (SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS node
                  FROM customer WHERE c_nationkey = {nk}),
        sn AS (SELECT COUNT(*) AS ns FROM seeds),
        marked AS (SELECT nd.node,
                          CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_s
                   FROM nodes nd LEFT JOIN seeds s ON s.node = nd.node),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        r0 AS (SELECT node,
                      CASE WHEN is_s = 1 THEN {scale} // ns
                           ELSE CAST(0 AS BIGINT) END AS rank
               FROM marked, sn)
        """.format(scale=graph.SCALE, nk=nationkey)
    ]
    for i in range(1, iters + 1):
        ctes.append(
            """
        c{i} AS (SELECT e.dst AS node, SUM(r.rank // d.deg) AS contrib
                 FROM edges e JOIN deg d ON d.src = e.src
                 JOIN r{prev} r ON r.node = e.src GROUP BY e.dst),
        r{i} AS (SELECT m.node,
                        CASE WHEN m.is_s = 1 THEN {base} // (100 * ns)
                             ELSE CAST(0 AS BIGINT) END
                          + ({d} * COALESCE(c.contrib, 0)) // 100 AS rank
                 FROM marked m CROSS JOIN sn
                 LEFT JOIN c{i} c ON c.node = m.node)
            """.format(i=i, prev=i - 1, base=base_num, d=damping_pct)
        )
    return (
        "WITH {} SELECT node, CAST(rank AS BIGINT) AS rank FROM r{}"
        " WHERE rank > 0".format(",".join(ctes), iters)
    )


@query("ppr_nation_customers", oracle=_ppr_oracle())
def ppr_nation_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the trade graph, restarting on the
    customers of one nation (nationkey 7): ranks measure proximity to
    that nation's customer base — the related-suppliers /
    recommendation reading of the PageRank kernel
    (operators/graph.py:personalized_pagerank), sharing the global
    kernel's exact quantized-integer arithmetic and unrolled-CTE
    oracle.  Zero-rank nodes (unreached within the iteration horizon)
    are dropped on both sides, keeping the output proportional to the
    seeds' neighborhood rather than the whole graph."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "cnode"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "snode"
            ),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("cnode").alias("src"), F.col("snode").alias("dst")
    ).union(
        pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    )
    seeds = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_nationkey") == 7)
        .select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias(
                "node"
            )
        )
    )
    ranks = graph.personalized_pagerank(edges, seeds, iters=2)
    return ranks.where(F.col("rank") > 0)
