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
