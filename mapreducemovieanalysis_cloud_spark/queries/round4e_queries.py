"""Round-4 fifth wave: sequence-transition analytics and 2-D binning —
the Markov transition matrix behind funnel/journey analysis and the
heatmap histogram behind feature cross-distribution profiling.

Both are exact-integer end to end: transition probabilities in milli
units over int64 counts, bins by integer division of cents/units.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

# ---- event transition matrix -------------------------------------------------


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events),
    t AS (SELECT src, dst, COUNT(*) AS n_transitions
          FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2),
    r AS (SELECT src, SUM(n_transitions) AS row_n FROM t GROUP BY 1)
    SELECT t.src, t.dst,
           CAST(t.n_transitions AS BIGINT) AS n_transitions,
           CAST((t.n_transitions * 1000) // r.row_n AS BIGINT) AS p_milli
    FROM t JOIN r ON t.src = r.src
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: (src, dst, count, row-normalized probability in milli) —
    the journey-analysis/next-action-model statistic funnels are a
    special case of.

    Plan: one window pass keyed on the user (LEAD over (ts, tiebreak) —
    the shuffle carries user-partitioned events once), then the matrix
    aggregates to event-type² rows and row-normalizes ON THAT tiny table
    via a same-key join. No per-user arrays materialize — a hot user
    costs a bigger sort partition, not executor memory."""
    seq = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("src"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("dst"),
    )
    t = (
        seq.where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .localCheckpoint(eager=False)
    )
    r = t.groupBy(F.col("src").alias("__s")).agg(
        F.sum("n_transitions").alias("row_n")
    )
    return t.join(r, t["src"] == r["__s"]).select(
        "src",
        "dst",
        F.col("n_transitions").cast("long").alias("n_transitions"),
        F.expr("(n_transitions * 1000) div row_n").alias("p_milli"),
    )


# ---- 2-D histogram -----------------------------------------------------------

_H2_PRICE_W = 10_000  # o_totalprice bin width (currency units)
_H2_QTY_W = 10  # per-order line-count ... quantity bin width


@query(
    "histogram2d_price_qty",
    oracle=f"""
    WITH j AS (SELECT o.o_totalprice AS price, l.l_quantity AS qty
               FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
    SELECT CAST(CAST(FLOOR(price) AS BIGINT) // {_H2_PRICE_W} AS INT)
             AS price_bin,
           CAST(CAST(FLOOR(qty) AS BIGINT) // {_H2_QTY_W} AS INT) AS qty_bin,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM j GROUP BY 1, 2
    """,
)
def histogram2d_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D fixed-width histogram of (order total price x line quantity) —
    the cross-distribution heatmap of feature profiling, exact integer
    binning on both axes.

    Plan: one key-partitioned equi-join (orders⋈lineitem — the bucketed
    layout removes even that shuffle where it recurs), then a single
    aggregate whose output is bins_x × bins_y rows — bounded by the bin
    grid at any data size, with map-side partials doing the heavy
    collapse."""
    w_p, w_q = _H2_PRICE_W, _H2_QTY_W
    j = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .join(
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_quantity"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
    )
    return (
        j.select(
            F.expr(
                f"CAST(CAST(FLOOR(o_totalprice) AS BIGINT) div {w_p} AS INT)"
            ).alias("price_bin"),
            F.expr(
                f"CAST(CAST(FLOOR(l_quantity) AS BIGINT) div {w_q} AS INT)"
            ).alias("qty_bin"),
        )
        .groupBy("price_bin", "qty_bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
