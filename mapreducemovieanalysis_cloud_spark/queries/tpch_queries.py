"""TPC-H-shaped headline analytics over the driver tables.

The reference's two pipelines are single join + agg + sort queries
(``MovieRank.java:145-214``, ``MovieRating.java:140-210``); these queries are
the same operator families composed at depth — multi-way joins, selective
filters, group-by with several aggregates, top-k — i.e. the workload a user
of this engine actually runs at 100 TB. Determinism conventions follow
``queries.relational``: money per-row-rounded to integer cents before SUM,
timestamps emitted as formatted strings, every LIMIT backed by a unique
tie-break key.

Scale notes per query are in the docstrings; the common posture:

- filters sit directly on the scans (parquet pushdown / row-group pruning);
- ``nation``/``region`` are always broadcast (KBs at any scale factor);
- fact-fact joins (orders x lineitem) are left to the planner: at sf0.01
  AQE converts them to broadcast, on a cluster they become shuffle joins
  partitioned on the key — no hint is the right hint;
- top-k goes through TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.rounding import (
    round_half_up_long,
)
from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table


def _cents(expr: F.Column) -> F.Column:
    # round_half_up_long == F.round(.).cast("long") value-for-value on the
    # driver data (verified, functions/rounding.py) at ~3.5x the per-row
    # throughput — Q1's four money roundings were 0.69 s of its 0.96 s.
    return round_half_up_long(expr * 100)


_DISC_PRICE = "l_extendedprice * (1 - l_discount)"
_CHARGE = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS sum_qty_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_base_cents,
           CAST(SUM(CAST(ROUND({_DISC_PRICE} * 100) AS BIGINT)) AS BIGINT)
             AS sum_disc_cents,
           CAST(SUM(CAST(ROUND({_CHARGE} * 100) AS BIGINT)) AS BIGINT)
             AS sum_charge_cents,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary): one scan, map-side partial agg into a
    4-group final agg. The shipdate filter pushes to the parquet scan; the
    shuffle carries one row per (flag, status) per partition."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = (
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_cents(F.col("l_quantity"))).alias("sum_qty_cents"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(_cents(disc)).alias("sum_disc_cents"),
            F.sum(_cents(charge)).alias("sum_charge_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey AS l_orderkey,
           CAST(SUM(CAST(ROUND({_DISC_PRICE} * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority AS o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY 1, 3, 4
    ORDER BY revenue_cents DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): selective filters on all three scans,
    two equi-joins, agg, top-10 by revenue (orderkey tie-break). The planner
    sees the filtered sizes (AQE) and picks broadcast vs shuffle join per
    stage — at cluster scale both joins hash-partition on the order key."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_cents(disc)).alias("revenue_cents"))
        .select(
            "l_orderkey",
            "revenue_cents",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier",
    oracle=f"""
    SELECT n.n_name AS n_name,
           CAST(SUM(CAST(ROUND({_DISC_PRICE} * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): six-table join with a same-nation
    constraint. nation/region are explicitly broadcast (constant-size dims);
    the customer->orders->lineitem->supplier chain reuses the planner's
    hash partitioning; the region filter prunes before any fact join."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # FACT-FIRST join order (round-13 optimization): with the dim chain
    # on the left, the planner estimated the (customer x orders) subtree
    # above lineitem's scan size and BROADCAST THE FACT TABLE — a 600k-row
    # hash relation rebuilt on every execution (visible as BuildRight over
    # the lineitem scan in the committed before-plan).  Keeping lineitem
    # as the probe stream lets the size-based planner build the genuinely
    # small sides (filtered orders, customer, supplier) — and at a scale
    # where those stop fitting, the same size logic degrades to SMJ
    # instead of an impossible fact broadcast.  Inner joins commute: the
    # result is identical.
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_cents(disc)).alias("revenue_cents"))
    )


@query(
    "tpch_q18_large_volume",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 230
    )
    SELECT c.c_name AS c_name, c.c_custkey AS c_custkey,
           o.o_orderkey AS o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           CAST(big.sum_qty AS BIGINT) AS sum_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): HAVING over a fact-table agg, then
    join the (now tiny) qualifying set back to orders/customer. The agg
    output after HAVING is small at any scale -> broadcast it into the
    orders join instead of shuffling orders twice. l_quantity is integral,
    so the double SUM is exact and the BIGINT cast lossless."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 230)
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        F.broadcast(big)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            _cents(F.col("o_totalprice")).alias("totalprice_cents"),
            F.col("sum_qty").cast("long").alias("sum_qty"),
        )
    )


@query(
    "tpch_q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(ROUND({_DISC_PRICE} * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
    JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): cross-nation trade volume by year.
    Both nation copies broadcast; the inequality filter runs after the
    broadcast probes (no join explosion — it is a post-join predicate on
    two already-resolved dimension columns)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("cust_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # fact-first join order — same rationale (and before-plan evidence)
    # as tpch_q5: keep the filtered lineitem as the probe stream so the
    # planner never builds a fact-sized broadcast
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .where(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_cents(disc)).alias("revenue_cents"))
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           CAST(SUM(CAST(ROUND({_DISC_PRICE} * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           n.n_name AS n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY 1, 2, 4
    ORDER BY revenue_cents DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): quarter of orders, returned lines only,
    top-20 customers by lost revenue. Top-k plans as TakeOrderedAndProject
    (per-partition heaps of 20, no global sort)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # fact-first join order (round-13 optimization, the tpch_q5 pattern):
    # dim-chain-first made the planner BROADCAST THE FILTERED FACT (150k
    # returned lines) to probe a ~5k-row quarter of orders — build and
    # probe exactly backwards.  With lineitem as the probe stream the
    # size-based planner builds the quarter-of-orders and customer sides.
    # Inner joins commute: identical result.
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_cents(disc)).alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority AS o_orderpriority,
           COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY 1
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking): EXISTS as inner join +
    count(DISTINCT o_orderkey). The direct LeftSemi decorrelation forces
    BuildRight, i.e. a broadcast HASH RELATION OVER THE WHOLE LINEITEM
    PROJECTION (600 k rows at sf0.1 — a single-threaded build; the r13
    bench read q4 0.48 -> 0.61 s and a 0.82 core-scaling factor, the
    build's serial signature). The inner form lets the planner build the
    3-month filtered ORDERS side instead and probe lineitem; o_orderkey
    is unique in orders, so counting distinct matched keys per priority
    is exactly the EXISTS count. l_shipdate > '1997-01-01' is implied by
    the correlated predicate (l_shipdate > o_orderdate >= 1997-01-01) and
    stated explicitly so it reaches the lineitem scan as a pushed filter
    — the optimizer does not infer constant bounds through a non-equi
    join condition."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .where(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
        )
        .groupBy("o_orderpriority")
        .agg(F.count_distinct(F.col("o_orderkey")).alias("order_count"))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change) — deliberately built through the
    ``spark.sql`` ENTRY PATH (SURVEY §3.4 entry point b): tables registered
    as temp views by ``register_views``, query text handed to Catalyst
    verbatim. Plan-wise it is the best case for pushdown: every predicate
    reaches the parquet scan and the aggregate is a single map-side partial
    + 1-row final."""
    from mapreducemovieanalysis_cloud_spark.sources.readers import (
        register_views,
    )

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
        """
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
             CAST(ROUND({_DISC_PRICE} * 100) AS BIGINT) AS vol_cents,
             n2.n_name AS supp_nation
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
        AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'CHINA' THEN vol_cents
                         ELSE 0 END) AS BIGINT) AS china_cents,
           CAST(SUM(vol_cents) AS BIGINT) AS total_cents,
           SUM(CASE WHEN supp_nation = 'CHINA' THEN vol_cents ELSE 0 END)
             / SUM(vol_cents) AS mkt_share
    FROM vol GROUP BY 1
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): eight-way join, share = conditional
    sum / total sum per year. Both sums are exact cents ints, so the final
    share is ONE IEEE division — engine-independent. nation/region/part-dim
    sides broadcast; fact chain left to AQE."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("supp_nation"),
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _cents(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("vol_cents"),
            "supp_nation",
        )
    )
    china = F.when(F.col("supp_nation") == "CHINA", F.col("vol_cents")).otherwise(
        F.lit(0)
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.sum(china).alias("china_cents"),
            F.sum("vol_cents").alias("total_cents"),
        )
        .select(
            "o_year",
            "china_cents",
            "total_cents",
            (F.col("china_cents") / F.col("total_cents")).alias("mkt_share"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count, COUNT(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 (customer distribution, sans the comment-regex exclusion —
    o_comment is not in this schema): LEFT OUTER join so zero-order
    customers survive with count 0, then a histogram of the counts. Two
    shuffles total (custkey, then c_count); both aggregates are map-side
    partial."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "tpch_q14_promo_effect",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                    THEN CAST(ROUND({_DISC_PRICE} * 100) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS promo_cents,
           CAST(SUM(CAST(ROUND({_DISC_PRICE} * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                       THEN CAST(ROUND({_DISC_PRICE} * 100) AS BIGINT)
                       ELSE 0 END) / SUM(CAST(ROUND({_DISC_PRICE} * 100)
                                              AS BIGINT)) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): one month of lineitem joined to part
    (broadcast — part is the small side after pruning to two columns),
    promo share of revenue as exact-cents conditional sum over total."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc_cents = _cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    promo = F.when(
        F.col("p_type").startswith("PROMO"), disc_cents
    ).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).alias("promo_cents"),
            F.sum(disc_cents).alias("total_cents"),
        )
        .select(
            "promo_cents",
            "total_cents",
            (
                F.lit(100.0)
                * F.col("promo_cents")
                / F.col("total_cents")
            ).alias("promo_revenue"),
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(ROUND({_DISC_PRICE} * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY 1)
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
           r.total_cents AS total_cents
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_cents = (SELECT MAX(total_cents) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarter revenue per supplier, keep the
    max. The scalar max is a 1-row broadcast cross join (no second scan of
    lineitem, no window over the whole agg); cents ints make the MAX
    tie-set exact."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_cents(disc)).alias("total_cents")
    )
    top = revenue.agg(F.max("total_cents").alias("max_cents"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(top))
        .where(F.col("total_cents") == F.col("max_cents"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_cents")
    )


@query(
    "tpch_q17_small_quantity",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey AS a_partkey,
             0.2 * AVG(l_quantity) AS threshold
      FROM lineitem GROUP BY 1)
    SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents,
           SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) / 700.0
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.a_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < a.threshold
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue; p_container is not in this
    schema, so the part filter is brand-only): the correlated avg decorrelates
    into a per-part aggregate joined back to lineitem. Quantities are
    integral doubles, so per-part sums are exact in IEEE and 0.2*avg is
    reproducible bit-for-bit. At scale both sides partition on partkey —
    one co-located shuffle each."""
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.lit(0.2) * (F.sum("l_quantity") / F.count(F.lit(1)))
        ).alias("threshold")
    )
    p = load_table(spark, sf_dir, "part").where(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_qty, F.col("a_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("threshold"))
        .agg(
            F.sum(_cents(F.col("l_extendedprice"))).alias("total_cents")
        )
        .select(
            "total_cents",
            (F.col("total_cents") / F.lit(700.0)).alias("avg_yearly"),
        )
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST(ROUND({_DISC_PRICE} * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#9' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue; p_container is not in this schema, so
    the disjuncts use brand+size+quantity): a disjunctive join predicate the
    planner keeps as an equi-join on partkey plus a post-join OR filter —
    the join itself never degenerates to a cross product."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & (q >= 1) & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 25)
            & (q >= 10) & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(1, 50)
            & (q >= 20) & (q <= 30)
        )
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.sum(_cents(disc)).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q12_shipmode_priority",
    oracle="""
    SELECT l.l_returnflag AS ship_mode,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('A','R')
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority; l_shipmode /
    l_commitdate / l_receiptdate are not in this schema, so the mode column
    is l_returnflag and "shipped late" is l_shipdate > o_orderdate + 60
    days — a cross-table predicate like the original's commit/receipt
    comparison): fact-fact join with the year filter pushed to the lineitem
    scan, two conditional counts in one pass. The late-ship predicate
    evaluates inside the join stage (both operands post-join), adding no
    extra shuffle."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(
            F.col("l_shipdate")
            > F.timestamp_add("DAY", F.lit(60), F.col("o_orderdate"))
        )
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q21_suppliers_waiting",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    SELECT s.s_name AS s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting; l_commitdate /
    l_receiptdate are not in this schema, so "late" is l_shipdate >
    o_orderdate + 90 days on finalized orders): the EXISTS decorrelates to
    a LEFT SEMI self-join on the fact table and the NOT EXISTS to a LEFT
    ANTI join against the late set — the sole-late-supplier-per-multi-
    supplier-order pattern. All three fact legs hash-partition on
    l_orderkey, so at cluster scale the semi/anti probes are co-located
    with the late set's own shuffle; top-k rides TakeOrderedAndProject
    with s_name as the unique tie-break."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            F.col("l_shipdate")
            > F.timestamp_add("DAY", F.lit(90), F.col("o_orderdate"))
        )
        .select("l_orderkey", "l_suppkey")
    )
    other = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        late.join(
            other,
            (F.col("o2_orderkey") == F.col("l_orderkey"))
            & (F.col("o2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("o3_orderkey") == F.col("l_orderkey"))
            & (F.col("o3_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


@query(
    "tpch_q22_global_sales",
    oracle="""
    WITH pos AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
             COUNT(*) AS n
      FROM customer
      WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 5, 10, 15, 20))
    SELECT CAST(c.c_nationkey AS INT) AS cntrycode,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS totacctbal_cents
    FROM customer c, pos
    WHERE c.c_nationkey IN (1, 5, 10, 15, 20)
      AND CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.sum_cents
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity; c_phone is not in this schema,
    so country codes are c_nationkey values): customers with above-average
    positive balance and NO orders. The avg comparison is kept in exact
    integer arithmetic (bal_cents·n > sum_cents — no division), the
    no-orders test is a LEFT ANTI join on custkey, and the 1-row aggregate
    broadcasts."""
    codes = [1, 5, 10, 15, 20]
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(codes)
    )
    bal_cents = _cents(F.col("c_acctbal"))
    pos = c.where(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal_cents).alias("sum_cents"), F.count(F.lit(1)).alias("n")
    )
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(F.broadcast(pos))
        .where(bal_cents * F.col("n") > F.col("sum_cents"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal_cents).alias("totacctbal_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Adapted TPC-H queries.  The driver schema has NO partsupp table (and no
# p_mfgr / s_address columns), so Q2 / Q9 / Q11 / Q16 / Q20 cannot be posed
# in their standard form.  Each adaptation below keeps the query's SIGNATURE
# OPERATOR PATTERN — the thing a user of the reference engine would actually
# exercise — and substitutes the distinct (l_partkey, l_suppkey) pairs of
# lineitem for the missing partsupp bridge:
#
#   q2  : per-group extremum + join-back (min-cost supplier -> max-acctbal)
#   q9  : 5-way fact/dim join with per-row profit arithmetic, nation x year
#   q11 : group aggregate compared against a global scalar-subquery threshold
#   q16 : anti-join exclusion + COUNT(DISTINCT) over a deduplicated bridge
#   q20 : semi-join chain gated by an aggregated HAVING threshold
# ---------------------------------------------------------------------------


@query(
    "tpch_q2_best_supplier",
    oracle="""
    WITH shipped AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
             CAST(ROUND(s.s_acctbal * 100) AS BIGINT) AS acctbal_cents,
             n.n_name
      FROM shipped sh
      JOIN part p ON sh.l_partkey = p.p_partkey
      JOIN supplier s ON sh.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'LARGE' AND p.p_size <= 10)
    SELECT c.acctbal_cents, c.s_name, c.n_name, c.p_partkey, c.p_name,
           c.s_suppkey
    FROM cand c
    JOIN (SELECT p_partkey, MAX(acctbal_cents) AS best_cents
          FROM cand GROUP BY p_partkey) b
      ON c.p_partkey = b.p_partkey AND c.acctbal_cents = b.best_cents
    ORDER BY c.acctbal_cents DESC, c.p_partkey ASC, c.s_suppkey ASC
    LIMIT 100
    """,
)
def tpch_q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted (minimum-cost supplier; no partsupp table, so the
    bridge is DISTINCT (l_partkey, l_suppkey) and "best" is max s_acctbal in
    integer cents instead of min ps_supplycost).  Signature pattern kept:
    per-group extremum then select the rows attaining it — expressed as a
    window MAX over p_partkey — two shuffles total (bridge dedup + the
    window's hash partitioning) but no second scan or self-join of the
    candidate set (the standard correlated-subquery form would rejoin).  part is
    filtered before the join (type/size push to the scan) and broadcast;
    supplier/nation/region broadcast at any scale.  Ref pattern:
    /root/reference/MovieRank.java:145-214 (join + extremum family)."""
    from pyspark.sql import Window

    p = (
        load_table(spark, sf_dir, "part")
        .where((F.col("p_type") == "LARGE") & (F.col("p_size") <= 10))
        .select("p_partkey", "p_name")
    )
    # Broadcast the FILTERED part dim into the scan before deduplicating:
    # the distinct then shuffles only the ~1/30th of bridge pairs that
    # survive the type/size filter, not every (partkey, suppkey) in the
    # fact table.  (Catalyst won't push a join below an Aggregate itself.)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cand = (
        li
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            _cents(F.col("s_acctbal")).alias("acctbal_cents"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "s_suppkey",
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("best_cents", F.max("acctbal_cents").over(w))
        .where(F.col("acctbal_cents") == F.col("best_cents"))
        .drop("best_cents")
        .orderBy(
            F.col("acctbal_cents").desc(),
            F.col("p_partkey").asc(),
            F.col("s_suppkey").asc(),
        )
        .limit(100)
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(ROUND({_DISC_PRICE} * 100) AS BIGINT)
                    - CAST(ROUND(p.p_retailprice * l.l_quantity * 100)
                           AS BIGINT)) AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (product-type profit; ps_supplycost does not exist,
    so per-line cost is p_retailprice * l_quantity — margin vs retail).
    Signature pattern kept: five-way join fanning out from lineitem with
    per-row profit arithmetic rolled up by nation x year.  Both profit terms
    are rounded to integer cents PER ROW before the SUM, so the aggregate is
    exact int64 and summation order can't flip the hash.  The p_name LIKE
    filter lands on the part scan and the filtered part side broadcasts;
    orders x lineitem is left to AQE (shuffle join on a cluster)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cost = F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(_cents(disc_price) - _cents(cost)).alias("profit_cents"))
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
    WITH natline AS (
      SELECT l.l_partkey,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS val_cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3')
    SELECT l_partkey AS p_partkey,
           CAST(SUM(val_cents) AS BIGINT) AS value_cents
    FROM natline
    GROUP BY l_partkey
    HAVING SUM(val_cents) * 500 > (SELECT SUM(val_cents) FROM natline)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (important stock identification; ps_availqty /
    ps_supplycost do not exist, so "value" is shipped l_extendedprice from
    NATION_3's suppliers).  Signature pattern kept: group aggregate filtered
    against a GLOBAL scalar-subquery threshold (> total / 500).  The
    comparison stays in exact int64 (group_cents * 500 > total_cents — no
    division), the 1-row total broadcasts, and the nation-filtered supplier
    dim broadcasts into the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_3"
    )
    natline = (
        li.join(
            F.broadcast(
                s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("l_partkey", _cents(F.col("l_extendedprice")).alias("val_cents"))
    )
    per_part = natline.groupBy("l_partkey").agg(
        F.sum("val_cents").alias("value_cents")
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value_cents") * 500 > F.col("total_cents"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
    )


@query(
    "tpch_q16_supplier_count",
    oracle="""
    WITH shipped AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS INT) AS p_size,
           COUNT(DISTINCT sh.l_suppkey) AS supplier_cnt
    FROM shipped sh
    JOIN part p ON sh.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
      AND sh.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted (parts/supplier relationship; partsupp replaced by
    DISTINCT (l_partkey, l_suppkey), the "customer complaints" supplier
    exclusion by s_acctbal < 0).  Signature pattern kept: NOT IN -> LEFT
    ANTI join against the excluded suppliers, then COUNT(DISTINCT suppkey)
    per part descriptor.  The brand/size filters push to the part scan; both
    the filtered part dim and the tiny excluded-supplier set broadcast.
    Unlike the SQL form's explicit DISTINCT bridge, the Spark plan skips the
    pre-dedup entirely — COUNT(DISTINCT) is insensitive to duplicate
    (partkey, suppkey) pairs, so the only shuffle is the distinct-count
    aggregate itself (expanded to a two-level partial aggregate)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    p = (
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#5")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_promotion_suppliers",
    oracle="""
    WITH redparts AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    qty AS (
      SELECT l.l_suppkey,
             CAST(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_cents
      FROM lineitem l JOIN redparts rp ON l.l_partkey = rp.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l.l_suppkey
      HAVING SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) > 10000)
    SELECT s.s_name, n.n_name, qty.qty_cents
    FROM supplier s
    JOIN qty ON s.s_suppkey = qty.l_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_regionkey IN
          (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
    """,
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (potential part promotion; ps_availqty does not
    exist, so the gate is "shipped more than 100 units of red parts in
    1997").  Signature pattern kept: a semi-join chain — suppliers gated by
    an aggregated HAVING threshold over a filtered part set, then narrowed
    to one region.  redparts broadcasts into the lineitem scan (shipdate
    pushes down), the HAVING output is tiny and broadcasts back onto
    supplier, and the region gate is a broadcast semi through nation."""
    rp = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    qty = (
        li.join(F.broadcast(rp), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).alias("qty_cents"))
        .where(F.col("qty_cents") > 10000)
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_nations = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi"
    )
    return (
        s.join(F.broadcast(qty), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(asia_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_name", "n_name", "qty_cents")
    )
