"""Relational widening (SURVEY §2.2): join family, aggregates, windows,
top-k, set ops, scalar/date/string/array functions — each with a DuckDB oracle.

Determinism conventions (so order-insensitive value hashes match across
engines):

- money/doubles aggregate as cents: ``CAST(ROUND(x*100) AS BIGINT)`` then
  integer SUM — exact under any summation order (raw ``x*100`` is NOT exact:
  19.17*100 = 1916.999...);
- averages use round(sum)/count (see operators.aggregates.exact_avg);
- timestamps are emitted as formatted strings;
- every window/limit has a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.rounding import (
    round_half_up_long,
)

from mapreducemovieanalysis_cloud_spark.operators import joins, windows
from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table


def _cents(col: str) -> F.Column:
    return round_half_up_long(F.col(col) * 100)


# --------------------------------------------------------------------------
# Join family (SURVEY §2.2 row 2)
# --------------------------------------------------------------------------


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           COUNT(o.o_orderkey) AS num_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join keeping order-less customers (count = 0)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        joins.equi_join(
            customer.select("c_custkey", "c_name"),
            orders.select(F.col("o_custkey").alias("c_custkey"), "o_orderkey"),
            on="c_custkey",
            how="left",
        )
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("num_orders"))
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000.0)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with at least one 400k+ order. Semi joins
    shuffle only the key column of the probe side — no payload amplification."""
    customer = load_table(spark, sf_dir, "customer")
    big = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 400000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return joins.equi_join(
        customer.select("c_custkey", "c_name", "c_mktsegment"),
        big,
        on="c_custkey",
        how="left_semi",
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no finished ('F') order."""
    customer = load_table(spark, sf_dir, "customer")
    finished = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return joins.equi_join(
        customer.select("c_custkey", "c_name"), finished, "c_custkey", "left_anti"
    )


@query(
    "join_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS num_customers
               FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS num_suppliers
               FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           c.num_customers AS num_customers,
           s.num_suppliers AS num_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two aggregates (nations seen by customers vs
    suppliers); either side may be null."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("num_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("num_suppliers"))
    )
    joined = c.join(s, c["nk"] == s["nk_s"], "full")
    return joined.select(
        F.coalesce("nk", "nk_s").alias("nationkey"),
        "num_customers",
        "num_suppliers",
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT o.o_orderpriority AS o_orderpriority,
           COUNT(*) AS num_late
    FROM orders o JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY 1
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + theta (range) join: shipments later than 60 days after the
    order date. The equi key keeps it hash-partitionable (joins.range_join)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    joined = joins.range_join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        lineitem.select(
            F.col("l_orderkey").alias("o_orderkey"), "l_shipdate"
        ),
        equi_keys=["o_orderkey"],
        condition=F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("num_late")
    )


@query(
    "join_asof",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_event_id
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT p.event_id AS event_id, p.user_id AS user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           c.click_event_id AS click_event_id
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest prior click by the same user
    (union+window formulation — one shuffle, no range explosion; see
    operators.joins.asof_join)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # one click per (user, ts) so as-of tie-resolution is deterministic
    clicks = (
        events.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    joined = joins.asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts"
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.col("click_event_id_right").alias("click_event_id"),
    )


# --------------------------------------------------------------------------
# Window functions & top-k (SURVEY §2.2 rows 5-6)
# --------------------------------------------------------------------------


@query(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT p_brand, p_partkey, total_qty,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY total_qty DESC, p_partkey ASC) AS rn
      FROM (SELECT p.p_brand AS p_brand, p.p_partkey AS p_partkey,
                   CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2)
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by shipped quantity within each brand (window + filter:
    one exchange on the group key, never a global sort)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    totals = (
        lineitem.select("l_partkey", "l_quantity")
        .join(F.broadcast(part.select("p_partkey", "p_brand")),
              lineitem["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_partkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
    )
    return windows.top_k_per_group(
        totals,
        partition_by=["p_brand"],
        order_by=[F.col("total_qty").desc(), F.col("p_partkey").asc()],
        k=3,
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions per user timeline: lag/lead/cumulative sum
    (cumulative sum in exact cents)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.sum(_cents("value"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_cents"),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS BIGINT) AS win_cents,
           COUNT(*) OVER w AS win_n,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER w AS BIGINT)
             / (100.0 * COUNT(*) OVER w) AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per user (exact integer window sum / count)."""
    events = load_table(spark, sf_dir, "events")
    w = windows.sliding(["user_id"], [F.col("ts"), F.col("event_id")], 2)
    win_cents = F.sum(_cents("value")).over(w)
    win_n = F.count(F.lit(1)).over(w)
    return events.select(
        "event_id",
        "user_id",
        win_cents.alias("win_cents"),
        win_n.alias("win_n"),
        (win_cents / (100.0 * win_n)).alias("moving_avg"),
    )


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 orders by price: plans as TakeOrderedAndProject
    (per-partition heaps, no full sort — the scale-correct form of the
    reference's whole-dataset sorting job, MovieRank.java:182-203)."""
    orders = load_table(spark, sf_dir, "orders")
    return windows.top_k_global(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=100,
    )


# --------------------------------------------------------------------------
# Grouping: distinct / cube / rollup / grouping sets / approx (rows 3-4)
# --------------------------------------------------------------------------


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash aggregate without measures."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
    )


@query(
    "cube_qty",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT) AS total_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — all 2^2 grouping sets in one
    shuffle via Expand."""
    from mapreducemovieanalysis_cloud_spark.operators.aggregates import cube_agg

    return cube_agg(
        load_table(spark, sf_dir, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        {
            "total_qty": F.sum("l_quantity").cast("long"),
            "n": F.count(F.lit(1)),
        },
    )


@query(
    "rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical totals (status → status+priority → grand)."""
    from mapreducemovieanalysis_cloud_spark.operators.aggregates import rollup_agg

    return rollup_agg(
        load_table(spark, sf_dir, "orders"),
        ["o_orderstatus", "o_orderpriority"],
        {
            "n": F.count(F.lit(1)),
            "total_cents": F.sum(_cents("o_totalprice")),
        },
    )


@query(
    "grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the engine's SQL surface (spark.sql)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "approx_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS approx_nd
    FROM orders GROUP BY 1
    """,
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct count — the 100 TB COUNT(DISTINCT). Oracle uses
    the exact count; HLL++ is exact at this cardinality (3), which is the
    point of the check: the sketch degrades gracefully, never the semantics."""
    from mapreducemovieanalysis_cloud_spark.operators.aggregates import (
        approx_distinct as op,
    )

    return op(
        load_table(spark, sf_dir, "orders"),
        ["o_orderpriority"],
        "o_orderstatus",
    )


@query(
    "percentile_quantity",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY 1
    """,
)
def percentile_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (integer-valued measure keeps the
    interpolation bit-exact across engines)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("median_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
    )


@query(
    "percentile_approx_disc",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.5) AS p50_qty,
           quantile_disc(l_extendedprice, 0.9) AS p90_price
    FROM lineitem GROUP BY 1
    """,
)
def percentile_approx_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile (Greenwald-Khanna sketch). At the oracle's
    accuracy=1e6 the sketch is exact and equals DuckDB's discrete quantile;
    at 100 TB the default accuracy bounds memory per group while the full
    sort a true percentile needs never happens."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_quantity", 0.5, 1000000).alias("p50_qty"),
            F.percentile_approx("l_extendedprice", 0.9, 1000000).alias(
                "p90_price"
            ),
        )
    )


# --------------------------------------------------------------------------
# Set operations (row 7)
# --------------------------------------------------------------------------


@query(
    "setops_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setops_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations having both customers and suppliers."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "setops_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setops_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customer nations with no supplier."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)  # EXCEPT (distinct) semantics


@query(
    "setops_union_all",
    oracle="""
    SELECT side, nationkey, COUNT(*) AS n FROM (
      SELECT 'customer' AS side, c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT 'supplier' AS side, s_nationkey AS nationkey FROM supplier
    ) GROUP BY 1, 2
    """,
)
def setops_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + aggregate."""
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"), F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"), F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).groupBy("side", "nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )


# --------------------------------------------------------------------------
# Scalar function surface (row 8): string/date/math/json/array
# --------------------------------------------------------------------------


@query(
    "scalar_functions",
    oracle="""
    SELECT event_id,
           UPPER(event_type) AS etype_upper,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS k,
           CAST(hour(ts) AS INT) AS hr,
           strftime(ts, '%Y-%m-%d') AS date_str,
           CAST(length(props) AS INT) AS props_len,
           event_type || '-' || CAST(user_id AS VARCHAR) AS tag,
           FLOOR(value) AS value_floor,
           ABS(value - 100.0) AS dist_from_100
    FROM events
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math/JSON scalar functions, all JVM-side built-ins (the
    reference's only expressions are string concat and one division,
    MovieRank.java:70, MovieRating.java:98)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.upper("event_type").alias("etype_upper"),
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.hour("ts").alias("hr"),
        F.date_format("ts", "yyyy-MM-dd").alias("date_str"),
        F.length("props").alias("props_len"),
        F.concat_ws("-", "event_type", F.col("user_id").cast("string")).alias(
            "tag"
        ),
        F.floor("value").cast("double").alias("value_floor"),
        F.abs(F.col("value") - 100.0).alias("dist_from_100"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction + monthly aggregation (revives the reference's dead
    timestamp column, SURVEY §1.2)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_cents("o_totalprice")).alias("total_cents"),
        )
    )


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           CAST(length(p_name) AS INT) AS name_len,
           substr(p_name, 1, 5) AS name_prefix,
           reverse(p_brand) AS brand_rev,
           regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
           replace(p_type, 'E', '_') AS type_repl,
           CASE WHEN p_name LIKE '%old%' THEN 1 ELSE 0 END AS has_old
    FROM part
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface over part."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.reverse("p_brand").alias("brand_rev"),
        F.regexp_extract("p_brand", "#(\\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_type", "E", "_").alias("type_repl"),
        F.when(F.col("p_name").like("%old%"), 1).otherwise(0).alias("has_old"),
    )


@query(
    "array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(list_max(embedding) AS DOUBLE) AS max_val,
           CAST(list_min(embedding) AS DOUBLE) AS min_val,
           label
    FROM embeddings
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function surface over the embedding column (size / element_at /
    array_max / array_min — all exact float picks, no fp accumulation)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.array_max("embedding").cast("double").alias("max_val"),
        F.array_min("embedding").cast("double").alias("min_val"),
        "label",
    )


@query(
    "window_trailing_range",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
           AS BIGINT) AS trailing_hour_cents,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
           AS BIGINT) AS trailing_hour_events
    FROM events
    """,
)
def window_trailing_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: trailing one-hour totals per user. Spark's
    rangeBetween is numeric, so the frame runs over microsecond epochs —
    exactly DuckDB's INTERVAL frame on the same instants. One shuffle
    (hash by user), per-user time sort inside the window exec."""
    events = load_table(spark, sf_dir, "events")
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-hour_us, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.sum(round_half_up_long(F.col("value") * 100))
        .over(w)
        .alias("trailing_hour_cents"),
        F.count(F.lit(1)).over(w).alias("trailing_hour_events"),
    )
