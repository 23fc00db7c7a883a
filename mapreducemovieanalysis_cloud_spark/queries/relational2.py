"""Advanced relational surface: pivot/unpivot, JSON/map/explode TVFs,
subqueries (correlated scalar, IN), right/cross joins, and the Arrow UDF
showcase (pandas_udf + applyInPandas) — each with a DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.rounding import (
    round_half_up_long,
)

from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table


@query(
    "pivot_returnflag",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END)
                AS BIGINT) AS qty_A,
           CAST(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END)
                AS BIGINT) AS qty_N,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END)
                AS BIGINT) AS qty_R
    FROM lineitem GROUP BY 1
    """,
)
def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: quantity totals per linestatus × returnflag. Explicit pivot
    values keep the plan a single pass (no distinct-values pre-query)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum("l_quantity").cast("long"))
        .withColumnsRenamed({"A": "qty_A", "N": "qty_N", "R": "qty_R"})
    )


@query(
    "unpivot_part",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    """,
)
def unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide numeric columns to (key, metric, value) rows."""
    return load_table(spark, sf_dir, "part").unpivot(
        "p_partkey",
        ["p_size", "p_retailprice"],
        "metric",
        "value",
    )


@query(
    "json_struct",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS k,
           CASE WHEN CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) >= 50
                THEN 'high' ELSE 'low' END AS k_bucket
    FROM events
    """,
)
def json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct (schema-on-read over a JSON column),
    then derived columns. The JVM JSON parser runs inside codegen — no UDF."""
    events = load_table(spark, sf_dir, "events")
    parsed = events.select(
        "event_id",
        F.from_json("props", "struct<k:int>").alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.when(F.col("p.k") >= 50, "high").otherwise("low").alias("k_bucket"),
    )


@query(
    "map_functions",
    oracle="""
    SELECT event_type, 'cnt' AS map_key, CAST(COUNT(*) AS BIGINT) AS map_val
    FROM events GROUP BY 1
    UNION ALL
    SELECT event_type, 'users',
           CAST(COUNT(DISTINCT user_id) AS BIGINT)
    FROM events GROUP BY 1
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map column surface: build map<string,long> per group, then explode
    entries back to rows (map_from_arrays → explode)."""
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("user_id").alias("users"),
    )
    mapped = agg.select(
        "event_type",
        F.map_from_arrays(
            F.array(F.lit("cnt"), F.lit("users")),
            F.array(F.col("cnt"), F.col("users")),
        ).alias("m"),
    )
    return mapped.select(
        "event_type", F.explode("m").alias("map_key", "map_val")
    )


@query(
    "explode_tokens",
    oracle=r"""
    SELECT tok, COUNT(*) AS freq FROM (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents)
    GROUP BY 1
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-valued explode: token frequencies across the corpus (the
    word-count every MapReduce tutorial hand-rolls, as one expression)."""
    from mapreducemovieanalysis_cloud_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


@query(
    "subquery_correlated",
    oracle="""
    SELECT c_custkey, c_nationkey
    FROM customer c
    WHERE c_acctbal > (SELECT ROUND(SUM(c2.c_acctbal), 2) / COUNT(*)
                       FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated by Catalyst into a join):
    customers above their nation's average balance."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey
        FROM customer c
        WHERE c_acctbal > (SELECT ROUND(SUM(c2.c_acctbal), 2) / COUNT(*)
                           FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
      AND o_orderstatus = 'O'
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (planned as a left-semi join)."""
    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'BUILDING')
          AND o_orderstatus = 'O'
        """
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n.n_nationkey AS n_nationkey, n.n_name AS n_name,
           COUNT(s.s_suppkey) AS num_suppliers
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-outer join keeping supplier-less nations."""
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supplier.join(
            nation,
            supplier["s_nationkey"] == nation["n_nationkey"],
            "right",
        )
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("num_suppliers"))
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name AS r_name, s.o_orderstatus AS o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two provably-tiny inputs (dimension enumeration)."""
    region = load_table(spark, sf_dir, "region").select("r_name")
    statuses = (
        load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    )
    return region.crossJoin(statuses)


# ---- Arrow UDF showcase -----------------------------------------------------


def _normalize_udf():
    """Vectorized normalization (Arrow-batched scalar pandas_udf). Built
    lazily: creating a pandas_udf requires an active SparkSession, and the
    driver contract imports this module before one may exist."""

    @F.pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:
        return s.str.strip().str.lower().str.replace(r"\s+", " ", regex=True)

    return normalize


@query(
    "pandas_udf_normalize",
    oracle=r"""
    SELECT doc_id,
           lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm_text
    FROM documents
    """,
)
def pandas_udf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf over Arrow batches — the sanctioned Python escape
    hatch (10-100x over row-at-a-time UDFs). Oracle reproduces the exact
    string transform."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", _normalize_udf()("text").alias("norm_text"))


@query(
    "udtf_char_bigrams",
    oracle="""
    SELECT doc_id, substr(src, i, 2) AS bigram
    FROM (SELECT doc_id, substr(text, 1, 12) AS src FROM documents),
         unnest(generate_series(1, 11)) AS g(i)
    """,
)
def udtf_char_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one row per character bigram of the doc
    prefix — the lateral-join row-expanding UDF shape."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: long, bigram: string")
    class Bigrams:
        def eval(self, doc_id: int, text: str):
            prefix = text[:12]
            for i in range(len(prefix) - 1):
                yield doc_id, prefix[i : i + 2]

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("docs_for_udtf")
    spark.udtf.register("char_bigrams", Bigrams)
    return spark.sql(
        "SELECT b.doc_id, b.bigram "
        "FROM docs_for_udtf d, LATERAL char_bigrams(d.doc_id, d.text) b"
    )


@query(
    "salted_hot_key_agg",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM orders GROUP BY 1
    """,
)
def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation on a deliberately low-cardinality key
    (3 statuses — maximal skew): exact same result as the direct groupBy,
    but no single reducer sees a whole key's rows."""
    from mapreducemovieanalysis_cloud_spark.operators.skew import (
        salted_count_sum_cents,
    )

    return salted_count_sum_cents(
        load_table(spark, sf_dir, "orders"), ["o_orderstatus"], "o_totalprice"
    )


@query(
    "grouped_map_top2",
    oracle="""
    SELECT source, doc_id, n_chars FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    WHERE rn <= 2
    """,
)
def grouped_map_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: top-2 longest docs per source computed in
    pandas per group (the pattern for per-group Python logic that built-ins
    can't express — here deliberately chosen so an oracle CAN check it)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).head(2)

    return docs.groupBy("source").applyInPandas(top2, docs.schema)


@query(
    "pandas_udaf_median",
    oracle="""
    SELECT c_nationkey,
           median(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS median_cents,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY 1
    """,
)
def pandas_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (the UDAF surface): exact median of integer
    cents per nation. Median is not algebraic, so Spark ships each group's
    values to one Arrow batch — fine here because group count is bounded
    (25 nations) and values-per-group fit memory; at 100 TB an unbounded-
    cardinality median would use percentile_approx instead (see
    ``percentile_approx_disc``). Midpoint of two int64 is IEEE-exact, so
    the value matches DuckDB's quantile_cont(0.5) bit-for-bit."""

    @F.pandas_udf("double")
    def median_cents(v: pd.Series) -> float:
        return float(v.median())

    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        # Spark disallows mixing pandas and JVM aggregates in one agg();
        # the count rides along as a second pandas aggregate.
        return len(v)

    customer = load_table(spark, sf_dir, "customer")
    cents = round_half_up_long(F.col("c_acctbal") * 100)
    return (
        customer.select("c_nationkey", cents.alias("cents"))
        .groupBy("c_nationkey")
        .agg(
            median_cents(F.col("cents")).alias("median_cents"),
            n_rows(F.col("cents")).alias("n_customers"),
        )
    )


@query(
    "window_analytics",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           first_value(o_orderkey) OVER w AS first_key,
           last_value(o_orderkey) OVER w AS last_key,
           nth_value(o_orderkey, 2) OVER w AS second_key,
           ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
             AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions (first/last/nth value, ntile) over the
    full-partition frame — unique orderkey ordering keeps every engine's
    result identical."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wo = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
        F.ntile(4).over(wo).alias("quartile"),
    )


@query(
    "sample_deterministic",
    oracle="""
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))
               AS INTEGER) % 10 = 0
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample: md5(key) bucket — the reproducible
    eval-split / debugging-sample operator. Unlike TABLESAMPLE or
    df.sample(seed=...), the selection is a pure function of the KEY, so
    it is stable across engines, partitionings, and reruns, and the same
    row set can be re-derived anywhere (train/test splits that survive
    re-partitioning at 100 TB)."""
    from mapreducemovieanalysis_cloud_spark.functions.hashing import (
        md5_bucket,
    )

    orders = load_table(spark, sf_dir, "orders")
    return orders.where(md5_bucket("o_orderkey", 10) == 0).select(
        "o_orderkey", "o_custkey"
    )


@query(
    "join_range_binned",
    oracle="""
    SELECT n.n_name AS n_name, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(e.value*100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events e JOIN nation n
      ON e.value >= n.n_nationkey * 20.0
     AND e.value <  (n.n_nationkey + 1) * 20.0
    GROUP BY 1
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key) via the binned strategy: events.value
    against per-nation value bands [20k, 20k+20). The oracle is the naive
    inequality join; the engine answers it with bin-exploded equi-join
    (operators/joins.binned_range_join) — shuffled, never a nested-loop
    broadcast at scale."""
    from mapreducemovieanalysis_cloud_spark.operators.joins import (
        binned_range_join,
    )

    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_name",
        (F.col("n_nationkey") * F.lit(20.0)).alias("lo"),
        ((F.col("n_nationkey") + 1) * F.lit(20.0)).alias("hi"),
    )
    joined = binned_range_join(
        events, nation, point_col="value", lo_col="lo", hi_col="hi",
        bin_width=10.0,
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(round_half_up_long(F.col("value") * 100))
        .cast("long")
        .alias("value_cents"),
    )


@query(
    "variant_extract",
    oracle="""
    SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) // 10
                AS INT) AS k_decile,
           COUNT(*) AS n_events,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT))
                AS INT) AS max_k
    FROM events
    GROUP BY 1
    """,
)
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json into the binary
    variant encoding, variant_get typed extraction, then aggregate. The
    shredded variant scales to heterogeneous JSON where a fixed
    from_json schema can't; for the flat {"k": int} props both plans are
    codegen'd scans."""
    events = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        events.select(k.alias("k"))
        # `div`, not floor(k/10): DuckDB's `//` truncates toward zero
        # (probed: -7//10 = 0, -17//10 = -1), and Spark's `div` matches;
        # floor() would diverge for negative k.
        .groupBy(F.expr("k div 10").cast("int").alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("k").alias("max_k"),
        )
    )


def _cms_oracle(depth: int = 3, width: int = 64, k: int = 10) -> str:
    def bucket(i: int, key: str = "user_id") -> str:
        return (
            f"CAST(('0x' || substr(md5('{i}:' || CAST({key} AS VARCHAR)), 1, 4))"
            f" AS INTEGER) % {width}"
        )

    cells = "\n      UNION ALL ".join(
        f"SELECT {i} AS row_idx, {bucket(i)} AS bucket FROM events"
        for i in range(depth)
    )
    probes = "\n      UNION ALL ".join(
        f"SELECT user_id, true_count, {i} AS row_idx, {bucket(i)} AS bucket"
        " FROM keys"
        for i in range(depth)
    )
    return f"""
    WITH cells AS ({cells}),
    cms AS (SELECT row_idx, bucket, COUNT(*) AS cell_count
            FROM cells GROUP BY 1, 2),
    keys AS (SELECT user_id, COUNT(*) AS true_count FROM events GROUP BY 1),
    probes AS ({probes}),
    est AS (SELECT p.user_id, p.true_count,
                   CAST(MIN(c.cell_count) AS BIGINT) AS est_count
            FROM probes p JOIN cms c
              ON c.row_idx = p.row_idx AND c.bucket = p.bucket
            GROUP BY 1, 2)
    SELECT user_id, true_count, est_count FROM est
    ORDER BY est_count DESC, user_id ASC LIMIT {k}
    """


@query("cms_heavy_hitters", oracle=_cms_oracle())
def cms_heavy_hitters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heavy-hitter users by count-min-sketch estimate (d=3, w=64),
    exact count alongside — the sketch aggregates the stream into d·w
    cells so the hot-key question never needs a full-domain groupBy."""
    from mapreducemovieanalysis_cloud_spark.operators.aggregates import (
        cms_heavy_hitters,
    )

    return cms_heavy_hitters(
        load_table(spark, sf_dir, "events"), "user_id", depth=3, width=64, k=10
    )


def _profile_oracle(cols: list[str]) -> str:
    parts = [
        f"""
        SELECT '{c}' AS column_name,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM orders
        """
        for c in cols
    ]
    return " UNION ALL ".join(parts)


_PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


@query("profile_orders", oracle=_profile_oracle(_PROFILE_COLS))
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-gate data-quality profile of the orders table: null/distinct
    counts and min/max per column, one scan for all metrics (stack()
    unpivot of a single aggregate row)."""
    from mapreducemovieanalysis_cloud_spark.operators.aggregates import (
        profile_columns,
    )

    return profile_columns(
        load_table(spark, sf_dir, "orders"), _PROFILE_COLS
    )
