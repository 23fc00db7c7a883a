"""Round-4 seventh wave: distribution/shape statistics — the 2-D Pareto
skyline, grouped Gini concentration, Benford first-digit profile, lag-1
autocorrelation per key, Shannon entropy per slice, and the chi-square
independence cell table.

Exactness discipline (as waves 1-6): counts/ranks/cents are int64; the
float finishes (Gini/Pearson closed forms, p·ln p, Benford's ln ratio,
chi-square cell terms) are IDENTICAL scalar double expressions on
identical integer operands micro-rounded once — and where a statistic
sums per-cell doubles (entropy), the term count is slice-bounded, the
PSI precedent."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

# ---- 2-D Pareto skyline ------------------------------------------------------


@query(
    "skyline_qty_price",
    oracle="""
    WITH pts AS (SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS qty,
                        MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                          AS price_cents
                 FROM lineitem GROUP BY 1)
    SELECT qty, price_cents FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts o
      WHERE o.qty >= p.qty AND o.price_cents <= p.price_cents
        AND (o.qty > p.qty OR o.price_cents < p.price_cents))
    """,
)
def skyline_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier over (maximize quantity, minimize line price):
    the line items no buyer can strictly improve on — the skyline
    operator of preference queries (operators/ranking.py:skyline_2d).

    The oracle states the NOT-EXISTS dominance definition on the per-qty
    minima; the engine computes the same set with one distributive
    map-side MIN (y-domain cardinality output) and a single descending
    running-min sweep — no quadratic anti-join anywhere.  Scale: the
    only full pass is the aggregate; the sweep touches y-domain rows."""
    from mapreducemovieanalysis_cloud_spark.operators import ranking

    pts = load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(FLOOR(l_quantity) AS BIGINT)").alias("qty"),
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias(
            "price_cents"
        ),
    )
    return ranking.skyline_2d(pts, "qty", "price_cents")


# ---- grouped Gini concentration ---------------------------------------------


@query(
    "gini_revenue_by_nation",
    oracle="""
    WITH rev AS (SELECT c.c_nationkey AS nk, o.o_custkey AS cust,
                        SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                          AS x
                 FROM orders o JOIN customer c
                   ON c.c_custkey = o.o_custkey
                 GROUP BY 1, 2),
    ranked AS (SELECT nk, x,
                      ROW_NUMBER() OVER (PARTITION BY nk
                                         ORDER BY x, cust) AS i
               FROM rev),
    s AS (SELECT nk, COUNT(*) AS n, SUM(x) AS sx, SUM(i * x) AS six
          FROM ranked GROUP BY 1)
    SELECT n.n_name AS nation, CAST(s.n AS BIGINT) AS n,
           CAST(CASE WHEN sx = 0 THEN NULL ELSE
             ROUND((2.0 * CAST(six AS DOUBLE)
                    - (CAST(s.n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
                   / (CAST(s.n AS DOUBLE) * CAST(sx AS DOUBLE))
                   * 1000000) END AS BIGINT) AS gini_micro
    FROM s JOIN nation n ON n.n_nationkey = s.nk
    """,
)
def gini_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per nation: the Gini coefficient over each
    nation's per-customer order revenue (operators/aggregates.py:
    gini_by_group) — 0 when every customer spends alike, toward 1 when
    one whale holds the book.

    Scale: customer revenue aggregates on the customer key, the rank
    pass sorts within the nation partition, the closed form runs on 25
    rows; the nation dimension broadcasts."""
    from mapreducemovieanalysis_cloud_spark.operators import aggregates

    rev = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey"
                )
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            ).alias("x")
        )
    )
    named = rev.join(
        F.broadcast(
            load_table(spark, sf_dir, "nation").select(
                "n_nationkey", F.col("n_name").alias("nation")
            )
        ),
        F.col("n_nationkey") == F.col("c_nationkey"),
    )
    return aggregates.gini_by_group(named, ["nation"], "x", "o_custkey")


# ---- Benford first-digit profile --------------------------------------------


@query(
    "benford_totalprice",
    oracle="""
    WITH d AS (SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                  AS VARCHAR), 1, 1) AS INT) AS digit
               FROM orders),
    g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1)
    SELECT digit, CAST(n AS BIGINT) AS n,
           CAST((n * 1000) // SUM(n) OVER () AS BIGINT) AS observed_milli,
           CAST(ROUND(ln(1.0 + 1.0 / digit) / ln(10.0) * 1000)
                AS BIGINT) AS benford_milli
    FROM g
    """,
)
def benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit profile of order totals: observed vs
    theoretical milli-frequency per leading digit — the fraud/synthetic-
    data smoke test (fabricated amounts rarely follow log₁₀(1 + 1/d)).

    Scale: one map-side digit aggregate collapses the table to ≤ 9 rows;
    the share normalizer is a window over those 9 rows — no scalar
    broadcast join, no second scan."""
    g = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.expr(
                "CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)"
                " AS STRING), 1, 1) AS INT)"
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy()
    return g.select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.expr("n * 1000").cast("long").alias("__num"),
        F.sum("n").over(w).alias("__tot"),
    ).select(
        "digit",
        "n",
        F.expr("CAST(__num div __tot AS BIGINT)").alias("observed_milli"),
        F.expr(
            "CAST(ROUND(ln(1.0D + 1.0D / digit) / ln(10.0D) * 1000)"
            " AS BIGINT)"
        ).alias("benford_milli"),
    )


# ---- lag-1 autocorrelation per user -----------------------------------------

_ACF_DD = (
    "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_ACF_DY = (
    "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
)
_ACF_COV = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
)


@query(
    "acf1_user_value",
    oracle=f"""
    WITH e AS (SELECT user_id,
                      CAST(ROUND(value * 100) AS BIGINT) AS v,
                      LAG(CAST(ROUND(value * 100) AS BIGINT))
                        OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS pv
               FROM events),
    p AS (SELECT user_id, pv AS x, v AS y FROM e WHERE pv IS NOT NULL),
    s AS (SELECT user_id, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
          FROM p GROUP BY 1)
    SELECT user_id, CAST(n AS BIGINT) AS n,
           CAST(CASE WHEN n < 2 OR {_ACF_DD} = 0 OR {_ACF_DY} = 0
                THEN NULL ELSE
                ROUND({_ACF_COV} / (sqrt({_ACF_DD}) * sqrt({_ACF_DY}))
                      * 1000000) END AS BIGINT) AS corr_micro
    FROM s
    """,
)
def acf1_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each user's value series (Pearson of
    consecutive pairs in (ts, event_id) order) — the persistence /
    mean-reversion statistic of behavioral features (operators/
    aggregates.py:pearson_by_group over a LAG pairing).

    Scale: one user-partitioned window builds the pairs, one
    partial/final HashAggregate computes the six sums — both stages key
    on the user, so the series never crosses partitions."""
    from mapreducemovieanalysis_cloud_spark.operators import aggregates

    v = F.expr("CAST(ROUND(value * 100) AS BIGINT)")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        load_table(spark, sf_dir, "events")
        .select("user_id", v.alias("y"), F.lag(v).over(w).alias("x"))
        .where(F.col("x").isNotNull())
    )
    return aggregates.pearson_by_group(pairs, ["user_id"], "x", "y")


# ---- Shannon entropy per slice ----------------------------------------------


@query(
    "entropy_lang_by_source",
    oracle="""
    WITH g AS (SELECT source, lang, COUNT(*) AS c FROM documents
               GROUP BY 1, 2),
    t AS (SELECT source, SUM(c) AS n, COUNT(*) AS n_langs FROM g
          GROUP BY 1)
    SELECT g.source, CAST(t.n_langs AS BIGINT) AS n_langs,
           CAST(t.n AS BIGINT) AS n_docs,
           CAST(ROUND(SUM(-(CAST(g.c AS DOUBLE) / CAST(t.n AS DOUBLE))
                 * ln(CAST(g.c AS DOUBLE) / CAST(t.n AS DOUBLE)))
                 * 1000000) AS BIGINT) AS entropy_micro
    FROM g JOIN t ON g.source = t.source
    GROUP BY 1, 2, 3
    """,
)
def entropy_lang_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's language mix — the diversity
    gauge of corpus curation (0 = monolingual source; ln(k) = uniform
    over k languages).  The p·ln p terms run the identical double
    expression on integer count ratios in both engines; the per-source
    sum spans language-cardinality terms (PSI precedent).

    Scale: one (source, lang) aggregate, a source-keyed rollup, a
    same-key join — everything after the first aggregate is
    (sources × languages)-bounded."""
    g = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
    ).localCheckpoint(eager=False)
    t = g.groupBy(F.col("source").alias("__src")).agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_langs")
    )
    j = g.join(t, g["source"] == t["__src"])
    p = F.col("c").cast("double") / F.col("n").cast("double")
    return j.groupBy("source").agg(
        F.max("n_langs").cast("long").alias("n_langs"),
        F.max("n").cast("long").alias("n_docs"),
        F.round(F.sum(-p * F.log(p)) * 1_000_000)
        .cast("long")
        .alias("entropy_micro"),
    )


# ---- chi-square independence cells ------------------------------------------


@query(
    "chi2_cells_type_hod",
    oracle="""
    WITH f AS (SELECT event_type,
                      CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
                      COUNT(*) AS o
               FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, hod, o,
                 SUM(o) OVER (PARTITION BY event_type) AS r,
                 SUM(o) OVER (PARTITION BY hod) AS c,
                 SUM(o) OVER () AS n
          FROM f)
    SELECT event_type, hod, CAST(o AS BIGINT) AS o,
           CAST((r * c * 1000) // n AS BIGINT) AS expected_milli,
           CAST(ROUND((CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                       - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
                      * (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                         - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)
                         * CAST(c AS DOUBLE)) * 1000000) AS BIGINT)
             AS contrib_micro
    FROM w
    """,
)
def chi2_cells_type_hod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cell table for event type × hour-of-day:
    observed count, expected count (milli), and the cell's (O−E)²/E
    contribution (micro) — the per-cell view that localizes WHERE a
    dependence lives, not just that the global statistic is large (the
    global χ² is the contrib_micro sum; per-cell output keeps every row
    a single deterministic double expression on integer margins).

    Scale: one aggregate collapses events to the (types × 24) cell
    table; the margin windows run over those cells only — the fact
    table is scanned once and never joined back."""
    f = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.hour("ts").cast("int").alias("hod")
        )
        .agg(F.count(F.lit(1)).alias("o"))
    )
    ww = f.select(
        "event_type",
        "hod",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("r"),
        F.sum("o").over(Window.partitionBy("hod")).alias("c"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    on_minus_rc = (
        "(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)"
        " - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))"
    )
    return ww.select(
        "event_type",
        "hod",
        F.col("o").cast("long").alias("o"),
        F.expr("CAST((r * c * 1000) div n AS BIGINT)").alias(
            "expected_milli"
        ),
        F.expr(
            f"CAST(ROUND({on_minus_rc} * {on_minus_rc}"
            f" / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)"
            f" * CAST(c AS DOUBLE)) * 1000000) AS BIGINT)"
        ).alias("contrib_micro"),
    )
