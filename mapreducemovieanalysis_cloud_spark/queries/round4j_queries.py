"""Round-4 tenth wave: distribution-drift statistics — two-sample
Kolmogorov–Smirnov per slice, winsorized means, and P50/P95/P99
percentile bands.

Exactness discipline: the KS CDF gap is cross-multiplied int64 counts
(no float CDF exists); winsorization clamps at integer-rank order
statistics (no interpolation exists); the band quantiles ride the
scaled-integer trick — for a rational quantile a/b over ints,
b×percentile is an integer, so ROUND(b·q) is engine-proof (p50 ×2,
p95 ×20, p99 ×100).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

_V = "CAST(ROUND(value * 100) AS BIGINT)"

# ---- two-sample KS drift per event type -------------------------------------


@query(
    "ks_drift_by_type",
    oracle=f"""
    WITH c AS (SELECT event_type, {_V} AS v, COUNT(*) AS c FROM events
               GROUP BY 1, 2),
    t AS (SELECT event_type, SUM(c) AS n_in FROM c GROUP BY 1),
    g AS (SELECT CAST(SUM(n_in) AS BIGINT) AS n_all FROM t),
    vals AS (SELECT DISTINCT v FROM c),
    vtot AS (SELECT v, SUM(cv) OVER (ORDER BY v
                                     ROWS UNBOUNDED PRECEDING) AS cum_all
             FROM (SELECT v, SUM(c) AS cv FROM c GROUP BY 1)),
    grid AS (SELECT vals.v, t.event_type, t.n_in,
                    COALESCE(c.c, 0) AS c
             FROM vals CROSS JOIN t
             LEFT JOIN c ON c.event_type = t.event_type AND c.v = vals.v),
    s AS (SELECT grid.event_type, grid.n_in, grid.v,
                 SUM(grid.c) OVER (PARTITION BY grid.event_type
                                   ORDER BY grid.v
                                   ROWS UNBOUNDED PRECEDING) AS cum_in
          FROM grid)
    SELECT s.event_type, CAST(s.n_in AS BIGINT) AS n_in,
           CAST(g.n_all - s.n_in AS BIGINT) AS n_rest,
           CAST(MAX(ABS(s.cum_in * (g.n_all - s.n_in)
                        - (vtot.cum_all - s.cum_in) * s.n_in))
                * 1000000 // (s.n_in * (g.n_all - s.n_in)) AS BIGINT)
             AS ks_micro
    FROM s JOIN vtot ON vtot.v = s.v CROSS JOIN g
    GROUP BY s.event_type, s.n_in, g.n_all
    """,
)
def ks_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic of each event type's value
    distribution against the rest of the stream (operators/aggregates.py:
    ks_by_group) — the nonparametric drift alarm that sees SHAPE changes
    (bimodality, tail shifts) that mean/variance monitors miss, and the
    distribution-level complement of the binned PSI
    (quality_psi_by_source).

    Scale: the fact collapses to (value, type) counts map-side; every
    window after that runs on the value DOMAIN × type grid, and the
    cross joins broadcast type-cardinality totals."""
    from mapreducemovieanalysis_cloud_spark.operators import aggregates

    return aggregates.ks_by_group(
        load_table(spark, sf_dir, "events"), "event_type", F.expr(_V)
    )


# ---- winsorized mean per order priority -------------------------------------


@query(
    "winsorized_orders_by_priority",
    oracle="""
    WITH v AS (SELECT o_orderpriority AS pri,
                      CAST(ROUND(o_totalprice * 100) AS BIGINT) AS x
               FROM orders),
    r AS (SELECT pri, x,
                 ROW_NUMBER() OVER (PARTITION BY pri ORDER BY x) AS rn,
                 COUNT(*) OVER (PARTITION BY pri) AS n
          FROM v),
    kk AS (SELECT pri, x, rn, n, n * 5 // 100 AS k FROM r),
    b AS (SELECT pri, x, n, k,
                 MAX(CASE WHEN rn = k + 1 THEN x END)
                   OVER (PARTITION BY pri) AS lo,
                 MAX(CASE WHEN rn = n - k THEN x END)
                   OVER (PARTITION BY pri) AS hi
          FROM kk)
    SELECT pri AS o_orderpriority, CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS k,
           CAST(SUM(x) * 1000 // n AS BIGINT) AS mean_cents_milli,
           CAST(SUM(LEAST(GREATEST(x, lo), hi)) * 1000 // n AS BIGINT)
             AS winsorized_mean_cents_milli
    FROM b GROUP BY pri, n, k
    """,
)
def winsorized_orders_by_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """5% winsorized mean of order totals per priority class (operators/
    aggregates.py:winsorized_mean): the ⌊n/20⌋ smallest and largest
    totals clamp to exact integer-rank order statistics before the mean
    — the bounded-influence average whose clamp bounds involve no
    quantile interpolation at all.

    Scale: one hash exchange on the priority key (rank window, totals
    windows, and final aggregate share the partitioning)."""
    from mapreducemovieanalysis_cloud_spark.operators import aggregates

    return aggregates.winsorized_mean(
        load_table(spark, sf_dir, "orders"),
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"),
    )


# ---- P50/P95/P99 bands per (type, hour-of-day) ------------------------------


@query(
    "percentile_bands_type_hod",
    oracle=f"""
    SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(quantile_cont({_V}, 0.5) * 2) AS BIGINT) AS p50_x2,
           CAST(ROUND(quantile_cont({_V}, 0.95) * 20) AS BIGINT) AS p95_x20,
           CAST(ROUND(quantile_cont({_V}, 0.99) * 100) AS BIGINT) AS p99_x100
    FROM events GROUP BY 1, 2
    """,
)
def percentile_bands_type_hod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P50/P95/P99 value bands per (event type, hour of day) — the
    latency-band rollup of metrics pipelines, in scaled-integer
    exactness (operators/aggregates.py:percentile_bands): for rational
    quantile a/b over ints, b×percentile is integral, so ×2/×20/×100
    shipping makes the interpolated quantiles engine-proof.

    Scale: one partial/final aggregate on the (type, hod) grid — output
    is domain-bounded at types × 24 rows."""
    from mapreducemovieanalysis_cloud_spark.operators import aggregates

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("int").alias("hod"),
        F.col("value"),
    )
    return aggregates.percentile_bands(
        ev, ["event_type", "hod"], F.expr(_V)
    )
