"""Round-4 eighth wave: ordered-series kernels — CUSUM change-point
excursion, time-weighted average, trailing exact median, OHLC candle
bars, sliding 24 h distinct reach, consecutive-day streaks, and the MAD
robust-outlier profile.

Exactness discipline (waves 1-7): cents/epoch units/ranks are int64
end-to-end; the only doubles are (a) single scalar divisions on exact
integer sums micro/milli-rounded once, and (b) medians via the exact
``2×median`` integer trick — 2·median of an int multiset is the doubled
middle value or the sum of the two middles, so ROUND(2·median) is
engine-interpolation-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

_V = "CAST(ROUND(value * 100) AS BIGINT)"

# ---- CUSUM max excursion per user -------------------------------------------


@query(
    "cusum_user_value",
    oracle=f"""
    WITH v AS (SELECT user_id, {_V} AS v,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS k,
                      SUM({_V}) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS s
               FROM events),
    t AS (SELECT user_id, COUNT(*) AS n, SUM(v) AS tot FROM v GROUP BY 1),
    d AS (SELECT v.user_id, t.n, v.k,
                 ABS(t.n * v.s - v.k * t.tot) AS ad
          FROM v JOIN t USING (user_id)),
    r AS (SELECT user_id, n, k, ad,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ad DESC, k) AS rk
          FROM d)
    SELECT user_id, CAST(n AS BIGINT) AS n,
           CAST(ad AS BIGINT) AS excursion_n_cents,
           CAST(k AS BIGINT) AS at_k
    FROM r WHERE rk = 1
    """,
)
def cusum_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongest level-shift localization per user: the maximum CUSUM
    excursion of the value series, n-scaled into pure int64 (operators/
    series.py:cusum_max_excursion) — Page's change-point statistic
    without a single float until none at all.

    Scale: running-sum window + two same-key aggregates, all clustered
    on user_id; |D_k| <= n²·max_cents stays in int64 to ~10⁶-row series."""
    from mapreducemovieanalysis_cloud_spark.operators import series

    return series.cusum_max_excursion(load_table(spark, sf_dir, "events"))


# ---- time-weighted average per user -----------------------------------------


@query(
    "twap_user_value",
    oracle=f"""
    WITH e AS (SELECT user_id, {_V} AS v,
                      epoch_us(ts) // 1000 AS ms,
                      LEAD(epoch_us(ts) // 1000)
                        OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS next_ms
               FROM events),
    seg AS (SELECT user_id, v, next_ms - ms AS dt FROM e
            WHERE next_ms IS NOT NULL)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(ROUND(CAST(SUM(v * dt) AS DOUBLE)
                      / CAST(SUM(dt) AS DOUBLE) * 1000) AS BIGINT)
             AS twap_cents_milli
    FROM seg GROUP BY 1
    """,
)
def twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-weighted value level per user (TWAP): each observation
    holds until its successor; the weight is the hold in epoch ms
    (operators/series.py:time_weighted_avg).  The arithmetic mean
    over-weights bursts of short-lived readings; TWAP is the level a
    sampler polling at fixed intervals would converge to.

    Scale: one lead() window + one aggregate, both keyed on user_id."""
    from mapreducemovieanalysis_cloud_spark.operators import series

    return series.time_weighted_avg(load_table(spark, sf_dir, "events"))


# ---- trailing exact median per user -----------------------------------------


@query(
    "rolling_median_value",
    oracle=f"""
    SELECT event_id, user_id, {_V} AS v_cents,
           CAST(ROUND(2 * median({_V})
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
                AS BIGINT) AS med2_cents
    FROM events
    """,
)
def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-5 median of each user's value series, as 2×median
    so even-frame interpolation can never split engines (operators/
    series.py:rolling_median) — the robust local level that one spiked
    reading cannot move, unlike the moving average (window_moving_avg).

    Scale: one ROWS-frame window clustered on user_id; the frame buffer
    is 5 values regardless of series length."""
    from mapreducemovieanalysis_cloud_spark.operators import series

    return series.rolling_median(load_table(spark, sf_dir, "events"))


# ---- hourly OHLC bars per event type ----------------------------------------


@query(
    "ohlc_hourly_by_type",
    oracle=f"""
    WITH e AS (SELECT event_type,
                      epoch_us(ts) // 3600000000 AS h,
                      {_V} AS v, ts, event_id
               FROM events),
    r AS (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY event_type, h
                                    ORDER BY ts, event_id) AS ra,
                 ROW_NUMBER() OVER (PARTITION BY event_type, h
                                    ORDER BY ts DESC, event_id DESC) AS rd
          FROM e)
    SELECT event_type,
           strftime(make_timestamp(h * 3600000000),
                    '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN ra = 1 THEN v END) AS BIGINT) AS open_cents,
           CAST(MAX(v) AS BIGINT) AS high_cents,
           CAST(MIN(v) AS BIGINT) AS low_cents,
           CAST(MAX(CASE WHEN rd = 1 THEN v END) AS BIGINT) AS close_cents
    FROM r GROUP BY 1, 2
    """,
)
def ohlc_hourly_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candle bars per event type (operators/series.py:
    ohlc_bars): open/close picked by the (ts, event_id) total order
    via min_by/max_by inside ONE aggregate — where the oracle needs two
    row_number passes, the engine's plan is a single partial/final
    HashAggregate on (type, hour).

    Scale: output is (types × occupied hours)-bounded; min_by partials
    are O(1) per group, so map-side combine collapses the fact volume."""
    from mapreducemovieanalysis_cloud_spark.operators import series

    return series.ohlc_bars(load_table(spark, sf_dir, "events"))


# ---- sliding 24 h distinct reach --------------------------------------------


@query(
    "sliding_reach_by_type",
    oracle="""
    WITH e AS (SELECT event_id, event_type,
                      epoch_us(ts) // 1000000 AS sec, user_id
               FROM events)
    SELECT event_id, event_type, CAST(sec AS BIGINT) AS sec,
           CAST(COUNT(DISTINCT user_id)
                OVER (PARTITION BY event_type ORDER BY sec
                      RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS reach
    FROM e
    """,
)
def sliding_reach_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24 h distinct-user reach per event type at every event —
    a RANGE frame over integer epoch seconds, so same-second rows are
    frame peers in both engines and the count is a pure function of
    (type, second) (operators/series.py:sliding_distinct).

    Scale: exact tier; the frame set is bounded by one window span's
    active users per type.  The 100 TB tiers are the streaming
    watermarked variant or an HLL sketch column (docstring)."""
    from mapreducemovieanalysis_cloud_spark.operators import series

    return series.sliding_distinct(load_table(spark, sf_dir, "events"))


# ---- consecutive-day streaks ------------------------------------------------


@query(
    "streaks_user_days",
    oracle="""
    WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                  FROM events),
    isl AS (SELECT user_id,
                   d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                               ORDER BY d) AS INTEGER)
                     AS anchor
            FROM days),
    runs AS (SELECT user_id, anchor, COUNT(*) AS run FROM isl
             GROUP BY 1, 2)
    SELECT user_id, CAST(SUM(run) AS BIGINT) AS n_active_days,
           CAST(MAX(run) AS BIGINT) AS longest_streak
    FROM runs GROUP BY 1
    """,
)
def streaks_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day run per user plus total active
    days — the gaps-and-islands statistic via the date-minus-rank anchor
    (operators/series.py:longest_daily_streak).

    Scale: the fact table collapses to (user, date) before any window;
    everything after runs on users × active-days rows."""
    from mapreducemovieanalysis_cloud_spark.operators import series

    return series.longest_daily_streak(load_table(spark, sf_dir, "events"))


# ---- MAD robust-outlier profile ---------------------------------------------


@query(
    "mad_outliers_by_type",
    oracle=f"""
    WITH v AS (SELECT event_type, {_V} AS x FROM events),
    med AS (SELECT event_type,
                   CAST(ROUND(2 * median(x)) AS BIGINT) AS med2_cents
            FROM v GROUP BY 1),
    dev AS (SELECT v.event_type, med.med2_cents,
                   ABS(2 * v.x - med.med2_cents) AS dev2
            FROM v JOIN med USING (event_type)),
    mad AS (SELECT event_type, med2_cents,
                   CAST(ROUND(2 * median(dev2)) AS BIGINT) AS mad4_cents,
                   COUNT(*) AS n
            FROM dev GROUP BY 1, 2)
    SELECT m.event_type, m.med2_cents, m.mad4_cents,
           CAST(m.n AS BIGINT) AS n,
           CAST(SUM(CASE WHEN 2 * d.dev2 > 3 * m.mad4_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY 1, 2, 3, 4
    """,
)
def mad_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion PROFILE per event type: exact median (2×),
    exact MAD (4×), and the outlier count beyond 3·MAD (operators/
    aggregates.py:mad_outlier_stats).  Companion to the row-level gate
    ``outliers_value_mad`` (round3), which LISTS the outlying rows: the
    profile is the monitoring/drift view (types × 5 columns), the gate
    is the cleaning view — and the profile's plan is ONE exchange (both
    medians ride same-partition windows) vs the gate's
    aggregate+broadcast+rescan.

    Scale: one hash exchange on the type; the gate is pure int64."""
    from mapreducemovieanalysis_cloud_spark.operators import aggregates

    return aggregates.mad_outlier_stats(
        load_table(spark, sf_dir, "events"),
        "event_type",
        F.expr(_V),
    )
