"""Round-4h tests: oracle diffs for the ordered-series wave plus
hand-computable invariants for each new kernel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.operators import aggregates, series
from tests.oracle import assert_matches_oracle

ROUND4H = (
    "cusum_user_value",
    "twap_user_value",
    "rolling_median_value",
    "ohlc_hourly_by_type",
    "sliding_reach_by_type",
    "streaks_user_days",
    "mad_outliers_by_type",
)


@pytest.mark.parametrize("name", ROUND4H)
def test_matches_oracle_small(spark, sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, sf_dir),
        registry.oracle_sql()[name],
        sf_dir,
    )


@pytest.mark.parametrize("name", ROUND4H)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, oracle_sf_dir),
        registry.oracle_sql()[name],
        oracle_sf_dir,
    )


# ---- kernel invariants -------------------------------------------------------


def _events(spark, rows):
    """rows: (event_id, ts_str, user_id, value)."""
    return spark.createDataFrame(
        [(e, t, u, v) for e, t, u, v in rows],
        "event_id long, ts string, user_id long, value double",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_cusum_step_series(spark):
    """A clean level shift puts the max excursion at the shift point."""
    rows = [
        (i, f"2024-01-01 00:0{i}:00", 1, 1.0 if i < 5 else 3.0)
        for i in range(10)
    ]
    out = series.cusum_max_excursion(_events(spark, rows)).collect()[0]
    # v = 100 x5 then 300 x5 (cents); T=2000, n=10.
    # D_k = 10*S_k - k*2000; max |D_k| at k=5: |10*500 - 10000| = 5000.
    assert out.n == 10
    assert out.excursion_n_cents == 5000
    assert out.at_k == 5


def test_cusum_constant_series_is_zero(spark):
    rows = [(i, f"2024-01-01 00:0{i}:00", 7, 2.5) for i in range(5)]
    out = series.cusum_max_excursion(_events(spark, rows)).collect()[0]
    assert out.excursion_n_cents == 0 and out.at_k == 1


def test_twap_holds_dominate(spark):
    """A value held 9x longer dominates the duration-weighted mean."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, 10.0),  # held 9 s
        (2, "2024-01-01 00:00:09", 1, 20.0),  # held 1 s
        (3, "2024-01-01 00:00:10", 1, 99.0),  # terminal, zero weight
    ]
    out = series.time_weighted_avg(_events(spark, rows)).collect()[0]
    # (1000*9000 + 2000*1000) / 10000 ms = 1100 cents
    assert out.n_segments == 2
    assert out.twap_cents_milli == 1_100_000


def test_rolling_median_even_frame_is_exact(spark):
    """Frames of 2 and 4 interpolate; 2x keeps everything integral."""
    rows = [
        (1, "2024-01-01 00:00:01", 1, 1.0),
        (2, "2024-01-01 00:00:02", 1, 2.0),
        (3, "2024-01-01 00:00:03", 1, 10.0),
        (4, "2024-01-01 00:00:04", 1, 4.0),
    ]
    out = {
        r.event_id: r.med2_cents
        for r in series.rolling_median(_events(spark, rows)).collect()
    }
    assert out[1] == 200  # [100] -> 2*100
    assert out[2] == 300  # [100,200] -> 100+200
    assert out[3] == 400  # [100,200,1000] -> 2*200
    assert out[4] == 600  # [100,200,400,1000] -> 200+400


def test_ohlc_order_semantics(spark):
    """Open is the (ts, event_id)-first value, close the last; ties on
    ts break by event_id."""
    rows = [
        (2, "2024-01-01 05:00:00", 1, 7.0),
        (1, "2024-01-01 05:00:00", 1, 3.0),  # same ts, lower id -> open
        (3, "2024-01-01 05:30:00", 1, 1.0),
        (4, "2024-01-01 05:59:00", 1, 5.0),
    ]
    out = series.ohlc_bars(_events(spark, rows), key_col="user_id").collect()[0]
    assert (out.open_cents, out.high_cents, out.low_cents, out.close_cents) == (
        300,
        700,
        100,
        500,
    )


def test_sliding_reach_window_expiry(spark):
    """A user seen 24h+1s ago is out of the frame; within 24h counts."""
    rows = [
        (1, "2024-01-01 00:00:00", 10, 1.0),
        (2, "2024-01-01 23:59:59", 11, 1.0),  # user 10 still in frame
        (3, "2024-01-02 00:00:01", 12, 1.0),  # user 10's second expired
    ]
    df = _events(spark, rows).withColumn("event_type", F.lit("x"))
    out = {r.event_id: r.reach for r in series.sliding_distinct(df).collect()}
    assert out == {1: 1, 2: 2, 3: 2}


def test_sliding_reach_string_tiebreak_column(spark):
    """The operator is generic over the tiebreak column's dtype: the
    delta rows' null literal must take the caller's type (r04 advice —
    it was hardcoded long, breaking string id columns)."""
    rows = [
        (1, "2024-01-01 00:00:00", 10, 1.0),
        (2, "2024-01-01 12:00:00", 11, 1.0),
    ]
    df = (
        _events(spark, rows)
        .withColumn("event_type", F.lit("x"))
        .withColumn("event_id", F.concat(F.lit("ev-"), F.col("event_id")))
    )
    out = {r.event_id: r.reach for r in series.sliding_distinct(df).collect()}
    assert out == {"ev-1": 1, "ev-2": 2}


def test_streaks_islands(spark):
    """Two islands (3-day and 1-day), plus repeated events in one day."""
    rows = [
        (1, "2024-01-01 10:00:00", 1, 1.0),
        (2, "2024-01-01 22:00:00", 1, 1.0),
        (3, "2024-01-02 01:00:00", 1, 1.0),
        (4, "2024-01-03 01:00:00", 1, 1.0),
        (5, "2024-01-07 01:00:00", 1, 1.0),
    ]
    out = series.longest_daily_streak(_events(spark, rows)).collect()[0]
    assert out.n_active_days == 4
    assert out.longest_streak == 3


def test_mad_resists_one_spike(spark):
    """One extreme value flips the z-gate's sigma but not the MAD gate."""
    rows = [(i, f"2024-01-01 00:{i:02d}:00", 1, 10.0 + (i % 3)) for i in range(20)]
    rows.append((99, "2024-01-01 01:00:00", 1, 10_000.0))
    df = _events(spark, rows).withColumn("event_type", F.lit("x"))
    out = aggregates.mad_outlier_stats(
        df, "event_type", F.expr("CAST(ROUND(value * 100) AS BIGINT)")
    ).collect()[0]
    # median ~11, MAD ~1: only the spike escapes 3*MAD.
    assert out.n == 21
    assert out.n_outliers == 1


def test_registry_round4h_registered():
    q, o = registry.queries(), registry.oracle_sql()
    for name in ROUND4H:
        assert name in q and name in o
