"""Round-4f tests: oracle diffs for the interval/regression/BFS/TF-IDF
wave plus hand-computable invariants for each new kernel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.operators import (
    aggregates,
    graph,
    timeseries,
)
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table
from tests.oracle import assert_matches_oracle

ROUND4F = (
    "regr_price_on_qty_by_brand",
    "peak_concurrent_by_type",
    "interval_coverage_user",
    "resample_hourly_interp",
    "bfs_hops_suppliers",
    "tfidf_top_terms",
    "anomaly_hour_of_day",
)


@pytest.mark.parametrize("name", ROUND4F)
def test_matches_oracle_small(spark, sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, sf_dir),
        registry.oracle_sql()[name],
        sf_dir,
    )


@pytest.mark.parametrize("name", ROUND4F)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, oracle_sf_dir),
        registry.oracle_sql()[name],
        oracle_sf_dir,
    )


# ---- kernel invariants -------------------------------------------------------


def test_ols_recovers_exact_line(spark):
    """Points exactly on y = 3x + 7 give slope 3.0, intercept 7.0,
    r² = 1.0 (micro fixed-point); a zero-variance-x group yields NULLs."""
    df = spark.createDataFrame(
        [("a", x, 3 * x + 7) for x in (1, 2, 5, 9)]
        + [("b", 4, 10), ("b", 4, 20)],
        "g string, x long, y long",
    )
    out = {
        r["g"]: r
        for r in aggregates.ols_by_group(df, ["g"], "x", "y").collect()
    }
    assert out["a"]["slope_micro"] == 3_000_000
    assert out["a"]["intercept_micro"] == 7_000_000
    assert out["a"]["r2_micro"] == 1_000_000
    assert out["b"]["slope_micro"] is None
    assert out["b"]["intercept_micro"] is None
    assert out["b"]["r2_micro"] is None


def test_peak_concurrency_hand_case(spark):
    """[0,10) [5,15) [14,20) peaks at 2; disjoint [0,1) [2,3) peaks 1;
    an end meeting a start at the same instant does NOT overlap."""
    df = spark.createDataFrame(
        [
            ("a", 0, 10),
            ("a", 5, 15),
            ("a", 14, 20),
            ("b", 0, 1),
            ("b", 2, 3),
            ("c", 0, 5),
            ("c", 5, 9),
        ],
        "k string, __s long, __e long",
    )
    out = {
        r["k"]: r
        for r in timeseries.peak_concurrency(df, "k").collect()
    }
    assert out["a"]["max_concurrent"] == 2
    assert out["a"]["n_intervals"] == 3
    assert out["b"]["max_concurrent"] == 1
    assert out["c"]["max_concurrent"] == 1


def test_interval_coverage_hand_case(spark):
    """Overlap merges, touching merges, gaps split islands; covered
    length never double-counts."""
    df = spark.createDataFrame(
        [
            # [0,10) + [5,15) + [15,20) -> one island covering 20
            ("a", 1, 0, 10),
            ("a", 2, 5, 15),
            ("a", 3, 15, 20),
            # [30,35) -> second island covering 5
            ("a", 4, 30, 35),
            # containment: [0,100) swallows [10,20)
            ("b", 1, 0, 100),
            ("b", 2, 10, 20),
        ],
        "k string, __tb long, __s long, __e long",
    )
    out = {
        r["k"]: r
        for r in timeseries.interval_coverage(
            df, "k", "__s", "__e", "__tb"
        ).collect()
    }
    assert out["a"]["n_islands"] == 2
    assert out["a"]["covered_us"] == 25
    assert out["a"]["n_intervals"] == 4
    assert out["b"]["n_islands"] == 1
    assert out["b"]["covered_us"] == 100


def test_interp_exact_midpoint_and_monotone_grid(spark, sf_dir):
    """Interpolated values always lie within [min, max] of the user's
    observed range, and each user's grid hours are strictly interior to
    the observed span."""
    events = load_table(spark, sf_dir, "events")
    out = timeseries.resample_hourly_interp(events)
    bounds = events.groupBy("user_id").agg(
        F.min(F.round(F.col("value") * 1_000_000).cast("long")).alias(
            "lo"
        ),
        F.max(F.round(F.col("value") * 1_000_000).cast("long")).alias(
            "hi"
        ),
    )
    bad = (
        out.join(bounds, "user_id")
        .where(
            (F.col("interp_micro") < F.col("lo"))
            | (F.col("interp_micro") > F.col("hi"))
        )
        .count()
    )
    assert bad == 0


def test_interp_hand_case(spark):
    """Two observations an exact 2 hours apart: the single interior hour
    boundary interpolates to the exact midpoint; a boundary ON an
    observation returns the observation."""
    h = 3_600_000_000
    df = spark.createDataFrame(
        [(1, 1, h, 10.0), (1, 2, 3 * h, 20.0)],
        "user_id long, event_id long, t long, value double",
    ).select(
        "user_id",
        "event_id",
        F.timestamp_micros(F.col("t")).alias("ts"),
        "value",
    )
    out = timeseries.resample_hourly_interp(df).collect()
    assert len(out) == 1
    assert out[0]["interp_micro"] == 15_000_000


def test_bfs_hand_case(spark):
    """Path graph 1-2-3-4-5 with source {1}: hops are 0,1,2,3 within
    horizon 3; node 5 is beyond the horizon and absent."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "u long, v long"
    )
    sources = spark.createDataFrame([(1,)], "node long")
    out = {
        r["node"]: r["hops"]
        for r in graph.bfs_hops(edges, sources, 3).collect()
    }
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}


def test_tfidf_rank_bounds(spark, sf_dir):
    """Per doc at most K rows, ranks contiguous from 1, scores
    non-increasing in rank."""
    out = registry.queries()["tfidf_top_terms"](spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rows in by_doc.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(
            range(1, len(rows) + 1)
        ), doc
        assert len(rows) <= 3
        scores = [r["score_micro"] for r in rows]
        assert scores == sorted(scores, reverse=True), doc


def test_anomaly_outliers_bounded(spark, sf_dir):
    """Chebyshev: at most n/4 points sit beyond 2 sigma in any cell, and
    cell counts sum to the event count."""
    out = registry.queries()["anomaly_hour_of_day"](
        spark, sf_dir
    ).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n"] for r in out) == n_events
    for r in out:
        assert r["n_outliers"] <= r["n"] / 4 + 1, r
