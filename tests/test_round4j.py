"""Round-4j tests: oracle diffs for the drift-statistics wave plus
hand-computable invariants (KS vs scipy-free closed cases, winsorize
clamp semantics, band quantile integrality)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.operators import aggregates
from tests.oracle import assert_matches_oracle

ROUND4J = (
    "ks_drift_by_type",
    "winsorized_orders_by_priority",
    "percentile_bands_type_hod",
)


@pytest.mark.parametrize("name", ROUND4J)
def test_matches_oracle_small(spark, sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, sf_dir),
        registry.oracle_sql()[name],
        sf_dir,
    )


@pytest.mark.parametrize("name", ROUND4J)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, oracle_sf_dir),
        registry.oracle_sql()[name],
        oracle_sf_dir,
    )


# ---- kernel invariants -------------------------------------------------------


def _vals(spark, rows):
    """rows: (group, value_int)."""
    return spark.createDataFrame(rows, "g string, x long")


def test_ks_disjoint_supports_is_one(spark):
    """Completely separated distributions: D = 1."""
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (10, 11, 12)]
    out = {
        r.g: r.ks_micro
        for r in aggregates.ks_by_group(
            _vals(spark, rows), "g", F.col("x")
        ).collect()
    }
    assert out == {"a": 1_000_000, "b": 1_000_000}


def test_ks_identical_distributions_is_zero(spark):
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    out = {
        r.g: r.ks_micro
        for r in aggregates.ks_by_group(
            _vals(spark, rows), "g", F.col("x")
        ).collect()
    }
    assert out == {"a": 0, "b": 0}


def test_ks_single_group_drops_instead_of_null(spark):
    """A group that is the whole table has no rest sample (n_rest = 0):
    it must be dropped, not returned with a silently-NULL ks_micro
    (r04 advice — Spark's integer div yields NULL on /0 where DuckDB
    raises)."""
    rows = [("a", 1), ("a", 2), ("a", 3)]
    assert (
        aggregates.ks_by_group(_vals(spark, rows), "g", F.col("x")).count()
        == 0
    )


def test_ks_hand_case(spark):
    """a={1,3}, rest={2,4}: D = 1/2 at v=1 (and v=3)."""
    rows = [("a", 1), ("a", 3), ("b", 2), ("b", 4)]
    out = {
        r.g: (r.n_in, r.n_rest, r.ks_micro)
        for r in aggregates.ks_by_group(
            _vals(spark, rows), "g", F.col("x")
        ).collect()
    }
    assert out["a"] == (2, 2, 500_000)


def test_winsorized_clamps_both_tails(spark):
    """n=20, k=1: one value clamps up to the 2nd smallest, one down to
    the 19th; the raw mean moves, the winsorized mean resists."""
    xs = list(range(10, 28)) + [-1000, 5000]  # 18 middling + 2 wild
    out = aggregates.winsorized_mean(
        _vals(spark, [("a", x) for x in xs]), "g", F.col("x")
    ).collect()[0]
    assert out.n == 20 and out.k == 1
    srt = sorted(xs)
    lo, hi = srt[1], srt[18]
    clamped = [min(max(x, lo), hi) for x in xs]
    assert out.winsorized_mean_cents_milli == sum(clamped) * 1000 // 20
    assert out.mean_cents_milli == sum(xs) * 1000 // 20


def test_winsorized_small_group_is_identity(spark):
    """n < 20 -> k=0: nothing clamps."""
    out = aggregates.winsorized_mean(
        _vals(spark, [("a", x) for x in (1, 2, 300)]), "g", F.col("x")
    ).collect()[0]
    assert out.k == 0
    assert out.winsorized_mean_cents_milli == out.mean_cents_milli


def test_percentile_bands_are_scaled_integers(spark):
    """p50*2 / p95*20 / p99*100 land exactly on the rational grid."""
    xs = list(range(1, 101))  # 1..100
    out = aggregates.percentile_bands(
        _vals(spark, [("a", x) for x in xs]), ["g"], F.col("x")
    ).collect()[0]
    # (n-1)*q + 1 ranks: p50 -> 50.5 -> 101; p95 -> 95.05 -> 1901;
    # p99 -> 99.01 -> 9901
    assert (out.p50_x2, out.p95_x20, out.p99_x100) == (101, 1901, 9901)


def test_registry_round4j_registered():
    q, o = registry.queries(), registry.oracle_sql()
    for name in ROUND4J:
        assert name in q and name in o
