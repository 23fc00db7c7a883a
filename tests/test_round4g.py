"""Round-4g tests: oracle diffs for the distribution-statistics wave
plus hand-computable invariants for each new kernel."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.operators import aggregates, ranking
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table
from tests.oracle import assert_matches_oracle

ROUND4G = (
    "skyline_qty_price",
    "gini_revenue_by_nation",
    "benford_totalprice",
    "acf1_user_value",
    "entropy_lang_by_source",
    "chi2_cells_type_hod",
)


@pytest.mark.parametrize("name", ROUND4G)
def test_matches_oracle_small(spark, sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, sf_dir),
        registry.oracle_sql()[name],
        sf_dir,
    )


@pytest.mark.parametrize("name", ROUND4G)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, oracle_sf_dir),
        registry.oracle_sql()[name],
        oracle_sf_dir,
    )


# ---- kernel invariants -------------------------------------------------------


def test_skyline_hand_case(spark):
    """Dominated points drop, the frontier is strictly monotone, and a
    duplicate-y point collapses to its min x."""
    df = spark.createDataFrame(
        [
            (1, 5),
            (1, 3),  # same y, smaller x wins
            (2, 4),
            (3, 4),  # dominates (2,4): higher y, same x
            (4, 9),  # higher y but worse x than (3,4) -> kept
            (0, 2),
        ],
        "y long, x long",
    )
    out = sorted(
        (r["y"], r["x"]) for r in ranking.skyline_2d(df, "y", "x").collect()
    )
    assert out == [(0, 2), (1, 3), (3, 4), (4, 9)]
    ys = [p[0] for p in out]
    xs = [p[1] for p in out]
    assert xs == sorted(xs) and ys == sorted(ys)


def test_gini_extremes(spark):
    """All-equal values give G = 0; total concentration approaches
    (n-1)/n; zero-sum group yields NULL."""
    df = spark.createDataFrame(
        [("eq", i, 10) for i in range(4)]
        + [("conc", 0, 0), ("conc", 1, 0), ("conc", 2, 0), ("conc", 3, 100)]
        + [("zero", 0, 0), ("zero", 1, 0)],
        "g string, tb long, x long",
    )
    out = {
        r["g"]: r
        for r in aggregates.gini_by_group(df, ["g"], "x", "tb").collect()
    }
    assert out["eq"]["gini_micro"] == 0
    assert out["conc"]["gini_micro"] == 750_000  # (n-1)/n = 3/4
    assert out["zero"]["gini_micro"] is None


def test_pearson_by_group_exact(spark):
    """Perfect positive line -> +1e6; perfect negative -> -1e6;
    constant series -> NULL."""
    df = spark.createDataFrame(
        [("pos", x, 2 * x + 1) for x in (1, 2, 3)]
        + [("neg", x, -3 * x) for x in (1, 2, 3)]
        + [("flat", x, 7) for x in (1, 2, 3)],
        "g string, x long, y long",
    )
    out = {
        r["g"]: r["corr_micro"]
        for r in aggregates.pearson_by_group(
            df, ["g"], "x", "y"
        ).collect()
    }
    assert out["pos"] == 1_000_000
    assert out["neg"] == -1_000_000
    assert out["flat"] is None


def test_benford_shares_sum_and_reference(spark, sf_dir):
    """Digits are 1..9, observed milli shares sum to ~1000, and the
    reference column equals log10(1+1/d) in milli."""
    out = registry.queries()["benford_totalprice"](spark, sf_dir).collect()
    digits = {r["digit"] for r in out}
    assert digits <= set(range(1, 10))
    total_obs = sum(r["observed_milli"] for r in out)
    assert 1000 - len(out) <= total_obs <= 1000
    for r in out:
        expect = round(math.log10(1 + 1 / r["digit"]) * 1000)
        assert r["benford_milli"] == expect


def test_entropy_bounds(spark, sf_dir):
    """0 <= H <= ln(n_langs), with equality at 0 iff monolingual."""
    out = registry.queries()["entropy_lang_by_source"](
        spark, sf_dir
    ).collect()
    for r in out:
        assert 0 <= r["entropy_micro"] <= round(
            math.log(r["n_langs"]) * 1_000_000
        ) + 1, r
        if r["n_langs"] == 1:
            assert r["entropy_micro"] == 0


def test_chi2_margins_consistent(spark, sf_dir):
    """Observed cell counts sum to the event count, expected milli mass
    sums to ~1000x the event count, contributions are non-negative."""
    out = registry.queries()["chi2_cells_type_hod"](
        spark, sf_dir
    ).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["o"] for r in out) == n_events
    e_total = sum(r["expected_milli"] for r in out)
    assert abs(e_total - 1000 * n_events) <= len(out)
    assert all(r["contrib_micro"] >= 0 for r in out)


def test_acf1_matches_numpy_on_one_user(spark, sf_dir):
    """Cross-check one user's lag-1 autocorrelation against numpy."""
    import numpy as np

    events = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id") == 1)
        .orderBy("ts", "event_id")
        .select(F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("v"))
        .collect()
    )
    v = np.array([r["v"] for r in events], dtype=np.float64)
    expected = np.corrcoef(v[:-1], v[1:])[0, 1]
    out = {
        r["user_id"]: r["corr_micro"]
        for r in registry.queries()["acf1_user_value"](
            spark, sf_dir
        ).collect()
    }
    assert abs(out[1] - round(expected * 1_000_000)) <= 2
