"""Round-4e tests: oracle diffs plus the stochastic-matrix and
histogram-mass invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark import registry
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table
from tests.oracle import assert_matches_oracle

ROUND4E = ("event_transition_matrix", "histogram2d_price_qty")


@pytest.mark.parametrize("name", ROUND4E)
def test_matches_oracle_small(spark, sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, sf_dir),
        registry.oracle_sql()[name],
        sf_dir,
    )


@pytest.mark.parametrize("name", ROUND4E)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    assert_matches_oracle(
        registry.queries()[name](spark, oracle_sf_dir),
        registry.oracle_sql()[name],
        oracle_sf_dir,
    )


def test_transition_matrix_is_row_stochastic(spark, sf_dir):
    """Each row's counts sum to the row total (milli probabilities sum to
    ~1000 up to truncation), and total transitions = total events minus
    one per active user (a length-L sequence has L-1 transitions)."""
    out = registry.queries()["event_transition_matrix"](
        spark, sf_dir
    ).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r)
    for src, rows in by_src.items():
        p_sum = sum(r["p_milli"] for r in rows)
        assert 1000 - len(rows) <= p_sum <= 1000, src
    events = load_table(spark, sf_dir, "events")
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert sum(r["n_transitions"] for r in out) == n_events - n_users


def test_histogram2d_mass_conservation(spark, sf_dir):
    """Total histogram mass equals the join cardinality (= lineitem rows,
    every line has exactly one order), and bins are non-negative."""
    out = registry.queries()["histogram2d_price_qty"](
        spark, sf_dir
    ).collect()
    n_lines = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r["n"] for r in out) == n_lines
    for r in out:
        assert r["n"] > 0
        assert r["price_bin"] >= 0 and r["qty_bin"] >= 0
