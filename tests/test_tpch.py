"""Oracle-diffed tests for the TPC-H-shaped headline analytics, plus plan
quality checks (broadcasts where promised, filters pushed to the scans)."""

from __future__ import annotations

import pytest

from mapreducemovieanalysis_cloud_spark import registry
from tests.oracle import assert_matches_oracle

TPCH = (
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q18_large_volume",
    "tpch_q7_nation_volume",
    "tpch_q10_returned_items",
    "tpch_q4_order_priority",
)


@pytest.mark.parametrize("name", TPCH)
def test_matches_oracle_small(spark, sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)


@pytest.mark.parametrize("name", TPCH)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    """The shipdate predicate must reach the parquet scan (row-group
    pruning at scale), not sit in a post-scan Filter only."""
    df = registry.queries()["tpch_q1_pricing_summary"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:", 1)[1][:200]


def test_q5_broadcasts_dims(spark, sf_dir):
    """nation/region must come in as broadcast joins, never shuffled."""
    df = registry.queries()["tpch_q5_local_supplier"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_q1_single_shuffle(spark, sf_dir):
    """Q1 is scan -> partial agg -> exchange -> final agg: exactly one
    shuffle in the optimized plan."""
    df = registry.queries()["tpch_q1_pricing_summary"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
