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
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q12_shipmode_priority",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity",
    "tpch_q19_discounted_revenue",
    "tpch_q21_suppliers_waiting",
    "tpch_q22_global_sales",
    "tpch_q2_best_supplier",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_count",
    "tpch_q20_promotion_suppliers",
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


def test_q21_exists_decorrelates_to_semi_and_anti(spark, sf_dir):
    """Q21's EXISTS / NOT EXISTS must plan as one LeftSemi and one LeftAnti
    join on the fact key — never a correlated re-scan per row."""
    df = registry.queries()["tpch_q21_suppliers_waiting"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan


def test_q6_sql_entry_pushes_all_predicates(spark, sf_dir):
    """Q6 enters through spark.sql(); every predicate must still reach the
    parquet scan (entry path must not cost pushdown)."""
    df = registry.queries()["tpch_q6_forecast_revenue"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters:", 1)[1][:300]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, (col, pushed)


def test_q10_topk_take_ordered(spark, sf_dir):
    """Q10's top-20 must be per-partition heaps, not a global sort."""
    df = registry.queries()["tpch_q10_returned_items"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_q17_broadcasts_filtered_part(spark, sf_dir):
    """Q17's brand-filtered part (and the per-part avg at this SF) come in
    as broadcast joins so lineitem shuffles at most for the avg agg."""
    df = registry.queries()["tpch_q17_small_quantity"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
