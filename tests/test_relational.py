"""Oracle-diffed tests for the relational widening queries (SURVEY §2.2)."""

from __future__ import annotations

import pytest

from mapreducemovieanalysis_cloud_spark import registry
from tests.oracle import assert_matches_oracle

RELATIONAL = (
    "window_trailing_range",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_full_outer",
    "join_theta_range",
    "join_asof",
    "window_topk_per_group",
    "window_lag_lead",
    "window_moving_avg",
    "topk_global",
    "distinct_pairs",
    "cube_qty",
    "rollup_orders",
    "grouping_sets",
    "approx_distinct",
    "percentile_quantity",
    "percentile_approx_disc",
    "setops_intersect",
    "setops_except",
    "setops_union_all",
    "scalar_functions",
    "date_functions",
    "string_functions",
    "array_functions",
)


@pytest.mark.parametrize("name", RELATIONAL)
def test_matches_oracle_small(spark, sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)


@pytest.mark.parametrize("name", RELATIONAL)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)
