"""Oracle-diffed tests for the advanced relational surface."""

from __future__ import annotations

import pytest

from mapreducemovieanalysis_cloud_spark import registry
from tests.oracle import assert_matches_oracle

ADVANCED = (
    "pivot_returnflag",
    "unpivot_part",
    "json_struct",
    "map_functions",
    "explode_tokens",
    "subquery_correlated",
    "subquery_in",
    "join_right_outer",
    "join_cross",
    "pandas_udf_normalize",
    "pandas_udaf_median",
    "window_analytics",
    "sample_deterministic",
    "grouped_map_top2",
    "udtf_char_bigrams",
    "salted_hot_key_agg",
)


@pytest.mark.parametrize("name", ADVANCED)
def test_matches_oracle_small(spark, sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)


@pytest.mark.parametrize("name", ADVANCED)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)
