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
    "join_range_binned",
    "variant_extract",
    "cms_heavy_hitters",
    "profile_orders",
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


def test_salted_join_row_identical_to_plain_join(spark, sf_dir):
    """salted_join must return exactly the plain join's rows — salting only
    routes rows across tasks. Key chosen for maximal skew (3 values)."""
    from pyspark.sql import functions as F

    from mapreducemovieanalysis_cloud_spark.operators.skew import salted_join
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )
    dim = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(F.count(F.lit(1)).alias("flag_rows"))
    )
    got = (
        salted_join(li, dim, "l_returnflag", "flag", salt_buckets=8)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "flag_rows")
        .collect()
    )
    want = (
        li.join(dim, F.col("l_returnflag") == F.col("flag"))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "flag_rows")
        .collect()
    )
    assert sorted(got) == sorted(want)
    assert len(got) == li.count()


def test_cms_heavy_hitters_overestimates_only(spark, oracle_sf_dir):
    """CMS invariant: every estimate >= the true count, and the true
    heaviest key is in the top-k."""
    from pyspark.sql import functions as F

    from mapreducemovieanalysis_cloud_spark import registry
    from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

    out = registry.queries()["cms_heavy_hitters"](spark, oracle_sf_dir)
    rows = out.collect()
    assert rows and all(r.est_count >= r.true_count for r in rows)
    events = load_table(spark, oracle_sf_dir, "events")
    top_true = (
        events.groupBy("user_id")
        .count()
        .orderBy(F.desc("count"), F.asc("user_id"))
        .first()
    )
    # the max estimate dominates the true max (est(true-top) >= its count)
    assert max(r.est_count for r in rows) >= top_true["count"]
    # with width >> #keys the sketch is near-collision-free and the true
    # heavy hitter must surface in the top-k
    from mapreducemovieanalysis_cloud_spark.operators.aggregates import (
        cms_heavy_hitters,
    )

    wide = cms_heavy_hitters(
        events, "user_id", depth=3, width=1024, k=10
    ).collect()
    assert any(r.user_id == top_true.user_id for r in wide)
