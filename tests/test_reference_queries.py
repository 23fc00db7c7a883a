"""Oracle-diffed tests for the reference-parity queries (SURVEY §5.1)."""

from __future__ import annotations

import pytest

from mapreducemovieanalysis_cloud_spark import registry
from tests.oracle import assert_matches_oracle

REF_QUERIES = ("movie_rank", "movie_rank_desc", "movie_rating")


@pytest.mark.parametrize("name", REF_QUERIES)
def test_matches_oracle_small(spark, sf_dir, name):
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, sf_dir), sql, sf_dir)


@pytest.mark.parametrize("name", REF_QUERIES)
def test_matches_oracle_sf001(spark, oracle_sf_dir, name):
    """Same comparison at the driver's correctness scale (sf=0.01)."""
    q = registry.queries()[name]
    sql = registry.oracle_sql()[name]
    assert_matches_oracle(q(spark, oracle_sf_dir), sql, oracle_sf_dir)


def test_movie_rating_plan_is_broadcast(spark, sf_dir):
    """The dim side must broadcast — no shuffle of the facts side for the join
    (the scale-critical property; SURVEY §4 row 1)."""
    q = registry.queries()["movie_rating"]
    plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"title", "avg_rating", "num_ratings"}
