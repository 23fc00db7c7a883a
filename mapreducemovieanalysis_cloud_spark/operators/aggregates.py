"""Aggregation surface: grouped/cube/rollup/grouping-sets, approx aggregates,
deterministic float averages.

The reference has two hand-rolled aggregates (COUNT at ``MovieRank.java:99-115``,
COUNT+SUM+AVG at ``MovieRating.java:81-105``), both one-pass streaming folds —
exactly Spark's partial/final HashAggregate, which applies automatically to
everything here (the reference's disabled combiner, ``MovieRank.java:80-95``,
is always-on map-side partial aggregation in Spark).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_avg(measure: str, decimals: int = 2) -> Column:
    """Cross-engine bit-deterministic average: ``round(sum, decimals)/count``.

    Plain AVG over doubles differs in the final ulp per summation order (and
    between engines), which flips value-hash comparisons. When the measure has
    at most ``decimals`` decimal digits, the rounded sum is exact, and IEEE
    division of identical operands is exactly rounded — so the result is
    bit-identical in any engine, any plan, any partitioning.
    """
    return F.round(F.sum(measure), decimals) / F.count(F.lit(1))


def grouped(
    df: DataFrame, keys: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """groupBy().agg() with aliased outputs (hash-agg, partial+final)."""
    return df.groupBy(*keys).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )


def cube_agg(df: DataFrame, keys: list[str], aggs: dict[str, Column]) -> DataFrame:
    """CUBE: aggregate over every subset of ``keys`` (2^k grouping sets).
    Spark expands grouping sets inside a single shuffle via Expand."""
    return df.cube(*keys).agg(*[c.alias(name) for name, c in aggs.items()])


def rollup_agg(
    df: DataFrame, keys: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """ROLLUP: hierarchical prefixes of ``keys``."""
    return df.rollup(*keys).agg(*[c.alias(name) for name, c in aggs.items()])


def approx_distinct(
    df: DataFrame, keys: list[str], col: str, alias: str = "approx_nd", rsd: float = 0.05
) -> DataFrame:
    """HyperLogLog++ distinct-count estimate. At 100 TB this is the only sane
    COUNT(DISTINCT) — fixed-size sketch per group, no second shuffle of raw
    values. (HLL++ sparse mode is exact for small cardinalities, which the
    oracle check exploits.)"""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd).alias(alias)
    )
