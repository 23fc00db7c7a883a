"""Reference-parity queries on the driver's star schema (SURVEY §2.1, §3).

The MovieLens shapes map onto the TPC-H-ish tables per FIXTURES.md §2:
ratings ⋈ movies becomes lineitem ⋈ part (l_partkey = p_partkey), with
l_extendedprice standing in for the rating measure. The plans are the same
operator families the reference implements: broadcast join J1, count/avg
aggregates A2/A3, HAVING filters F1/F2, total-order sorts X1/X2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.operators.reference import (
    rank_by_avg,
    rank_by_count,
)
from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table


def _facts_dim(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_name").alias("title")
    )
    return lineitem, part


@query(
    "movie_rank",
    oracle="""
    SELECT l.l_partkey AS l_partkey, p.p_name AS title,
           COUNT(*) AS num_reviews
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
    ORDER BY num_reviews ASC, l_partkey ASC
    """,
)
def movie_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MovieRank, reference-exact ascending order (MovieRank.java:112-128)."""
    facts, dim = _facts_dim(spark, sf_dir)
    return rank_by_count(facts, dim, "l_partkey", "title", descending=False)


@query(
    "movie_rank_desc",
    oracle="""
    SELECT l.l_partkey AS l_partkey, p.p_name AS title,
           COUNT(*) AS num_reviews
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
    ORDER BY num_reviews DESC, l_partkey ASC
    """,
)
def movie_rank_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MovieRank with the README's intended descending popularity order."""
    facts, dim = _facts_dim(spark, sf_dir)
    return rank_by_count(facts, dim, "l_partkey", "title", descending=True)


@query(
    "movie_rating",
    oracle="""
    SELECT p.p_name AS title,
           ROUND(SUM(l.l_extendedprice), 2) / COUNT(*) AS avg_rating,
           COUNT(*) AS num_ratings
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name
    HAVING COUNT(*) > 10
       AND ROUND(SUM(l.l_extendedprice), 2) / COUNT(*) > 52000.0
    ORDER BY avg_rating DESC
    """,
)
def movie_rating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MovieRating (MovieRating.java:140-209): avg + HAVING + sort.

    Thresholds rescaled to the analog measure (l_extendedprice): COUNT > 10
    keeps the reference's strict cut (MovieRating.java:97); avg > 52000 sits at
    the sf-independent median group average, mirroring avg > 4
    (MovieRating.java:100).
    """
    facts, dim = _facts_dim(spark, sf_dir)
    return rank_by_avg(
        facts,
        dim,
        key="l_partkey",
        label="title",
        measure="l_extendedprice",
        min_count=10,
        min_avg=52000.0,
        descending=True,
    )
