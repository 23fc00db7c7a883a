"""The reference's two pipelines, re-expressed as single Catalyst plans.

``MovieRank.java`` (join + count + sort) and ``MovieRating.java`` (join + avg
+ HAVING + sort) each run two chained MR jobs staged through HDFS text
(SURVEY §3.1-3.2). Here each is ONE lazy DataFrame expression: broadcast hash
join → partial/final hash aggregate → post-agg filter → range-partitioned
total-order sort, fused by whole-stage codegen, zero intermediate
materialization.

Semantics decisions (SURVEY §2 notes):

- inner join (the reference's HashMap probe stringifies missing titles into
  the literal "null", MovieRank.java:67-70 — a wart, not a feature);
- ``descending=True`` default order matches README intent ("sorted by their
  popularity"); ``descending=False`` reproduces the reference-exact ascending
  MR shuffle order (MovieRank.java:112-128);
- deterministic tie-breaks on the group key (the reference collapses ties in
  arbitrary reducer order, MovieRank.java:132-143).

Both operators are generic over (facts, dims): the MovieLens shape
(ratings ⋈ movies) and the driver's TPC-H analog (lineitem ⋈ part) are the
same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rank_by_count(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    label: str,
    count_alias: str = "num_reviews",
    descending: bool = True,
) -> DataFrame:
    """MovieRank (MovieRank.java:145-214): review count per dim row, sorted.

    SELECT dim.key, dim.label, COUNT(*) FROM facts JOIN dim USING(key)
    GROUP BY key, label ORDER BY count.

    ``dim`` is broadcast — the Spark form of the reference's DistributedCache
    HashMap replication (MovieRank.java:30-51). At 100 TB the facts side never
    shuffles for the join; the only shuffles are the aggregate exchange (with
    automatic map-side partial aggregation — the reference's disabled
    combiner, MovieRank.java:80-95,161) and the range exchange for the sort.

    The aggregate runs BELOW the join (round-13 optimization, guide §2.3
    "aggregate before you shuffle"): the count needs only the key, so
    grouping first collapses the fact stream to one row per key before
    the broadcast probe, and the label string never enters the aggregate
    exchange at all — it is attached to group-sized rows afterwards.
    Equivalent to join-then-group because ``dim`` is a unique-key lookup
    (the reference's own contract: a DistributedCache HashMap holds ONE
    title per id, MovieRank.java:30-51); the inner join then drops
    exactly the same unmatched keys either side of the aggregate.
    """
    counted = (
        facts.select(key)  # early projection (MovieRank.java:65-72)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias(count_alias))
        .join(F.broadcast(dim.select(key, label)), key, "inner")
        .select(key, label, count_alias)
    )
    order = F.col(count_alias).desc() if descending else F.col(count_alias).asc()
    return counted.orderBy(order, F.col(key).asc())


def rank_by_avg(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    label: str,
    measure: str,
    min_count: int = 10,
    min_avg: float = 4.0,
    avg_alias: str = "avg_rating",
    count_alias: str = "num_ratings",
    descending: bool = True,
    measure_decimals: int = 2,
) -> DataFrame:
    """MovieRating (MovieRating.java:140-209): avg-measure ranking with HAVING.

    SELECT label, AVG(measure), COUNT(*) FROM facts JOIN dim USING(key)
    GROUP BY key, label HAVING COUNT(*) > min_count AND AVG > min_avg
    ORDER BY avg.

    Strict ``>`` thresholds match the reference exactly
    (MovieRating.java:96-101). The HAVING filters run before the sort exchange,
    so only surviving groups are range-partitioned — the same stage placement
    the reference hand-codes in its reducer (SURVEY §4).

    The average is computed as ``round(sum, measure_decimals) / count`` rather
    than ``avg`` so the result is bit-deterministic across engines and
    summation orders: the source measure has ``measure_decimals`` decimals, so
    the rounded sum is exact, and IEEE division of identical operands is
    exactly rounded. Plain ``avg`` differs in the last ulp per summation order,
    which flips order-insensitive value hashes.
    """
    avg_col = F.round(F.sum(measure), measure_decimals) / F.count(F.lit(1))
    # Aggregate below the broadcast join, HAVING below it too (round-13
    # optimization, guide §2.3 — same argument and unique-key-dim
    # precondition as rank_by_count): the aggregate exchange carries
    # (key, partial sum, partial count) with no label string, and only
    # HAVING survivors probe the broadcast HashMap.
    ranked = (
        facts.select(key, measure)
        .groupBy(key)
        .agg(
            avg_col.alias(avg_alias),
            F.count(F.lit(1)).alias(count_alias),
        )
        .where((F.col(count_alias) > min_count) & (F.col(avg_alias) > min_avg))
        .join(F.broadcast(dim.select(key, label)), key, "inner")
        # final column order: label leads (MovieRating.java:130-136, X3)
        .select(label, avg_alias, count_alias, key)
    )
    order = F.col(avg_alias).desc() if descending else F.col(avg_alias).asc()
    return ranked.orderBy(order, F.col(key).asc()).drop(key)
