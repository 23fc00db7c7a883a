"""Window functions and top-k — absent from the reference (SURVEY §2.2).

The reference's "ranking" is a full global sort through a second MR job
(``MovieRank.java:118-143``). Real ranking primitives here: partitioned window
functions (one hash exchange + in-partition sort, no global order needed) and
TakeOrderedAndProject top-k (per-partition heaps + driver merge — never a full
sort at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def ranked(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    rank_alias: str = "rn",
    method: str = "row_number",
) -> DataFrame:
    """Attach row_number/rank/dense_rank over (partition_by, order_by)."""
    fns = {
        "row_number": F.row_number,
        "rank": F.rank,
        "dense_rank": F.dense_rank,
    }
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_alias, fns[method]().over(w))


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_alias: str = "rn",
) -> DataFrame:
    """Top-k rows per group. Executes as window + filter: one exchange on the
    group key, per-partition sort, no global sort. ``order_by`` should include
    a unique tie-break column for deterministic output."""
    return ranked(df, partition_by, order_by, rank_alias).where(
        F.col(rank_alias) <= k
    )


def top_k_global(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k. ``orderBy().limit()`` plans as TakeOrderedAndProject:
    each partition keeps a k-heap, the driver merges k·partitions rows — the
    full dataset is never sorted (vs. the reference's all-data second MR job,
    MovieRank.java:182-203)."""
    return df.orderBy(*order_by).limit(k)


def sliding(
    partition_by: list[str],
    order_by: list[Column],
    preceding: int,
    following: int = 0,
) -> WindowSpec:
    """ROWS BETWEEN frame spec for moving aggregates (lag/lead windows)."""
    return (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(-preceding, following)
    )
