"""Join family beyond the reference's single broadcast equi-join.

The reference implements exactly one join: the replicated-HashMap probe
(SURVEY §2.1 J1, ``MovieRank.java:55-74``). The engine exposes the full
family — planner-chosen equi-joins of every type, theta/range conditions, and
an as-of join built from a union + window rather than a range-exploding
inequality join.

Scale notes:

- equi-joins: leave strategy choice to Catalyst/AQE (broadcast below the
  threshold, sort-merge above, skew-split under AQE); hint explicitly only
  when the small side is provably small.
- as-of: the naive formulation (inequality join + keep latest) produces an
  O(n·m) range join per key. The union+window formulation here is one shuffle
  on (key), one sort within partitions — the same cost as a window function,
  robust at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

JOIN_TYPES = (
    "inner",
    "left",
    "right",
    "full",
    "left_semi",
    "left_anti",
    "cross",
)


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Planner-strategized equi-join over all SQL join types."""
    if how not in JOIN_TYPES:
        raise ValueError(f"unsupported join type {how!r}; one of {JOIN_TYPES}")
    if broadcast_right:
        right = F.broadcast(right)
    return left.join(right, on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    suffix: str = "_right",
    within=None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (direction='backward'; 'forward' takes the
    earliest right row with ``right_ts >= left_ts``), per ``key``.

    Implementation: tag both sides, union, and run ``last(right col, ignorenulls)``
    over a window ordered by time within each key — right rows "carry forward"
    onto subsequent left rows. One hash exchange on ``key`` plus an in-partition
    sort; no range join, no per-key collect. Left rows with no prior right row
    get nulls (left-outer semantics, matching DuckDB's ASOF LEFT JOIN).

    Ties (equal timestamps) resolve as right-row-visible (``<=`` / ``>=``),
    matching DuckDB ASOF semantics.

    ``within``: optional tolerance gate — a callable
    ``(left_t: Column, matched_right_t: Column) -> boolean Column``; a
    matched right row failing it has its carried columns NULLed while
    the left row is kept (pandas ``merge_asof(tolerance=...)``
    semantics). Evaluated post-window, so it adds zero exchanges.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    right_cols = [c for c in right.columns if c != key]
    l_tagged = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    for c in right_cols:
        l_tagged = l_tagged.withColumn(f"{c}{suffix}", F.lit(None))
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    )
    for c in left.columns:
        if c != key:
            r_tagged = r_tagged.withColumn(c, F.lit(None))
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort before left rows at equal __t so they are visible
        w = (
            Window.partitionBy(key)
            .orderBy(F.col("__t").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(key)
            .orderBy(F.col("__t").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    filled = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_cols
        ],
    )
    if within is None:
        carried = {c: F.col(f"__f_{c}") for c in right_cols}
    else:
        ok = F.col(f"__f_{right_ts}").isNotNull() & within(
            F.col("__t"), F.col(f"__f_{right_ts}")
        )
        carried = {c: F.when(ok, F.col(f"__f_{c}")) for c in right_cols}
    out_cols = [F.col(c) for c in left.columns] + [
        carried[c].alias(f"{c}{suffix}") for c in right_cols
    ]
    return filled.where(F.col("__side") == 1).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: list[str],
    condition,
    how: str = "inner",
) -> DataFrame:
    """Equi-keys + theta condition join (e.g. band / interval-overlap joins).

    The equi keys keep the join hash-partitionable — only rows sharing keys
    meet the theta predicate, so this does NOT degenerate to a cross join.
    A pure theta join (no equi keys) broadcasts the smaller side.
    """
    if equi_keys:
        cond = None
        for k in equi_keys:
            c = left[k] == right[k]
            cond = c if cond is None else (cond & c)
        cond = cond & condition
        return left.join(right, cond, how)
    return left.join(F.broadcast(right), condition, how)


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    num_buckets: int = 1 << 20,
) -> DataFrame:
    """Runtime-filtered join: broadcast a Bloom-style bucket set built from
    the dim keys and semi-filter the fact side BEFORE its shuffle.

    The filter is a one-hash Bloom — the distinct set of
    ``xxhash64(key) mod m`` buckets — applied as a broadcast left-semi
    join. False positives pass through and are discarded by the exact join
    that follows; false negatives are impossible, so the result is
    row-identical to the plain join (which is what the oracle runs).

    Scale: the broadcast is at most ``min(|dim keys|, m)`` longs (m = 2^20
    is <= 8 MB); size m ~8-16x the dim key cardinality to keep the false-
    positive rate low. At 100 TB the payoff is that the semi join runs
    map-side over the fact scan, so only the ~selectivity fraction of the
    fact table ever enters the shuffle Exchange for the main join —
    the same effect as Spark's runtime bloom filter
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``), but explicit,
    engine-independent, and usable when the dim side is a subquery the
    optimizer won't infer a filter from.
    """
    bucket = F.pmod(F.xxhash64(F.col(on)), F.lit(num_buckets))
    buckets = dim.select(bucket.alias("__bucket")).distinct()
    pre = (
        fact.withColumn("__bucket", bucket)
        .join(F.broadcast(buckets), "__bucket", "left_semi")
        .drop("__bucket")
    )
    return pre.join(dim, on, how)


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Point-in-interval join WITHOUT equi keys, scalably: the pure theta
    formulation plans as BroadcastNestedLoopJoin (O(n·m) compares, driver
    OOM when neither side is broadcastable). Binning restores a shuffled
    equi-join: each interval explodes to the bins it covers
    (floor(lo/w)..floor(hi/w)), each point maps to exactly ONE bin, the
    sides equi-join on the bin id, and the exact predicate re-verifies.

    Exact (no candidate loss: a point's bin is always within its covering
    interval's bin span) and duplicate-free (one bin per point). Shuffle
    volume: points × 1 + intervals × (span/w + 1); pick ``bin_width`` near
    the median interval span so interval replication is a small constant.
    Inner-join semantics (the filter discards outer nulls).
    """
    p = points.withColumn(
        "__bin", F.floor(F.col(point_col) / bin_width).cast("long")
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width).cast("long"),
                F.floor(F.col(hi_col) / bin_width).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, "__bin")
        .where(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop("__bin")
    )
