"""Skew mitigation: salted two-stage aggregation.

AQE's skew-join splitting handles joins; hot *aggregation* keys still funnel
into one reducer (the same pathology the reference would hit if one movieId
dominated reviews.csv — its HashPartitioner sends every row for the key to a
single reduce call, MovieRank.java:99-115). Salting splits each key across N
sub-aggregates, then merges: two small shuffles instead of one skewed one.

Correctness is exact for any distributive/algebraic aggregate (count, sum,
min, max — and avg as sum+count): the salt only changes association order,
and the cents/integer conventions keep even float measures order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.rounding import (
    round_half_up_long,
)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output name -> (partial_agg_expr, merge_agg_expr), e.g.
    ``{"n": (F.count(F.lit(1)), F.sum("n"))}``. Stage 1 groups by
    (keys, salt) — spreading a hot key over ``salt_buckets`` reducers —
    stage 2 merges the partials per key.
    """
    # Salt from a deterministic row hash, not monotonically_increasing_id():
    # the id depends on partition placement, so task retries would re-salt
    # rows differently — merged results stay exact (stage 2 is algebraic)
    # but partials become nondeterministic. xxhash64 over the row is stable
    # across retries and still spreads a hot key over all buckets.
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: salt the fact side, replicate the dim side.

    Each fact row gets a deterministic salt in [0, salt_buckets); the dim
    side is exploded ``salt_buckets``× so every (key, salt) bucket finds
    its match. A hot fact key that would funnel into one join task now
    spreads over ``salt_buckets`` tasks, at the cost of replicating only
    the SMALL side — the classic manual alternative when AQE's runtime
    skew split can't kick in (e.g. the skew is inside one already-small
    partition file, or the join is inside a cached subtree AQE won't
    replan). Result is row-identical to the plain join: salting only
    routes rows, every fact row still meets exactly its key's dim row.
    """
    salted = facts.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*facts.columns), F.lit(salt_buckets)).cast("int"),
    )
    replicated = dim.withColumn(
        "__salt",
        F.explode(
            F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")
        ),
    )
    joined = salted.join(
        replicated,
        (F.col(key) == F.col(dim_key)) & (salted["__salt"] == replicated["__salt"]),
    )
    return joined.drop("__salt")


def salted_count_sum_cents(
    df: DataFrame,
    keys: list[str],
    measure: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Salted count + exact-cents sum (the common hot-key shape)."""
    cents = round_half_up_long(F.col(measure) * 100)
    return salted_agg(
        df,
        keys,
        {
            "n": (F.count(F.lit(1)), F.sum("n").cast("long")),
            "sum_cents": (F.sum(cents), F.sum("sum_cents").cast("long")),
        },
        salt_buckets,
    )


def fan_out_underparallel(df: DataFrame) -> DataFrame:
    """Round-robin-rebalance a frame whose physical partitioning is
    narrower than the session's default parallelism; a no-op otherwise.

    The idle-capacity fix for UNSPLITTABLE small inputs (guide §2.5
    "input skew" / §2.6): a single-file, single-row-group parquet table
    scans as ONE task, so every map-side expression downstream of it —
    tokenize, shingle, md5, explode — runs on one core while the rest
    of the cluster idles.  Measured on the round-13 probes (sf0.1,
    local[32], every driver table is one row group): minhash signature
    derivation 1.64 s -> 0.55 s just by spreading the tokenized frame
    across the cores.

    Scale posture: the condition is SELF-EXTINGUISHING.  At 100 TB a
    table scans as thousands of splits >= cluster cores, the predicate
    is false, and the plan carries zero extra Exchange.  The rebalance
    only fires when the input is small relative to the cluster — which
    is exactly when one extra round-robin shuffle of it is cheap, and
    when NOT firing leaves the whole cluster serialized on one task.
    Callers apply it to narrow projections (ids + derived arrays), not
    raw wide rows, so the rebalanced bytes stay proportional to the
    columns the downstream compute actually needs.

    ``df.rdd.getNumPartitions()`` finalizes a classic physical plan for
    the frame (no job is launched); apply this to scan-adjacent frames,
    not deep mid-plan subtrees.

    ``SPARK_GRAFT_FANOUT=0`` disables the rebalance (the parameterised
    kill-switch the optimization rules require for any scale-dependent
    behavior; default on — the local bench is exactly the under-parallel
    case the rebalance exists for)."""
    import os

    if os.environ.get("SPARK_GRAFT_FANOUT", "1") == "0":
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
