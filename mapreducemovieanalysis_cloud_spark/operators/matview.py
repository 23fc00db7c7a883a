"""Incremental materialized-view maintenance for algebraic aggregates.

The warehouse pattern: an aggregate MV is materialized ONCE over the
base facts; each new fact batch refreshes it by aggregating ONLY the
delta and merging partial states — the base is never re-scanned.  This
works exactly for algebraic aggregates (SUM/COUNT here; MIN/MAX merge
the same way; AVG = SUM/COUNT at read time), which is also why the
engine's cents-integer discipline matters: integer partials merge
associatively with no summation-order drift, so an incrementally
maintained MV is BIT-IDENTICAL to a full recompute — provable by oracle,
not just approximately fresh.

Scale: the refresh cost is O(delta) + O(|MV|) regardless of base size —
the difference between a nightly full re-aggregation of 100 TB and a
merge of one day's partition against a group-cardinality-sized view.
The merge is a full-outer join on the MV key (group cardinality rows on
one side, delta groups on the other); either side missing contributes
its partial unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_mv(
    facts: DataFrame, keys: list[str], cents_col: F.Column
) -> DataFrame:
    """Partial-state aggregate: (keys..., revenue_cents, n_rows)."""
    return facts.select(*keys, cents_col.alias("__cents")).groupBy(
        *keys
    ).agg(
        F.sum("__cents").alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_mv(stored: DataFrame, delta_agg: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two partial-state MVs: full-outer on the keys, partials sum
    with missing-side zero.  Associative and commutative, so deltas can
    arrive in any order / any batching and the view stays exact."""
    d = delta_agg.select(
        *[F.col(k).alias(f"__d_{k}") for k in keys],
        F.col("revenue_cents").alias("__d_cents"),
        F.col("n_rows").alias("__d_rows"),
    )
    cond = None
    for k in keys:
        c = stored[k].eqNullSafe(d[f"__d_{k}"])
        cond = c if cond is None else (cond & c)
    return (
        stored.join(d, cond, "full_outer")
        .select(
            *[
                F.coalesce(stored[k], d[f"__d_{k}"]).alias(k)
                for k in keys
            ],
            (
                F.coalesce(stored["revenue_cents"], F.lit(0))
                + F.coalesce(d["__d_cents"], F.lit(0))
            ).alias("revenue_cents"),
            (
                F.coalesce(stored["n_rows"], F.lit(0))
                + F.coalesce(d["__d_rows"], F.lit(0))
            ).alias("n_rows"),
        )
    )
