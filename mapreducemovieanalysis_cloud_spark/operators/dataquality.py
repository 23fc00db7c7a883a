"""Declarative data-quality constraint checking (the Deequ-style gate).

A pipeline ingesting 100 TB/day promotes a batch only after its quality
contract holds: completeness of required columns, key uniqueness, value
ranges, accepted-value domains, referential integrity.  This module
evaluates a constraint suite as ordinary aggregates and returns one row
per constraint — (constraint, metric_micro, passed) — so the gate is a
DataFrame like everything else (joinable into run ledgers, assertable in
CI, oracle-checkable).

Exactness: every metric is an integer micro-ratio ``(num * 1_000_000) div
den`` — no float division anywhere, so pass thresholds compare int64 and
any engine agrees bit-for-bit.

Scale: completeness/range/domain metrics for ONE table fuse into a single
scan with conditional aggregates (one pass however many constraints);
uniqueness adds one count-distinct aggregate; referential integrity is a
left-anti join that shuffles only the key column (or broadcasts the
dimension side when it fits).  Nothing here is per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def check_constraints(
    df: DataFrame,
    completeness_cols: list[str],
    unique_col: str,
    range_checks: list[tuple[str, str]],
    domain_checks: list[tuple[str, list[str]]],
    threshold_micro: int = MICRO,
) -> DataFrame:
    """Single-scan constraint suite over one table.

    * completeness(c): non-null fraction of column c
    * uniqueness(c):   distinct / total of column c
    * range(name, predicate-SQL): fraction of rows satisfying the predicate
    * domain(c, values): fraction of rows whose c is in the accepted set

    passed = 1 iff metric_micro >= threshold_micro (defaults to exact
    1.0, i.e. the constraint must hold for every row).  Output:
    (constraint STRING, metric_micro BIGINT, passed INT), one row per
    constraint, produced by ONE aggregate over the table.

    An EMPTY batch fails closed: every metric reports 0 and the gate
    blocks promotion (Deequ's behavior — its metrics go NaN on empty
    data and assertions fail). A zero-row ingest almost always means
    an upstream failure, not a clean batch; a pipeline that wants
    emptiness to pass adds an explicit row-count constraint instead of
    this gate silently promoting it (r08 empty-input sweep).
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    names: list[str] = []
    for c in completeness_cols:
        a = f"completeness_{c}"
        names.append(a)
        aggs.append(F.sum(F.col(c).isNotNull().cast("long")).alias(a))
    names.append(f"uniqueness_{unique_col}")
    aggs.append(
        F.count_distinct(F.col(unique_col)).alias(
            f"uniqueness_{unique_col}"
        )
    )
    for name, pred in range_checks:
        a = f"range_{name}"
        names.append(a)
        aggs.append(
            F.sum(F.expr(pred).cast("long")).alias(a)
        )
    for c, values in domain_checks:
        a = f"domain_{c}"
        names.append(a)
        aggs.append(
            F.sum(F.col(c).isin(values).cast("long")).alias(a)
        )
    wide = df.agg(*aggs)
    per_constraint = F.array(
        *[
            F.struct(
                F.lit(n).alias("constraint"),
                # fail-closed: empty batch (__n = 0) reports 0, never
                # DIVIDE_BY_ZERO (ANSI) or a vacuous pass
                F.expr(
                    f"CASE WHEN `__n` = 0 THEN 0 "
                    f"ELSE (`{n}` * {MICRO}) div `__n` END"
                ).alias("metric_micro"),
            )
            for n in names
        ]
    )
    return (
        wide.select(F.explode(per_constraint).alias("c"))
        .select(
            F.col("c.constraint").alias("constraint"),
            F.col("c.metric_micro").alias("metric_micro"),
        )
        .withColumn(
            "passed",
            (F.col("metric_micro") >= F.lit(threshold_micro)).cast("int"),
        )
    )


def referential_integrity(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    threshold_micro: int = MICRO,
) -> DataFrame:
    """Fraction of fact rows whose key exists in the dimension, as the
    same (constraint, metric_micro, passed) row shape.

    Plan: left-semi join on the key (payload never moves; dimension
    broadcasts when it fits) + the fact count — two aggregates total."""
    n = fact.agg(F.count(F.lit(1)).alias("__n"))
    matched = (
        fact.select(F.col(fact_key))
        .join(
            dim.select(F.col(dim_key)),
            F.col(fact_key) == F.col(dim_key),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("__m"))
    )
    return (
        n.crossJoin(F.broadcast(matched))
        .select(
            F.lit(f"referential_{fact_key}").alias("constraint"),
            # same fail-closed empty-batch convention as
            # check_constraints
            F.expr(
                f"CASE WHEN __n = 0 THEN 0 "
                f"ELSE (__m * {MICRO}) div __n END"
            ).alias("metric_micro"),
        )
        .withColumn(
            "passed",
            (F.col("metric_micro") >= F.lit(threshold_micro)).cast("int"),
        )
    )
