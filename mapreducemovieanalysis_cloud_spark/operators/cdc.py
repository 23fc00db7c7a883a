"""Change-data-capture shaping: SCD type-2 interval building.

A warehouse-side staple the reference's two MapReduce jobs never needed,
but any pipeline that ingests mutable entities (user state, document
licensing status, crawl metadata) does: collapse an ordered change log
into one row per (entity, consecutive-state run) with validity intervals
— the slowly-changing-dimension type-2 shape downstream joins expect.

Implementation is the sessionize pattern (operators/curation.py) with a
state-change boundary instead of a time gap: lag marks transitions, a
running sum numbers versions, a group-by collapses runs, and a final lead
window closes each interval with the next version's start. All four
passes — two windows, the group-by, the lead — cluster on the entity key,
so Spark plans ONE hash exchange for the whole operator (HashPartitioning
on the key satisfies every downstream clustering requirement).

Determinism: timestamps format to strings; the open interval's end is the
classic '9999-12-31 00:00:00' sentinel rather than NULL so the hash
compare never depends on engine null ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OPEN_END = "9999-12-31 00:00:00"


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
    formatted: bool = True,
) -> DataFrame:
    """One row per consecutive run of ``state_col`` per ``key_col``:
    (key, version BIGINT, state, valid_from, valid_to, n_events).

    ``version`` numbers runs 1..k in time order; ``valid_to`` is the next
    run's ``valid_from`` (half-open intervals), ``OPEN_END`` for the
    current run. ``tiebreak_col`` fixes within-timestamp order.

    ``formatted=False`` keeps valid_from/valid_to as RAW timestamps
    (valid_to NULL for the open run) — required by consumers that join
    against the boundaries (point-in-time lookup), where the
    seconds-resolution string format would silently round a
    microsecond boundary down past a snapshot instant.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = (
        df.withColumn(
            "__chg",
            F.when(
                F.lag(state_col).over(w).isNull()
                | (F.lag(state_col).over(w) != F.col(state_col)),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "version",
            F.sum("__chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    runs = changed.groupBy(key_col, "version").agg(
        F.min(state_col).alias("state"),
        F.min(ts_col).alias("__vf"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy("version")
    if not formatted:
        return runs.select(
            F.col(key_col),
            F.col("version").cast("long").alias("version"),
            "state",
            F.col("__vf").alias("valid_from"),
            F.lead("__vf").over(wv).alias("valid_to"),
            "n_events",
        )
    return runs.select(
        F.col(key_col),
        F.col("version").cast("long").alias("version"),
        "state",
        F.date_format("__vf", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("__vf").over(wv), "yyyy-MM-dd HH:mm:ss"),
            F.lit(OPEN_END),
        ).alias("valid_to"),
        "n_events",
    )
