"""Event-time windowed aggregation — SURVEY §2.2 row 9 (absent from the
reference, which is pure batch).

The same ``F.window`` / ``F.session_window`` expressions run in batch and in
Structured Streaming; the streaming path adds a watermark for state eviction
and late-data drop. Keeping one definition for both is the point: the
correctness oracle checks the batch semantics, streaming tests check that the
incremental execution converges to the identical result.

Scale: windowed aggregation shuffles on (window, keys); watermarks bound the
state store. Session windows merge within the state store — the gap duration
bounds per-key state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.rounding import (
    round_half_up_long,
)

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _fmt(col: Column, alias: str) -> Column:
    return F.date_format(col, TS_FMT).alias(alias)


def _cents(col: str) -> Column:
    return round_half_up_long(F.col(col) * 100)


def tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Non-overlapping event-time windows: count + exact-cents sum."""
    return (
        events.groupBy(F.window(ts_col, duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(value_col)).alias("sum_cents"),
        )
        .select(
            _fmt(F.col("w.start"), "window_start"),
            _fmt(F.col("w.end"), "window_end"),
            "n_events",
            "sum_cents",
        )
    )


def sliding_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide windows)."""
    return (
        events.groupBy(F.window(ts_col, duration, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_cents(value_col)).alias("sum_cents"),
        )
        .select(
            _fmt(F.col("w.start"), "window_start"),
            _fmt(F.col("w.end"), "window_end"),
            "n_events",
            "sum_cents",
        )
    )


def session_agg(
    events: DataFrame,
    gap: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based session windows per key: a session extends while successive
    events arrive within ``gap``; window end = last event + gap."""
    return (
        events.groupBy(
            F.col(key_col), F.session_window(ts_col, gap).alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            _fmt(F.col("w.start"), "session_start"),
            _fmt(F.col("w.end"), "session_end"),
            "n_events",
        )
    )


def streaming_tumbling_counts(
    stream: DataFrame,
    duration: str = "10 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming tumbling counts with a watermark: state for windows older
    than (max event time − watermark) is evicted, later-arriving rows are
    dropped — bounded state at unbounded input."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, duration).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def sliding_reach_windows(
    events: DataFrame,
    duration: str = "24 hours",
    slide: str = "6 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    member_col: str = "user_id",
) -> DataFrame:
    """Batch twin of ``streaming_sliding_reach``: exact distinct members
    per (sliding window, key).  One definition of the window grid for
    both engines, so the streaming convergence test compares like with
    like (the per-event trailing variant lives in
    operators/series.py:sliding_distinct — this is the window-grid tier)."""
    return (
        events.groupBy(
            F.window(ts_col, duration, slide).alias("w"), F.col(key_col)
        )
        .agg(F.count_distinct(F.col(member_col)).alias("reach"))
        .select(
            _fmt(F.col("w.start"), "window_start"),
            F.col(key_col),
            F.col("reach").cast("long").alias("reach"),
        )
    )


def streaming_sliding_reach(
    stream: DataFrame,
    duration: str = "24 hours",
    slide: str = "6 hours",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    member_col: str = "user_id",
) -> DataFrame:
    """Streaming sliding-window distinct reach — the watermarked scale
    tier that operators/series.py:sliding_distinct's docstring points to
    when even two sorted batch passes are too dear.

    TWO chained stateful operators, both watermark-bounded (Spark's
    multiple-stateful-operator support): the windowed projection keeps
    the event-time metadata on the window column, so the
    ``dropDuplicates`` state holds one row per (window, key, member)
    inside the watermark horizon, and the downstream count aggregates
    the survivors per (window, key).  Exact — not a sketch; swap the
    final agg to ``approx_count_distinct`` on the raw stream for the
    HLL tier when member cardinality per window is itself the problem.

    Append mode emits each window once, when the watermark passes its
    end — the convergence test closes windows with a sentinel event.
    """
    w1 = stream.withWatermark(ts_col, watermark).select(
        F.window(ts_col, duration, slide).alias("w"),
        F.col(key_col),
        F.col(member_col),
    )
    return (
        w1.dropDuplicates(["w", key_col, member_col])
        .groupBy("w", key_col)
        .agg(F.count(F.lit(1)).alias("reach"))
        .select(
            _fmt(F.col("w.start"), "window_start"),
            F.col(key_col),
            F.col("reach").cast("long").alias("reach"),
        )
    )
