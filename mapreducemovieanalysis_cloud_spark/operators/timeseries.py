"""Time-series shaping over the events table: regular-grid resampling with
last-observation-carried-forward, and ordered funnel analysis.

Both are event-pipeline staples the relational surface doesn't cover
directly: resampling turns an irregular event stream into the fixed-step
series feature pipelines expect; funnels measure ordered conversion
(view -> click -> purchase) across millions of users.

Determinism: grid positions are integer epoch-hours (``unix_micros div
3_600_000_000``) — never float bucketing; the carried value is picked by
(ts, tiebreak) max within the bucket, then carried with
``last(ignorenulls)`` over the integer grid order; money is exact cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_HOUR = 3_600_000_000


def resample_hourly_locf(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """One row per (user, hour) from the user's first to last active hour:
    event count in the hour and the latest value as of that hour
    (last-observation-carried-forward across empty hours), in exact cents.

    Plan shape: one aggregate collapses events to occupied hours (the
    in-hour "latest" is an integer max over (us, tiebreak) packed
    comparisons — no row_number pass), a per-user sequence explodes the
    full grid, and a left join + LOCF window fills gaps. Every stage
    clusters on user_id. Grid size is span-bounded (users x hours), never
    event-bounded, so the explode cannot amplify a hot user's volume.
    """
    us = F.unix_micros(F.col(ts_col))
    hour = (us / F.lit(US_PER_HOUR)).cast("long")
    cents = F.round(F.col(value_col) * 100).cast("long")
    # latest event per occupied hour via max_by over the (us, tiebreak)
    # total order; count per hour rides along in the same aggregate
    occupied = (
        df.select(
            F.col(user_col),
            hour.alias("hour_idx"),
            us.alias("__us"),
            F.col(tiebreak_col).alias("__tb"),
            cents.alias("__cents"),
        )
        .groupBy(user_col, "hour_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max_by(
                "__cents", F.struct(F.col("__us"), F.col("__tb"))
            ).alias("__hour_cents"),
        )
    )
    span = occupied.groupBy(user_col).agg(
        F.min("hour_idx").alias("__lo"), F.max("hour_idx").alias("__hi")
    )
    grid = span.select(
        F.col(user_col),
        F.explode(F.sequence("__lo", "__hi")).alias("hour_idx"),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy("hour_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        grid.join(occupied, [user_col, "hour_idx"], "left")
        .withColumn(
            "value_cents", F.last("__hour_cents", ignorenulls=True).over(w)
        )
        .withColumn("n_events", F.coalesce("n_events", F.lit(0)))
    )
    return filled.select(
        F.col(user_col),
        F.date_format(
            F.timestamp_micros(F.col("hour_idx") * US_PER_HOUR),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("hour"),
        "n_events",
        "value_cents",
    )


def ewma_per_key(
    df: DataFrame,
    alpha: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Exponentially-weighted moving average per key: one row
    (key, n_events, ewma_micro) where the state folds s' = s*(1-alpha) +
    x*alpha over the (ts, tiebreak)-ordered series, seeded by the first
    observation — the classic smoothing pass behind monitoring baselines
    and feature decay.

    Determinism across engines: the fold ORDER is total ((ts, tiebreak)
    sort inside one array_sort), every multiply/add is IEEE-754 double in
    the same association, and only the FINAL state is rounded (micro
    units) — so a serial engine folding the same series bit-matches.

    Scale: one aggregate — map-side partial collect into per-key struct
    arrays, order restored by array_sort, fold inside the same expression;
    no window pass, no second shuffle. State is O(1) per key; the array is
    bounded by a key's history (cap upstream with ``cap_per_group`` for
    adversarial keys, as with ``user_event_sequences``)."""
    a = float(alpha)
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("__us"),
                F.col(tiebreak_col).alias("__tb"),
                F.col(value_col).cast("double").alias("__v"),
            )
        )
    )
    vals = F.transform(arr, lambda s: s["__v"])
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda s, x: s * F.lit(1.0 - a) + x * F.lit(a),
    )
    return df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(folded * 1_000_000).cast("long").alias("ewma_micro"),
    )


def funnel_counts(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: for each stage i, the number of users
    whose first stage-i event STRICTLY follows their (recursively
    constrained) first stage-(i-1) event. Output: (stage_idx INT, stage,
    n_users), one row per stage.

    Each stage is one filtered aggregate on user_id joined to the previous
    frontier — same-key joins throughout, |stages| passes over an
    already-filtered slice, no per-user event arrays (the collect_list
    formulation balloons hot users; this never materializes a user's
    history)."""
    us = F.unix_micros(F.col(ts_col))
    typed = df.select(F.col(user_col), F.col(type_col), us.alias("__us"))
    frontier = None
    out_rows = []
    for i, stage in enumerate(stages):
        stage_events = typed.where(F.col(type_col) == stage)
        if frontier is None:
            frontier = stage_events.groupBy(user_col).agg(
                F.min("__us").alias("__t")
            )
        else:
            frontier = (
                stage_events.join(
                    frontier.select(user_col, F.col("__t").alias("__prev")),
                    user_col,
                )
                .where(F.col("__us") > F.col("__prev"))
                .groupBy(user_col)
                .agg(F.min("__us").alias("__t"))
            )
        out_rows.append(
            frontier.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(stage).alias("stage"),
                "n_users",
            )
        )
    result = out_rows[0]
    for r in out_rows[1:]:
        result = result.unionAll(r)
    return result


def user_event_sequences(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    sep: str = ">",
) -> DataFrame:
    """Ordered action sequence per user — the log-to-training-sequence
    pass (next-action prediction corpora): (user, seq string, n_events,
    first/last formatted timestamps).

    One aggregate: events collapse into per-user sorted struct arrays
    (map-side partial collect, exact (ts, tiebreak) order restored by
    array_sort — no window pass, no second shuffle). Hot users bound the
    array size; cap upstream with ``cap_per_group`` when a user can
    exceed executor memory.
    """
    us = F.unix_micros(F.col(ts_col))
    return (
        df.select(
            F.col(user_col),
            us.alias("__us"),
            F.col(tiebreak_col).alias("__tb"),
            F.col(type_col).alias("__ty"),
            F.col(ts_col).alias("__ts"),
        )
        .groupBy(user_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__us", "__tb", "__ty"))
                    ),
                    lambda s: s["__ty"],
                ),
                sep,
            ).alias("seq"),
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("__ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "first_ts"
            ),
            F.date_format(F.max("__ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "last_ts"
            ),
        )
    )
