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

from mapreducemovieanalysis_cloud_spark.functions.rounding import (
    round_half_up_long,
)

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
    cents = round_half_up_long(F.col(value_col) * 100)
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


def resample_hourly_interp(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Linear interpolation at interior hour boundaries per key — the
    gap-fill complement of LOCF (sensor/metric series want the straight
    line between observations, not a step function): one row per (user,
    hour) for every hour boundary STRICTLY inside the user's observed
    span, with the value linearly interpolated between the nearest
    observation at-or-before and strictly-after the boundary.

    Exactness: values quantize to int64 micro units up front; the
    interpolation term is pure integer arithmetic
    (``pv + sign * (|nv-pv| * (g-pt)) div (nt-pt)`` — abs/sign split so
    truncating integer division agrees across engines for negative
    slopes).  Duplicate timestamps collapse to the (ts, tiebreak)-latest
    observation first, so time -> value is a function.

    Plan shape: one aggregate collapses duplicates, one per-user span
    aggregate explodes the hour grid (span-bounded, never
    event-bounded), then grid + observations merge into ONE per-user
    ordered stream where two RUNNING frames — forward sort for prev,
    reverse sort for next — supply the neighbors in O(rows): a single
    user-keyed exchange (two in-partition sorts), no as-of join, no
    self-join, and no O(rows^2) unbounded-following frame."""
    us = F.unix_micros(F.col(ts_col))
    vm = round_half_up_long(F.col(value_col) * 1_000_000)
    obs = (
        df.select(
            F.col(user_col),
            us.alias("t"),
            F.col(tiebreak_col).alias("__tb"),
            vm.alias("__vm"),
        )
        .groupBy(user_col, "t")
        .agg(F.max_by("__vm", F.col("__tb")).alias("vm"))
    )
    span = obs.groupBy(user_col).agg(
        F.min("t").alias("__lo"), F.max("t").alias("__hi")
    )
    h = F.lit(US_PER_HOUR)
    grid = span.where(
        (F.col("__lo") / h).cast("long") + 1
        <= ((F.col("__hi") - 1) / h).cast("long")
    ).select(
        F.col(user_col),
        F.explode(
            F.sequence(
                (F.col("__lo") / h).cast("long") + 1,
                ((F.col("__hi") - 1) / h).cast("long"),
            )
        ).alias("__h"),
    )
    merged = obs.select(
        user_col, "t", F.lit(0).alias("__is_grid"), "vm"
    ).unionByName(
        grid.select(
            F.col(user_col),
            (F.col("__h") * US_PER_HOUR).alias("t"),
            F.lit(1).alias("__is_grid"),
            F.lit(None).cast("long").alias("vm"),
        )
    )
    # observations sort before a grid point at the same instant, so a
    # boundary landing exactly on an observation interpolates to it
    w = Window.partitionBy(user_col).orderBy("t", "__is_grid")
    prev_frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # "nearest following observation" as a RUNNING frame over the exact
    # reverse sort, not rowsBetween(1, unboundedFollowing): Spark's
    # unbounded-FOLLOWING frame re-aggregates from each row to the
    # partition end (O(rows^2) per key — measured 6-8 s on a 1 M-row
    # merge), while both running frames stream in O(rows).  (t,
    # __is_grid) is unique per user, so the reverse order is exact and
    # `last` over (unboundedPreceding, -1) of the reverse sort is
    # precisely the first non-null strictly after the row in forward
    # order.  Same partitioning key -> still ONE exchange, two
    # in-partition sorts.
    w_rev = Window.partitionBy(user_col).orderBy(
        F.col("t").desc(), F.col("__is_grid").desc()
    )
    next_frame = w_rev.rowsBetween(Window.unboundedPreceding, -1)
    obs_t = F.when(F.col("__is_grid") == 0, F.col("t"))
    filled = merged.select(
        F.col(user_col),
        "t",
        "__is_grid",
        F.last("vm", ignorenulls=True).over(prev_frame).alias("pv"),
        F.last(obs_t, ignorenulls=True).over(prev_frame).alias("pt"),
        F.last("vm", ignorenulls=True).over(next_frame).alias("nv"),
        F.last(obs_t, ignorenulls=True).over(next_frame).alias("nt"),
    ).where(
        (F.col("__is_grid") == 1)
        & F.col("pv").isNotNull()
        & F.col("nv").isNotNull()
    )
    # the |Δv| * Δt product overflows int64 for long gaps (5e8 micro x a
    # multi-hour gap in epoch-micros); widen to DECIMAL(38) for the one
    # multiply-divide — operands are positive after the abs/sign split,
    # so Spark's `div` and DuckDB's HUGEINT `//` truncate identically
    d = F.col("nv") - F.col("pv")
    q = F.expr(
        "CAST((CAST(abs(nv - pv) AS DECIMAL(38,0)) * (t - pt))"
        " div (nt - pt) AS BIGINT)"
    )
    return filled.select(
        F.col(user_col),
        F.date_format(
            F.timestamp_micros(F.col("t")), "yyyy-MM-dd HH:mm:ss"
        ).alias("hour"),
        (
            F.col("pv") + F.when(d < 0, -q).otherwise(q)
        ).alias("interp_micro"),
    )


def peak_concurrency(
    df: DataFrame,
    key_col: str,
    start_us_col: str = "__s",
    end_us_col: str = "__e",
) -> DataFrame:
    """Sweep-line peak concurrency per key over [start, end) intervals:
    (key, n_intervals, max_concurrent) — the capacity-planning statistic
    (max simultaneous sessions / transfers / rentals) that a naive
    interval self-join computes quadratically and this computes in one
    sort.

    Each interval contributes +1 at start and -1 at end; deltas collapse
    per (key, instant) FIRST (so ends and starts at the same instant net
    out — the closed-open convention where a slot freed at t is reusable
    at t), then one ordered running sum per key; the peak is the max
    running total.  Ties need no tiebreak: net deltas are aggregated per
    instant before the ordered scan, so the cumulative series — and its
    max — is unique whatever the engine's sort is.

    Scale: two shuffles on the key (delta aggregate, ordered window) —
    point volume is 2x intervals, state is one counter per partition
    row.  A key's points must sort in one partition; keys here are
    low-cardinality dimensions (event types, device classes), the
    per-key point count is what grows."""
    points = df.select(
        F.col(key_col), F.col(start_us_col).alias("t"), F.lit(1).alias("d")
    ).unionByName(
        df.select(
            F.col(key_col), F.col(end_us_col).alias("t"), F.lit(-1).alias("d")
        )
    )
    net = points.groupBy(key_col, "t").agg(F.sum("d").alias("net"))
    w = (
        Window.partitionBy(key_col)
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = net.withColumn("cur", F.sum("net").over(w))
    return (
        running.groupBy(key_col)
        .agg(F.max("cur").cast("long").alias("max_concurrent"))
        .join(
            df.groupBy(key_col).agg(
                F.count(F.lit(1)).alias("n_intervals")
            ),
            key_col,
        )
        .select(key_col, "n_intervals", "max_concurrent")
    )


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_us_col: str = "__s",
    end_us_col: str = "__e",
    tiebreak_col: str = "__tb",
) -> DataFrame:
    """Union-of-intervals coverage per key: merge overlapping/touching
    [start, end) intervals into islands and report (key, n_intervals,
    n_islands, covered_us) — utilization/uptime accounting where
    overlapping sessions must not double-count.

    The gaps-and-islands pass: per key in (start, end, tiebreak) order,
    an interval opens a NEW island iff its start exceeds the running max
    of all previous ends (ROWS ... 1 PRECEDING); the island id is the
    running count of opens; coverage sums max(end)-min(start) per
    island.  Touching intervals (start == prev end) merge — [1,3)+[3,5)
    covers 4.  All arithmetic is int64 epoch-micros.

    Scale: one sort shuffle on the key feeds both windows (same
    partitioning and order), then two key-local aggregates; no
    self-join, no explode — the classic O(n^2) overlap join becomes
    O(n log n) sort."""
    w = Window.partitionBy(key_col).orderBy(
        start_us_col, end_us_col, tiebreak_col
    )
    prev_max_end = F.max(end_us_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opens = F.when(
        prev_max_end.isNull() | (F.col(start_us_col) > prev_max_end), 1
    ).otherwise(0)
    islands = df.select(
        F.col(key_col),
        F.col(start_us_col).alias("__s"),
        F.col(end_us_col).alias("__e"),
        F.sum(opens)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("__island"),
    )
    per_island = islands.groupBy(key_col, "__island").agg(
        F.count(F.lit(1)).alias("__n"),
        (F.max("__e") - F.min("__s")).alias("__len"),
    )
    return per_island.groupBy(key_col).agg(
        F.sum("__n").cast("long").alias("n_intervals"),
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum("__len").cast("long").alias("covered_us"),
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
        round_half_up_long(folded * 1_000_000).alias("ewma_micro"),
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


def _with_session_idx(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Tag each event with its gap-based session index — the SAME
    boundary rule as ``curation.sessionize`` (lag over (user, ts,
    tiebreak); a gap > ``gap_seconds`` opens a session), kept here as
    the shared prelude for the session-scoped analytics below so the
    funnel, the transition matrix, and the session rollup can never
    disagree on where a session starts.  Integer-microsecond
    comparisons throughout; adds ``__us`` and ``__sess``."""
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    gap_us = gap_seconds * 1_000_000
    return df.withColumn("__us", us).withColumn(
        "__sess",
        F.sum(
            F.when(
                F.lag("__us").over(w).isNull()
                | (F.col("__us") - F.lag("__us").over(w) > gap_us),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def session_funnel_counts(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Ordered funnel WITHIN a session: for each stage i, the number of
    SESSIONS whose first stage-i event strictly follows their
    (recursively constrained) first stage-(i-1) event in the same
    session.  Output: (stage_idx INT, stage, n_sessions), one row per
    stage.

    ``funnel_counts`` answers "did the user ever convert"; this answers
    the stricter product question "does a single visit convert" — a
    user who views today and purchases next week counts there but not
    here.

    Scale: ONE user-keyed exchange serves the sessionization windows,
    then each stage is one filtered aggregate keyed on (user, session)
    joined to the previous frontier — same-key joins throughout, no
    per-session event arrays (the collect_list formulation balloons hot
    sessions; this never materializes a session's history)."""
    typed = _with_session_idx(
        df, user_col, ts_col, tiebreak_col, gap_seconds
    ).select(F.col(user_col).alias("__u"), "__sess", type_col, "__us")
    frontier = None
    out_rows = []
    for i, stage in enumerate(stages):
        stage_events = typed.where(F.col(type_col) == stage)
        if frontier is None:
            frontier = stage_events.groupBy("__u", "__sess").agg(
                F.min("__us").alias("__t")
            )
        else:
            frontier = (
                stage_events.join(
                    frontier.select(
                        "__u", "__sess", F.col("__t").alias("__prev")
                    ),
                    ["__u", "__sess"],
                )
                .where(F.col("__us") > F.col("__prev"))
                .groupBy("__u", "__sess")
                .agg(F.min("__us").alias("__t"))
            )
        out_rows.append(
            frontier.agg(F.count(F.lit(1)).alias("n_sessions")).select(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(stage).alias("stage"),
                "n_sessions",
            )
        )
    result = out_rows[0]
    for r in out_rows[1:]:
        result = result.unionAll(r)
    return result


def session_transition_counts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """First-order Markov transition matrix over consecutive events
    WITHIN a session: (from_type, to_type, n_trans, p_permille) where
    p_permille = n_trans·1000 div Σ_to n_trans — the next-action prior
    a sequence model (or a funnel designer) reads off the log.  A
    session boundary breaks the chain: the last event of one session
    and the first of the next are NOT a transition.

    Exactness: integer counts and one integer permille division —
    engine-identical bit-for-bit.  Scale: the sessionize windows and
    the lead() share ONE user-keyed exchange; the aggregate output is
    |event types|² rows, so everything after the window pass is
    broadcast-sized."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    tagged = _with_session_idx(
        df, user_col, ts_col, tiebreak_col, gap_seconds
    ).select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
        (F.lead("__sess").over(w) == F.col("__sess")).alias("__same"),
    )
    cnt = (
        tagged.where(F.col("__same") & F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    tot = Window.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        F.col("n_trans").cast("long").alias("n_trans"),
        F.expr("n_trans * 1000").cast("long").alias("__num"),
        F.sum("n_trans").over(tot).cast("long").alias("__den"),
    ).select(
        "from_type",
        "to_type",
        "n_trans",
        F.expr("__num div __den").cast("long").alias("p_permille"),
    )
