"""Ordered-series kernels over the events stream: CUSUM change-point
excursion, time-weighted average, trailing-window exact median, OHLC
candle bars, sliding distinct cardinality, and consecutive-day streaks.

These are the per-key sequential statistics feature pipelines ask for
once the basic window family (lag/lead/moving-avg) exists: drift
localization (CUSUM), duration-weighted level (TWAP), robust local level
(rolling median), bar compression (OHLC), rolling reach (sliding
distinct), and engagement persistence (streaks).

Determinism discipline (the wave-1..7 contract): every input is reduced
to int64 (cents / epoch units / ranks) before any arithmetic; the only
float steps are single scalar double expressions on identical integer
operands, micro-rounded once — or, for medians, the exact ``2×median``
trick: 2·median of an int multiset is itself an integer (middle value
doubled, or the sum of the two middles), so ROUND(2·median) is
bit-identical across engines regardless of their interpolation paths.

Scale posture: every kernel is a single pass clustered on its series
key — one user-partitioned window plus one partial/final aggregate.
Nothing materializes a per-key buffer except the sliding-distinct frame
(bounded by the key's 24 h active-user cardinality; the 100 TB tier is
the streaming watermark variant or HLL, see docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.rounding import (
    round_half_up_long,
)

US_PER_HOUR = 3_600_000_000


def _cents(value_col: str) -> Column:
    return round_half_up_long(F.col(value_col) * 100)


def cusum_max_excursion(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Maximum CUSUM excursion of each key's value series, n-scaled so the
    arithmetic never leaves int64-exact integers.

    The CUSUM statistic at step k is C_k = Σ_{i<=k}(v_i − mean); its max
    |C_k| localizes the strongest level shift in the series (Page's
    change-point heuristic).  Multiplying through by n gives
    D_k = n·S_k − k·T (S_k running sum, T series total) — an INTEGER whose
    max abs and argmax are the same argmax as C_k.  Output per key:
    n, ``excursion_n_cents`` = max|D_k| (n-scaled cents), and ``at_k`` =
    the earliest 1-based step attaining it.

    Scale: ONE exchange on the key — the ordered running-sum window, the
    unordered (n, T) windows, and the final argmax aggregate all share
    the same partitioning, so the series never crosses partitions and
    the fact scans once.
    Magnitude bound: |D_k| <= n²·max_cents, safely inside int64 for
    per-key series below ~10⁶ rows at TPC-H-like value ranges.
    """
    v = _cents(value_col)
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    w_all = Window.partitionBy(key_col)
    # (n, T) ride unordered windows over the SAME partition key as the
    # ordered running-sum window, so the whole derivation is one exchange
    # and one scan — no totals join back onto the fact.
    stepped = df.select(
        F.col(key_col),
        v.alias("__v"),
        F.row_number().over(w).alias("__k"),
        F.sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "__s"
        ),
    ).select(
        F.col(key_col),
        F.col("__k"),
        F.col("__s"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("__v").over(w_all).alias("__tot"),
    )
    dev = stepped.select(
        F.col(key_col),
        F.col("n"),
        F.col("__k"),
        F.abs(
            F.col("n") * F.col("__s") - F.col("__k") * F.col("__tot")
        ).alias("__ad"),
    )
    return dev.groupBy(key_col, "n").agg(
        F.max("__ad").cast("long").alias("excursion_n_cents"),
        F.min_by("__k", F.struct(-F.col("__ad"), F.col("__k")))
        .cast("long")
        .alias("at_k"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average value per key (TWAP): each observation holds
    until the next one; the weight is the hold duration in epoch
    milliseconds; the final observation (no successor) carries no weight.

    Output: key, ``n_segments`` (rows with a successor), and
    ``twap_cents_milli`` = ROUND(Σ(v·dt)/Σ(dt) · 1000) — the one double
    division on two exact int64 sums, milli-rounded once.  Keys with a
    single event have no held segment and are excluded (the duration-
    weighted level is undefined, matching the SQL oracle's join-through).

    Scale: one lead() window within the key partition and one same-key
    aggregate; products are cents×ms bounded by the series span, int64-
    safe to multi-year spans at 10⁵-cent values.
    """
    v = _cents(value_col)
    ms = (F.unix_micros(F.col(ts_col)) / F.lit(1000)).cast("long")
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    seg = (
        df.select(
            F.col(key_col),
            v.alias("__v"),
            ms.alias("__ms"),
            F.lead(ms).over(w).alias("__next_ms"),
        )
        .where(F.col("__next_ms").isNotNull())
        .select(
            F.col(key_col),
            (F.col("__next_ms") - F.col("__ms")).alias("__dt"),
            F.col("__v"),
        )
    )
    return seg.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.round(
            F.sum(F.col("__v") * F.col("__dt")).cast("double")
            / F.sum("__dt").cast("double")
            * 1000
        )
        .cast("long")
        .alias("twap_cents_milli"),
    )


def rolling_median(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    window_rows: int = 5,
) -> DataFrame:
    """Exact trailing-``window_rows`` median of each key's value series,
    reported as ``med2_cents`` = 2×median (always an integer for integer
    inputs: the doubled middle value, or the sum of the two middles when
    the frame holds an even count — so linear-interpolation differences
    between engines cannot appear).

    Output: one row per input event — id, key, ``v_cents``, ``med2_cents``.

    Scale: one ROWS-frame window pass clustered on the key; the frame
    buffer is ``window_rows`` values regardless of series length, so the
    operator is a constant-memory streaming fold per partition.
    """
    v = _cents(value_col)
    frame = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    return df.select(
        F.col(tiebreak_col),
        F.col(key_col),
        v.alias("v_cents"),
        F.round(F.expr(f"percentile(CAST(ROUND({value_col} * 100) AS BIGINT), 0.5D)").over(frame) * 2)
        .cast("long")
        .alias("med2_cents"),
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Hourly OHLC candle bars per key: open = first value in the hour by
    (ts, tiebreak), close = last, high/low = max/min — the bar compression
    every metrics store applies before charting or feature extraction.

    One aggregate computes all four legs: open/close ride ``min_by`` /
    ``max_by`` over the (epoch-micros, tiebreak) struct total order (no
    row_number pass, no second scan), high/low are plain min/max.

    Scale: a single partial/final HashAggregate on (key, hour); output is
    (keys × occupied hours)-bounded.  min_by/max_by partials carry one
    (value, order-key) pair each, so the map-side combine stays O(1) per
    group like sum/count.
    """
    v = _cents(value_col)
    us = F.unix_micros(F.col(ts_col))
    hour_idx = (us / F.lit(US_PER_HOUR)).cast("long")
    order = F.struct(us.alias("us"), F.col(tiebreak_col).alias("tb"))
    bars = (
        df.select(
            F.col(key_col),
            hour_idx.alias("__h"),
            v.alias("__v"),
            order.alias("__o"),
        )
        .groupBy(key_col, "__h")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min_by("__v", "__o").alias("open_cents"),
            F.max("__v").alias("high_cents"),
            F.min("__v").alias("low_cents"),
            F.max_by("__v", "__o").alias("close_cents"),
        )
    )
    return bars.select(
        F.col(key_col),
        F.date_format(
            F.timestamp_micros(F.col("__h") * US_PER_HOUR),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("hour"),
        "n",
        "open_cents",
        "high_cents",
        "low_cents",
        "close_cents",
    )


def sliding_distinct(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    member_col: str = "user_id",
    tiebreak_col: str = "event_id",
    window_seconds: int = 86_400,
) -> DataFrame:
    """Trailing-window distinct cardinality per key at every event: how
    many distinct members touched this key in the ``window_seconds``
    ending at each event's timestamp (rolling 24 h reach by default).

    Output: one row per event — id, key, ``sec`` (epoch), ``reach``.
    The count is a pure function of (key, second): a member counts at
    query second s iff it has an event in [s−W+1, s].

    LINEAR sweep-line formulation (the naive RANGE-frame
    ``collect_set`` rebuilds the member set per row — measured 20×
    wall on 10× data): a member's events each cover query seconds
    [t, t+W−1]; chaining a member's events whose gap <= W merges that
    coverage into disjoint intervals, so the member can never be
    double-counted.  Each interval emits +1 at its start and −1 one past
    its end; the key-ordered running sum of deltas AT each event second
    (deltas sort before query rows on the same second) is exactly the
    distinct reach.

    Scale: two exchanges — (key, member) for the chain window, then
    (key) for the sweep — both linear in events with no per-row set
    state; this is the same sweep kernel as peak_concurrency, derived
    per member first.  The streaming watermarked variant or an HLL
    sketch column remain the alternatives when even two sorted passes
    are too dear.
    """
    w = window_seconds
    sec = (F.unix_micros(F.col(ts_col)) / F.lit(1_000_000)).cast("long")
    ev = df.select(
        F.col(tiebreak_col),
        F.col(key_col),
        sec.alias("sec"),
        F.col(member_col).alias("__m"),
    )
    # chain each member's events into merged coverage intervals
    w_m = Window.partitionBy(key_col, "__m").orderBy("sec")
    chained = ev.select(
        F.col(key_col),
        "__m",
        "sec",
        F.when(
            F.lag("sec").over(w_m).isNull()
            | (F.col("sec") - F.lag("sec").over(w_m) > w),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("__new"),
    ).select(
        F.col(key_col),
        "__m",
        "sec",
        F.sum("__new")
        .over(w_m.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__grp"),
    )
    intervals = chained.groupBy(key_col, "__m", "__grp").agg(
        F.min("sec").alias("__start"),
        (F.max("sec") + F.lit(w)).alias("__stop"),  # one past last covered
    )
    # delta rows carry no event id; the null literal takes the CALLER's
    # tiebreak dtype (not a hardcoded long) so a string/uuid id column
    # unions cleanly
    tiebreak_type = df.schema[tiebreak_col].dataType
    null_tiebreak = F.lit(None).cast(tiebreak_type).alias(tiebreak_col)
    deltas = intervals.select(
        F.col(key_col),
        F.col("__start").alias("sec"),
        F.lit(1).alias("__d"),
        F.lit(0).alias("__q"),
        null_tiebreak,
    ).unionByName(
        intervals.select(
            F.col(key_col),
            F.col("__stop").alias("sec"),
            F.lit(-1).alias("__d"),
            F.lit(0).alias("__q"),
            null_tiebreak,
        )
    )
    queries_rows = ev.select(
        F.col(key_col),
        "sec",
        F.lit(0).alias("__d"),
        F.lit(1).alias("__q"),
        F.col(tiebreak_col),
    )
    # deltas (__q=0) sort before query rows (__q=1) on the same second,
    # so a coverage starting AT s counts and one ending before s doesn't;
    # query rows carry delta 0, so tie order among them cannot matter.
    sweep = Window.partitionBy(key_col).orderBy("sec", "__q").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        deltas.unionByName(queries_rows)
        .select(
            F.col(tiebreak_col),
            F.col(key_col),
            "sec",
            "__q",
            F.sum("__d").over(sweep).cast("long").alias("reach"),
        )
        .where(F.col("__q") == 1)
        .select(tiebreak_col, key_col, "sec", "reach")
    )


def longest_daily_streak(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Longest run of consecutive active calendar days per key, plus the
    total distinct active-day count — the gaps-and-islands engagement
    statistic (an island is a maximal set of adjacent dates; subtracting
    the within-key day rank from each date collapses every island to a
    constant anchor).

    Scale: dedup to (key, date) first — the fact table never enters the
    window; the rank window and both aggregates run on key×days rows.
    Pure integer/date arithmetic end to end.
    """
    d = F.to_date(F.col(ts_col))
    days = df.select(F.col(key_col), d.alias("__d")).distinct()
    w = Window.partitionBy(key_col).orderBy("__d")
    islands = days.select(
        F.col(key_col),
        F.date_sub(F.col("__d"), F.row_number().over(w)).alias("__anchor"),
    )
    runs = islands.groupBy(key_col, "__anchor").agg(
        F.count(F.lit(1)).alias("__run")
    )
    return runs.groupBy(key_col).agg(
        F.sum("__run").cast("long").alias("n_active_days"),
        F.max("__run").cast("long").alias("longest_streak"),
    )
