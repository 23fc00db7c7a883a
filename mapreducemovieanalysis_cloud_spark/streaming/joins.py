"""Stream-stream interval join (SURVEY §2.2: joins beyond broadcast-equi,
streaming).

``clicks_before_purchases`` attributes each purchase to the clicks by the
same user within the preceding attribution window — the canonical
stream-stream join shape. The same expression works on batch DataFrames
(the oracle path) and on streams (where both sides carry watermarks so the
join state can be evicted: Spark buffers each side only until
watermark + interval).

Scale shape: the join keys on user_id, so both streams hash-partition by
user; state per key is bounded by the interval x event rate, and the
watermark bounds total state. No broadcast — both sides are unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_before_purchases(
    purchases: DataFrame,
    clicks: DataFrame,
    interval: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Join each purchase to same-user clicks in ``[p.ts - interval, p.ts]``.

    Pass ``watermark`` when both inputs are streaming (required by Spark for
    state eviction); leave None for batch semantics. Output carries exact
    integer microsecond delay (engine-neutral — no float time math).
    """
    p = purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    if watermark is not None:
        p = p.withWatermark("p_ts", watermark)
        c = c.withWatermark("c_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {interval}"))
    )
    return p.join(c, cond).select(
        "user_id",
        "purchase_id",
        "click_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("delay_us"),
    )


def purchases_with_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    interval: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase emits, with
    its attributed click ids where they exist and NULLs where none do —
    the "unattributed conversion" feed.

    Outer emission is what distinguishes this from the inner variant: a
    streaming engine can only declare "no click matched" once the
    watermark guarantees no matching click can still arrive, so NULL rows
    surface with watermark latency while matches stream immediately —
    converged output equals the batch left join (the oracle). State and
    partitioning are identical to the inner join: keyed on user_id,
    per-side buffers bounded by watermark + interval.
    """
    p = purchases.select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    if watermark is not None:
        p = p.withWatermark("p_ts", watermark)
        c = c.withWatermark("c_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {interval}"))
    )
    return p.join(c, cond, "left_outer").select(
        "user_id",
        "purchase_id",
        "click_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("delay_us"),
    )
