"""Windowed event-time queries (batch semantics of the streaming operators in
``streaming.windows`` — identical expressions run under readStream; the
oracle checks the batch result, streaming tests check convergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table
from mapreducemovieanalysis_cloud_spark.streaming import windows as W

_SUM_CENTS = "CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)"


@query(
    "window_tumbling",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour',
                    '%Y-%m-%d %H:%M:%S') AS window_end,
           COUNT(*) AS n_events,
           {_SUM_CENTS} AS sum_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows over events."""
    return W.tumbling_agg(load_table(spark, sf_dir, "events"))


@query(
    "window_sliding",
    oracle=f"""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS w_start, value
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
             value
      FROM events
    )
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(w_start + INTERVAL '1 hour',
                    '%Y-%m-%d %H:%M:%S') AS window_end,
           COUNT(*) AS n_events,
           {_SUM_CENTS} AS sum_cents
    FROM assigned
    GROUP BY 1, 2
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event in 2 windows)."""
    return W.sliding_agg(load_table(spark, sf_dir, "events"))


@query(
    "window_session",
    oracle="""
    WITH lagged AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events),
    flags AS (
      SELECT user_id, ts,
             CASE WHEN prev IS NULL OR ts - prev >= INTERVAL '10 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM lagged),
    sess AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flags)
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL '10 minutes',
                    '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events
    FROM sess
    GROUP BY user_id, sid
    """,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute-gap session windows per user (gaps-and-islands oracle)."""
    return W.session_agg(load_table(spark, sf_dir, "events"))


@query(
    "join_interval_events",
    oracle="""
    SELECT p.user_id AS user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '30 minutes'
    """,
)
def join_interval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase->click attribution interval join (batch semantics of the
    stream-stream join in ``streaming.joins`` — identical expression under
    readStream with watermarks on both sides)."""
    from mapreducemovieanalysis_cloud_spark.streaming.joins import (
        clicks_before_purchases,
    )

    events = load_table(spark, sf_dir, "events")
    return clicks_before_purchases(
        events.where(F.col("event_type") == "purchase"),
        events.where(F.col("event_type") == "click"),
        interval="30 minutes",
    )


@query(
    "stream_first_seen",
    oracle="""
    SELECT user_id, event_type,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts
    FROM events
    GROUP BY user_id, event_type
    """,
)
def stream_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch semantics of the first-seen stateful dedup emitter
    (``streaming.tws``): min event time per (user, event_type). The
    streaming implementations (transformWithState where protobuf exists,
    applyInPandasWithState otherwise) emit each pair exactly once at its
    first-seen micro-batch; with in-order arrival the converged output
    equals this grouped MIN, which is what the convergence tests assert."""
    from mapreducemovieanalysis_cloud_spark.streaming.tws import (
        first_seen_batch,
    )

    return first_seen_batch(load_table(spark, sf_dir, "events"))


@query(
    "join_interval_events_outer",
    oracle="""
    SELECT p.user_id AS user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '30 minutes'
    """,
)
def join_interval_events_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER purchase->click attribution (batch semantics of the
    watermark-bounded outer stream-stream join in ``streaming.joins``):
    unattributed purchases surface as NULL click rows — in streaming they
    emit once the watermark proves no match can arrive."""
    from mapreducemovieanalysis_cloud_spark.streaming.joins import (
        purchases_with_attribution,
    )

    events = load_table(spark, sf_dir, "events")
    return purchases_with_attribution(
        events.where(F.col("event_type") == "purchase"),
        events.where(F.col("event_type") == "click"),
        interval="30 minutes",
    )
