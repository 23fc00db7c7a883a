"""Round-4 twelfth wave: hard-negative mining over the embeddings table
— the contrastive-training data op that random negative sampling cannot
replace (the informative negatives are the cross-label vectors nearest
the anchor).

Exactness: the quantized-integer cosine of the ANN family
(micro-quantized components, integer dot products, one double divide on
identical operands), ranked with the neighbor id as total-order
tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.registry import query
from mapreducemovieanalysis_cloud_spark.sources.readers import load_table

_QUANT = (
    "list_transform({v}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)"
    " AS BIGINT))"
)
_DOT = (
    "CAST(list_sum(list_transform(generate_series(1, len(qa)),"
    " i -> qa[i] * qb[i])) AS BIGINT)"
)
_N2 = "CAST(list_sum(list_transform({a}, x -> x * x)) AS BIGINT)"
_COS = (
    f"({_DOT} / (sqrt(CAST({_N2.format(a='qa')} AS DOUBLE))"
    f" * sqrt(CAST({_N2.format(a='qb')} AS DOUBLE))))"
)


@query(
    "hard_negatives_brute",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, label AS anchor_label,
                      {_QUANT.format(v='embedding')} AS qa
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, label AS neighbor_label,
                 {_QUANT.format(v='embedding')} AS qb
          FROM embeddings),
    scored AS (SELECT query_id, anchor_label, neighbor_id, neighbor_label,
                      {_COS} AS cosine
               FROM q, c WHERE c.neighbor_label <> q.anchor_label)
    SELECT query_id, anchor_label, neighbor_id, neighbor_label, cosine,
           CAST(rank AS INT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id)
                      AS rank
          FROM scored)
    WHERE rank <= 3
    """,
)
def hard_negatives_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 hard negatives for 10 anchor embeddings: the most-similar
    vectors carrying a DIFFERENT label (operators/similarity.py:
    hard_negatives) — the contrastive-pair miner whose exact tier is a
    broadcast-anchor corpus scan and whose scale tier is the IVF probe
    with a label post-filter.

    Scale: anchors broadcast; the corpus scans once; the label filter
    runs before the top-k window, so only cross-label candidates rank."""
    from mapreducemovieanalysis_cloud_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    return similarity.hard_negatives(emb, anchors)


# ---- sliding-window reach (batch twin of the streaming tier) ----------------


@query(
    "sliding_reach_windows",
    oracle="""
    WITH e AS (SELECT event_type, user_id,
                      epoch_us(ts) // 1000000 AS sec
               FROM events),
    rep AS (SELECT event_type, user_id,
                   ((sec // 21600) - k) * 21600 AS win_start
            FROM e, unnest(generate_series(0, 3)) AS t(k)
            WHERE ((sec // 21600) - k) * 21600 + 86400 > sec),
    d AS (SELECT DISTINCT event_type, user_id, win_start FROM rep)
    SELECT strftime(make_timestamp(win_start * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS reach
    FROM d GROUP BY 1, 2
    """,
)
def sliding_reach_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user reach per 24 h sliding window (6 h slide) per event
    type — the window-grid tier of rolling reach (streaming/windows.py:
    sliding_reach_windows, whose streaming twin chains watermarked
    dedup + windowed count and is pinned convergent in
    tests/test_streaming2.py).  The oracle replicates Spark's
    epoch-aligned window semantics explicitly: each event lands in
    duration/slide = 4 windows.

    Scale: the Expand replicates each event 4× (duration/slide — a
    constant), then distinct + count aggregate on (window, type); the
    streaming tier holds only watermark-deep state instead."""
    from mapreducemovieanalysis_cloud_spark.streaming import windows as SW

    return SW.sliding_reach_windows(
        load_table(spark, sf_dir, "events"), "24 hours", "6 hours"
    )
