"""DSIR-style data selection: hashed n-gram importance weights.

Published method (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling"): represent each document as a bag of hashed
n-grams, fit smoothed bucket distributions over a TARGET corpus (the
high-quality distribution you want more of) and the RAW corpus (the
big pool you are selecting from), and score every raw document with its
log importance weight

    log w(d) = sum_b  c_d[b] * ( ln p_target[b] - ln p_raw[b] )

Resampling raw docs proportionally to ``exp(log w)`` shifts the
selected pool toward the target distribution.  This module computes the
per-document log weights; selection composes with the existing
deterministic samplers (operators/curation.py) and top-k.

Engine-neutral determinism: buckets come from ``md5_bucket`` (a pure
function of the gram string, identical in the DuckDB oracle); both
distributions are add-1-smoothed ratios of integer counts, so every
``ln`` runs on integer-valued doubles and the identical expression in
both engines; the per-doc sum is micro-rounded to a BIGINT
(the entropy_lang_by_source pattern).

Scale posture (100 TB): the corpus is touched ONCE — one explode into
unigram+bigram grams, collapsed map-side into (doc, bucket) counts
(the same shuffle class as any tokenize pass).  Both global bucket
distributions derive from that table: raw = a bucket rollup of it,
target = the same rollup restricted to target-member docs — no second
pass over text.  Each distribution is exactly ``n_buckets`` rows
(default 1024), broadcast onto the (doc, bucket) table; the final
per-doc rollup re-shuffles one row per (doc, bucket), bounded by
min(doc_len, n_buckets) per doc.  Nothing driver-side, nothing
quadratic, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.functions.rounding import (
    round_half_up_long,
)

from mapreducemovieanalysis_cloud_spark.functions.hashing import md5_bucket

DEFAULT_BUCKETS = 1024


def _grams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, gram) rows: whitespace unigrams plus adjacent bigrams.

    Tokenizes in its own projection (the ``shingle_sets`` pattern —
    CSE does not reach inside higher-order-function lambdas, so the
    split must be materialized before ``shingles_from_tokens`` walks
    it); the text column is read exactly once and the bigram array is
    the ordered 2-shingle array the dedup family already uses."""
    from mapreducemovieanalysis_cloud_spark.functions.text import (
        shingles_from_tokens,
        tokens,
    )

    toked = docs.select(
        F.col(id_col).alias("_id"), tokens(text_col).alias("__toks")
    )
    return toked.select(
        "_id",
        F.explode(
            F.concat(
                F.col("__toks"), shingles_from_tokens(F.col("__toks"), 2)
            )
        ).alias("gram"),
    )


def doc_bucket_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(_id, bucket, c): hashed-gram histogram per document — the one
    corpus-wide pass everything else derives from."""
    return (
        _grams(docs, id_col, text_col)
        .select(
            "_id", md5_bucket("gram", n_buckets, salt="dsir:").alias("bucket")
        )
        .groupBy("_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _ln(c: Column) -> Column:
    return F.log(c.cast("double"))


def dsir_log_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-document DSIR log importance weight of every document in
    ``docs`` (the raw pool) toward the subset where ``target_pred``
    holds (the target corpus).

    Returns (id_col, n_grams, log_weight_micro) — log_weight_micro is
    ``round(1e6 * log w(d))`` as BIGINT.  Docs with no grams (empty
    text) are absent, never scored 0.

    With add-1 smoothing, ``p_x[b] = (c_x[b] + 1) / (tot_x + K)``::

        log w(d) = sum_b c_d[b] * ( ln(c_t[b]+1) - ln(c_r[b]+1) )
                   + n_d * ( ln(tot_r + K) - ln(tot_t + K) )

    so only the K-row count tables and two scalar totals are needed.
    """
    db = doc_bucket_counts(docs, id_col, text_col, n_buckets).localCheckpoint()

    members = docs.select(
        F.col(id_col).alias("_id"), target_pred.cast("int").alias("_is_t")
    )
    per_doc = db.join(F.broadcast(members), "_id")

    raw = db.groupBy("bucket").agg(F.sum("c").alias("c_r"))
    tgt = (
        per_doc.where(F.col("_is_t") == 1)
        .groupBy("bucket")
        .agg(F.sum("c").alias("c_t"))
    )
    dists = (
        raw.join(tgt, "bucket", "left")
        .select(
            "bucket",
            "c_r",
            F.coalesce(F.col("c_t"), F.lit(0)).alias("c_t"),
        )
        .localCheckpoint()
    )
    totals = dists.agg(
        F.sum("c_r").alias("tot_r"), F.sum("c_t").alias("tot_t")
    )

    scored = (
        db.join(F.broadcast(dists), "bucket")
        .groupBy("_id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(
                F.col("c")
                * (_ln(F.col("c_t") + 1) - _ln(F.col("c_r") + 1))
            ).alias("_s"),
        )
        .crossJoin(F.broadcast(totals))
    )
    return scored.select(
        F.col("_id").alias(id_col),
        "n_grams",
        round_half_up_long(
            (
                F.col("_s")
                + F.col("n_grams")
                * (
                    _ln(F.col("tot_r") + n_buckets)
                    - _ln(F.col("tot_t") + n_buckets)
                )
            )
            * 1000000
        ).alias("log_weight_micro"),
    )
