"""CCNet-style per-language LM-quality bucketing (head/middle/tail).

Published method (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data"): score every document with a
language model, then split EACH LANGUAGE's documents into perplexity
terciles — *head* (lowest perplexity, highest quality), *middle*,
*tail* — so downstream mixing can keep head+middle and drop or
down-weight tail per language instead of applying one global threshold
that would starve low-resource languages.

The tercile rule here is value-based and exact: with ``cum_before(s)``
= number of same-language docs scoring strictly below ``s`` and ``n``
the language's doc count,

    tercile = 1 + (cum_before * 3) div n        in {1, 2, 3}

All same-score docs land in the same tercile (ties never straddle a
boundary), the arithmetic is pure integers over the micro-rounded LM
score, and the identical expression runs in the DuckDB oracle.

Scale posture (100 TB): the naive formulation — a window over
``PARTITION BY lang ORDER BY score`` on the doc table — puts every
document of a language through ONE task: the single-partition sort that
dies first at scale (and skews worst exactly where it matters, on the
dominant language).  This module instead:

1. collapses docs to a (lang, score, cnt) group table — the only pass
   over per-doc rows is a partial-aggregatable groupBy;
2. runs the textbook two-phase prefix sum over that table (the
   ``packing.packed_positions`` pattern): range-partition by
   (lang, score) — a parallel range sort — compute LOCAL per-partition
   running counts, prefix-sum the per-(partition, lang) totals (a
   p x n_langs table, the only single-partition window), and add the
   broadcast offsets back;
3. joins the tercile assignment back to docs on (lang, score) — a
   plain equi-join, no window ever touches per-doc rows.

Integer addition is associative, so the two-phase cum_before is
bit-identical to the naive window the oracle runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.operators.ngram_lm import (
    ngram_model,
    score_documents,
)

BUCKET_LABELS = {1: "head", 2: "middle", 3: "tail"}


def _grouped_cum_before(
    gs: DataFrame,
    part_col: str,
    order_col: str,
    cnt_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``gs`` + ``cum_before``: per ``part_col``, the sum of ``cnt_col``
    over rows ordered strictly before this row's ``order_col`` — the
    distributed two-phase prefix sum (see module docstring / packing.py).

    ``num_partitions`` pins the range-partition count so tiny test
    inputs still exercise the two-phase merge (AQE would coalesce them
    to one partition); the result is partition-count-independent."""
    ranged = (
        gs.repartitionByRange(num_partitions, part_col, order_col)
        if num_partitions
        else gs.repartitionByRange(part_col, order_col)
    )
    ranged = ranged.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint()
    w_local = (
        Window.partitionBy("_pid", part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_pid = ranged.groupBy("_pid", part_col).agg(
        F.sum(cnt_col).alias("_psum")
    )
    w_off = (
        Window.partitionBy(part_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = per_pid.select(
        "_pid",
        part_col,
        F.coalesce(F.sum("_psum").over(w_off), F.lit(0)).alias("_poff"),
    )
    return (
        ranged.withColumn(
            "_prev_local",
            F.coalesce(F.sum(cnt_col).over(w_local), F.lit(0)),
        )
        .join(F.broadcast(offs), ["_pid", part_col])
        .withColumn(
            "cum_before",
            (F.col("_poff") + F.col("_prev_local")).cast("long"),
        )
        .drop("_pid", "_poff", "_prev_local")
    )


def lm_quality_buckets(
    docs: DataFrame,
    n: int = 2,
    k: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-document CCNet bucket assignment: (id, lang,
    avg_neg_logprob_micro, tercile, bucket) with tercile 1 = *head*
    (best third of its language by self-trained add-k n-gram LM score)
    through 3 = *tail*.  Docs too short to score (< n tokens) are
    absent, matching ``score_documents``.

    The LM is trained on the full corpus (the CCNet setup trains on a
    target corpus; self-training is the degenerate single-corpus case —
    swap ``ngram_model(docs)`` for a model built on a reference corpus
    to reproduce the paper exactly)."""
    scored = score_documents(
        docs, ngram_model(docs, n, id_col, text_col), n, k, id_col, text_col
    )
    # wl feeds BOTH the (lang, score) group table and the final verdict
    # join: materialize it once or the whole LM-scoring subtree (explode
    # + three count-table joins) executes twice.
    wl = (
        scored.select(
            id_col, F.col("avg_neg_logprob_micro").alias("_score")
        )
        .join(docs.select(id_col, lang_col), id_col)
        .localCheckpoint()
    )

    gs = wl.groupBy(lang_col, "_score").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    cum = _grouped_cum_before(
        gs, lang_col, "_score", "_cnt", num_partitions
    )
    totals = gs.groupBy(lang_col).agg(F.sum("_cnt").alias("_n"))
    assign = cum.join(F.broadcast(totals), lang_col).select(
        lang_col,
        "_score",
        F.expr("CAST(1 + (cum_before * 3) div _n AS BIGINT)").alias(
            "tercile"
        ),
    )
    return wl.join(assign, [lang_col, "_score"]).select(
        id_col,
        lang_col,
        F.col("_score").alias("avg_neg_logprob_micro"),
        "tercile",
        F.element_at(
            F.array(*[F.lit(BUCKET_LABELS[i]) for i in (1, 2, 3)]),
            F.col("tercile").cast("int"),
        ).alias("bucket"),
    )
