"""Streaming maintenance of the incremental n-gram LM count store.

The batch side (operators/ngram_lm.py) appends per-batch n-gram /
context / distinct-unigram tables to the idempotent epoch layout; this
wrapper makes a Structured Streaming query the APPENDER via
``foreachBatch`` — a retried micro-batch overwrites its own three
``batch=<id>`` directories, exactly-once at the batch level, the same
protocol as the FM/CMS/KMV/graph-edge appenders.  Counts merge by
ADDITION and the vocabulary by set union, and each document's n-grams
derive from its own row, so ANY document-to-micro-batch assignment
leaves the merged model equal to a one-shot batch rebuild (pinned by
tests/test_streaming2.py) — "LM scores over the corpus to date"
maintained continuously with count-table (Heaps-sublinear) state, no
text retained, no history rescans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mapreducemovieanalysis_cloud_spark.operators.ngram_lm import (
    incremental_ngram_append,
)


def ngram_count_sink(
    stream: DataFrame,
    store: str,
    checkpoint_path: str,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """writeStream wrapper: each micro-batch appends its n-gram /
    context / vocab tables under its epoch id.  Returns the started
    StreamingQuery; score with ``ngram_lm.incremental_lm_score`` (the
    registered ``incremental_lm_scores`` read path)."""
    return (
        stream.writeStream.foreachBatch(
            lambda batch, bid: incremental_ngram_append(
                batch, store, bid, n=n, id_col=id_col, text_col=text_col
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
