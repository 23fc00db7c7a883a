"""Streaming maintenance of the bottom-k (KMV) overlap-sketch store.

The batch side (operators/corpus_overlap.py) appends per-batch bottom-k
shingle sketches to the idempotent epoch layout; this wrapper makes a
Structured Streaming query the APPENDER: every micro-batch sketches its
own documents and writes the result under its own epoch id via
``foreachBatch``, so a retried micro-batch overwrites its own
``batch=<id>`` directory — exactly-once at the batch level, the same
protocol as the FM (streaming/fm.py) and CMS (streaming/cms.py)
appenders.  Because bottom-k merges by union-then-re-rank —
BK(A ∪ B) = BK(BK(A) ∪ BK(B)), associative AND idempotent — the store's
merged sketch after ANY prefix of micro-batches equals a one-shot batch
sketch over the same rows: "cross-source duplication matrix to date"
maintained continuously with ≤ |groups|·k hashes of state, no shingles
retained, no history rescans (pinned by
tests/test_streaming2.py::test_kmv_streaming_sink_matches_batch).

This closes the incremental-store roster: FM (distinct), CMS (heavy
hitters), and KMV (overlap) each have both a batch appender and a
foreachBatch streaming twin on the shared write_epoch protocol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mapreducemovieanalysis_cloud_spark.operators.corpus_overlap import (
    incremental_kmv_append,
)


def kmv_sketch_sink(
    stream: DataFrame,
    store: str,
    checkpoint_path: str,
    group_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    k: int = 64,
):
    """writeStream wrapper: each micro-batch appends its bottom-k
    sketches under its epoch id.  Returns the started StreamingQuery;
    read the merged sketches at any time with
    ``corpus_overlap.incremental_kmv_sketches`` and feed them to
    ``corpus_overlap.pairwise_overlap(..., sketches=...)``."""
    return (
        stream.writeStream.foreachBatch(
            lambda batch, bid: incremental_kmv_append(
                batch, store, bid, group_col, text_col, n=n, k=k
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
