"""Streaming maintenance of the graph edge-count stores (undirected
co-occurrence pair counts and directed src->dst link counts).

The batch side (operators/graph.py) appends per-batch edge-count
partials to the idempotent epoch layout; these wrappers make a
Structured Streaming query the APPENDER via ``foreachBatch`` — a
retried micro-batch overwrites its own ``batch=<id>`` directory,
exactly-once at the batch level, the same protocol as the FM/CMS/KMV
sketch appenders.

CONTRACT — complete groups per micro-batch.  Unlike the sketch stores
(whose OR/ADD/bottom-k merges are safe under ROW-level splits), the
edge stores pair group members WITHIN a batch: a group split across two
micro-batches would undercount its cross-batch pairs.  The streaming
source must therefore deliver closed groups — the natural shape is one
ingest-day file per micro-batch (an order closes before its day's file
lands; ``maxFilesPerTrigger=1`` pins file == batch).  This is the same
contract the batch appenders document and the batch-split-invariance
tests pin; it is the CALLER's source-layout obligation, not something
the sink can verify — the sink composes whatever rows the micro-batch
carries.

Because per-batch counts merge by ADDITION over disjoint groups, the
store's merged edge list after ANY prefix of conforming micro-batches
equals a one-shot batch rebuild over the same rows (pinned by
tests/test_streaming2.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mapreducemovieanalysis_cloud_spark.operators.graph import (
    incremental_cooccurrence_append,
    incremental_directed_append,
)


def cooc_edge_sink(
    stream: DataFrame,
    store: str,
    checkpoint_path: str,
    group_col: str,
    node_col: str,
):
    """writeStream wrapper for the UNDIRECTED pair-count store: each
    micro-batch (complete groups — see module contract) appends its
    within-group pair counts under its epoch id.  Returns the started
    StreamingQuery; read the merged edge list at any time with
    ``graph.incremental_cooccurrence_edges``."""
    return (
        stream.writeStream.foreachBatch(
            lambda batch, bid: incremental_cooccurrence_append(
                batch, store, bid, group_col, node_col
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def directed_edge_sink(
    stream: DataFrame,
    store: str,
    checkpoint_path: str,
    group_col: str,
    src_col: str,
    dst_col: str,
):
    """writeStream wrapper for the DIRECTED edge-count store: each
    micro-batch (complete groups) appends its (src, dst) linking-group
    counts under its epoch id.  Returns the started StreamingQuery;
    read the merged edge list with ``graph.incremental_directed_edges``."""
    return (
        stream.writeStream.foreachBatch(
            lambda batch, bid: incremental_directed_append(
                batch, store, bid, group_col, src_col, dst_col
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
