"""Streaming maintenance of the incremental fixed-bin histogram store.

The batch side (operators/sketches.py) appends per-batch (group, bin,
n) partials to the idempotent epoch layout; this wrapper makes a
Structured Streaming query the APPENDER via ``foreachBatch`` — a
retried micro-batch overwrites its own ``batch=<id>`` directory,
exactly-once at the batch level, the same protocol as every other
store appender.  Bin counts merge by ADDITION at row grain, so ANY
row-to-micro-batch assignment leaves the merged histogram equal to a
one-shot batch rebuild (pinned by tests/test_streaming2.py) —
"p50/p90/p99 to date" served from O(bins) longs per group, maintained
O(batch), never a corpus sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mapreducemovieanalysis_cloud_spark.operators.sketches import (
    incremental_hist_append,
)


def hist_bin_sink(
    stream: DataFrame,
    store: str,
    checkpoint_path: str,
    group_col: str,
    cents_col: str,
    bin_width_cents: int,
):
    """writeStream wrapper: each micro-batch appends its histogram
    partials under its epoch id.  Returns the started StreamingQuery;
    read percentiles at any time with ``sketches.hist_percentiles``
    (the round-13 ``incremental_hist_percentiles`` read path)."""
    return (
        stream.writeStream.foreachBatch(
            lambda batch, bid: incremental_hist_append(
                batch, store, bid, group_col, cents_col, bin_width_cents
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
