"""Streaming maintenance of the count-min frequency store.

The batch side (operators/sketches.py) appends per-batch CMS cells and
candidate keys to the idempotent epoch layout; this wrapper makes a
Structured Streaming query the APPENDER: every micro-batch adds its
cells/candidates under its own epoch id via ``foreachBatch``, so a
retried micro-batch overwrites its own ``batch=<id>`` directory —
exactly-once at the batch level, the same protocol as the FM distinct
sink (streaming/fm.py) and the DQ quarantine sink.  Because cell
counts ADD and addition is associative, the store's merged sketch
after ANY prefix of micro-batches equals a batch rebuild over the same
rows — "heavy hitters to date" maintained continuously with
depth x width longs of state plus a bounded candidate list, no keys
retained beyond the candidates, no history rescans (pinned by
tests/test_round13_staged.py::test_cms_streaming_sink_matches_batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mapreducemovieanalysis_cloud_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    incremental_cms_append,
)


def cms_hitters_sink(
    stream: DataFrame,
    store: str,
    key_col: str,
    checkpoint_path: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    cand_m: int = 20,
):
    """writeStream wrapper: each micro-batch appends its CMS cells and
    top-``cand_m`` candidates under its epoch id.  Returns the started
    StreamingQuery; read the hitters at any time with
    ``sketches.incremental_cms_topk``."""
    return (
        stream.writeStream.foreachBatch(
            lambda batch, bid: incremental_cms_append(
                batch, store, bid, key_col, depth, width, cand_m
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
