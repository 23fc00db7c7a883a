"""Streaming maintenance of the Flajolet-Martin distinct store.

The batch side (operators/sketches.py) appends per-batch register masks
to the idempotent epoch layout; this wrapper makes a Structured
Streaming query the APPENDER: every micro-batch ORs its ids into masks
and writes them under its own epoch id via ``foreachBatch``, so a
retried micro-batch overwrites its own ``batch=<id>`` directory —
exactly-once at the batch level, the same protocol as the DQ quarantine
sink and the streaming MV delta log.  Because OR-merge is associative
and idempotent, the store's merged estimate after ANY prefix of
micro-batches equals a batch rebuild over the same rows — "distinct
users per group to date" maintained continuously with R longs per group
of state, no ids retained, no history rescans (pinned by
tests/test_round12_staged.py::test_fm_streaming_sink_matches_batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mapreducemovieanalysis_cloud_spark.operators.sketches import (
    incremental_fm_append,
)


def fm_distinct_sink(
    stream: DataFrame,
    store: str,
    group_cols: list[str],
    id_col: str,
    checkpoint_path: str,
    registers: int = 16,
    salt: str = "fmd",
):
    """writeStream wrapper: each micro-batch appends its register masks
    under its epoch id.  Returns the started StreamingQuery; read the
    estimate at any time with ``sketches.incremental_fm_distinct``."""
    return (
        stream.writeStream.foreachBatch(
            lambda batch, bid: incremental_fm_append(
                batch, store, bid, group_cols, id_col, registers, salt
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
