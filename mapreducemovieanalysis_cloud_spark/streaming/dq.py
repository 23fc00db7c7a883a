"""Streaming data-quality gate: per-micro-batch constraint routing.

The batch `operators.dataquality` gate decides whether a FINISHED batch
may promote; a streaming ingest needs the row-level counterpart — every
micro-batch splits into rows that satisfy the contract (append to the
good sink) and rows that violate it (append to a quarantine sink WITH
the list of violated constraints), so bad data is never dropped silently
and never pollutes downstream tables.

Implementation is one ``foreachBatch`` pass: a single projection computes
the violation list per row (an array of failed constraint names — pure
map-side expressions), then two filtered writes.  No shuffle at all;
exactly-once per sink comes from the streaming checkpoint plus
idempotent per-epoch directories (``<sink>/batch=<id>`` overwritten on
retry — the streaming/mv.py delta layout; a plain parquet append would
duplicate rows whenever foreachBatch re-runs a failed batch).

At 100 TB/day the gate adds one codegen'd projection to the ingest path;
quarantine volume is violation-driven.  Constraint evaluation is the
same SQL-predicate surface as the batch gate, so one contract definition
serves both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def violations_column(predicates: list[tuple[str, str]]) -> F.Column:
    """ARRAY<STRING> of the names of violated constraints for each row —
    a predicate must evaluate TRUE to pass; NULL (three-valued SQL) is a
    violation, which is what a quality gate must assume."""
    return F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.coalesce(F.expr(pred), F.lit(False)), F.lit(name)
                )
                for name, pred in predicates
            ]
        )
    )


def route_batch(
    batch: DataFrame,
    predicates: list[tuple[str, str]],
    good_path: str,
    quarantine_path: str,
    batch_id: int | None = None,
) -> None:
    """Split one (micro-)batch on the row-level contract and write each
    side to its sink; quarantined rows carry the violation names.

    With ``batch_id`` each side lands in its own epoch directory
    ``<sink>/batch=<id>`` via overwrite — the idempotent-delta layout
    shared with ``streaming/mv.py``: a RETRIED micro-batch (foreachBatch
    re-runs its batch function on failure) rewrites the same directories
    instead of appending duplicates, which is what makes the streaming
    sink's exactly-once claim true rather than aspirational.  Readers of
    the sink root see ``batch`` as a hive partition column.  Without
    ``batch_id`` (ad-hoc one-shot use) both sides plain-append —
    at-least-once under caller retry, and the two layouts must not be
    mixed on one sink path."""
    tagged = batch.withColumn(
        "__violations", violations_column(predicates)
    )
    good = tagged.where(F.size("__violations") == 0).drop("__violations")
    quar = (
        tagged.where(F.size("__violations") > 0)
        .withColumn("violations", F.array_join("__violations", ","))
        .drop("__violations")
    )
    if batch_id is not None:
        from mapreducemovieanalysis_cloud_spark.sources.writers import (
            write_epoch,
        )

        for sink in (good_path, quarantine_path):
            _reject_flat_layout(sink)
        write_epoch(good, good_path, batch_id)
        write_epoch(quar, quarantine_path, batch_id)
    else:
        good.write.mode("append").parquet(good_path)
        quar.write.mode("append").parquet(quarantine_path)


def _reject_flat_layout(root: str) -> None:
    """Refuse to write epoch directories into a sink already holding
    flat-appended files: Spark's partition discovery cannot read a root
    mixing data files and ``batch=`` directories, so the mix would brick
    the sink for every reader.  Failing the stream start with a clear
    migration message beats producing an unreadable sink."""
    import os

    if not os.path.isdir(root):
        return
    for entry in os.listdir(root):
        if entry.startswith(("batch=", "_", ".")):
            continue
        raise ValueError(
            f"{root} holds flat-appended files ({entry}); the epoch "
            "layout cannot be mixed into it — migrate the old files "
            "into a batch=<id> directory (or point the stream at a "
            "fresh sink) first"
        )


def dq_gate_sink(
    stream: DataFrame,
    predicates: list[tuple[str, str]],
    good_path: str,
    quarantine_path: str,
    checkpoint_path: str,
):
    """writeStream wrapper: every micro-batch routes through
    ``route_batch`` with its epoch id, so a retried batch overwrites its
    own ``batch=<id>`` directories instead of appending duplicates.
    Returns the started StreamingQuery."""
    return (
        stream.writeStream.foreachBatch(
            lambda batch, bid: route_batch(
                batch, predicates, good_path, quarantine_path, batch_id=bid
            )
        )
        .option("checkpointLocation", checkpoint_path)
        .start()
    )
