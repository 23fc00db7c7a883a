"""Streaming materialized-view maintenance, exactly-once by layout.

The batch operator (`operators.matview`) proves the merge is exact; the
streaming problem is DELIVERY: foreachBatch may re-execute a micro-batch
after a failure, and a naive read-merge-overwrite of the MV would apply
that batch twice.  The layout solves it without transactions:

* the BASE aggregate lives at ``<mv>/base`` (built once);
* each micro-batch writes ONLY its own partial aggregate to
  ``<mv>/deltas/batch=<epochId>`` with overwrite — re-executing epoch N
  rewrites the same directory with the same deterministic content, so
  retries are idempotent BY PATH, not by protocol;
* readers merge base + all delta partitions with one group-by — partial
  states are associative, so the merged view equals the batch recompute
  regardless of how many epochs (or retries) produced the deltas.

Compaction (folding old deltas into base) is an offline rewrite of the
same shape; until it runs, read cost grows by one tiny
group-cardinality file per epoch — bounded and observable, never wrong.

Scale: per batch the stream writes group-cardinality rows (not facts);
the reader's merge is a union of MV-sized frames + one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_base(mv: DataFrame, path: str) -> None:
    mv.write.mode("overwrite").parquet(f"{path}/base")


def apply_stream_deltas(
    stream: DataFrame,
    path: str,
    keys: list[str],
    cents_col: str,
    checkpoint_path: str,
):
    """writeStream: each micro-batch aggregates itself and overwrites its
    own epoch directory — the idempotent-delta log."""
    from mapreducemovieanalysis_cloud_spark.operators import matview

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        agg = matview.aggregate_mv(batch, keys, F.col(cents_col))
        agg.write.mode("overwrite").parquet(
            f"{path}/deltas/batch={epoch_id}"
        )

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def read_current_mv(
    spark: SparkSession, path: str, keys: list[str]
) -> DataFrame:
    """Merged view: base + every delta epoch, one aggregate.  Partials
    are associative ints, so the result is independent of epoch count,
    ordering, and retries."""
    import os

    frames = [spark.read.parquet(f"{path}/base")]
    deltas_dir = f"{path}/deltas"
    if os.path.isdir(deltas_dir):
        frames.append(
            spark.read.parquet(f"{deltas_dir}/batch=*")
        )
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    return union.groupBy(*keys).agg(
        F.sum("revenue_cents").alias("revenue_cents"),
        F.sum("n_rows").alias("n_rows"),
    )


def compact(spark: SparkSession, path: str, keys: list[str]) -> None:
    """Fold all delta epochs into the base (offline maintenance): write
    the merged view as the new base, then drop the delta log.  Readers
    see base+deltas before, base-only after — both merge to the same
    view, so compaction never needs to coordinate with them."""
    import shutil

    merged = read_current_mv(spark, path, keys)
    merged.write.mode("overwrite").parquet(f"{path}/base_next")
    shutil.rmtree(f"{path}/deltas", ignore_errors=True)
    shutil.rmtree(f"{path}/base")
    shutil.move(f"{path}/base_next", f"{path}/base")


def read_mv_asof(
    spark: SparkSession, path: str, keys: list[str], as_of_epoch: int
) -> DataFrame:
    """Time travel over the delta log: the view as of (and including)
    ``as_of_epoch`` — base plus every delta directory with a smaller or
    equal epoch id.  The epoch-keyed layout gives snapshot reads for
    free: a snapshot is just a prefix of the log, and since partials are
    associative the prefix merges exactly like the full log.  Epochs
    newer than the requested snapshot are simply not read — no tombstones
    or version manifests needed until compaction folds the log."""
    import os
    import re

    frames = [spark.read.parquet(f"{path}/base")]
    deltas_dir = f"{path}/deltas"
    if os.path.isdir(deltas_dir):
        for d in sorted(os.listdir(deltas_dir)):
            m = re.fullmatch(r"batch=(\d+)", d)
            if m and int(m.group(1)) <= as_of_epoch:
                frames.append(
                    spark.read.parquet(f"{deltas_dir}/{d}")
                )
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    return union.groupBy(*keys).agg(
        F.sum("revenue_cents").alias("revenue_cents"),
        F.sum("n_rows").alias("n_rows"),
    )
