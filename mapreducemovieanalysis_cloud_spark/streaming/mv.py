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
        from mapreducemovieanalysis_cloud_spark.sources.writers import (
            write_epoch,
        )

        agg = matview.aggregate_mv(batch, keys, F.col(cents_col))
        write_epoch(agg, f"{path}/deltas", epoch_id)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .start()
    )


def _recover_compaction(path: str) -> None:
    """Heal a crashed ``compact`` so the view is never lost (mirrors the
    inverted index's swap recovery).  The compaction protocol only moves
    data aside (``deltas__folding``, ``base__old``) before the new base is
    live and deletes it last, so every crash point leaves a complete copy
    on disk; this routine rolls the state FORWARD when the folded base
    finished (``base_next`` complete, or already live) and BACKWARD
    (restore base and deltas) otherwise."""
    import os
    import shutil

    base = f"{path}/base"
    nxt = f"{path}/base_next"
    folding = f"{path}/deltas__folding"
    next_done = os.path.exists(os.path.join(nxt, "_SUCCESS"))
    if not os.path.isdir(base):
        if next_done:
            shutil.move(nxt, base)  # crashed between the two base renames
        elif os.path.isdir(f"{path}/base__old"):
            shutil.move(f"{path}/base__old", base)
    if os.path.isdir(folding):
        if os.path.exists(os.path.join(base, "_SUCCESS")) and not os.path.isdir(nxt):
            # folded base is live (crash after the swap): the aside delta
            # copy is already folded in — dropping it is the roll-forward
            shutil.rmtree(folding)
        elif next_done:
            # folded base complete but not yet live: finish the swap
            if os.path.isdir(base):
                shutil.move(base, f"{path}/base__old")
            shutil.move(nxt, base)
            shutil.rmtree(folding)
        else:
            # fold never finished: restore the delta log and retry later
            if not os.path.isdir(f"{path}/deltas"):
                shutil.move(folding, f"{path}/deltas")
            else:
                shutil.rmtree(folding)
            shutil.rmtree(nxt, ignore_errors=True)
    if os.path.isdir(f"{path}/base__old") and os.path.isdir(base):
        shutil.rmtree(f"{path}/base__old")


def read_current_mv(
    spark: SparkSession, path: str, keys: list[str]
) -> DataFrame:
    """Merged view: base + every delta epoch, one aggregate.  Partials
    are associative ints, so the result is independent of epoch count,
    ordering, and retries.  A crashed compaction is healed first."""
    import os

    _recover_compaction(path)
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
    the merged view as the new base, then drop the folded delta log.
    Readers see base+deltas before, base-only after — both merge to the
    same view.

    Crash-safe by rename-aside, never delete-then-replace (the previous
    delete-deltas-first order had a window where a crash lost the folded
    deltas PERMANENTLY — old base live, deltas gone, and a rerun would
    rebuild base_next from that already-wrong state): the folded base is
    fully written first (``base_next`` + ``_SUCCESS``), the delta log and
    old base only move ASIDE (``deltas__folding``, ``base__old``) until
    the new base is live, and deletes come last.  Every crash point
    leaves a complete copy of the view on disk, and
    ``_recover_compaction`` (run by every reader and by compact itself)
    rolls the state forward or backward deterministically — rerunning
    compact after any crash converges.  Invariant the recovery relies
    on: ``deltas__folding`` is only ever created AFTER ``base_next`` is
    complete, so ``folding present ∧ base_next absent`` proves the
    swapped-in base already contains the folded deltas.  Offline
    lifecycle as before: run without concurrent delta appends."""
    import os
    import shutil

    _recover_compaction(path)
    merged = read_current_mv(spark, path, keys)
    merged.write.mode("overwrite").parquet(f"{path}/base_next")
    if os.path.isdir(f"{path}/deltas"):
        shutil.move(f"{path}/deltas", f"{path}/deltas__folding")
    shutil.move(f"{path}/base", f"{path}/base__old")
    shutil.move(f"{path}/base_next", f"{path}/base")
    shutil.rmtree(f"{path}/deltas__folding", ignore_errors=True)
    shutil.rmtree(f"{path}/base__old")


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

    _recover_compaction(path)
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
