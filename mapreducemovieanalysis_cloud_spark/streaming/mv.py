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


def _resolve_read_paths(path: str) -> tuple[str, str | None]:
    """READ-ONLY crash-state resolution (r05 advisor): which (base dir,
    delta-log dir-or-None) hold the current view, given any crash point of
    the compaction protocol — without performing a single rename.

    Every crash point leaves a complete copy of the view on disk (that is
    what rename-aside buys); this maps the debris to it:

    * clean / ``base_next`` partial or merely complete → base + deltas
      (an unswapped folded base is REDUNDANT with base+deltas, not newer);
    * ``deltas__folding`` present ∧ ``base_next`` complete → the folded
      base at ``base_next`` IS the view (live ``base`` is the stale old
      one, the aside deltas are folded in);
    * ``deltas__folding`` present ∧ ``base_next`` absent → the swap
      finished: live ``base`` is the folded base, aside deltas redundant;
    * ``deltas__folding`` present ∧ ``base_next`` incomplete (a rerun
      crashed while overwriting it) → the fold never completed: base plus
      the delta log, which sits at ``deltas`` if present else still aside
      at ``deltas__folding``;
    * ``base`` absent (crash between the two swap renames) → the folded
      base at ``base_next`` when complete, else the parked ``base__old``.

    Readers concurrent with a CRASHED compact are therefore always safe
    and mutate nothing; readers concurrent with a LIVE compact remain
    excluded by the offline-maintenance lifecycle (compact holds the
    layout's ``maintenance_lock`` while it mutates)."""
    import os

    base = f"{path}/base"
    nxt = f"{path}/base_next"
    folding = f"{path}/deltas__folding"
    old = f"{path}/base__old"
    deltas = f"{path}/deltas"
    next_done = os.path.exists(os.path.join(nxt, "_SUCCESS"))
    deltas_or_none = deltas if os.path.isdir(deltas) else None
    if os.path.isdir(base):
        if os.path.isdir(folding):
            if next_done:
                return nxt, None
            if not os.path.isdir(nxt):
                return base, None
            return base, deltas_or_none or folding
        return base, deltas_or_none
    if next_done:
        return nxt, None
    if os.path.isdir(old):
        return old, deltas_or_none or (
            folding if os.path.isdir(folding) else None
        )
    return base, deltas_or_none  # nothing to resolve: read fails loudly


def _recover_compaction(path: str) -> None:
    """Heal a crashed ``compact`` ON DISK — destructive (rolls the state
    forward or backward with renames), so it runs ONLY under the layout's
    ``maintenance_lock``: from ``compact`` itself and from the explicit
    ``repair`` entry point, never from readers (readers resolve the crash
    state read-only via ``_resolve_read_paths``).  The individual ops
    tolerate already-performed renames as belt and braces."""
    import os

    from mapreducemovieanalysis_cloud_spark.operators.recovery import (
        guarded_move,
        guarded_rmtree,
    )

    base = f"{path}/base"
    nxt = f"{path}/base_next"
    folding = f"{path}/deltas__folding"
    next_done = os.path.exists(os.path.join(nxt, "_SUCCESS"))
    if not os.path.isdir(base):
        if next_done:
            guarded_move(nxt, base)  # crashed between the two base renames
        elif os.path.isdir(f"{path}/base__old"):
            guarded_move(f"{path}/base__old", base)
    if os.path.isdir(folding):
        if os.path.exists(os.path.join(base, "_SUCCESS")) and not os.path.isdir(nxt):
            # folded base is live (crash after the swap): the aside delta
            # copy is already folded in — dropping it is the roll-forward
            guarded_rmtree(folding)
        elif next_done:
            # folded base complete but not yet live: finish the swap
            if os.path.isdir(base):
                guarded_move(base, f"{path}/base__old")
            guarded_move(nxt, base)
            guarded_rmtree(folding)
        else:
            # fold never finished: restore the delta log and retry later
            if not os.path.isdir(f"{path}/deltas"):
                guarded_move(folding, f"{path}/deltas")
            else:
                guarded_rmtree(folding)
            guarded_rmtree(nxt)
    if os.path.isdir(f"{path}/base__old") and os.path.isdir(base):
        guarded_rmtree(f"{path}/base__old")


def repair(path: str) -> None:
    """Explicit on-disk repair of a crashed compaction, under the
    exclusive maintenance lock.  Reads never need this for correctness
    (they resolve crash states read-only); run it — or simply rerun
    ``compact`` — to clean the debris up."""
    from mapreducemovieanalysis_cloud_spark.operators.recovery import (
        maintenance_lock,
    )

    with maintenance_lock(path):
        _recover_compaction(path)


def read_current_mv(
    spark: SparkSession, path: str, keys: list[str]
) -> DataFrame:
    """Merged view: base + every delta epoch, one aggregate.  Partials
    are associative ints, so the result is independent of epoch count,
    ordering, and retries.  A crashed compaction is resolved READ-ONLY
    (``_resolve_read_paths``) — readers never rename or delete, so
    concurrent readers over a crashed state cannot race each other."""
    base_dir, deltas_dir = _resolve_read_paths(path)
    frames = [spark.read.parquet(base_dir)]
    if deltas_dir is not None:
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
    leaves a complete copy of the view on disk; readers resolve any
    crash state READ-ONLY (``_resolve_read_paths``), and
    ``_recover_compaction`` (run here and by explicit ``repair``, always
    under the exclusive ``maintenance_lock``) rolls the on-disk state
    forward or backward deterministically — rerunning compact after any
    crash converges.  Invariant the recovery relies on:
    ``deltas__folding`` is only ever created AFTER ``base_next`` is
    complete, so ``folding present ∧ base_next absent`` proves the
    swapped-in base already contains the folded deltas.  Offline
    lifecycle as before: run without concurrent delta appends or reads —
    the lock serializes compact/repair against each other, and readers
    are safe against any state compact leaves BEHIND, but a read racing
    compact's own renames mid-flight can still fail (and merely fails:
    it can no longer corrupt the layout or crash the compactor)."""
    import os

    from mapreducemovieanalysis_cloud_spark.operators.recovery import (
        guarded_move,
        guarded_rmtree,
        maintenance_lock,
    )

    with maintenance_lock(path):
        _recover_compaction(path)
        merged = read_current_mv(spark, path, keys)
        merged.write.mode("overwrite").parquet(f"{path}/base_next")
        if os.path.isdir(f"{path}/deltas"):
            guarded_move(f"{path}/deltas", f"{path}/deltas__folding")
        guarded_move(f"{path}/base", f"{path}/base__old")
        guarded_move(f"{path}/base_next", f"{path}/base")
        guarded_rmtree(f"{path}/deltas__folding")
        guarded_rmtree(f"{path}/base__old")


def read_mv_asof(
    spark: SparkSession, path: str, keys: list[str], as_of_epoch: int
) -> DataFrame:
    """Time travel over the delta log: the view as of (and including)
    ``as_of_epoch`` — base plus every delta directory with a smaller or
    equal epoch id.  The epoch-keyed layout gives snapshot reads for
    free: a snapshot is just a prefix of the log, and since partials are
    associative the prefix merges exactly like the full log.  Epochs
    newer than the requested snapshot are simply not read — no tombstones
    or version manifests needed until compaction folds the log.  Crash
    states resolve read-only, like ``read_current_mv`` (a delta log
    parked aside mid-fold is listed under its aside name; ``batch=<id>``
    directory names survive the rename, so the epoch filter is
    unaffected)."""
    import os
    import re

    base_dir, deltas_dir = _resolve_read_paths(path)
    frames = [spark.read.parquet(base_dir)]
    if deltas_dir is not None:
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
