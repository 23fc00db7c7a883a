"""Epoch-store compaction (sources/writers.compact_epochs): the
small-directories lifecycle for every incremental store — one epoch per
ingest day means thousands of ``batch=`` dirs per read after a few
years, and ``read_epochs`` pays an O(epochs) listing + per-dir footer
open on every query.  Pins:

* folding preserves the merged answer EXACTLY for both merge algebras
  in production (ADD counts — graph stores; OR masks — FM store) and
  collapses the store to one epoch;
* appends after a fold keep merging correctly (the folded epoch is
  just another partial);
* every crash point rolls FORWARD deterministically on rerun
  (uncommitted stage discarded; committed marker finishes moves, swap,
  cleanup — including the crash-after-swap state);
* rerunning on a compacted store is a no-op.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.sources.writers import (
    compact_epochs,
    read_epochs,
    write_epoch,
)


def _count_merge(df):
    return df.groupBy("u", "v").agg(F.sum("cnt").alias("cnt"))


def _edges(spark, root):
    return sorted(
        map(
            tuple,
            read_epochs(spark, root)
            .groupBy("u", "v")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .collect(),
        )
    )


def _epoch_dirs(root):
    return sorted(
        e
        for e in os.listdir(root)
        if e.startswith("batch=") and os.path.isdir(os.path.join(root, e))
    )


def _seed_counts_store(spark, root, n_epochs=3):
    for b in range(n_epochs):
        df = spark.createDataFrame(
            [(u, u + 1 + b % 2, 1 + (u + b) % 3) for u in range(6)],
            "u long, v long, cnt long",
        )
        write_epoch(df, root, f"b{b}")


def test_fold_preserves_counts_and_collapses_dirs(spark, tmp_path):
    root = str(tmp_path / "pairs")
    _seed_counts_store(spark, root)
    before = _edges(spark, root)
    assert len(_epoch_dirs(root)) == 3
    assert compact_epochs(spark, root, _count_merge) == 3
    assert _epoch_dirs(root) == ["batch=folded"]
    assert _edges(spark, root) == before
    # append after the fold: the folded epoch is just another partial
    write_epoch(
        spark.createDataFrame([(0, 1, 5)], "u long, v long, cnt long"),
        root,
        "b9",
    )
    after = dict(((u, v), c) for u, v, c in _edges(spark, root))
    want = dict(((u, v), c) for u, v, c in before)
    want[(0, 1)] = want.get((0, 1), 0) + 5
    assert after == want
    # refolding folds {folded, b9} into one again
    assert compact_epochs(spark, root, _count_merge) == 2
    assert _epoch_dirs(root) == ["batch=folded"]
    assert dict(((u, v), c) for u, v, c in _edges(spark, root)) == want


def test_fold_preserves_or_masks(spark, tmp_path):
    from mapreducemovieanalysis_cloud_spark.operators import sketches

    store = str(tmp_path / "fm")
    rows = [("g%d" % (i % 2), i) for i in range(60)]
    df = spark.createDataFrame(rows, "g string, uid long")
    sketches.incremental_fm_append(
        df.where(F.col("uid") % 3 == 0), store, "b0", ["g"], "uid"
    )
    sketches.incremental_fm_append(
        df.where(F.col("uid") % 3 == 1), store, "b1", ["g"], "uid"
    )
    sketches.incremental_fm_append(
        df.where(F.col("uid") % 3 == 2), store, "b2", ["g"], "uid"
    )
    before = sorted(
        map(
            tuple,
            sketches.incremental_fm_distinct(spark, store, ["g"]).collect(),
        )
    )
    folded = compact_epochs(
        spark,
        f"{store}/masks",
        lambda d: d.groupBy("g", "r").agg(F.expr("bit_or(m)").alias("m")),
    )
    assert folded == 3
    assert _epoch_dirs(f"{store}/masks") == ["batch=folded"]
    after = sorted(
        map(
            tuple,
            sketches.incremental_fm_distinct(spark, store, ["g"]).collect(),
        )
    )
    assert after == before


def test_noop_on_single_epoch_store(spark, tmp_path):
    root = str(tmp_path / "pairs")
    write_epoch(
        spark.createDataFrame([(0, 1, 1)], "u long, v long, cnt long"),
        root,
        "b0",
    )
    assert compact_epochs(spark, root, _count_merge) == 0
    assert _epoch_dirs(root) == ["batch=b0"]
    assert compact_epochs(spark, root, _count_merge) == 0  # still one


def test_uncommitted_stage_is_discarded(spark, tmp_path):
    """Crash BEFORE the marker: the staged dir exists but the fold
    never committed — the next run discards it and folds fresh (the
    fold set may have changed since the stage was computed)."""
    root = str(tmp_path / "pairs")
    _seed_counts_store(spark, root)
    before = _edges(spark, root)
    stale = spark.createDataFrame(
        [(99, 100, 42)], "u long, v long, cnt long"
    )
    stale.write.parquet(os.path.join(root, "__compact", "batch=folded"))
    assert compact_epochs(spark, root, _count_merge) == 3
    assert _edges(spark, root) == before  # stale stage never surfaced


def test_committed_marker_rolls_forward(spark, tmp_path):
    """Crash right AFTER the marker (no moves yet) and again mid-move:
    rerunning finishes moves + swap + cleanup; the answer is the staged
    merge, exactly."""
    root = str(tmp_path / "pairs")
    _seed_counts_store(spark, root)
    before = _edges(spark, root)
    staged = os.path.join(root, "__compact", "batch=folded")
    _count_merge(read_epochs(spark, root)).write.parquet(staged)
    with open(os.path.join(root, "__compact", "_STAGED"), "w") as fh:
        json.dump(_epoch_dirs(root), fh)
    # crash state A: marker written, nothing moved — plus simulate a
    # mid-move crash by moving ONE epoch into trash by hand
    os.makedirs(os.path.join(root, "__folded_trash"), exist_ok=True)
    os.rename(
        os.path.join(root, "batch=b0"),
        os.path.join(root, "__folded_trash", "batch=b0"),
    )
    assert compact_epochs(spark, root, _count_merge) == 3
    assert _epoch_dirs(root) == ["batch=folded"]
    assert _edges(spark, root) == before
    assert not os.path.exists(os.path.join(root, "__compact"))
    assert not os.path.exists(os.path.join(root, "__folded_trash"))


def test_crash_after_swap_cleans_up(spark, tmp_path):
    """Crash AFTER the staged epoch swapped in but before cleanup:
    marker + trash remain, staging dir no longer holds the epoch —
    rerun must finish cleanup without touching the swapped result."""
    root = str(tmp_path / "pairs")
    _seed_counts_store(spark, root)
    before = _edges(spark, root)
    assert compact_epochs(spark, root, _count_merge) == 3
    want = _edges(spark, root)
    assert want == before
    # rebuild the post-swap crash state around the completed fold
    os.makedirs(os.path.join(root, "__compact"), exist_ok=True)
    with open(os.path.join(root, "__compact", "_STAGED"), "w") as fh:
        json.dump(["batch=b0", "batch=b1", "batch=b2"], fh)
    os.makedirs(os.path.join(root, "__folded_trash", "batch=b0"))
    assert compact_epochs(spark, root, _count_merge) == 3  # roll-forward
    assert _epoch_dirs(root) == ["batch=folded"]
    assert _edges(spark, root) == want
    assert not os.path.exists(os.path.join(root, "__compact"))
    assert not os.path.exists(os.path.join(root, "__folded_trash"))
    shutil.rmtree(root)


_CRASH_STATES = [
    # (name, marker_written, n_moves: 0|1|-1(all), swapped, trash_gone)
    ("staged_only", False, 0, False, False),
    ("marker_no_moves", True, 0, False, False),
    ("mid_move", True, 1, False, False),
    ("moved_all", True, -1, False, False),
    ("swapped", True, -1, True, False),
    ("trash_cleaned", True, -1, True, True),
]


@pytest.mark.parametrize("refold", [False, True], ids=["fold", "refold"])
@pytest.mark.parametrize(
    "name,marker_written,n_moves,swapped,trash_gone",
    _CRASH_STATES,
    ids=[s[0] for s in _CRASH_STATES],
)
def test_crash_state_matrix(
    spark, tmp_path, refold, name, marker_written, n_moves, swapped,
    trash_gone,
):
    """EVERY crash point of the compaction protocol, on a first fold
    AND on a re-fold (where ``batch=folded`` is itself in the fold set
    — the state family where the r11 advisor found the move-loop-
    replay data-loss bug by hand): build the exact on-disk state a
    crash leaves behind, rerun compact_epochs, and assert convergence
    to one folded epoch holding exactly the pre-crash merged truth,
    with no protocol litter left."""
    root = str(tmp_path / "pairs")
    _seed_counts_store(spark, root)
    if refold:
        assert compact_epochs(spark, root, _count_merge) == 3
        write_epoch(
            spark.createDataFrame(
                [(0, 1, 10), (7, 8, 5)], "u long, v long, cnt long"
            ),
            root,
            "b3",
        )
    want = _edges(spark, root)
    compact_dir = os.path.join(root, "__compact")
    staged = os.path.join(compact_dir, "batch=folded")
    trash = os.path.join(root, "__folded_trash")
    fold_set = _epoch_dirs(root)
    _count_merge(read_epochs(spark, root)).write.parquet(staged)
    if marker_written:
        with open(os.path.join(compact_dir, "_STAGED"), "w") as fh:
            json.dump(fold_set, fh)
    moves = fold_set[: n_moves] if n_moves >= 0 else fold_set
    if moves:
        os.makedirs(trash, exist_ok=True)
    for epoch in moves:
        os.rename(os.path.join(root, epoch), os.path.join(trash, epoch))
    if swapped:
        os.rename(staged, os.path.join(root, "batch=folded"))
    if trash_gone:
        shutil.rmtree(trash, ignore_errors=True)
    # rerun from the crash state: must converge, preserving the truth
    n = compact_epochs(spark, root, _count_merge)
    assert n == len(fold_set)
    assert _epoch_dirs(root) == ["batch=folded"]
    assert _edges(spark, root) == want
    assert not os.path.exists(compact_dir)
    assert not os.path.exists(trash)
    # idempotent from the recovered state: refold of 1 epoch is a no-op
    assert compact_epochs(spark, root, _count_merge) == 0


def test_torn_marker_treated_as_uncommitted(spark, tmp_path):
    """The 13th crash state the r12 advisor found missing from the
    matrix: a crash MID-marker-write leaves unparseable JSON.  The
    write is now atomic (tmp + rename) so this state shouldn't arise
    going forward, but a marker torn by an older layout or a
    non-atomic filesystem must read as UNCOMMITTED — moves only start
    after a complete marker — and be discarded, never raise
    JSONDecodeError forever (which would break the 'every state
    recoverable by rerunning' protocol)."""
    root = str(tmp_path / "pairs")
    _seed_counts_store(spark, root)
    want = _edges(spark, root)
    compact_dir = os.path.join(root, "__compact")
    staged = os.path.join(compact_dir, "batch=folded")
    _count_merge(read_epochs(spark, root)).write.parquet(staged)
    with open(os.path.join(compact_dir, "_STAGED"), "w") as fh:
        fh.write('["batch=b0", "ba')  # torn mid-write
    assert compact_epochs(spark, root, _count_merge) == 3
    assert _epoch_dirs(root) == ["batch=folded"]
    assert _edges(spark, root) == want
    assert not os.path.exists(compact_dir)
    # no .tmp litter from the atomic-commit path either
    assert not os.path.exists(os.path.join(compact_dir, "_STAGED.tmp"))


def test_refold_crash_after_swap_keeps_new_fold(spark, tmp_path):
    """Crash AFTER the swap on a RE-fold — the fold set contains the
    previous ``batch=folded``, so a naive rerun of the move loop would
    mistake the freshly swapped-in result for an unfolded epoch, trash
    it, and rmtree the trash: total data loss.  Rerun must detect the
    swap-already-done state (staged absent) and only clean up."""
    root = str(tmp_path / "pairs")
    _seed_counts_store(spark, root)
    assert compact_epochs(spark, root, _count_merge) == 3  # first fold
    extra = spark.createDataFrame(
        [(0, 1, 10), (7, 8, 5)], "u long, v long, cnt long"
    )
    write_epoch(extra, root, "b3")
    want = _edges(spark, root)
    # hand-build the second fold's crash-after-swap state: stage the
    # new merge, commit the marker (fold set INCLUDES batch=folded),
    # finish moves + swap, then "crash" before cleanup
    compact_dir = os.path.join(root, "__compact")
    staged = os.path.join(compact_dir, "batch=folded")
    _count_merge(read_epochs(spark, root)).write.parquet(staged)
    fold_set = _epoch_dirs(root)  # ['batch=b3', 'batch=folded']
    with open(os.path.join(compact_dir, "_STAGED"), "w") as fh:
        json.dump(fold_set, fh)
    trash = os.path.join(root, "__folded_trash")
    os.makedirs(trash, exist_ok=True)
    for name in fold_set:
        os.rename(os.path.join(root, name), os.path.join(trash, name))
    os.rename(staged, os.path.join(root, "batch=folded"))
    # crash here: marker + trash remain, staged gone, new fold live
    assert compact_epochs(spark, root, _count_merge) == 2  # cleanup only
    assert _epoch_dirs(root) == ["batch=folded"]
    assert _edges(spark, root) == want
    assert not os.path.exists(compact_dir)
    assert not os.path.exists(trash)
    shutil.rmtree(root)


def test_compact_holds_maintenance_lock(spark, tmp_path):
    """A live competing holder makes compact fail fast with the
    dedicated error instead of interleaving renames (the invindex
    lock rule applied to the epoch layout)."""
    import pytest

    from mapreducemovieanalysis_cloud_spark.operators.recovery import (
        MaintenanceLockHeld,
        maintenance_lock,
    )

    root = str(tmp_path / "pairs")
    _seed_counts_store(spark, root)
    with maintenance_lock(root):
        with pytest.raises(MaintenanceLockHeld):
            _locked_compact(spark, root)
    # released: the same call succeeds
    assert compact_epochs(spark, root, _count_merge) == 3


def _locked_compact(spark, root):
    """compact with a zero wait so the held-lock case fails fast.

    flock re-entrancy within one process goes through independent fds
    (recovery.maintenance_lock opens its own), so the outer holder above
    genuinely blocks this call."""
    import unittest.mock as mock

    from mapreducemovieanalysis_cloud_spark.operators import recovery

    orig = recovery.maintenance_lock

    def zero_wait(root_, timeout=60.0, poll=0.1):
        return orig(root_, timeout=0.0, poll=poll)

    with mock.patch.object(recovery, "maintenance_lock", zero_wait):
        return compact_epochs(spark, root, _count_merge)


def test_fold_preserves_kmv_bottomk(spark, tmp_path):
    """The third production merge algebra — KMV's union-then-re-rank:
    folding with DISTINCT on (grp, h) preserves the merged bottom-k
    sketches exactly (the re-rank happens at read, so a distinct union
    is a valid partial)."""
    from mapreducemovieanalysis_cloud_spark.operators import corpus_overlap

    store = str(tmp_path / "kmv")
    rows = [
        ("s0", f"alpha beta gamma doc{i} shared tail") for i in range(6)
    ] + [("s1", f"alpha beta gamma other{i % 2} end") for i in range(5)]
    df = spark.createDataFrame(rows, "source string, text string")
    thirds = [df.where(F.crc32("text") % 3 == i) for i in range(3)]
    for i, part in enumerate(thirds):
        corpus_overlap.incremental_kmv_append(part, store, f"b{i}", k=16)

    def merged():
        return sorted(
            map(
                tuple,
                corpus_overlap.incremental_kmv_sketches(
                    spark, store, k=16
                ).collect(),
            )
        )

    before = merged()
    assert (
        compact_epochs(
            spark,
            f"{store}/sketch",
            lambda d: d.select("grp", "h").distinct(),
        )
        == 3
    )
    assert _epoch_dirs(f"{store}/sketch") == ["batch=folded"]
    assert merged() == before
