"""The shared maintenance lock + read-only reader guarantees (r05 advisor
medium findings): destructive crash recovery is exclusive to
compact/repair under an flock-based lock, and the hot read paths of the
streaming-MV layout and the stored inverted index resolve crash states
without mutating the filesystem."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from mapreducemovieanalysis_cloud_spark.operators import matview
from mapreducemovieanalysis_cloud_spark.operators.recovery import (
    MaintenanceLockHeld,
    maintenance_lock,
)
from mapreducemovieanalysis_cloud_spark.streaming import mv as smv


def test_lock_excludes_second_holder_and_releases(tmp_path):
    root = str(tmp_path / "layout")
    with maintenance_lock(root, timeout=5.0):
        with pytest.raises(MaintenanceLockHeld):
            # an independent fd in the same process behaves like another
            # process under flock: exclusion is real, and timeout=0
            # fails fast instead of deadlocking
            with maintenance_lock(root, timeout=0.0):
                pass
    # released on exit: immediately acquirable again
    with maintenance_lock(root, timeout=0.0):
        pass


def test_lock_auto_releases_when_holder_dies(tmp_path):
    """flock is released by the OS when the holder's fd closes (process
    death included) — a crashed compact can never brick the layout with
    a stale lock file, even though the file itself stays behind."""
    import fcntl

    root = str(tmp_path / "layout")
    os.makedirs(root)
    path = os.path.join(root, "_MAINTENANCE_LOCK")
    fd = os.open(path, os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    os.close(fd)  # "crash": no explicit unlock, fd just goes away
    assert os.path.exists(path)  # the stale FILE remains...
    with maintenance_lock(root, timeout=0.0):  # ...and does not block
        pass


def _mv_fixture(spark, path):
    keys = ["g"]

    def mk(rows):
        return spark.createDataFrame(rows, "g string, cents long")

    smv.write_base(
        matview.aggregate_mv(mk([("a", 10), ("b", 5)]), keys, F.col("cents")),
        path,
    )
    matview.aggregate_mv(
        mk([("a", 7), ("c", 1)]), keys, F.col("cents")
    ).write.mode("overwrite").parquet(f"{path}/deltas/batch=0")
    expected = sorted(
        (r["g"], r["revenue_cents"], r["n_rows"])
        for r in matview.aggregate_mv(
            mk([("a", 10), ("b", 5), ("a", 7), ("c", 1)]), keys, F.col("cents")
        ).collect()
    )
    return keys, expected


def _canon(df):
    return sorted(
        (r["g"], r["revenue_cents"], r["n_rows"]) for r in df.collect()
    )


def test_mv_reader_is_read_only_over_crash_state(spark, tmp_path):
    """A reader over a crashed compaction returns the correct view while
    leaving every piece of debris exactly where it was — two concurrent
    readers can no longer race each other's heal renames.  Explicit
    repair (or a compact rerun) cleans the state up afterwards."""
    path = str(tmp_path / "mv")
    keys, expected = _mv_fixture(spark, path)
    # crash state: folded base complete, deltas aside, old base still live
    smv.read_current_mv(spark, path, keys).write.mode("overwrite").parquet(
        f"{path}/base_next"
    )
    shutil.move(f"{path}/deltas", f"{path}/deltas__folding")
    before = {
        d: os.path.isdir(f"{path}/{d}")
        for d in ("base", "base_next", "deltas", "deltas__folding")
    }
    assert _canon(smv.read_current_mv(spark, path, keys)) == expected
    after = {
        d: os.path.isdir(f"{path}/{d}")
        for d in ("base", "base_next", "deltas", "deltas__folding")
    }
    assert after == before  # not one rename happened on the read path
    smv.repair(path)
    assert _canon(smv.read_current_mv(spark, path, keys)) == expected
    assert not os.path.isdir(f"{path}/deltas__folding")
    assert not os.path.isdir(f"{path}/base_next")


def test_mv_asof_resolves_aside_delta_log(spark, tmp_path):
    """Time travel keeps working over a crashed fold whose delta log sits
    aside: batch=<id> names survive the rename, so the epoch filter
    applies to the parked copy identically."""
    path = str(tmp_path / "mv")
    keys, _ = _mv_fixture(spark, path)
    want0 = _canon(smv.read_mv_asof(spark, path, keys, as_of_epoch=0))
    # fold never finished (base_next incomplete): log is aside
    os.makedirs(f"{path}/base_next")  # no _SUCCESS
    shutil.move(f"{path}/deltas", f"{path}/deltas__folding")
    assert _canon(smv.read_mv_asof(spark, path, keys, as_of_epoch=0)) == want0
    assert os.path.isdir(f"{path}/deltas__folding")  # read-only


def test_repair_fails_fast_while_lock_is_held(spark, tmp_path):
    path = str(tmp_path / "mv")
    _mv_fixture(spark, path)
    with maintenance_lock(path, timeout=5.0):
        with pytest.raises(MaintenanceLockHeld):
            with maintenance_lock(path, timeout=0.0):
                pass
    smv.repair(path)  # and proceeds normally once released
