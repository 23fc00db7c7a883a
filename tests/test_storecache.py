"""Contracts for the shared incremental-store cache protocol
(operators/storecache.py): atomic publish, build reuse, and the
stale-sibling sweep the round-9 advisor asked for (orphaned
``.build-*`` dirs from crashed builds, superseded-fingerprint
stores)."""

from __future__ import annotations

import os
import time

from mapreducemovieanalysis_cloud_spark.operators.storecache import (
    STALE_AFTER_S,
    _sweep_stale,
    cached_store,
)


def _mkdir_with_mtime(path: str, age_s: float) -> None:
    os.makedirs(path)
    t = time.time() - age_s
    os.utime(path, (t, t))


def test_cached_store_builds_once_and_reuses(tmp_path, monkeypatch):
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    monkeypatch.setattr(
        "mapreducemovieanalysis_cloud_spark.sources.readers"
        ".table_fingerprint",
        lambda sf_dir, table: "fpA",
    )
    calls = []

    def build(b):
        calls.append(b)
        os.makedirs(b)
        with open(os.path.join(b, "data"), "w") as fh:
            fh.write("x")

    p1 = cached_store("/data/sf0.01", "fam", "v1", "t", build)
    p2 = cached_store("/data/sf0.01", "fam", "v1", "t", build)
    assert p1 == p2
    assert len(calls) == 1  # second call reused the published store
    assert os.path.exists(os.path.join(p1, "data"))
    # the build dir was renamed away, not copied
    assert not os.path.exists(calls[0])


def test_sweep_removes_stale_build_orphans_keeps_fresh(tmp_path):
    store = str(tmp_path / "fam" / "sf0.01" / "v1-fpA")
    parent = os.path.dirname(store)
    stale = os.path.join(parent, "v1-fpA.build-123-dead")
    fresh = os.path.join(parent, "v1-fpA.build-456-live")
    _mkdir_with_mtime(stale, STALE_AFTER_S + 60)
    _mkdir_with_mtime(fresh, 1)
    _sweep_stale(store)
    assert not os.path.exists(stale)  # crashed build reclaimed
    assert os.path.exists(fresh)  # concurrent in-flight build untouched


def test_sweep_evicts_superseded_fingerprint_never_current(tmp_path):
    store = str(tmp_path / "fam" / "sf0.01" / "v1-fpNEW")
    parent = os.path.dirname(store)
    old_fp = os.path.join(parent, "v1-fpOLD")
    _mkdir_with_mtime(old_fp, STALE_AFTER_S + 60)
    _mkdir_with_mtime(store, STALE_AFTER_S + 60)  # current: old but kept
    _sweep_stale(store)
    assert not os.path.exists(old_fp)  # superseded by data regeneration
    assert os.path.exists(store)  # the current key is never swept


def test_sweep_noop_when_parent_missing(tmp_path):
    _sweep_stale(str(tmp_path / "nope" / "sf" / "v1-fp"))  # must not raise
