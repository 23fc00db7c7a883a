"""Pins bench.py's store-consumer instrument resolution (r09 verdict
item 4, hardened per the r10 advisor): the two incremental-store
consumers must resolve BEFORE their registration (from the staged
modules, discovered from disk) and AFTER it (from the registry, which
wins), so the round-over-round reading never silently vanishes across
the committed promotion windows — and a name resolving NOWHERE is
reported as a warning, never a crash."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench


def test_staged_modules_discovered_from_disk():
    # Discovery must pick up every round*_staged module present in the
    # queries package — a future round14_staged lands without touching
    # bench.py (r10 advisor item 1).
    mods = bench._staged_modules()
    for expected in (
        "round11_staged", "round12_staged", "round13_staged",
        "round14_staged",
    ):
        assert expected in mods
    # ordered by ROUND NUMBER, not lexicographically: staged_queries()
    # resolves duplicate names first-wave-wins, so round7 must precede
    # round10 (r11 advisor item 3)
    import re

    nums = [int(re.search(r"\d+", m).group()) for m in mods]
    assert nums == sorted(nums)
    assert mods.index("round7_staged") < mods.index("round10_staged")


def test_store_consumers_resolve_from_staged_modules():
    # With an empty registry dict, both names must fall back to the
    # staged modules and be callable; nothing unresolved.
    got, missing = bench._resolve_store_consumers({})
    assert sorted(got) == sorted(bench.STORE_CONSUMER)
    assert all(callable(fn) for fn in got.values())
    assert missing == []


def test_registry_resolution_wins_after_promotion():
    sentinel = object()
    qs = {name: sentinel for name in bench.STORE_CONSUMER}
    got, missing = bench._resolve_store_consumers(qs)
    assert all(got[name] is sentinel for name in bench.STORE_CONSUMER)
    assert missing == []


def test_machine_load_recorded():
    # r11 verdict item 2: the artifact must carry 1/5/15-min loadavg +
    # CPU count so noise-vs-regression adjudication is data, not prose.
    load = bench._machine_load()
    assert load["cpu_count"] == os.cpu_count() and load["cpu_count"] > 0
    for key in ("loadavg_1m", "loadavg_5m", "loadavg_15m"):
        assert key in load and load[key] >= 0.0


def test_store_consumer_per_name_isolation(spark, sf_dir):
    # r11 advisor item 2: a consumer that raises mid-loop must degrade
    # to an error entry while every OTHER consumer's reading survives.
    def boom(spark, sf_dir):
        raise RuntimeError("store build failed")

    def ok(spark, sf_dir):
        return spark.range(5)

    timings, errors = bench._time_store_consumers(
        spark, sf_dir, {"first_ok": ok, "broken": boom, "last_ok": ok}
    )
    assert sorted(timings) == ["first_ok", "last_ok"]
    assert list(errors) == ["broken"]
    assert "store build failed" in errors["broken"]


def test_epoch_compaction_instrument(spark):
    # r11 verdict item 4: the compaction tier gets a round-over-round
    # reading — build epochs, read merged, fold, read again.
    reading = bench._epoch_compaction_instrument(spark)
    assert reading["epochs"] == bench.N_COMPACTION_EPOCHS
    assert reading["folded"] == bench.N_COMPACTION_EPOCHS
    for key in (
        "merged_read_before_sec", "compact_sec", "merged_read_after_sec",
    ):
        assert reading[key] > 0.0


def test_missing_name_is_reported_not_fatal():
    # A renamed/removed staged query must degrade to an absent reading
    # PLUS a warning entry, never crash the bench (the driver runs it
    # unattended).
    orig = bench.STORE_CONSUMER
    bench.STORE_CONSUMER = orig + ["no_such_query_xyz"]
    try:
        got, missing = bench._resolve_store_consumers({})
        assert "no_such_query_xyz" not in got
        assert sorted(got) == sorted(orig)
        assert missing == ["no_such_query_xyz"]
    finally:
        bench.STORE_CONSUMER = orig
