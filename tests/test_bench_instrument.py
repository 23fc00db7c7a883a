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
    assert mods == sorted(mods)


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
