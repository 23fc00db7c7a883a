"""Pins bench.py's store-consumer instrument resolution (r09 verdict
item 4): the two incremental-store consumers must resolve BEFORE their
registration (from the staged modules) and AFTER it (from the registry,
which wins), so the round-over-round reading never silently vanishes
across the committed r11/r12 promotion windows."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench


def test_store_consumers_resolve_from_staged_modules():
    # With an empty registry dict, both names must fall back to the
    # staged modules (round11_staged / round12_staged) and be callable.
    got = bench._resolve_store_consumers({})
    assert sorted(got) == sorted(bench.STORE_CONSUMER)
    assert all(callable(fn) for fn in got.values())


def test_registry_resolution_wins_after_promotion():
    sentinel = object()
    qs = {name: sentinel for name in bench.STORE_CONSUMER}
    got = bench._resolve_store_consumers(qs)
    assert all(got[name] is sentinel for name in bench.STORE_CONSUMER)


def test_missing_name_is_skipped_not_fatal():
    # A renamed/removed staged query must degrade to an absent reading,
    # never crash the bench (the driver runs it unattended).
    orig = bench.STORE_CONSUMER
    bench.STORE_CONSUMER = orig + ["no_such_query_xyz"]
    try:
        got = bench._resolve_store_consumers({})
        assert "no_such_query_xyz" not in got
        assert sorted(got) == sorted(orig)
    finally:
        bench.STORE_CONSUMER = orig
