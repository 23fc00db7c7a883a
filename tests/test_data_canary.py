"""Driver-data drift canary (r04 verdict item 8): pin the PHYSICAL
parquet schema of every driver-provided table and fail loudly when it
changes.

The driver regenerated events.parquet between rounds 2 and 3 with
``ts`` flipping TIMESTAMP(NANOS) -> TIMESTAMP(MICROS); the repo caught
it by luck in a failing oracle. This test makes the next such
regeneration surface locally, before a driver run, with a message that
says exactly what moved.

On a legitimate regeneration: re-run
``python tests/test_data_canary.py`` to refresh the pin file, then
re-verify every query over the changed table (tools/rotation.py
promotes them in the driver window via _DATA_REGENERATED).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pytest

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))
PIN_FILE = os.path.join(os.path.dirname(__file__), "data_fingerprints.json")


def physical_schema(path: str) -> str:
    """The parquet PHYSICAL schema text (includes physical type +
    logical annotation, e.g. INT64 TIMESTAMP(NANOS) vs MICROS — the
    level at which the r03 drift happened, invisible to df.schema)."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        path = parts[0]
    # first repr line carries the object address — drop it
    return "\n".join(str(pq.ParquetFile(path).schema).splitlines()[1:])


def current_fingerprints() -> dict[str, str]:
    fps = {}
    for sf in SF_DIRS:
        for t in TABLES:
            p = os.path.join(sf, f"{t}.parquet")
            if os.path.exists(p):
                key = f"{os.path.basename(sf)}/{t}"
                fps[key] = hashlib.md5(
                    physical_schema(p).encode()
                ).hexdigest()
    return fps


@pytest.mark.skipif(not SF_DIRS, reason="no driver testdata present")
def test_driver_table_physical_schemas_unchanged():
    with open(PIN_FILE) as fh:
        pinned = json.load(fh)
    got = current_fingerprints()
    present_sfs = {os.path.basename(d) for d in SF_DIRS}
    changed = sorted(
        k for k in pinned if k in got and got[k] != pinned[k]
    )
    # a table is "vanished" only when its sf dir is mounted but the
    # table file is gone — a machine with a subset of the pinned sf
    # dirs (e.g. only sf0.01) has no drift, just less data
    vanished = sorted(
        k
        for k in pinned
        if k not in got and k.split("/", 1)[0] in present_sfs
    )
    new = sorted(k for k in got if k not in pinned)
    assert not changed and not vanished, (
        "driver data drifted since the pin: "
        f"changed={changed} vanished={vanished} (new={new}). "
        "If the driver regenerated a table: refresh the pin "
        "(python tests/test_data_canary.py), add the affected queries "
        "to tools/rotation.py:_DATA_REGENERATED, regenerate _priority, "
        "and re-verify every query over the table before trusting old "
        "driver rows."
    )


if __name__ == "__main__":
    with open(PIN_FILE, "w") as fh:
        json.dump(current_fingerprints(), fh, indent=1, sort_keys=True)
    print(f"pinned {PIN_FILE}")
