"""Build-if-absent cache protocol for fingerprint+version-keyed
incremental stores (LM counts, co-occurrence pairs, FM masks, KMV
signatures, IVF cells, ...).

One store per (family, corpus leaf, behavior version, data
fingerprint) under the system temp dir.  The build happens in a
process-unique ``<store>.build-<pid>-<uuid>`` directory and publishes
with ONE atomic rename, so a concurrent process can never read a
half-built store and a lost rename race just discards the duplicate.
A code change bumps the family's version constant (the ngram_lm
INCREMENTAL_STORE_VERSION rule) rather than requiring a /tmp flush.

This module is the ONE owner of that protocol — round 10/11/12 staged
queries each carried a near-identical copy until the round-9 advisor
flagged two gaps the copies shared: a build that crashes before its
rename leaked its ``.build-*`` directory forever (only the rename-race
loser cleaned up), and fingerprint-keyed stores accumulated without
eviction after every testdata regeneration.  ``_sweep_stale`` below
closes both: on entry to the build branch it removes sibling
``*.build-*`` leftovers and superseded-fingerprint stores older than
``STALE_AFTER_S`` (old enough that no live process is still using
them; the current store path itself is never swept).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid
from typing import Callable

# A build/abandoned store older than this is presumed dead (builds at
# any tested scale finish in seconds; a reader holds a store open for
# one query).  Deliberately generous — the sweep exists to stop
# unbounded accumulation, not to reclaim space eagerly.
STALE_AFTER_S = 3600


def _sweep_stale(store: str, now: float | None = None) -> None:
    """Remove stale siblings of ``store``: orphaned ``*.build-*``
    directories from crashed builds, and stores whose fingerprint key
    differs from the current one (superseded by a testdata
    regeneration) — both only when older than STALE_AFTER_S, and never
    ``store`` itself."""
    parent = os.path.dirname(store)
    if not os.path.isdir(parent):
        return
    cutoff = (time.time() if now is None else now) - STALE_AFTER_S
    keep = os.path.basename(store)
    for name in os.listdir(parent):
        if name == keep:
            continue
        path = os.path.join(parent, name)
        try:
            if os.path.getmtime(path) > cutoff:
                continue
        except OSError:
            continue  # vanished mid-sweep (another process's rename)
        shutil.rmtree(path, ignore_errors=True)


def cached_store(
    sf_dir: str,
    family: str,
    version: str,
    table: str,
    build_fn: Callable[[str], None],
) -> str:
    """Return the path of the ``family`` store for ``table`` under
    ``sf_dir``, building it via ``build_fn(build_dir)`` if absent.

    Cache key = corpus leaf + behavior ``version`` + data fingerprint,
    so a code change (version bump) or a testdata regeneration (new
    fingerprint) builds fresh by construction while repeat queries in
    the same round reuse the published store.
    """
    from mapreducemovieanalysis_cloud_spark.sources.readers import (
        table_fingerprint,
    )

    leaf = os.path.basename(os.path.normpath(sf_dir))
    fp = table_fingerprint(sf_dir, table)
    store = os.path.join(
        tempfile.gettempdir(), family, leaf, f"{version}-{fp}"
    )
    if not os.path.exists(store):
        _sweep_stale(store)
        build = f"{store}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        build_fn(build)
        try:
            os.rename(build, store)
        except OSError:
            if not os.path.exists(store):  # real failure, not a race
                raise
            shutil.rmtree(build, ignore_errors=True)
    return store
