"""Shared maintenance lock + guarded filesystem ops for the rename-aside
storage layouts (the stored inverted index, ``operators/invindex.py``, and
the streaming-MV delta log, ``streaming/mv.py``).

Why this exists (r05 advisor, both medium findings): the two layouts used
to run their DESTRUCTIVE crash recovery (``shutil.move``/``rmtree`` roll
forward/backward) inside every reader.  Two concurrent readers healing the
same crashed state raced each other's renames, and a reader overlapping a
live compaction could hijack the fold mid-flight and crash it.  The fix has
two halves, applied identically to both layouts:

1. **Readers never mutate.**  The hot read path resolves WHICH directories
   to read from the on-disk crash state (every crash point of the protocols
   leaves a complete copy of the data somewhere — that is what rename-aside
   buys) and reads them as-is.  Cost: a handful of ``isdir`` calls; no
   rename, no delete, no race.
2. **Mutation is exclusive.**  ``compact``/``repair`` take this module's
   ``maintenance_lock`` — a ``flock``-based exclusive lock, so it is
   released by the OS even if the holder dies (no stale-lock protocol
   needed).  Concurrent maintenance on one layout root either waits or
   fails fast with ``MaintenanceLockHeld``; it can never interleave.

The individual moves/deletes inside recovery additionally tolerate
``FileNotFoundError`` (``guarded_move``/``guarded_rmtree``) as belt and
braces — under the lock they should never fire, but a tolerated no-op
beats a crashed healer.

Local-filesystem semantics, like the rest of the layouts' maintenance ops:
on cluster object storage the lock maps to the store's native conditional
write / lease primitive (or the layout moves into a transactional table
format), and ``flock`` here is the single-box stand-in for it.
"""

from __future__ import annotations

import os
import shutil
import time

LOCK_NAME = "_MAINTENANCE_LOCK"


class MaintenanceLockHeld(RuntimeError):
    """Another process holds the layout's maintenance lock."""


class maintenance_lock:
    """Exclusive per-layout-root maintenance lock (context manager).

    ``flock(LOCK_EX)`` on ``<root>/_MAINTENANCE_LOCK``: exclusive across
    processes AND across independent file descriptors in one process, and
    automatically released when the holding process exits for any reason —
    a crashed compact can never leave the layout permanently locked.  The
    holder's pid is written into the file purely as a diagnostic.

    ``timeout`` bounds the wait for a live holder; 0 means fail fast.
    """

    def __init__(
        self, root: str, timeout: float = 60.0, poll: float = 0.1
    ) -> None:
        self.root = root
        self.path = os.path.join(root, LOCK_NAME)
        self.timeout = timeout
        self.poll = poll
        self._fd: int | None = None

    def __enter__(self) -> "maintenance_lock":
        import fcntl

        os.makedirs(self.root, exist_ok=True)
        fd = os.open(self.path, os.O_CREAT | os.O_RDWR, 0o644)
        deadline = time.monotonic() + self.timeout
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except (BlockingIOError, PermissionError):
                if time.monotonic() >= deadline:
                    os.close(fd)
                    raise MaintenanceLockHeld(
                        f"maintenance lock on {self.root} is held by "
                        "another process (live compact/repair); retry "
                        "after it finishes"
                    ) from None
                time.sleep(self.poll)
        os.ftruncate(fd, 0)
        os.write(fd, str(os.getpid()).encode())
        self._fd = fd
        return self

    def __exit__(self, *exc: object) -> None:
        import fcntl

        if self._fd is not None:
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            self._fd = None


def guarded_move(src: str, dst: str) -> None:
    """``shutil.move`` that no-ops when the source is already gone (a
    concurrent or prior healer performed this rename first)."""
    try:
        shutil.move(src, dst)
    except FileNotFoundError:
        pass


def guarded_rmtree(path: str) -> None:
    """``shutil.rmtree`` tolerant of the tree already being gone."""
    shutil.rmtree(path, ignore_errors=True)
