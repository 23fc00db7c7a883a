"""First-seen dedup emitter: per key, each event_type is emitted exactly
once — on the micro-batch where it first appears, stamped with that batch's
minimum event time (SURVEY §2.2 row 9, "stateful ops"; the streaming-ingest
side of the dedup family in operators/dedup.py).

Two implementations of the same semantics:

- ``first_seen_types`` — transformWithState (Spark 4's successor stateful
  API: typed state variables + timers on a ``StatefulProcessor`` class;
  MapState keyed by event_type holds the seen-set). The PySpark side of
  this API needs ``google.protobuf`` (StateMessage_pb2), which this
  container does not ship, so the wrapper is gated behind
  ``TWS_AVAILABLE`` — the processor class, state wiring, schemas, and the
  batch-mode entry (transformWithState runs in batch queries too, where
  state starts empty and semantics collapse to GROUP BY key, type →
  MIN(ts)) are real and exercised whenever the dependency exists.
- ``first_seen_types_apws`` — the same operator on
  ``applyInPandasWithState`` (protobuf-free), used by the streaming
  convergence tests: a ListState-equivalent tuple of seen types per key.

State size is O(distinct types per key), hash-partitioned by the grouping
key like any shuffle; on a cluster the store is RocksDB-backed with
changelog checkpointing, so the scale posture matches a streaming
aggregation. Batch oracle (registry ``stream_first_seen``):
``GROUP BY user_id, event_type → MIN(ts)``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # transformWithState's python workers import protobuf lazily
    import google.protobuf  # noqa: F401

    TWS_AVAILABLE = True
except ImportError:  # container ships no protobuf — gate, don't crash
    TWS_AVAILABLE = False

FIRST_SEEN_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_type", StringType(), False),
        StructField("first_ts", StringType(), False),
    ]
)

_SEEN_VALUE_SCHEMA = StructType([StructField("one", LongType(), True)])


def _fmt_us(us: int) -> str:
    return pd.Timestamp(int(us), unit="us").strftime("%Y-%m-%d %H:%M:%S.%f")


if TWS_AVAILABLE:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class FirstSeenProcessor(StatefulProcessor):
        """Emit each (key, event_type) once, at its first-seen batch."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getMapState(
                "seen", "event_type string", _SEEN_VALUE_SCHEMA
            )

        def handleInputRows(
            self, key, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            firsts: dict[str, int] = {}
            for pdf in rows:
                for et, us in zip(pdf["event_type"], pdf["ts_us"]):
                    if self._seen.containsKey((et,)):
                        continue
                    us = int(us)
                    if et not in firsts or us < firsts[et]:
                        firsts[et] = us
            if firsts:
                for et in firsts:
                    self._seen.updateValue((et,), (1,))
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]] * len(firsts),
                        "event_type": list(firsts.keys()),
                        "first_ts": [_fmt_us(u) for u in firsts.values()],
                    }
                )

        def close(self) -> None:
            pass


def first_seen_types(events: DataFrame) -> DataFrame:
    """First occurrence of each (user, event_type) via transformWithState.
    Batch or streaming input; event time travels as exact integer micros
    (no tz/precision drift through Arrow), formatted once on the way out.
    Raises ImportError where the container lacks protobuf (see module
    docstring) — callers gate on ``TWS_AVAILABLE``."""
    if not TWS_AVAILABLE:
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf, which this "
            "environment does not provide; use first_seen_types_apws"
        )
    return (
        events.select(
            "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=FirstSeenProcessor(),
            outputStructType=FIRST_SEEN_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


def _apws_update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen: tuple[str, ...] = state.get[0] if state.exists else ()
    seen_set = set(seen.split("\x00")) if seen else set()
    firsts: dict[str, int] = {}
    for pdf in batches:
        for et, us in zip(pdf["event_type"], pdf["ts_us"]):
            if et in seen_set:
                continue
            us = int(us)
            if et not in firsts or us < firsts[et]:
                firsts[et] = us
    if firsts:
        seen_set.update(firsts)
        state.update(("\x00".join(sorted(seen_set)),))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(firsts),
                "event_type": list(firsts.keys()),
                "first_ts": [_fmt_us(u) for u in firsts.values()],
            }
        )


_APWS_STATE_SCHEMA = StructType([StructField("seen", StringType(), True)])


def first_seen_types_apws(stream: DataFrame) -> DataFrame:
    """The same first-seen emitter on applyInPandasWithState (streaming
    only; protobuf-free). Seen-set state is a NUL-joined sorted string —
    the API's flat-struct state model has no map/list variables (that is
    what transformWithState adds)."""
    return (
        stream.select(
            "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _apws_update,
            outputStructType=FIRST_SEEN_SCHEMA,
            stateStructType=_APWS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def first_seen_batch(events: DataFrame) -> DataFrame:
    """Batch semantics of the first-seen emitter (what a converged stream
    equals when every event arrives in order): min event time per (user,
    event_type). This is the registry's oracle-checked entry."""
    return (
        events.groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("min_ts"))
        .select(
            "user_id",
            "event_type",
            F.date_format("min_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "first_ts"
            ),
        )
    )
