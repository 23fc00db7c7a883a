"""Streaming per-key EWMA via applyInPandasWithState — the continuous
counterpart of ``operators.timeseries.ewma_per_key``, sharing its exact
fold semantics so stream and batch converge bit-for-bit.

State per key is the raw float64 EWMA plus the event count — the state
carries the UNROUNDED accumulator across micro-batches (rounding per
batch would compound; the batch operator rounds only the final state, so
the stream must too).  Within a micro-batch rows fold in (ts, tiebreak)
order; across micro-batches the fold order is arrival order, so the
operator assumes per-key event-time-ordered ingestion (the usual log/CDC
contract).  A late row would need re-folding from a snapshot — that is a
reprocessing decision, not silently absorbable state, and is documented
rather than faked.

Scale: state is O(1) per key (two numbers); the state store partitions by
key hash exactly like a shuffle — hot keys are the only skew concern, and
they are bounded by the per-batch sort of that key's rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

EWMA_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("ewma_micro", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("s", DoubleType(), False),
        StructField("n", LongType(), False),
    ]
)


def _make_update(alpha: float):
    keep = 1.0 - alpha

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            s, n = state.get
            seeded = True
        else:
            s, n = 0.0, 0
            seeded = False
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            for x in pdf["value"]:
                x = float(x)
                if not seeded:
                    s = x
                    seeded = True
                else:
                    s = s * keep + x * alpha
                n += 1
        state.update((s, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "ewma_micro": [int(round(s * 1_000_000))],
            }
        )

    return update


def running_ewma(stream: DataFrame, alpha: float = 0.2) -> DataFrame:
    """Continuously-updated per-user EWMA of ``value``: emits
    (user_id, n_events, ewma_micro) every micro-batch the key appears in.
    After any prefix of in-order micro-batches, the emitted state equals
    ``ewma_per_key`` run on the union of those batches (pinned in
    tests/test_streaming2.py)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_update(alpha),
        outputStructType=EWMA_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
