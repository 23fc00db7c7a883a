"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.2 row 9: "stateful ops").

``running_counts`` keeps a per-key (count, cents-sum) state across
micro-batches — the canonical arbitrary-stateful pattern (the built-in
windowed aggregates cover time-bucketed state; this covers everything else:
counters, ML feature state, per-entity sessions with custom logic).

State is per-key and Arrow-batched; at scale the state store partitions by
key hash exactly like a shuffle, so hot keys are the only skew concern.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_cents", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("cents", LongType(), False),
    ]
)


def _update(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        cents += int(round(pdf["value"].sum() * 100))
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]}
    )


def running_counts(stream: DataFrame) -> DataFrame:
    """Running (count, cents) per user across micro-batches. Emits the
    current total for every key seen in each batch (update semantics)."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
