"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for streaming semantics the built-in windowed
aggregations can't express: arbitrary per-key state carried across
micro-batches (counters, decaying scores, small per-user models).
Demonstrated here as running per-user totals — the state schema, the
Arrow batch path, update-mode emission, and cross-batch state carry
are the real engineering surface; the arithmetic is deliberately
simple.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)


def _update_user_totals(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cumulative (n_events, total_value) per user, updated every
    micro-batch. State is O(users) — bounded regardless of stream
    length; add a timeout to expire idle users in production."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
