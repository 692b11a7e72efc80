"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user aggregates that survive across micro-batches — the
engine's arbitrary-state surface (the analog of Flink's KeyedProcessFunction),
for logic windowed aggregations can't express (counters, sessions with
custom expiry, online sketches).

State discipline for 100 TB streams: state is per-key and bounded (two
numbers per user here); the store shuffles by the group key once, and
timeouts (GroupStateTimeout) are the eviction mechanism for abandoned
keys — set NoTimeout only when the key domain is bounded, as here.
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

from etl_cnpjs_spark.serde import pickle_by_value

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame → per-user running (count, sum) in update mode.
    Arrow-batched: each micro-batch group arrives as pandas chunks."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


pickle_by_value(__name__)
