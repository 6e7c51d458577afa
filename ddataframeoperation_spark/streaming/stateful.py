"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in streaming surface (windows, session windows, dedup — B36-B38,
streaming/windows.py) covers declared aggregations; this module is the
escape hatch for operators Spark lacks: arbitrary per-key state machines.
The grouped-map function receives Arrow batches of one key's new rows plus
that key's ``GroupState`` and decides what to emit and what to keep.

Scale notes: state lives in the executor-local state store keyed by the
shuffle partitioning — adding executors shards state linearly. A timeout
(``GroupStateTimeout``) is mandatory hygiene at 100 TB: without it,
abandoned keys pin state forever.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["running_totals_per_user"]

_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("s", DoubleType()),
    ]
)


def running_totals_per_user(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained as explicit state —
    the minimal custom state machine: merge each micro-batch's rows into
    the key's accumulator and emit the updated totals.

    (The reference's platform ran arbitrary user scripts per node, A23 —
    this is the streaming twin of that surface: user logic, engine-managed
    state and partitioning.)
    """
    import pandas as pd

    def update(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 4)]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUTPUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
