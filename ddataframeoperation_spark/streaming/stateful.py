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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "running_totals_per_user",
    "running_totals_per_user_tws",
    "token_budget_admission",
]

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


def running_totals_per_user_tws(stream: DataFrame) -> DataFrame:
    """Spark 4 ``transformWithStateInPandas`` twin of
    :func:`running_totals_per_user` — same per-user (count, sum) state
    machine on the successor state API (``StatefulProcessor`` +
    ``ValueState`` instead of the legacy ``GroupState`` tuple).

    Environment note (COVERAGE.md B38): the API's Python worker speaks a
    protobuf-based state-server protocol, and ``google.protobuf`` is not
    installed in this container — so this function CONSTRUCTS fine (the
    pyspark imports are protobuf-free) but the query fails at runtime
    until protobuf exists. ``tests/test_streaming.py::
    test_transform_with_state_totals_equals_batch`` is skip-marked on
    exactly that import and auto-activates the moment the environment
    gains protobuf, keeping the "environment-blocked" claim verifiable.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", _STATE)

        def handleInputRows(self, key, rows, timerValues):
            n, s = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += int(len(pdf))
                s += float(pdf["value"].sum())
            self._state.update((n, s))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [round(s, 4)],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )


_ADMIT_OUT = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("ntok", LongType()),
    ]
)

_ADMIT_STATE = StructType([StructField("used", LongType())])


def token_budget_admission(
    stream: DataFrame,
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    token_col: str = "ntok",
) -> DataFrame:
    """B38 × north-star — stateful per-source token-budget ADMISSION for
    streaming corpus ingest: each source's cumulative admitted token count
    persists in the state store across micro-batches, and an arriving
    document is admitted iff it still fits (``used + ntok <= budget``;
    the boundary-crossing doc is rejected, later smaller docs may still
    fit — greedy in arrival order). The streaming complement of the batch
    :func:`~ddataframeoperation_spark.operators.sampling.token_budget_mix`:
    batch realizes a mixture over a known corpus, this caps an UNBOUNDED
    arriving stream at ingest time.

    Determinism: rows are processed in ``id_col`` order within each
    micro-batch (the whole batch is concatenated before sorting — Arrow
    chunk order is arbitrary), so a replay with the same batch boundaries
    admits the identical set. ``id_col`` values must be UNIQUE within a
    (source, micro-batch) slice — duplicate ids tie under the stable sort
    and keep arbitrary Arrow-chunk order, silently breaking replay
    determinism (same precondition as ``epoch_shard_order``). Rows with a
    NULL ``id_col`` or ``token_col`` are dropped, not admitted.
    This is the property the multi-batch equivalence
    test pins. State is one long per source; shards with the shuffle
    partitioning like every keyed state op. Memory: one source's rows for
    ONE micro-batch materialize in pandas for the sort — bound the batch
    (maxFilesPerTrigger / maxOffsetsPerTrigger) so a hot source's slice
    fits an executor; the state itself is O(1) regardless.
    """
    import pandas as pd

    if budget < 0:
        raise ValueError("budget must be >= 0")

    def admit(
        key: tuple, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        (used,) = state.get if state.exists else (0,)
        out_ids, out_toks = [], []
        # Concatenate the whole micro-batch BEFORE sorting: the runtime
        # delivers a group's rows as multiple Arrow chunks (split at
        # arrow.maxRecordsPerBatch) in arbitrary shuffle order, so a
        # per-chunk sort would break the documented doc_id-order
        # determinism for groups larger than one chunk.
        whole = pd.concat(list(pdfs), ignore_index=True)
        # NULL token counts (e.g. NULL text upstream) arrive as NaN —
        # reject those rows instead of crashing the query on int(NaN):
        # a doc with no token count has no budget accounting. A NULL
        # doc_id likewise cannot be admitted (int(NaN) raises, and an
        # id-less doc has no deterministic replay position).
        whole = whole.dropna(subset=[id_col, token_col])
        for _, row in whole.sort_values(id_col).iterrows():
            t = int(row[token_col])
            if used + t <= budget:
                used += t
                out_ids.append(int(row[id_col]))
                out_toks.append(t)
        state.update((used,))
        yield pd.DataFrame(
            {
                "doc_id": out_ids,
                "source": [key[0]] * len(out_ids),
                "ntok": out_toks,
            }
        )

    return (
        stream.select(
            F.col(id_col).cast("long").alias(id_col),
            F.col(source_col).alias(source_col),
            F.col(token_col).cast("long").alias(token_col),
        )
        .groupBy(source_col)
        .applyInPandasWithState(
            admit,
            outputStructType=_ADMIT_OUT,
            stateStructType=_ADMIT_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
