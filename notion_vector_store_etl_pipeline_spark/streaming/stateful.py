"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10 stretch): per-user running totals maintained across
microbatches — the pattern for any custom accumulator Spark's built-in
windowed aggs can't express (the streaming analogue of the reference's
run counters, `:673-676`).

State is one (count, total) pair per user_id; the watermark-less
ProcessingTimeTimeout config keeps state forever (bounded by the key
domain) — production deployments bound it with ``state.setTimeoutDuration``.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update_user_totals(
    key: Tuple[int], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """events: streaming DataFrame with (user_id, value). Emits the
    updated running totals for each user seen in the microbatch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Same running totals on Spark 4's ``transformWithStateInPandas``
    (the successor API): state is a named, schema-ful ``ValueState`` in
    the state store rather than an opaque tuple, so it survives
    processor-code evolution, supports TTL, and composes with list/map
    state and timers. Output is identical to ``running_user_totals`` —
    the test asserts both variants against the same batch aggregate.

    Environment note: the TWS state protocol needs ``google.protobuf``
    (its driver worker imports StateMessage_pb2), which this container
    does not ship — the test skips when protobuf is absent; on a normal
    Spark 4 deployment it runs as-is with the RocksDB state store
    provider.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            prior = self._totals.get()
            n, total = prior if prior is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
