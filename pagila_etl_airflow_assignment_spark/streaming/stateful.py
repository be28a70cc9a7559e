"""Custom stateful streaming operator on Spark 4's arbitrary-state API
(`transformWithStateInPandas` + `StatefulProcessor`): per-user running
aggregates that survive across microbatches.

Why this API (vs `applyInPandasWithState`, used by streaming/aggregations.py
sessionization): typed per-key state primitives (ValueState/ListState/
MapState) backed by the RocksDB state store, state TTL, and timers — the
arbitrary-stateful-operator extension point. This module keeps ONE ValueState
of (n_events, total_value) per user and emits the updated running totals every
microbatch the user appears in; the final emission per user equals the batch
aggregate (the differential test's contract).

Scale: state is keyed by user_id — hash-distributed, one small tuple per user,
RocksDB-spillable; a 100 TB/day stream holds state proportional to |users|,
not event volume. Arrow-batched: Python touches per-user columnar chunks.

Runtime requirements: the RocksDB state store provider
(`spark.sql.streaming.stateStore.providerClass`) and `google.protobuf` for the
TWS Python runner (bundled with full Spark distributions; absent in minimal
containers — the differential test skips, never fakes, when it is missing).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..sources.parquet import events_stream

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("n_nonnull", LongType()),
        StructField("total", DoubleType()),
    ]
)


class RunningTotalsProcessor(StatefulProcessor):
    """ValueState-backed running (count, sum) per user."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, n_nonnull, total = (
            (self._state.get() or (0, 0, 0.0)) if self._state.exists() else (0, 0, 0.0)
        )
        for pdf in rows:
            n += len(pdf)
            # SUM() over zero non-null inputs is NULL, not 0.0 — track the
            # non-null count so an all-NULL user matches the batch twin/oracle
            n_nonnull += int(pdf["value"].notna().sum())
            total += float(pdf["value"].fillna(0.0).sum())
        self._state.update((n, n_nonnull, total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 6) if n_nonnull else None],
            }
        )

    def close(self) -> None:
        pass


def streaming_user_running_totals(
    spark: SparkSession, events_path: str
) -> DataFrame:
    """Streaming form: file source → transformWithStateInPandas keyed by
    user_id. Emits the running totals for every user seen in each microbatch;
    the last emission per user is the complete aggregate."""
    stream = events_stream(spark, events_path)
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=RUNNING_TOTALS_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


def user_totals_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the same totals as one hash aggregate."""
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("user_id")
    )


USER_TOTALS_SQL = """
    SELECT user_id,
           COUNT(*) AS n_events,
           round(SUM(value), 6) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
"""
