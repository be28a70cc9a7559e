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


# --- per-user rate limiting (throttle) --------------------------------------------

THROTTLE_MIN_GAP_S = 86_400  # at most one emitted event per user per day

THROTTLED_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("emit_seq", LongType()),
    ]
)

_ANCHOR_SCHEMA = StructType(
    [StructField("anchor_us", LongType()), StructField("n_emitted", LongType())]
)


def throttle_events(
    events: DataFrame, min_gap_s: int = THROTTLE_MIN_GAP_S
) -> DataFrame:
    """Per-user rate limiting with TRUE throttle semantics: an event is
    emitted iff it arrives ≥ ``min_gap_s`` after the LAST EMITTED event of
    that user (the emitted event re-anchors the window — unlike bucketed
    first-per-window, a burst straddling a bucket boundary cannot emit
    twice). The alerting/notification dedup every event pipeline ships.

    Sequential dependence makes this window-inexpressible (the anchor hops
    to whichever event was kept), so the batch form folds each user's
    SORTED event array left-to-right with a struct accumulator — one
    user-keyed shuffle, all-JVM (higher-order aggregate, no Python); the
    oracle walks the identical recursion as a recursive CTE; the STREAMING
    form (``ThrottleProcessor``) is one ValueState anchor per user. Exact
    integer microseconds end to end."""
    gap_us = int(min_gap_s) * 1_000_000
    evs = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("us"), F.col("event_id").alias("eid")
            )
        )
    )
    init = F.struct(
        F.lit(-(1 << 62)).cast("long").alias("anchor"),
        F.array().cast("array<long>").alias("kept"),
    )
    folded = F.aggregate(
        evs,
        init,
        lambda acc, e: F.when(
            e["us"] - acc["anchor"] >= gap_us,
            F.struct(
                e["us"].alias("anchor"),
                F.array_append(acc["kept"], e["eid"]).alias("kept"),
            ),
        ).otherwise(acc),
    )
    kept = (
        events.groupBy("user_id")
        .agg(folded.alias("f"))
        .select("user_id", F.posexplode(F.col("f.kept")).alias("pos0", "event_id"))
        .select("event_id", "user_id", (F.col("pos0") + 1).cast("long").alias("emit_seq"))
    )
    return kept.orderBy("event_id")


def throttle_events_sql(min_gap_s: int = THROTTLE_MIN_GAP_S) -> str:
    gap_us = int(min_gap_s) * 1_000_000
    return f"""
        WITH RECURSIVE ordered AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                   ) AS rn
            FROM events
        ), walk(user_id, rn, event_id, anchor, kept, n_emitted) AS (
            SELECT user_id, rn, event_id, us, TRUE, CAST(1 AS BIGINT)
            FROM ordered WHERE rn = 1
            UNION ALL
            SELECT o.user_id, o.rn, o.event_id,
                   CASE WHEN o.us - w.anchor >= CAST({gap_us} AS BIGINT)
                        THEN o.us ELSE w.anchor END,
                   o.us - w.anchor >= CAST({gap_us} AS BIGINT),
                   w.n_emitted + CAST(o.us - w.anchor >= CAST({gap_us} AS BIGINT)
                                      AS BIGINT)
            FROM walk w JOIN ordered o
              ON o.user_id = w.user_id AND o.rn = w.rn + 1
        )
        SELECT event_id, user_id, n_emitted AS emit_seq
        FROM walk WHERE kept
        ORDER BY event_id
    """


class ThrottleProcessor(StatefulProcessor):
    """ValueState anchor per user: emit iff ts - anchor >= min_gap."""

    def __init__(self, min_gap_s: int = THROTTLE_MIN_GAP_S) -> None:
        self._gap_us = int(min_gap_s) * 1_000_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("anchor", _ANCHOR_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        anchor, n_emitted = (
            (self._state.get() or (-(1 << 62), 0))
            if self._state.exists()
            else (-(1 << 62), 0)
        )
        pdf = pd.concat(list(rows), ignore_index=True)
        # microbatch rows arrive unordered; the throttle walk is defined over
        # event time with event_id tiebreak
        pdf = pdf.sort_values(["us", "event_id"], kind="mergesort")
        out_ids, out_seqs = [], []
        for eid, us in zip(pdf["event_id"], pdf["us"]):
            if int(us) - anchor >= self._gap_us:
                anchor = int(us)
                n_emitted += 1
                out_ids.append(int(eid))
                out_seqs.append(n_emitted)
        self._state.update((anchor, n_emitted))
        yield pd.DataFrame(
            {
                "event_id": pd.Series(out_ids, dtype="int64"),
                "user_id": pd.Series([user_id] * len(out_ids), dtype="int64"),
                "emit_seq": pd.Series(out_seqs, dtype="int64"),
            }
        )

    def close(self) -> None:
        pass


def streaming_throttled_events(
    spark: SparkSession, events_path: str, min_gap_s: int = THROTTLE_MIN_GAP_S
) -> DataFrame:
    """Streaming form: file source → transformWithStateInPandas keyed by
    user_id, ValueState anchor; exactly the batch fold's emissions."""
    stream = events_stream(spark, events_path)
    return (
        stream.select(
            "user_id", "event_id", F.unix_micros("ts").alias("us")
        )
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=ThrottleProcessor(min_gap_s),
            outputStructType=THROTTLED_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )


# --- throttle what-if sweep ----------------------------------------------------------

THROTTLE_WHATIF_GAPS_H = (6, 24, 72)


def throttle_whatif(events: DataFrame) -> DataFrame:
    """Policy sweep over the true throttle: how many notifications would
    each candidate min-gap emit? One pass evaluates every config in
    {THROTTLE_WHATIF_GAPS_H} hours — the capacity-planning question asked
    before changing a rate limit, answered without replaying the stream N
    times: (min_gap_hours, n_emitted, n_suppressed, suppress_milli).

    Each user's sorted event array folds once PER CONFIG with a
    (anchor, count) accumulator — the same sequential recursion as
    ``throttle_events``, counting instead of collecting, so the sweep adds
    zero shuffles: configs differ only in the fold constant. The oracle
    walks the identical recursion per config and unions.

    Scale shape: one user-keyed shuffle total; fold work is
    |configs|·|user events|."""
    evs = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("us"), F.col("event_id").alias("eid")
            )
        )
    )
    per_user = events.groupBy("user_id").agg(evs.alias("evs"))
    counts = []
    for gap_h in THROTTLE_WHATIF_GAPS_H:
        gap_us = gap_h * 3600 * 1_000_000
        def step_for(g):
            def step(acc, e):
                return F.when(
                    e["us"] - acc["anchor"] >= F.lit(g),
                    F.struct(
                        e["us"].alias("anchor"), (acc["n"] + 1).alias("n")
                    ),
                ).otherwise(acc)

            return step

        fold = F.aggregate(
            F.col("evs"),
            F.struct(
                F.lit(-(1 << 62)).cast("long").alias("anchor"),
                F.lit(0).cast("long").alias("n"),
            ),
            step_for(gap_us),
        )
        counts.append(
            per_user.select(
                F.lit(gap_h).cast("long").alias("min_gap_hours"),
                fold["n"].alias("n_kept"),
                F.size("evs").cast("long").alias("n_total"),
            )
        )
    un = counts[0]
    for c in counts[1:]:
        un = un.unionByName(c)
    return (
        un.groupBy("min_gap_hours")
        .agg(
            F.sum("n_kept").cast("long").alias("n_emitted"),
            (F.sum("n_total") - F.sum("n_kept")).cast("long").alias(
                "n_suppressed"
            ),
            F.expr(
                "CAST(1000 * (SUM(n_total) - SUM(n_kept)) DIV SUM(n_total)"
                " AS BIGINT)"
            ).alias("suppress_milli"),
        )
        .orderBy("min_gap_hours")
    )


def throttle_whatif_sql() -> str:
    parts = []
    for gap_h in THROTTLE_WHATIF_GAPS_H:
        gap_us = gap_h * 3600 * 1_000_000
        parts.append(
            f"""
        SELECT CAST({gap_h} AS BIGINT) AS min_gap_hours,
               CAST(SUM(CASE WHEN emitted THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM (
            WITH RECURSIVE ordered AS (
                SELECT user_id, event_id, epoch_us(ts) AS us,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                       ) AS rn
                FROM events
            ), walk(user_id, rn, anchor, emitted) AS (
                SELECT user_id, rn, us, TRUE FROM ordered WHERE rn = 1
                UNION ALL
                SELECT o.user_id, o.rn,
                       CASE WHEN o.us - w.anchor >= CAST({gap_us} AS BIGINT)
                            THEN o.us ELSE w.anchor END,
                       o.us - w.anchor >= CAST({gap_us} AS BIGINT)
                FROM walk w
                JOIN ordered o ON o.user_id = w.user_id AND o.rn = w.rn + 1
            )
            SELECT user_id, emitted FROM walk
        )"""
        )
    union = " UNION ALL ".join(parts)
    return f"""
        WITH sweeps AS ({union})
        SELECT min_gap_hours, n_kept AS n_emitted,
               n_total - n_kept AS n_suppressed,
               CAST(1000 * (n_total - n_kept) // n_total AS BIGINT)
                   AS suppress_milli
        FROM sweeps
        ORDER BY min_gap_hours
    """
