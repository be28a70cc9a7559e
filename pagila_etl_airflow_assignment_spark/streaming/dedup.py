"""Streaming exactly-once deduplication over at-least-once event delivery.

Message buses redeliver: the same event can arrive more than once, so every
streaming consumer needs idempotent ingestion. Structured Streaming's answer
is ``dropDuplicatesWithinWatermark`` — per-key state that remembers seen
event_ids only as long as the watermark allows a duplicate to still arrive,
so state stays bounded on an unbounded stream (the unbounded-state trap of
plain ``dropDuplicates`` on a stream).

The fixtures' events are already unique per ``event_id``, so redelivery is
simulated deterministically: every ``REPLAY_MOD``-th event is delivered twice
(``with_replayed_events``). The batch twin runs the identical semantics
through the batch planner and is the DuckDB-oracle surface; the streaming
differential test asserts stream(availableNow) == batch twin.

Scale: the dedup state and the downstream aggregation both shuffle on narrow
keys (event_id hash / event_type); watermark-driven eviction keeps state
proportional to the duplicate-arrival horizon, not the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import events_stream

# Deterministic at-least-once simulation: every 20th event is delivered twice.
REPLAY_MOD = 20


def with_replayed_events(events: DataFrame) -> DataFrame:
    """Simulate at-least-once delivery: re-deliver every REPLAY_MOD-th event."""
    return events.unionByName(events.where(F.col("event_id") % REPLAY_MOD == 0))


def dedup_events_batch(events: DataFrame) -> DataFrame:
    """Batch twin of the streaming dedup: replay, then keep one row per
    event_id. Duplicate rows are byte-identical, so which one survives is
    immaterial."""
    return with_replayed_events(events).dropDuplicates(["event_id"])


def dedup_event_counts(events: DataFrame) -> DataFrame:
    """Registered query surface: per-type stats AFTER exactly-once dedup.

    With the replayed input, skipping the dedup would overcount every 20th
    event — the aggregation existing downstream is what makes the dedup
    observable to the oracle."""
    return (
        dedup_events_batch(events)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("event_type")
    )


DEDUP_EVENT_COUNTS_SQL = f"""
    WITH replayed AS (
        SELECT * FROM events
        UNION ALL
        SELECT * FROM events WHERE event_id % {REPLAY_MOD} = 0
    ),
    deduped AS (SELECT DISTINCT * FROM replayed)
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           round(SUM(value), 6) AS total_value
    FROM deduped
    GROUP BY event_type
    ORDER BY event_type
"""


def streaming_dedup_events(
    spark: SparkSession, events_path: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming form: file source → event-time watermark →
    ``dropDuplicatesWithinWatermark`` on event_id.

    Append-mode safe: a row is emitted once its event_id is first seen; the
    watermark bounds how long the id is remembered (duplicates arriving
    within the horizon are dropped, state for older ids is evicted)."""
    stream = events_stream(spark, events_path)
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
