"""Registered batch twins of the streaming operators (oracle-checkable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register
from ..sources.parquet import load_table
from .aggregations import (
    HOURLY_EVENT_COUNTS_SQL,
    SLIDING_EVENT_COUNTS_SQL,
    hourly_event_counts,
    session_concurrency,
    session_concurrency_sql,
    session_kpis,
    session_kpis_sql,
    sessionize_batch,
    sessionize_batch_sql,
    sessionize_native,
    sessionize_native_sql,
    sliding_event_counts,
)
from .dedup import DEDUP_EVENT_COUNTS_SQL, dedup_event_counts
from .joins import (
    PURCHASE_CLICK_WINDOW_JOIN_OUTER_SQL,
    PURCHASE_CLICK_WINDOW_JOIN_SQL,
    purchase_click_window_join,
    purchase_click_window_join_outer,
)
from .stateful import (
    USER_TOTALS_SQL,
    throttle_events,
    throttle_events_sql,
    user_totals_batch,
)
from . import enrichment


@register("events_hourly_tumbling", oracle=HOURLY_EVENT_COUNTS_SQL)
def q_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch twin of the streaming form)."""
    return hourly_event_counts(load_table(spark, sf_dir, "events"))


@register("events_sessionization", oracle=sessionize_batch_sql())
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via lag+cumsum windows (batch twin of the
    applyInPandasWithState streaming operator)."""
    return sessionize_batch(load_table(spark, sf_dir, "events"))


@register("events_windowed_click_join", oracle=PURCHASE_CLICK_WINDOW_JOIN_SQL)
def q_windowed_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase, same-user clicks in the preceding hour (batch twin of the
    watermarked stream-stream interval join)."""
    return purchase_click_window_join(load_table(spark, sf_dir, "events"))


@register(
    "events_windowed_click_join_outer", oracle=PURCHASE_CLICK_WINDOW_JOIN_OUTER_SQL
)
def q_windowed_click_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVERY purchase with its preceding-hour click stats, zero-click
    purchases included (batch twin of the watermarked LEFT OUTER
    stream-stream join — null padding emitted at watermark close)."""
    return purchase_click_window_join_outer(load_table(spark, sf_dir, "events"))


@register("events_sliding_window", oracle=SLIDING_EVENT_COUNTS_SQL)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour/15-min window aggregation (batch twin of the streaming
    form; Expand fan-out happens before the partial aggregate)."""
    return sliding_event_counts(load_table(spark, sf_dir, "events"))


@register("events_streaming_dedup", oracle=DEDUP_EVENT_COUNTS_SQL)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once per-type stats over at-least-once (replayed) delivery
    (batch twin of watermarked dropDuplicatesWithinWatermark)."""
    return dedup_event_counts(load_table(spark, sf_dir, "events"))


@register("events_session_window_native", oracle=sessionize_native_sql())
def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via Spark's native session_window (one
    UpdatingSessions pass; streaming-ready unchanged)."""
    return sessionize_native(load_table(spark, sf_dir, "events"))


@register("events_user_totals", oracle=USER_TOTALS_SQL)
def q_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals (batch twin of the transformWithStateInPandas
    arbitrary-state streaming operator, streaming/stateful.py)."""
    return user_totals_batch(load_table(spark, sf_dir, "events"))


@register("events_enriched", oracle=enrichment.enriched_events_sql())
def q_enriched_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category-dim enrichment join (batch twin of the stateless
    stream-static broadcast join, streaming/enrichment.py)."""
    return enrichment.enriched_events_batch(load_table(spark, sf_dir, "events"))


@register("events_throttled", oracle=throttle_events_sql())
def q_throttled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True per-user rate limiting (emit iff >= min_gap since last EMITTED
    event — the anchor hops): JVM struct-accumulator fold per user; the
    streaming twin is a ValueState StatefulProcessor."""
    return throttle_events(load_table(spark, sf_dir, "events"))


@register("events_session_concurrency", oracle=session_concurrency_sql())
def q_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via the +1/-1 boundary sweep over
    gap-based sessions — the capacity-planning operator no per-session
    aggregate can express."""
    return session_concurrency(load_table(spark, sf_dir, "events"))


@register("events_session_kpis", oracle=session_kpis_sql())
def q_session_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily session KPI panel: bounce rate and exact medians of depth and
    duration via the integer cumulative-threshold rule."""
    return session_kpis(load_table(spark, sf_dir, "events"))


from . import stateful as _stateful


@register("events_throttle_whatif", oracle=_stateful.throttle_whatif_sql())
def q_throttle_whatif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-limit policy sweep: every candidate min-gap evaluated in the
    one user-keyed pass — capacity planning without N replays."""
    return _stateful.throttle_whatif(load_table(spark, sf_dir, "events"))
