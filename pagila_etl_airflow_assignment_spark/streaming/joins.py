"""Stream-stream time-interval join: purchases ⋈ prior clicks per user.

The reference has no joins beyond the two tiny LEFT joins in its summary
query (SURVEY.md §2.C); this is the streaming-extension counterpart —
Structured Streaming's watermarked stream-stream inner join, the capability
that lets two unbounded sources join with bounded state.

Join-strategy note: with an equi key present (user_id) the time-range
condition is just a residual filter on a hash/sort-merge join — Catalyst
plans the equi join and applies the BETWEEN as a post-filter, so NO binning
is needed (contrast `operators/temporal.range_join_binned`, which exists for
the keyless case where Catalyst would otherwise nested-loop).

Streaming state bound: both sides carry a watermark and the join condition
time-bounds each side against the other, so Spark can evict buffered rows
once the watermark passes `ts + window` — state is O(window × rate), not
O(stream length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import events_stream

JOIN_WINDOW_SECONDS = 3600


def _purchases(events: DataFrame) -> DataFrame:
    return events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )


def _clicks(events: DataFrame) -> DataFrame:
    return events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )


def _pair_condition():
    lo = F.col("purchase_ts") - F.expr(f"INTERVAL {JOIN_WINDOW_SECONDS} SECONDS")
    return (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") >= lo)
        & (F.col("click_ts") <= F.col("purchase_ts"))
    )


def purchase_click_window_join(events: DataFrame) -> DataFrame:
    """Batch twin: per purchase, count/sum of the same user's clicks in the
    preceding hour (inclusive bounds). Equi join on user + residual time
    filter; one shuffle per side on user_id."""
    pairs = _purchases(events).join(_clicks(events), _pair_condition())
    return (
        pairs.groupBy("purchase_id")
        .agg(
            F.count("*").alias("n_prior_clicks"),
            F.round(F.sum("click_value"), 6).alias("prior_click_value"),
        )
        .orderBy("purchase_id")
    )


PURCHASE_CLICK_WINDOW_JOIN_SQL = f"""
    SELECT p.event_id AS purchase_id,
           COUNT(*) AS n_prior_clicks,
           ROUND(SUM(c.value), 6) AS prior_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND epoch_us(c.ts) >= epoch_us(p.ts) - {JOIN_WINDOW_SECONDS} * CAST(1000000 AS BIGINT)
     AND epoch_us(c.ts) <= epoch_us(p.ts)
    GROUP BY p.event_id
    ORDER BY purchase_id
"""


def purchase_click_window_join_outer(events: DataFrame) -> DataFrame:
    """LEFT OUTER batch twin: EVERY purchase appears, including those with no
    prior-hour click (n_prior_clicks 0, prior_click_value NULL — SUM over no
    rows). Same one-shuffle-per-side user_id equi join; the outer row padding
    is free. The streaming counterpart (below) is the capability the inner
    form can't express: "purchases that did NOT convert from a click" exit
    the stream as null-padded rows once the watermark closes their window."""
    pairs = _purchases(events).join(_clicks(events), _pair_condition(), "left_outer")
    return (
        pairs.groupBy("purchase_id")
        .agg(
            F.count("click_ts").alias("n_prior_clicks"),
            F.round(F.sum("click_value"), 6).alias("prior_click_value"),
        )
        .orderBy("purchase_id")
    )


PURCHASE_CLICK_WINDOW_JOIN_OUTER_SQL = f"""
    SELECT p.event_id AS purchase_id,
           COUNT(c.click_ts) AS n_prior_clicks,
           ROUND(SUM(c.click_value), 6) AS prior_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (
        SELECT user_id AS c_user, ts AS click_ts, value AS click_value
        FROM events WHERE event_type = 'click'
    ) c
      ON p.user_id = c.c_user
     AND epoch_us(c.click_ts) >= epoch_us(p.ts) - {JOIN_WINDOW_SECONDS} * CAST(1000000 AS BIGINT)
     AND epoch_us(c.click_ts) <= epoch_us(p.ts)
    GROUP BY p.event_id
    ORDER BY purchase_id
"""


def streaming_purchase_click_pairs_outer(
    spark: SparkSession, events_path: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming LEFT OUTER stream-stream join: unmatched purchases are
    emitted null-padded only after the watermark guarantees no matching click
    can still arrive — the state-eviction deadline doubles as the
    null-emission trigger (this is why outer stream-stream joins REQUIRE
    both the watermark and a time-bound join condition)."""
    raw = events_stream(spark, events_path)
    p = _purchases(raw).withWatermark("purchase_ts", watermark)
    c = _clicks(raw).withWatermark("click_ts", watermark)
    return p.join(c, _pair_condition(), "leftOuter").select(
        "purchase_id", "purchase_ts", "click_ts", "click_value"
    )


def streaming_purchase_click_pairs(
    spark: SparkSession, events_path: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming form: watermarked stream-stream inner join emitting raw
    (purchase, click) pairs in append mode. The time-interval condition lets
    Spark bound both join buffers: clicks older than
    `watermark + JOIN_WINDOW` relative to the purchase-side watermark are
    evicted."""
    raw = events_stream(spark, events_path)
    p = _purchases(raw).withWatermark("purchase_ts", watermark)
    c = _clicks(raw).withWatermark("click_ts", watermark)
    return p.join(c, _pair_condition()).select(
        "purchase_id", "purchase_ts", "click_ts", "click_value"
    )
