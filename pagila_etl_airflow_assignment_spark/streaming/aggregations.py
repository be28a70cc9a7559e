"""Structured Streaming operators over the `events` table, each with a batch
twin so correctness is oracle-checkable.

The reference is batch-incremental, not streaming (SURVEY.md §2.I) — its
watermark table is the batch analog of Structured Streaming's event-time
watermark. This module supplies the true streaming counterparts:

- tumbling- and sliding-window aggregation with late-data watermark (I-1's
  streaming form);
- gap sessionization twice: Spark-native ``session_window`` and custom
  stateful ``applyInPandasWithState`` (the "custom stateful operator"
  extension point).

Batch twins run the identical logic through the batch planner: the tumbling
window via the same ``F.window``, sessionization via lag/cumsum window
functions. Tests assert stream (availableNow) == batch twin; the batch twins
are also registered as driver queries with DuckDB oracles.

Scale: streaming state is keyed by (window, event_type) / user_id — both
shuffle-partitioned; the watermark bounds state size (late rows beyond 1 hour
are dropped), which is what keeps unbounded streams at bounded memory.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions import micros
from ..sources.parquet import events_stream

SESSION_GAP = dt.timedelta(minutes=5)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
    ]
)


# --- tumbling-window aggregation ---------------------------------------------


def hourly_event_counts(events: DataFrame) -> DataFrame:
    """Batch twin: tumbling 1-hour window per event_type."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").start.alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("hour_start", "event_type")
    )


HOURLY_EVENT_COUNTS_SQL = """
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           round(SUM(value), 6) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


def streaming_hourly_event_counts(
    spark: SparkSession, events_path: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming form: file source → watermark → tumbling window agg.

    The watermark lets Spark finalize and evict window state once event time
    passes window_end + watermark — bounded state on unbounded input.
    """
    stream = events_stream(spark, events_path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").start.alias("hour_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def sliding_event_counts(events: DataFrame) -> DataFrame:
    """Batch twin of the sliding-window form: 1-hour windows every 15 minutes.
    Spark's Expand fans each event to windows/slide = 4 rows BEFORE the
    map-side partial aggregate, so the shuffle carries only aggregated
    (window, event_type) groups — overlap multiplies map CPU, not shuffle
    bytes. Same expression runs unchanged under readStream + withWatermark."""
    return (
        events.groupBy(
            F.window("ts", "1 hour", "15 minutes").start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("window_start", "event_type")
    )


# each event belongs to exactly windows/slide = 4 sliding windows: the one
# starting at its last 15-min boundary and the three before it
SLIDING_EVENT_COUNTS_SQL = """
    SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
                          - k * 900000000) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           round(SUM(value), 6) AS total_value
    FROM events, unnest(generate_series(0, 3)) AS t(k)
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


def streaming_sliding_event_counts(
    spark: SparkSession, events_path: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming form of the sliding window: identical window expression under
    readStream; state is one entry per open (window, event_type), finalized
    once the watermark passes window_end."""
    stream = events_stream(spark, events_path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour", "15 minutes").start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


# --- sessionization -----------------------------------------------------------


def sessionize_batch(events: DataFrame, gap: dt.timedelta = SESSION_GAP) -> DataFrame:
    """Batch twin: gap-based sessions per user via lag + running sum —
    the classic two-window formulation, no UDF."""
    w_user = Window.partitionBy("user_id").orderBy("ts")
    gap_s = int(gap.total_seconds())
    with_breaks = events.select(
        "user_id",
        "ts",
        "value",
        # integer-microsecond gap math: exact, and identical to the DuckDB
        # oracle's epoch_us() (double-seconds epoch would round differently)
        F.when(
            micros("ts") - micros(F.lag("ts").over(w_user))
            > gap_s * 1_000_000,
            1,
        )
        .otherwise(0)
        .alias("is_break"),
    )
    with_ids = with_breaks.withColumn(
        "session_id",
        F.sum("is_break").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_ids.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events", "total_value"
        )
        .orderBy("user_id", "session_start")
    )


def sessionize_batch_sql(gap: dt.timedelta = SESSION_GAP) -> str:
    gap_s = int(gap.total_seconds())
    return f"""
        WITH with_breaks AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             > {gap_s} * 1000000
                        THEN 1 ELSE 0 END AS is_break
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        with_ids AS (
            SELECT *, SUM(is_break) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS session_id
            FROM with_breaks
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               COUNT(*) AS n_events,
               round(SUM(value), 6) AS total_value
        FROM with_ids
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """


def sessionize_native(
    events: DataFrame, gap: dt.timedelta = SESSION_GAP
) -> DataFrame:
    """Gap sessionization via Spark's built-in ``session_window`` — the
    engine-native form of the lag+cumsum twin above. Semantics differ at the
    exact-gap boundary: ``session_window`` keeps a session open while the next
    event is STRICTLY inside ``last_ts + gap`` (break at ``delta >= gap``),
    and ``session_end`` is ``last_ts + gap`` (eviction horizon), not the last
    event time. The oracle encodes exactly those semantics. At scale this is
    the preferred form: Catalyst plans one UpdatingSessionsExec pass instead
    of two ordered windows + an aggregate, and the same expression works
    unchanged under ``readStream``."""
    gap_expr = f"{int(gap.total_seconds())} seconds"
    return (
        events.groupBy("user_id", F.session_window("ts", gap_expr))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


def sessionize_native_sql(gap: dt.timedelta = SESSION_GAP) -> str:
    gap_s = int(gap.total_seconds())
    return f"""
        WITH with_breaks AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             >= {gap_s} * 1000000
                        THEN 1 ELSE 0 END AS is_break
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        with_ids AS (
            SELECT *, SUM(is_break) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS session_id
            FROM with_breaks
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '{gap_s} seconds' AS session_end,
               COUNT(*) AS n_events,
               round(SUM(value), 6) AS total_value
        FROM with_ids
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """


def streaming_sessionize(
    spark: SparkSession,
    events_path: str,
    gap: dt.timedelta = SESSION_GAP,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful streaming operator: gap sessionization with
    ``applyInPandasWithState`` (per-user session state, processing-time-safe
    eviction via event-time timeout).

    State per user is the open session (start, end, count, sum). A microbatch's
    rows are merged in event-time order; sessions closed by the gap are
    emitted; the still-open session stays in state until the watermark timeout
    fires. Arrow-batched — Python touches grouped columnar chunks, not rows."""
    gap_s = int(gap.total_seconds())

    state_schema = StructType(
        [
            StructField("start_s", DoubleType()),
            StructField("end_s", DoubleType()),
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ]
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs)).sort_values("ts")
        out: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                s, e, n, tot = state.get
                out.append((user_id, s, e, n, tot))
                state.remove()
        else:
            if state.exists:
                cur = list(state.get)
            else:
                cur = None
            for ts, val in zip(rows["ts"], rows["value"]):
                t = ts.timestamp()
                if cur is None:
                    cur = [t, t, 1, float(val)]
                elif t - cur[1] > gap_s:
                    out.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                    cur = [t, t, 1, float(val)]
                else:
                    cur[1] = t
                    cur[2] += 1
                    cur[3] += float(val)
            if cur is not None:
                state.update(tuple(cur))
                state.setTimeoutTimestamp(int((cur[1] + gap_s) * 1000))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "start_s", "end_s", "n", "total"]
            )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("start_s", DoubleType()),
            StructField("end_s", DoubleType()),
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ]
    )

    stream = events_stream(spark, events_path)
    sessions = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return sessions.select(
        "user_id",
        F.timestamp_seconds("start_s").alias("session_start"),
        F.timestamp_seconds("end_s").alias("session_end"),
        F.col("n").alias("n_events"),
        F.round("total", 6).alias("total_value"),
    )

# --- peak session concurrency (sweep line) --------------------------------------


def session_concurrency(events: DataFrame, gap: dt.timedelta = SESSION_GAP) -> DataFrame:
    """Peak concurrent sessions per day via the classic boundary sweep:
    (day, n_sessions, peak_concurrency).

    The capacity-planning twin of sessionization — "how many sessions were
    EVER open at once?" cannot be answered by any per-session aggregate; it
    needs the +1/−1 sweep over session boundaries with a running sum. The
    sweep is partitioned by day (a session spanning midnight re-enters the
    next day with a clipped start boundary, so the carry-in is represented
    locally and no cross-partition running state is needed). Boundaries are
    ordered (ts, delta): at an exact boundary tie the −1 departure is
    processed first, i.e. intervals are closed [start, end] and a session
    ending at instant t does not overlap one starting at t+1µs.

    Within a (ts, delta) tie the row order is arbitrary, but every tied row
    carries the SAME delta, so the running sum's set of values — and
    therefore its max — is order-independent: deterministic cross-engine.

    Scale shape: the day-explode is narrow and bounded by session span; the
    sweep is one window per day partition. Day partitions at 100 TB can be
    large but the sweep relation is SESSIONS (already aggregated), orders of
    magnitude smaller than events; for a pathological single-day corpus the
    hierarchical sweep (chunk-local sums + prefix-merged offsets) is the
    documented escape hatch.
    """
    sessions = sessionize_batch(events, gap).select("session_start", "session_end")
    spanned = sessions.select(
        "session_start",
        "session_end",
        F.explode(
            F.sequence(F.to_date("session_start"), F.to_date("session_end"))
        ).alias("day"),
    )
    day_start = F.col("day").cast("timestamp")
    day_last_us = day_start + F.expr("INTERVAL '0 23:59:59.999999' DAY TO SECOND")
    arrive = spanned.select(
        "day",
        F.greatest(F.col("session_start"), day_start).alias("ts"),
        F.lit(1).alias("delta"),
    )
    depart = spanned.select(
        "day",
        (
            F.least(F.col("session_end"), day_last_us)
            + F.expr("INTERVAL '0.000001' SECOND")
        ).alias("ts"),
        F.lit(-1).alias("delta"),
    )
    w = Window.partitionBy("day").orderBy("ts", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    swept = arrive.unionByName(depart).select(
        "day", F.sum("delta").over(w).alias("open_now"), "delta"
    )
    return (
        swept.groupBy("day")
        .agg(
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_sessions"),
            F.max("open_now").cast("long").alias("peak_concurrency"),
        )
        .orderBy("day")
    )


def session_concurrency_sql(gap: dt.timedelta = SESSION_GAP) -> str:
    return f"""
        WITH sessions AS (
            SELECT session_start, session_end FROM ({sessionize_batch_sql(gap)})
        ),
        spanned AS (
            SELECT session_start, session_end,
                   CAST(unnest(generate_series(
                       CAST(session_start AS DATE),
                       CAST(session_end AS DATE),
                       INTERVAL 1 DAY)) AS DATE) AS day
            FROM sessions
        ),
        boundaries AS (
            SELECT day,
                   GREATEST(session_start, CAST(day AS TIMESTAMP)) AS ts,
                   1 AS delta
            FROM spanned
            UNION ALL
            SELECT day,
                   LEAST(session_end,
                         CAST(day AS TIMESTAMP) + INTERVAL 1 DAY
                             - INTERVAL 1 MICROSECOND)
                       + INTERVAL 1 MICROSECOND AS ts,
                   -1 AS delta
            FROM spanned
        ),
        swept AS (
            SELECT day, delta,
                   SUM(delta) OVER (
                       PARTITION BY day ORDER BY ts, delta
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS open_now
            FROM boundaries
        )
        SELECT day,
               CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sessions,
               CAST(MAX(open_now) AS BIGINT) AS peak_concurrency
        FROM swept
        GROUP BY day
        ORDER BY day
    """

# --- session KPI panel ---------------------------------------------------------------


def session_kpis(events: DataFrame, gap: dt.timedelta = SESSION_GAP) -> DataFrame:
    """Daily session KPI panel: (day, n_sessions, bounce_milli,
    median_depth, median_duration_s) — bounce rate (single-event sessions),
    median events per session and median duration, the web-analytics
    heads-up display.

    Medians are exact: per day, the depth/duration value distributions
    collapse to (value, count) and the median is the smallest value whose
    doubled cumulative count reaches the total (the weighted-median integer
    threshold — no percentile floats). Durations are whole seconds by
    integer microsecond division.

    Scale shape: sessions are the (already aggregated) sessionize_batch
    relation; each median is a cumulative window over the DISTINCT value
    relation per day, bounded by value cardinality."""
    s = sessionize_batch(events, gap).select(
        F.to_date("session_start").alias("day"),
        F.col("n_events").alias("depth"),
        (
            (micros("session_end") - micros("session_start"))
            / F.lit(1_000_000)
        )
        .cast("long")
        .alias("dur_s"),
    )
    base = s.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        F.expr(
            "CAST((2 * 1000 * SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END)"
            " + COUNT(*)) DIV (2 * COUNT(*)) AS BIGINT)"
        ).alias("bounce_milli"),
    )

    def _median(col: str, out: str) -> DataFrame:
        per_v = s.groupBy("day", col).agg(F.count("*").alias("m"))
        wday = Window.partitionBy("day")
        wcum = wday.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        cum = per_v.select(
            "day",
            F.col(col).alias("v"),
            F.sum("m").over(wcum).alias("cum"),
            F.sum("m").over(wday).alias("tot"),
        )
        return (
            cum.where(2 * F.col("cum") >= F.col("tot"))
            .groupBy("day")
            .agg(F.min("v").cast("long").alias(out))
        )

    return (
        base.join(_median("depth", "median_depth"), "day")
        .join(_median("dur_s", "median_duration_s"), "day")
        .orderBy("day")
    )


def session_kpis_sql(gap: dt.timedelta = SESSION_GAP) -> str:
    def median(col: str, out: str) -> str:
        return f"""(
            SELECT day, CAST(MIN(v) AS BIGINT) AS {out}
            FROM (
                SELECT day, {col} AS v,
                       SUM(m) OVER (PARTITION BY day ORDER BY {col}
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS cum,
                       SUM(m) OVER (PARTITION BY day) AS tot
                FROM (SELECT day, {col}, COUNT(*) AS m
                      FROM s GROUP BY day, {col})
            )
            WHERE 2 * cum >= tot GROUP BY day
        )"""

    return f"""
        WITH sess AS ({sessionize_batch_sql(gap)}),
        s AS (
            SELECT CAST(session_start AS DATE) AS day,
                   n_events AS depth,
                   (epoch_us(session_end) - epoch_us(session_start))
                       // 1000000 AS dur_s
            FROM sess
        ),
        base AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS n_sessions,
                   CAST((2 * 1000 * SUM(CASE WHEN depth = 1 THEN 1 ELSE 0 END)
                         + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
                       AS bounce_milli
            FROM s GROUP BY day
        )
        SELECT b.day, b.n_sessions, b.bounce_milli,
               d.median_depth, u.median_duration_s
        FROM base b
        JOIN {median("depth", "median_depth")} d USING (day)
        JOIN {median("dur_s", "median_duration_s")} u USING (day)
        ORDER BY b.day
    """
