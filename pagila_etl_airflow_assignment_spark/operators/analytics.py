"""Per-entity ordered window analytics over the event stream.

The window-function workload the reference never needed (its one query is a
grouped weekly summary) but any analytics engine must have: per-user event
sequencing, running totals, deltas vs the previous event, and short rolling
means — lag/lead + cumulative + bounded-frame aggregates in one pass.

Scale shape: ONE shuffle, keyed by user_id, then every window function runs
inside the same sort within the partition (Spark plans a single Window node
over (user_id, ts, event_id) sort order). User keys are high-cardinality and
unskewed — no single partition holds more than one user's timeline times the
hash fan-in — so this survives 100× data by adding partitions, not state.
All frames are explicit ROWS frames: identical semantics (and identical
float accumulation order) in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROLLING_N = 3  # trailing window width for the rolling mean


def user_rolling_stats(events: DataFrame) -> DataFrame:
    """(user_id, event_id, ts, seq, cum_value, delta_value, avg3_value):
    event index, running value total, change vs previous event, and trailing
    3-event mean, per user in (ts, event_id) order."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    roll = w.rowsBetween(-(ROLLING_N - 1), Window.currentRow)
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.row_number().over(w).cast("long").alias("seq"),
        F.round(F.sum("value").over(cum), 6).alias("cum_value"),
        F.round(
            F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 6
        ).alias("delta_value"),
        F.round(F.avg("value").over(roll), 6).alias("avg3_value"),
    )


USER_ROLLING_STATS_SQL = f"""
    SELECT user_id, event_id, ts,
           row_number() OVER w AS seq,
           round(SUM(value) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS cum_value,
           round(value - COALESCE(lag(value) OVER w, 0.0), 6) AS delta_value,
           round(AVG(value) OVER (
               w ROWS BETWEEN {ROLLING_N - 1} PRECEDING AND CURRENT ROW), 6)
             AS avg3_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def scd2_user_state(events: DataFrame) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change log: collapse each
    user's event stream into state-validity intervals — (user_id, state,
    valid_from, valid_to, is_current), where consecutive equal states merge
    and ``valid_to`` is the next change (NULL while current).

    The classic warehouse history-table build. Both window passes share the
    (user_id, ts, event_id) partitioning and sort, and the change filter
    preserves partitioning AND order, so Catalyst plans ONE shuffle + ONE
    sort for the whole thing (pinned in tests/test_plans.py)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = events.select(
        "user_id",
        "event_id",
        "ts",
        F.col("event_type").alias("state"),
        F.lag("event_type").over(w).alias("prev_state"),
    ).where(F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state")))
    return changes.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


SCD2_USER_STATE_SQL = """
    WITH marked AS (
        SELECT user_id, event_id, ts, event_type AS state,
               lag(event_type) OVER w AS prev_state
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
        SELECT * FROM marked WHERE prev_state IS NULL OR prev_state <> state
    )
    SELECT user_id, state, ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           lead(ts) OVER w IS NULL AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""
