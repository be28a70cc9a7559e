"""Event-sequence operators: transition matrices, online anomaly flags, and
reset-on-marker running sums.

All three share the analytics.py scale shape — ONE shuffle keyed by user_id,
then every window function runs inside the same (ts, event_id) sort — and all
frames are explicit ROWS frames so Spark and the DuckDB oracle accumulate
floats in the identical order.

- event_transitions: the first-order Markov view of user behavior (bigram
  counts of consecutive event types). The per-user lag is the only windowed
  step; the (prev, curr) aggregate is a ≤|event_types|²-key hash agg.
- user_value_anomalies: each event's value z-scored against that user's
  TRAILING window (current row excluded — the baseline never peeks at the
  value it scores, same no-peek construction as events_leakage_free_features).
- running_balance_with_reset: cumulative value that resets at each marker
  event ("purchase" empties the cart). The reset decomposes into plain
  cumulative sums — balance = cum(value) − cum_at_last_marker — via
  last_value(... IGNORE NULLS), so no per-group second shuffle and no
  session-id materialization is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ANOMALY_LOOKBACK = 20  # trailing events forming the per-user baseline
ANOMALY_MIN_N = 5  # fewer baseline points than this → no verdict
ANOMALY_Z = 3.0


def event_transitions(events: DataFrame) -> DataFrame:
    """(prev_type, event_type, n, p): consecutive-pair counts per user
    timeline plus the row-normalized transition probability."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
    )
    wrow = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wrow), 6).alias("p"),
    ).orderBy("prev_type", "event_type")


EVENT_TRANSITIONS_SQL = """
    WITH pairs AS (
        SELECT prev_type, event_type, COUNT(*) AS n
        FROM (
            SELECT event_type,
                   lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
            FROM events
        )
        WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, n,
           round(n / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM pairs
    ORDER BY prev_type, event_type
"""


def user_value_anomalies(
    events: DataFrame,
    lookback: int = ANOMALY_LOOKBACK,
    min_n: int = ANOMALY_MIN_N,
    z_threshold: float = ANOMALY_Z,
) -> DataFrame:
    """Events whose value is ≥ ``z_threshold`` sample standard deviations from
    the user's trailing-``lookback`` mean (current row excluded). Events with
    fewer than ``min_n`` baseline points or zero baseline variance are not
    scored — both engines agree on the NULL, so no epsilon fudge is needed."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trail = w.rowsBetween(-lookback, -1)
    scored = events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.avg("value").over(trail).alias("mu"),
        F.stddev_samp("value").over(trail).alias("sigma"),
        F.count("value").over(trail).alias("n_base"),
    ).withColumn(
        "z",
        F.when(
            (F.col("n_base") >= min_n) & (F.col("sigma") > 0),
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6),
        ),
    )
    return (
        scored.where(F.abs(F.col("z")) >= z_threshold)
        .select("event_id", "user_id", "ts", "event_type", "value", "z")
        .orderBy("event_id")
    )


def user_value_anomalies_sql(
    lookback: int = ANOMALY_LOOKBACK,
    min_n: int = ANOMALY_MIN_N,
    z_threshold: float = ANOMALY_Z,
) -> str:
    return f"""
        WITH scored AS (
            SELECT event_id, user_id, ts, event_type, value,
                   AVG(value) OVER w AS mu,
                   STDDEV_SAMP(value) OVER w AS sigma,
                   COUNT(value) OVER w AS n_base
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN {lookback} PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, user_id, ts, event_type, value,
               round((value - mu) / sigma, 6) AS z
        FROM scored
        WHERE n_base >= {min_n} AND sigma > 0
          AND ABS(round((value - mu) / sigma, 6)) >= {z_threshold}
        ORDER BY event_id
    """


RESET_MARKER = "purchase"


def running_balance_with_reset(
    events: DataFrame, marker: str = RESET_MARKER
) -> DataFrame:
    """Per-user cumulative value since the last ``marker`` event (the marker
    row itself reads 0 — it "spends" the balance). One user_id shuffle; the
    reset needs no epoch numbering or second partitioning: balance =
    cum_value − cum_value_at_last_marker, both plain cumulative frames."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # two selects because window expressions can't nest; both Window nodes
    # share the (user_id | ts, event_id) partitioning+sort, so Spark plans one
    # exchange and one sort feeding both passes
    with_cum = events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.sum("value").over(cum).alias("cum_value"),
    )
    last_marker_cum = F.last(
        F.when(F.col("event_type") == marker, F.col("cum_value")), ignorenulls=True
    ).over(cum)
    return with_cum.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.round(
            F.col("cum_value") - F.coalesce(last_marker_cum, F.lit(0.0)), 6
        ).alias("balance_since_reset"),
    ).orderBy("event_id")


def running_balance_with_reset_sql(marker: str = RESET_MARKER) -> str:
    return f"""
        WITH c AS (
            SELECT event_id, user_id, ts, event_type, value,
                   SUM(value) OVER w AS cum_value
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT event_id, user_id, ts, event_type, value,
               round(cum_value - COALESCE(
                   last_value(CASE WHEN event_type = '{marker}'
                                   THEN cum_value END IGNORE NULLS) OVER w2,
                   0.0), 6) AS balance_since_reset
        FROM c
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """
