"""Point-in-time-correct feature operators — the ML feature-store surface.

Training-data correctness hinges on never letting a feature peek at or past
its label event (leakage). Both operators here make that guarantee by
construction:

- `pit_state_lookup`: for each label event, the dimension state that was
  valid AT that event's time — an as-of join against SCD2 validity
  intervals (the "point-in-time join" every feature store ships). Reuses
  the engine's union/last-value as-of join: single shuffle on the entity
  key, no interval fan-out.
- `leakage_free_click_features`: per label event, aggregates of the user's
  prior activity STRICTLY EARLIER in stream order — one cumulative window
  with an explicit `rows between unbounded preceding and 1 preceding`
  frame. The frame is the leakage proof: the current (label) row and
  everything after it are structurally outside the aggregation.

Scale: both are single-shuffle user_id-keyed plans; the SCD2 build feeding
the lookup shares the same key. Nothing joins event-to-event (no interval
explosion) and no feature is computed twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import temporal
from .analytics import scd2_user_state


def pit_state_lookup(events: DataFrame, label_type: str = "purchase") -> DataFrame:
    """Each `label_type` event joined to the user's SCD2 state valid at its
    timestamp. The state stream excludes label events (a label's own arrival
    is not a feature). Boundary: an event exactly at `valid_from` sees the
    NEW state (as-of inclusive bound == interval half-open [from, to))."""
    states = scd2_user_state(events.where(F.col("event_type") != label_type))
    labels = events.where(F.col("event_type") == label_type).select(
        F.col("event_id").alias("label_id"), "user_id", "ts"
    )
    joined = temporal.asof_join(
        labels,
        states.select("user_id", "valid_from", "state"),
        on="user_id",
        left_ts="ts",
        right_ts="valid_from",
        right_cols=("state",),
    )
    return joined.select(
        "label_id",
        "user_id",
        "ts",
        F.col("state").alias("state_at_label"),
    ).orderBy("label_id")


def pit_state_lookup_sql(label_type: str = "purchase") -> str:
    return f"""
        WITH marked AS (
            SELECT user_id, event_id, ts, event_type AS state,
                   lag(event_type) OVER w AS prev_state
            FROM events
            WHERE event_type <> '{label_type}'
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        changes AS (
            SELECT user_id, ts AS valid_from, state
            FROM marked
            WHERE prev_state IS NULL OR prev_state <> state
        ),
        labels AS (
            SELECT event_id AS label_id, user_id, ts
            FROM events WHERE event_type = '{label_type}'
        )
        SELECT label_id, l.user_id, l.ts, s.state AS state_at_label
        FROM labels l
        ASOF LEFT JOIN changes s
          ON l.user_id = s.user_id AND l.ts >= s.valid_from
        ORDER BY label_id
    """


def leakage_free_click_features(
    events: DataFrame, label_type: str = "purchase", feature_type: str = "click"
) -> DataFrame:
    """Per label event: count and value-sum of the user's `feature_type`
    events strictly earlier in (ts, event_id) stream order. The
    1-PRECEDING frame bound is the no-leakage guarantee."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_feat = F.col("event_type") == feature_type
    with_cum = events.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.coalesce(
            F.count(F.when(is_feat, 1)).over(w), F.lit(0)
        ).cast("long").alias("prior_clicks"),
        F.round(
            F.coalesce(F.sum(F.when(is_feat, F.col("value"))).over(w), F.lit(0.0)),
            6,
        ).alias("prior_click_value"),
    )
    return (
        with_cum.where(F.col("event_type") == label_type)
        .select(
            F.col("event_id").alias("label_id"),
            "user_id",
            "ts",
            "prior_clicks",
            "prior_click_value",
        )
        .orderBy("label_id")
    )


def leakage_free_click_features_sql(
    label_type: str = "purchase", feature_type: str = "click"
) -> str:
    return f"""
        WITH cum AS (
            SELECT event_id, user_id, ts, event_type,
                   COALESCE(COUNT(CASE WHEN event_type = '{feature_type}'
                                       THEN 1 END) OVER w, 0) AS prior_clicks,
                   round(COALESCE(SUM(CASE WHEN event_type = '{feature_type}'
                                           THEN value END) OVER w, 0.0), 6)
                     AS prior_click_value
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
            )
        )
        SELECT event_id AS label_id, user_id, ts, prior_clicks, prior_click_value
        FROM cum
        WHERE event_type = '{label_type}'
        ORDER BY label_id
    """
