"""Hand-computed tests for the window-analytics operators (rolling stats,
SCD2 interval build) and the one-pass table profiler."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from pagila_etl_airflow_assignment_spark.operators import analytics, profile


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


def test_scd2_merges_runs_and_tracks_validity(spark):
    events = spark.createDataFrame(
        [
            (1, _ts(1), 10, "a", 0.0, "{}"),
            (2, _ts(2), 10, "a", 0.0, "{}"),  # same state: merged into run 1
            (3, _ts(3), 10, "b", 0.0, "{}"),
            (4, _ts(4), 10, "a", 0.0, "{}"),  # back to a: NEW interval
            (5, _ts(5), 20, "x", 0.0, "{}"),  # other user: independent
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = sorted(
        (r.user_id, r.state, r.valid_from, r.valid_to, r.is_current)
        for r in analytics.scd2_user_state(events).collect()
    )
    assert got == [
        (10, "a", _ts(1), _ts(3), False),
        (10, "a", _ts(4), None, True),
        (10, "b", _ts(3), _ts(4), False),
        (20, "x", _ts(5), None, True),
    ]


def test_scd2_intervals_tile_each_user_timeline(spark):
    """Intervals must be contiguous per user (valid_to == next valid_from)
    with exactly one open (current) interval per user."""
    from pagila_etl_airflow_assignment_spark.sources.parquet import load_table

    from conftest import SF_SMALL

    rows = analytics.scd2_user_state(
        load_table(spark, SF_SMALL, "events")
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in ivs if r.is_current) == 1
        assert ivs[-1].valid_to is None
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from, (user, a, b)


def test_profile_counts_nulls_distincts_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, None, 1.5), (2, "y", None), (3, "x", 4.0)],
        "k long, s string, v double",
    )
    got = {r.col_name: r for r in profile.profile_table(df).collect()}
    assert got["k"].n_nulls == 0 and got["k"].n_distinct == 3
    assert (got["k"].min_value, got["k"].max_value) == ("1", "3")
    assert got["s"].n_nulls == 1 and got["s"].n_distinct == 2
    assert (got["s"].min_value, got["s"].max_value) == ("x", "y")
    assert got["v"].n_nulls == 1 and got["v"].n_distinct == 3
    assert (got["v"].min_value, got["v"].max_value) == ("1.5", "4.0")


def test_delta_agg_merge_equals_full_for_any_split(spark):
    """Mergeable-aggregate property: for several base/delta split points the
    merged partials equal the full aggregate exactly."""
    import pyspark.sql.functions as F

    from conftest import SF_SMALL
    from pagila_etl_airflow_assignment_spark.operators.analytics import (
        _typed_agg,
        merge_aggregate_delta,
    )
    from pagila_etl_airflow_assignment_spark.sources.parquet import load_table

    events = load_table(spark, SF_SMALL, "events")
    full = {
        r.event_type: (r.n, r.total)
        for r in merge_aggregate_delta(
            _typed_agg(events), _typed_agg(events.limit(0))
        ).collect()
    }
    for mod in (2, 3, 7):
        base = _typed_agg(events.where(F.col("event_id") % mod != 0))
        delta = _typed_agg(events.where(F.col("event_id") % mod == 0))
        merged = {
            r.event_type: (r.n, r.total)
            for r in merge_aggregate_delta(base, delta).collect()
        }
        assert merged == full, f"split mod={mod} diverged"
