"""Round-7 hardening tests: advisor fixes, rotation invariants."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --- isqrt overflow guard (ADVICE r6: (s0+1)^2 wrapped for inputs near 2^63) -------


def test_isqrt_exact_near_int64_max(spark):
    """The up-correction probe must not form (s0+1)^2: for x near 2^63 that
    square exceeds int64 and previously wrapped negative (non-ANSI), firing
    the <= branch and returning s0+1 incorrectly."""
    from pagila_etl_airflow_assignment_spark.functions import isqrt

    xs = [
        2**63 - 1,  # int64 max: seed s0 = 3037000499, (s0+1)^2 overflows
        3037000499**2,  # largest perfect square in int64
        3037000499**2 - 1,
        3037000499**2 + 1,
        9223372036854775806,
    ]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    for r in df.select("x", isqrt("x").alias("s")).collect():
        assert r.s == math.isqrt(r.x), (r.x, r.s)


def test_isqrt_sql_exact_near_int64_max():
    """DuckDB twin: naive (s0+1)^2 raises out-of-range there; the rewritten
    probe must evaluate cleanly and exactly across the full BIGINT domain."""
    duckdb = pytest.importorskip("duckdb")
    from pagila_etl_airflow_assignment_spark.functions import isqrt_sql

    con = duckdb.connect()
    for x in [0, 1, 2, 3, 2**63 - 1, 3037000499**2, 3037000499**2 - 1]:
        got = con.execute(f"SELECT {isqrt_sql(str(x))} AS s").fetchone()[0]
        assert got == math.isqrt(x), (x, got)


# --- kendall_tau_daily laziness (ADVICE r6: eager daily.count() at build time) -----


def test_kendall_tau_plan_construction_runs_no_job(spark):
    """Building the kendall plan must be lazy — the day count rides the plan
    as a broadcast 1-row cross join, not a driver-side count()."""
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        kendall_tau_daily,
    )

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    events = spark.createDataFrame(
        [(1, "click", "2024-01-01 00:00:00", 1.0)],
        "user_id long, event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    df = kendall_tau_daily(events)  # plan construction only
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "plan construction triggered a Spark job"
    row = df.collect()[0]
    assert row.n_days == 1 and row.tau_a_milli == 0


def test_kendall_tau_values_small_grid(spark):
    """3-day grid with strictly concordant counts -> tau_a = +1.000."""
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        kendall_tau_daily,
    )

    rows = []
    # day1: 1 click / 1 error; day2: 2/2; day3: 3/3 (strictly increasing both)
    for d, n in [("2024-01-01", 1), ("2024-01-02", 2), ("2024-01-03", 3)]:
        for t in ["click"] * n + ["error"] * n:
            rows.append((1, t, f"{d} 10:00:00", 0.0))
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = kendall_tau_daily(events).collect()[0]
    assert (r.n_days, r.concordant, r.discordant, r.tied) == (3, 3, 0, 0)
    assert r.tau_a_milli == 1000


# --- round-7 driver-sample rotation invariants --------------------------------------


def test_r7_rotation_head_is_never_certified_backlog():
    """The first 50 emitted names must all come from the never-driver-sampled
    backlog (so CORRECTNESS_r7 certifies 50 first-time queries), and emission
    must cover the registry exactly once."""
    from pagila_etl_airflow_assignment_spark import registry

    names = list(registry.queries())
    assert len(names) == len(set(names))
    backlog = set(registry._NEVER_DRIVER_SAMPLED_R7)
    certified = set(registry._DRIVER_CERTIFIED_R6)
    head = names[:50]
    assert all(n in backlog for n in head), [n for n in head if n not in backlog]
    # certified-green queries are re-sampled last, never displacing the backlog
    tail = names[-len(certified):]
    assert set(tail) == certified
    # every listed name still exists in the registry (no stale rotation rows)
    assert backlog <= set(names) and certified <= set(names)
