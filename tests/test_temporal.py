"""Edge semantics of the temporal join operators (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from pagila_etl_airflow_assignment_spark.operators.temporal import (
    asof_join,
    range_join_binned,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            Row(lid=1, k=1, lts=_ts("2024-01-01 10:00:00")),
            Row(lid=2, k=1, lts=_ts("2024-01-01 12:00:00")),
            Row(lid=3, k=2, lts=_ts("2024-01-01 09:00:00")),  # before any right
            Row(lid=4, k=3, lts=_ts("2024-01-01 09:00:00")),  # key w/o right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rts=_ts("2024-01-01 10:00:00"), v="a"),  # ties lid=1 exactly
            Row(k=1, rts=_ts("2024-01-01 11:00:00"), v="b"),
            Row(k=2, rts=_ts("2024-01-01 09:30:00"), v="c"),
        ]
    )
    return left, right


def test_asof_join_backward_inclusive(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: (r["matched_rts"], r["v"])
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts", right_cols=("v",)
        ).collect()
    }
    assert out[1] == (_ts("2024-01-01 10:00:00"), "a")  # equal ts matches (<=)
    assert out[2] == (_ts("2024-01-01 11:00:00"), "b")  # latest prior, not first
    assert out[3] == (None, None)  # right exists but only later
    assert out[4] == (None, None)  # key absent from right


def test_asof_join_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["lid"]: r["matched_rts"]
        for r in asof_join(
            left,
            right,
            on="k",
            left_ts="lts",
            right_ts="rts",
            tolerance_seconds=1800,
        ).collect()
    }
    assert out[1] == _ts("2024-01-01 10:00:00")  # 0s old: kept
    assert out[2] is None  # 1h old: dropped by 30-min tolerance


def test_asof_join_plan_has_no_join_node(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on="k", left_ts="lts", right_ts="rts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan  # union + window, never a join
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_range_join_binned_bounds_inclusive(spark):
    left = spark.createDataFrame([Row(lid=1, lts=_ts("2024-01-01 10:00:00"))])
    right = spark.createDataFrame(
        [
            Row(rts=_ts("2024-01-01 09:54:59"), rv=1),  # 301s before: out
            Row(rts=_ts("2024-01-01 09:55:00"), rv=2),  # exactly -300s: in
            Row(rts=_ts("2024-01-01 10:05:00"), rv=3),  # exactly +300s: in
            Row(rts=_ts("2024-01-01 10:05:01"), rv=4),  # 301s after: out
        ]
    )
    got = sorted(
        r["rv"]
        for r in range_join_binned(
            left, right, "lts", "rts", lo_seconds=-300, hi_seconds=300
        ).collect()
    )
    assert got == [2, 3]


def test_range_join_binned_plans_as_equi_join(spark):
    left = spark.createDataFrame([Row(lid=1, lts=_ts("2024-01-01 10:00:00"))])
    right = spark.createDataFrame([Row(rts=_ts("2024-01-01 10:01:00"), rv=1)])
    plan = (
        range_join_binned(left, right, "lts", "rts", -300, 300)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan, plan


def test_asof_join_matches_pandas_merge_asof_backward(spark):
    """Differential vs pandas merge_asof (an independent reference
    implementation) on random-ish deterministic data."""
    import pandas as pd

    import pyspark.sql.functions as F
    from pagila_etl_airflow_assignment_spark.operators.temporal import asof_join

    left_rows = [(u, 100 * u + 7 * i) for u in range(4) for i in range(25)]
    right_rows = [(u, 100 * u + 11 * i) for u in range(4) for i in range(17)]
    left = spark.createDataFrame(
        [(u, t) for u, t in left_rows], "k long, lt long"
    ).select("k", F.timestamp_micros(F.col("lt") * 1_000_000).alias("lt"))
    right = spark.createDataFrame(
        [(u, t) for u, t in right_rows], "k long, rt long"
    ).select("k", F.timestamp_micros(F.col("rt") * 1_000_000).alias("rt"))
    got = {
        (r.k, r.lt): r.matched_rt
        for r in asof_join(left, right, on="k", left_ts="lt", right_ts="rt").collect()
    }
    lp = left.toPandas().sort_values("lt")
    rp = right.toPandas().sort_values("rt")
    want_df = pd.merge_asof(lp, rp, left_on="lt", right_on="rt", by="k")
    for _, row in want_df.iterrows():
        want = None if pd.isna(row["rt"]) else row["rt"].to_pydatetime()
        assert got[(row["k"], row["lt"].to_pydatetime())] == want


def test_asof_forward_matches_pandas_merge_asof_forward(spark):
    import pandas as pd

    import pyspark.sql.functions as F
    from pagila_etl_airflow_assignment_spark.operators.temporal import (
        asof_join_forward,
    )

    left_rows = [(u, 100 * u + 7 * i) for u in range(4) for i in range(25)]
    right_rows = [(u, 100 * u + 11 * i) for u in range(4) for i in range(17)]
    left = spark.createDataFrame(left_rows, "k long, lt long").select(
        "k", F.timestamp_micros(F.col("lt") * 1_000_000).alias("lt")
    )
    right = spark.createDataFrame(right_rows, "k long, rt long").select(
        "k", F.timestamp_micros(F.col("rt") * 1_000_000).alias("rt")
    )
    got = {
        (r.k, r.lt): r.matched_rt
        for r in asof_join_forward(
            left, right, on="k", left_ts="lt", right_ts="rt"
        ).collect()
    }
    lp = left.toPandas().sort_values("lt")
    rp = right.toPandas().sort_values("rt")
    want_df = pd.merge_asof(
        lp, rp, left_on="lt", right_on="rt", by="k", direction="forward"
    )
    for _, row in want_df.iterrows():
        want = None if pd.isna(row["rt"]) else row["rt"].to_pydatetime()
        assert got[(row["k"], row["lt"].to_pydatetime())] == want
