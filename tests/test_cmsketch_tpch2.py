"""Count-Min sketch properties, the Q14/Q19 shapes, and the hive-style
partition-pruning plan pin."""

from __future__ import annotations

import datetime as dt
import math
import re

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from pagila_etl_airflow_assignment_spark.operators import cmsketch, tpch_shapes
from pagila_etl_airflow_assignment_spark.sources.parquet import load_table

from conftest import SF_SMALL
from test_plans import final_plan


def _events(spark, user_ids):
    return spark.createDataFrame(
        [(i, u, dt.datetime(2024, 1, 1), "view", 0.0) for i, u in enumerate(user_ids)],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )


def test_cm_estimate_never_undercounts(spark):
    users = [1] * 50 + [2] * 20 + list(range(100, 400))
    out = cmsketch.cm_estimate_topk(_events(spark, users), k=10).collect()
    truth = {1: 50, 2: 20}
    for r in out:
        assert r.cm_estimate >= r.true_n  # one-sided error
        if r.user_id in truth:
            assert r.true_n == truth[r.user_id]


def test_cm_total_mass_per_row_equals_n(spark):
    users = list(range(500))
    sketch = cmsketch.cm_build(_events(spark, users)).collect()
    per_row = {}
    for r in sketch:
        per_row[r.row] = per_row.get(r.row, 0) + r.n
    assert set(per_row) == {0, 1, 2, 3}
    assert all(v == 500 for v in per_row.values())  # every row sees every event


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=80))
def test_cm_property_estimates_dominate_truth(spark, user_ids):
    out = cmsketch.cm_estimate_topk(_events(spark, user_ids), k=100).collect()
    true_counts = {}
    for u in user_ids:
        true_counts[u] = true_counts.get(u, 0) + 1
    assert len(out) == len(true_counts)
    for r in out:
        assert r.true_n == true_counts[r.user_id]
        assert r.cm_estimate >= r.true_n


def test_promo_share_conditional_agg(spark):
    li = spark.createDataFrame(
        [
            (1, 1, 100.0, 0.0, dt.datetime(2024, 1, 5)),
            (2, 2, 300.0, 0.0, dt.datetime(2024, 1, 20)),
        ],
        "l_orderkey long, l_partkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "STANDARD")], "p_partkey long, p_type string"
    )
    out = tpch_shapes.promo_revenue_share(li, part).collect()
    assert len(out) == 1
    assert out[0].ship_month == dt.date(2024, 1, 1)
    assert math.isclose(out[0].promo_share_pct, 25.0, abs_tol=1e-9)
    assert out[0].total_revenue == 400.0


def test_disjunctive_revenue_branches(spark):
    li = spark.createDataFrame(
        [
            (1, 1, 10.0, 100.0, 0.0, dt.datetime(2024, 1, 1)),  # c1 hit
            (2, 1, 30.0, 100.0, 0.0, dt.datetime(2024, 1, 1)),  # qty>=25: miss
            (3, 2, 10.0, 50.0, 0.0, dt.datetime(2024, 1, 1)),  # c3 hit (no qty bound)
            (4, 3, 10.0, 70.0, 0.0, dt.datetime(2024, 1, 1)),  # no branch
        ],
        "l_orderkey long, l_partkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [(1, "Brand#2", 5), (2, "Brand#23", 30), (3, "Brand#55", 5)],
        "p_partkey long, p_brand string, p_size int",
    )
    out = tpch_shapes.disjunctive_predicate_revenue(li, part).collect()[0]
    assert out.n_lines == 2 and out.revenue == 150.0


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    """Hive-style date-partitioned layout: a filter on the partition column
    must reach the scan as PartitionFilters and restrict inputFiles to the
    matching directory — the first line of defense at 100 TB (entire
    partitions never open)."""
    path = str(tmp_path / "events_by_day")
    events = load_table(spark, SF_SMALL, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    events.write.partitionBy("event_date").mode("overwrite").parquet(path)
    some_day = events.select(F.min("event_date").alias("d")).first()["d"]

    read = spark.read.parquet(path).where(F.col("event_date") == F.lit(some_day))
    plan = final_plan(read)
    # the partition predicate must land in PartitionFilters (directory-level
    # pruning), NOT in the row-level PushedFilters — inputFiles() can't show
    # this (it is analysis-level, before pruning), the plan can
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan
    # and the pruned read returns exactly that day's rows
    expected = events.where(F.col("event_date") == F.lit(some_day)).count()
    assert read.count() == expected > 0
