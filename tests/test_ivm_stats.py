"""IVM join maintenance, closed-form statistics, streaming CM sketch."""

from __future__ import annotations

import datetime as dt
import math
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from pagila_etl_airflow_assignment_spark.operators import cmsketch, ivm, stats
from pagila_etl_airflow_assignment_spark.sources.parquet import load_table
from pagila_etl_airflow_assignment_spark.streaming.sketch import streaming_cm_sketch

from conftest import SF_SMALL


def test_ivm_union_equals_direct_join(spark):
    """The 4-term delta union must reproduce the direct join exactly —
    including orders whose lines span base and delta slices."""
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    got = sorted(
        tuple(r) for r in ivm.maintained_join_view(orders, lineitem).collect()
    )
    want = sorted(
        tuple(r)
        for r in ivm._join_project(orders, lineitem)
        .orderBy("o_orderkey", "l_linenumber")
        .collect()
    )
    assert got == want and len(got) > 0


def test_ivm_terms_are_disjoint_and_cover(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    a, da = ivm._split(orders, "o_orderkey", 7)
    b, db = ivm._split(lineitem, "l_orderkey", 5)
    n_terms = (
        ivm._join_project(a, b).count()
        + ivm._join_project(da, b).count()
        + ivm._join_project(a, db).count()
        + ivm._join_project(da, db).count()
    )
    assert n_terms == ivm._join_project(orders, lineitem).count()


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_chi_square_zero_for_independent_uniform(spark):
    # perfectly uniform 2x2 contingency -> chi2 == 0
    rows, eid = [], 0
    for t in ("a", "b"):
        for h in (1, 2):
            for _ in range(10):
                rows.append((eid, 1, dt.datetime(2024, 1, 1, h), t, 0.0))
                eid += 1
    out = stats.chi_square_independence(_events(spark, rows)).collect()[0]
    assert out.chi2 == 0.0 and out.dof == 1 and out.n_cells == 4


def test_chi_square_detects_dependence(spark):
    # type 'a' only in hour 1, 'b' only in hour 2 -> maximal dependence
    rows = [(i, 1, dt.datetime(2024, 1, 1, 1), "a", 0.0) for i in range(20)]
    rows += [(100 + i, 1, dt.datetime(2024, 1, 1, 2), "b", 0.0) for i in range(20)]
    out = stats.chi_square_independence(_events(spark, rows)).collect()[0]
    assert math.isclose(out.chi2, 40.0, abs_tol=1e-6)  # == N for a perfect 2x2 split


def test_welch_t_matches_manual(spark):
    # cohort A (even users): values 1,2,3 ; cohort B (odd): 5,5,7,7
    rows = [
        (1, 2, dt.datetime(2024, 1, 1), "x", 1.0),
        (2, 4, dt.datetime(2024, 1, 1), "x", 2.0),
        (3, 6, dt.datetime(2024, 1, 1), "x", 3.0),
        (4, 1, dt.datetime(2024, 1, 1), "x", 5.0),
        (5, 3, dt.datetime(2024, 1, 1), "x", 5.0),
        (6, 5, dt.datetime(2024, 1, 1), "x", 7.0),
        (7, 7, dt.datetime(2024, 1, 1), "x", 7.0),
    ]
    out = stats.welch_ab_test(_events(spark, rows)).collect()[0]
    n_a, m_a, v_a = 3, 2.0, 1.0
    n_b, m_b, v_b = 4, 6.0, 4.0 / 3.0
    se2 = v_a / n_a + v_b / n_b
    t = (m_a - m_b) / math.sqrt(se2)
    dof = se2**2 / ((v_a / n_a) ** 2 / (n_a - 1) + (v_b / n_b) ** 2 / (n_b - 1))
    assert (out.n_a, out.n_b) == (3, 4)
    assert math.isclose(out.t_stat, round(t, 6), abs_tol=1e-6)
    assert math.isclose(out.welch_dof, round(dof, 6), abs_tol=1e-6)


def test_welch_null_on_degenerate_variance(spark):
    rows = [(i, i, dt.datetime(2024, 1, 1), "x", 3.0) for i in range(10)]
    out = stats.welch_ab_test(_events(spark, rows)).collect()[0]
    assert out.t_stat is None and out.welch_dof is None


@pytest.fixture(scope="module")
def events_dir(spark):
    d = tempfile.mkdtemp(prefix="events-cm-stream-")
    shutil.copy(f"{SF_SMALL}/events.parquet", f"{d}/events.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_cm_sketch_equals_batch(spark, events_dir):
    q = (
        streaming_cm_sketch(spark, events_dir)
        .writeStream.format("memory")
        .queryName("cm_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt-cm-"))
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("cm_stream").collect())
    want = sorted(
        tuple(r)
        for r in cmsketch.cm_build(load_table(spark, SF_SMALL, "events")).collect()
    )
    assert got == want and len(got) > 0


def test_backlog_eventification_matches_naive_overlap(spark):
    import datetime as dt

    orders = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 2)),
         (3, dt.datetime(2024, 1, 10))],
        "o_orderkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 5)), (2, dt.datetime(2024, 1, 5)),
         (3, dt.datetime(2024, 1, 3))],  # order 3 "ships" before opening -> clamped
        "l_orderkey long, l_shipdate timestamp",
    )
    from pagila_etl_airflow_assignment_spark.operators.temporal import (
        order_backlog_curve,
    )

    out = {r.day: r.open_orders for r in order_backlog_curve(orders, li).collect()}
    # days: 1/1 open(1); 1/2 open(2); 1/5 close both; 1/10 open+close order 3 (clamped)
    assert out == {
        dt.date(2024, 1, 1): 1,
        dt.date(2024, 1, 2): 2,
        dt.date(2024, 1, 5): 0,
        dt.date(2024, 1, 10): 0,
    }


def test_entropy_uniform_and_point_mass(spark):
    rows = [(1, 1, dt.datetime(2024, 1, 1), t, 0.0) for t in ("a", "b", "c", "d")]
    rows += [(10 + i, 2, dt.datetime(2024, 1, 1), "a", 0.0) for i in range(5)]
    out = {r.user_id: r for r in stats.user_type_entropy(_events(spark, rows)).collect()}
    assert out[1].entropy_micro == round(math.log(4) * 1e6)  # uniform
    assert out[2].entropy_micro == 0  # point mass


def test_gini_equal_vs_concentrated(spark):
    orders = spark.createDataFrame(
        [(1, 1, 100.0, dt.datetime(2024, 1, 1)), (2, 2, 100.0, dt.datetime(2024, 1, 1)),
         (3, 3, 400.0, dt.datetime(2024, 1, 1))],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    )
    cust = spark.createDataFrame(
        [(1, "EQ"), (2, "EQ"), (3, "CONC"), (4, "CONC")],
        "c_custkey long, c_mktsegment string",
    )
    out = {r.c_mktsegment: r.gini for r in
           stats.segment_spend_gini(orders, cust).collect()}
    assert math.isclose(out["EQ"], 0.0, abs_tol=1e-9)  # equal spend -> 0
    assert math.isclose(out["CONC"], 0.5, abs_tol=1e-9)  # (0,400): G=0.5


def test_funnel_timebound_enforces_deadline(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: full funnel within deadlines
        (1, 1, base, "view", 0.0),
        (2, 1, base + dt.timedelta(hours=1), "click", 0.0),
        (3, 1, base + dt.timedelta(hours=2), "purchase", 0.0),
        # user 2: click 2 days after view -> misses the 1-day deadline
        (4, 2, base, "view", 0.0),
        (5, 2, base + dt.timedelta(days=2), "click", 0.0),
        (6, 2, base + dt.timedelta(days=2, hours=1), "purchase", 0.0),
    ]
    from pagila_etl_airflow_assignment_spark.operators.analytics import (
        funnel_user_stages_timebound,
    )

    out = funnel_user_stages_timebound(_events(spark, rows)).collect()[0]
    assert (out.n_view, out.n_click, out.n_purchase) == (2, 1, 1)


def test_streaming_hll_registers_equal_batch(spark, events_dir):
    from pagila_etl_airflow_assignment_spark.operators.hll import _bucket, _rank
    from pagila_etl_airflow_assignment_spark.streaming.sketch import (
        streaming_hll_registers,
    )

    q = (
        streaming_hll_registers(spark, events_dir)
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt-hll-"))
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.table("hll_stream").collect())
    ev = load_table(spark, SF_SMALL, "events")
    hexed = ev.select("event_type", F.md5(F.col("user_id").cast("string")).alias("kh"))
    want = sorted(
        tuple(r)
        for r in hexed.select(
            "event_type", _bucket(F.col("kh")).alias("bucket"), _rank(F.col("kh")).alias("r")
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("m"))
        .collect()
    )
    assert got == want and len(got) > 0
