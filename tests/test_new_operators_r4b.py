"""Round-4b operators: TPC-H-shaped decision-support queries, the
co-occurrence graph, event-sequence windows, and shingle novelty.

Semantics pinned on tiny inline fixtures (engine-independent); the
differential check vs DuckDB runs via tools/verify_local.py and the driver's
CORRECTNESS gate. Plan-shape assertions live in the *_plan tests below.
"""

from __future__ import annotations

import datetime as dt
import re

import pyspark.sql.functions as F

from pagila_etl_airflow_assignment_spark.llm import novelty
from pagila_etl_airflow_assignment_spark.operators import graph, sequences, tpch_shapes
from pagila_etl_airflow_assignment_spark.registry import queries
from pagila_etl_airflow_assignment_spark.sources.parquet import load_table

from conftest import SF_SMALL
from test_plans import final_plan


def _ts(day: int, hour: int = 0):
    return dt.datetime(2024, 1, day, hour)


# ---------------------------------------------------------------------------
# TPC-H shapes
# ---------------------------------------------------------------------------


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_shipdate timestamp",
    )


def _supplier(spark, keys):
    return spark.createDataFrame(
        [(k, f"supp#{k}") for k in keys], "s_suppkey long, s_name string"
    )


def test_sole_final_shipper_semantics(spark):
    # order 100: supplier 1 ships last alone -> counted for supplier 1
    # order 200: suppliers 1 and 2 tie on the final day -> nobody counted
    # order 300: single supplier -> excluded (needs >= 2 suppliers)
    li = _lineitem(
        spark,
        [
            (100, 1, 1, 1.0, 10.0, 0.0, _ts(5)),
            (100, 2, 2, 1.0, 10.0, 0.0, _ts(3)),
            (200, 3, 1, 1.0, 10.0, 0.0, _ts(7)),
            (200, 4, 2, 1.0, 10.0, 0.0, _ts(7)),
            (300, 5, 9, 1.0, 10.0, 0.0, _ts(9)),
        ],
    )
    out = tpch_shapes.sole_final_shipper(li, _supplier(spark, [1, 2, 9])).collect()
    assert [(r.s_suppkey, r.n_orders_closed) for r in out] == [(1, 1)]


def test_large_volume_threshold_and_joinback(spark):
    li = _lineitem(
        spark,
        [
            (1, 1, 1, 250.0, 10.0, 0.0, _ts(1)),
            (1, 2, 1, 100.0, 10.0, 0.0, _ts(2)),  # order 1 total 350 > 300
            (2, 1, 1, 299.0, 10.0, 0.0, _ts(1)),  # order 2 total 299 <= 300
        ],
    )
    orders = spark.createDataFrame(
        [(1, 10, 111.0, _ts(1)), (2, 10, 222.0, _ts(2))],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    )
    cust = spark.createDataFrame([(10, "cust#10")], "c_custkey long, c_name string")
    out = tpch_shapes.large_volume_orders(cust, orders, li).collect()
    assert [(r.o_orderkey, r.total_qty) for r in out] == [(1, 350.0)]


def test_min_cost_supplier_tie_breaks_to_smallest_suppkey(spark):
    li = _lineitem(
        spark,
        [
            (1, 7, 3, 2.0, 20.0, 0.0, _ts(1)),  # unit 10.0
            (2, 7, 1, 4.0, 40.0, 0.0, _ts(1)),  # unit 10.0 (tie, smaller key)
            (3, 7, 2, 1.0, 50.0, 0.0, _ts(1)),  # unit 50.0
        ],
    )
    out = tpch_shapes.min_cost_supplier(li, _supplier(spark, [1, 2, 3])).collect()
    assert [(r.p_partkey, r.s_suppkey, r.min_unit_price) for r in out] == [(7, 1, 10.0)]


def test_dormant_rich_customers_filters_both_ways(spark):
    cust = spark.createDataFrame(
        [(1, 100.0, "A"), (2, 900.0, "A"), (3, 900.0, "B"), (4, -5.0, "B")],
        "c_custkey long, c_acctbal double, c_mktsegment string",
    )
    # avg positive bal = (100+900+900)/3 = 633.3; rich = {2, 3}
    orders = spark.createDataFrame(
        [(1, 3, _ts(20))],  # customer 3 ordered after the cutoff -> not dormant
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    out = tpch_shapes.dormant_rich_customers(cust, orders, since="2024-01-10").collect()
    assert [(r.c_mktsegment, r.n_dormant, r.total_acctbal) for r in out] == [
        ("A", 1, 900.0)
    ]


def test_supplier_concentration_share_and_cut(spark):
    li = _lineitem(
        spark,
        [
            (1, 1, 1, 1.0, 90.0, 0.0, _ts(1)),
            (2, 1, 2, 1.0, 9.0, 0.0, _ts(1)),
            (3, 1, 3, 1.0, 1.0, 0.0, _ts(1)),
        ],
    )
    out = tpch_shapes.supplier_revenue_concentration(
        li, _supplier(spark, [1, 2, 3]), fraction=0.05
    ).collect()
    assert [(r.s_suppkey, r.revenue, r.share) for r in out] == [(1, 90.0, 0.9), (2, 9.0, 0.09)]


def test_nation_trade_volume_excludes_intra_nation(spark):
    li = _lineitem(spark, [(1, 1, 1, 1.0, 100.0, 0.0, _ts(1))])
    orders = spark.createDataFrame(
        [(1, 10, _ts(1))], "o_orderkey long, o_custkey long, o_orderdate timestamp"
    )
    cust = spark.createDataFrame([(10, 0)], "c_custkey long, c_nationkey int")
    # same-nation supplier: excluded; cross-nation: kept
    supp_same = spark.createDataFrame([(1, 0)], "s_suppkey long, s_nationkey int")
    supp_cross = spark.createDataFrame([(1, 1)], "s_suppkey long, s_nationkey int")
    nation = spark.createDataFrame(
        [(0, "ALPHA"), (1, "BETA")], "n_nationkey int, n_name string"
    )
    assert (
        tpch_shapes.nation_trade_volume(li, orders, cust, supp_same, nation).count()
        == 0
    )
    rows = tpch_shapes.nation_trade_volume(
        li, orders, cust, supp_cross, nation
    ).collect()
    assert [(r.cust_nation, r.supp_nation, r.revenue) for r in rows] == [
        ("ALPHA", "BETA", 100.0)
    ]


# ---------------------------------------------------------------------------
# Graph
# ---------------------------------------------------------------------------


def test_copurchase_counts_and_basket_cap(spark):
    rows = [(1, p, 1, 1.0, 1.0, 0.0, _ts(1)) for p in (10, 20, 30)]
    rows += [(2, p, 1, 1.0, 1.0, 0.0, _ts(1)) for p in (10, 20)]
    # mega-basket: 40 distinct parts -> dropped whole by max_basket=30
    rows += [(3, p, 1, 1.0, 1.0, 0.0, _ts(1)) for p in range(100, 140)]
    li = _lineitem(spark, rows)
    out = graph.copurchase_pairs(li, k=10, max_basket=30).collect()
    assert [(r.part_a, r.part_b, r.n_orders) for r in out] == [
        (10, 20, 2),
        (10, 30, 1),
        (20, 30, 1),
    ]


def test_part_degree_counts_distinct_neighbors(spark):
    rows = [(1, p, 1, 1.0, 1.0, 0.0, _ts(1)) for p in (10, 20, 30)]
    rows += [(2, p, 1, 1.0, 1.0, 0.0, _ts(1)) for p in (10, 20)]
    li = _lineitem(spark, rows)
    out = graph.part_degree(li, k=10).collect()
    by_part = {r.p_partkey: (r.degree, r.n_copurchases) for r in out}
    assert by_part[10] == (2, 3)  # neighbors {20,30}; co-rows 2+1
    assert by_part[30] == (2, 2)


# ---------------------------------------------------------------------------
# Event sequences
# ---------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_event_transitions_row_normalized(spark):
    ev = _events(
        spark,
        [
            (1, 1, _ts(1, 1), "view", 0.0),
            (2, 1, _ts(1, 2), "click", 0.0),
            (3, 1, _ts(1, 3), "view", 0.0),
            (4, 1, _ts(1, 4), "purchase", 0.0),
            (5, 2, _ts(1, 1), "view", 0.0),
            (6, 2, _ts(1, 2), "click", 0.0),
        ],
    )
    out = {(r.prev_type, r.event_type): (r.n, r.p) for r in
           sequences.event_transitions(ev).collect()}
    # 'view' is followed by click twice and purchase once -> p = 2/3, 1/3
    assert out[("view", "click")] == (2, round(2 / 3, 6))
    assert out[("view", "purchase")] == (1, round(1 / 3, 6))
    assert out[("click", "view")] == (1, 1.0)


def test_anomaly_needs_baseline_and_variance(spark):
    # constant baseline -> sigma 0 -> never scored, even for a wild value
    rows = [(i, 1, _ts(1, i), "view", 5.0) for i in range(1, 9)]
    rows.append((9, 1, _ts(1, 9), "view", 500.0))
    assert sequences.user_value_anomalies(_events(spark, rows)).count() == 0
    # varied baseline -> the spike IS scored
    rows = [(i, 1, _ts(1, i), "view", float(i % 3)) for i in range(1, 9)]
    rows.append((9, 1, _ts(1, 9), "view", 500.0))
    out = sequences.user_value_anomalies(_events(spark, rows)).collect()
    assert [r.event_id for r in out] == [9]
    # too-short history -> no verdict
    rows = [(1, 1, _ts(1, 1), "view", 1.0), (2, 1, _ts(1, 2), "view", 500.0)]
    assert sequences.user_value_anomalies(_events(spark, rows)).count() == 0


def test_balance_resets_at_marker(spark):
    ev = _events(
        spark,
        [
            (1, 1, _ts(1, 1), "view", 10.0),
            (2, 1, _ts(1, 2), "click", 5.0),
            (3, 1, _ts(1, 3), "purchase", 1.0),  # resets: balance 0 here
            (4, 1, _ts(1, 4), "view", 7.0),
        ],
    )
    out = {r.event_id: r.balance_since_reset for r in
           sequences.running_balance_with_reset(ev).collect()}
    assert out == {1: 10.0, 2: 15.0, 3: 0.0, 4: 7.0}


# ---------------------------------------------------------------------------
# Novelty
# ---------------------------------------------------------------------------


def test_novelty_first_doc_all_novel_duplicate_none(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # exact dup -> 0 novelty
            (3, "alpha beta gamma zeta eta theta"),  # 1 shared of 4 shingles
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in novelty.shingle_novelty(docs).collect()}
    assert out[1].novelty_ratio == 1.0
    assert out[2].novelty_ratio == 0.0
    assert out[3].n_shingles == 4 and out[3].n_novel == 3


# ---------------------------------------------------------------------------
# Plan shapes
# ---------------------------------------------------------------------------


def test_shipping_priority_plan_topk_and_broadcast(spark):
    plan = final_plan(queries()["warehouse_shipping_priority"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_balance_with_reset_single_exchange(spark):
    """Two window passes share one (user_id) partitioning: exactly one
    shuffle exchange in the final plan."""
    df = sequences.running_balance_with_reset(load_table(spark, SF_SMALL, "events"))
    plan = final_plan(df.drop("__sort"))  # no-op drop; keep df as-is
    n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchange == 1, plan


def test_novelty_single_shingle_exchange(spark):
    """first-occurrence via MIN window: one shingle-keyed hash exchange and
    one doc_id aggregate exchange — never a third (agg+self-join would add
    one)."""
    df = novelty.shingle_novelty(load_table(spark, SF_SMALL, "documents"))
    plan = final_plan(df)
    n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchange <= 2, plan
