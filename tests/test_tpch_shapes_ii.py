"""Decision-support shapes II (TPC-H Q10/Q13/Q15/Q16/Q17 adaptations).

Semantics pinned on tiny inline fixtures; the differential check vs DuckDB
runs via tools/verify_local.py and the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import datetime as dt

from pagila_etl_airflow_assignment_spark.operators import tpch_shapes


def _ts(day: int):
    return dt.datetime(1996, 1, day)


def _customer(spark, rows):
    return spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int, c_acctbal double"
    )


def test_custdist_zero_orders_and_priority_exclusion(spark):
    cust = _customer(spark, [(1, "a", 0, 0.0), (2, "b", 0, 0.0), (3, "c", 0, 0.0)])
    orders = spark.createDataFrame(
        [
            (10, 1, "2-HIGH"),
            (11, 1, "2-HIGH"),
            (12, 2, "1-URGENT"),  # excluded -> customer 2 counts as zero-order
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    rows = {
        (r.c_count, r.custdist)
        for r in tpch_shapes.customer_order_distribution(cust, orders).collect()
    }
    assert rows == {(0, 2), (2, 1)}


def test_small_quantity_threshold_is_strict_and_per_part(spark):
    # part 1: qties 1 and 19 -> avg 10, threshold qty < 2 -> only the qty-1
    # line qualifies; part 2 (other brand) never participates.
    li = spark.createDataFrame(
        [
            (1, 1.0, 700.0),
            (1, 19.0, 100.0),
            (2, 1.0, 999.0),
        ],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#23"), (2, "Brand#1")], "p_partkey long, p_brand string"
    )
    row = tpch_shapes.small_quantity_revenue(li, part).collect()[0]
    assert row.n_small_lines == 1
    assert row.avg_yearly == 100.0  # 700 / 7.0


def test_top_supplier_surfaces_all_tied_maxima(spark):
    li = spark.createDataFrame(
        [
            (1, 10.0, 0.0, _ts(5)),
            (2, 10.0, 0.0, _ts(6)),
            (3, 1.0, 0.0, _ts(7)),
            (1, 99.0, 0.0, dt.datetime(1995, 1, 1)),  # outside the quarter
        ],
        "l_suppkey long, l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    supp = spark.createDataFrame(
        [(1, "s1"), (2, "s2"), (3, "s3")], "s_suppkey long, s_name string"
    )
    rows = tpch_shapes.top_revenue_suppliers(li, supp).collect()
    assert [(r.s_suppkey, r.total_revenue) for r in rows] == [(1, 10.0), (2, 10.0)]


def test_returned_items_filters_flag_and_order_window(spark):
    cust = _customer(spark, [(1, "a", 0, 5.0)])
    nation = spark.createDataFrame([(0, "N0")], "n_nationkey int, n_name string")
    orders = spark.createDataFrame(
        [(10, 1, _ts(5)), (11, 1, dt.datetime(1995, 6, 1))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            (10, "R", 100.0, 0.0),
            (10, "N", 999.0, 0.0),  # wrong flag
            (11, "R", 999.0, 0.0),  # order outside window
        ],
        "l_orderkey long, l_returnflag string, l_extendedprice double, l_discount double",
    )
    rows = tpch_shapes.returned_item_report(cust, orders, li, nation).collect()
    assert [(r.c_custkey, r.revenue) for r in rows] == [(1, 100.0)]


def test_parts_supplier_counts_dedups_and_excludes(spark):
    part = spark.createDataFrame(
        [
            (1, "Brand#1", "ECONOMY", 9),
            (2, "Brand#13", "ECONOMY", 9),  # excluded brand
            (3, "Brand#1", "ECONOMY", 2),  # size not in the selected set
        ],
        "p_partkey long, p_brand string, p_type string, p_size int",
    )
    supp = spark.createDataFrame(
        [(1, 10.0), (2, -1.0)], "s_suppkey long, s_acctbal double"
    )
    li = spark.createDataFrame(
        [
            (1, 1),
            (1, 1),  # duplicate pair -> counted once
            (1, 2),  # negative-balance supplier -> excluded
            (2, 1),
            (3, 1),
        ],
        "l_partkey long, l_suppkey long",
    )
    rows = tpch_shapes.parts_supplier_counts(li, part, supp).collect()
    assert [(r.p_brand, r.p_size, r.supplier_cnt) for r in rows] == [
        ("Brand#1", 9, 1)
    ]
