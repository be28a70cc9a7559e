"""Behavior-mining, distributional, Zipf, and quantization operators:
semantics pinned on tiny inline fixtures (differential checks run via
tools/verify_local.py and the driver gate)."""

from __future__ import annotations

import datetime as dt
import math

import pyspark.sql.functions as F

from pagila_etl_airflow_assignment_spark.llm import corpus_stats
from pagila_etl_airflow_assignment_spark.llm import embeddings as embeddings_mod
from pagila_etl_airflow_assignment_spark.operators import behavior, distributions


def _ts(day: int, hour: int = 0, minute: int = 0):
    return dt.datetime(2024, 1, day, hour, minute)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_trending_ranks_within_hour(spark):
    rows = [(i, 1, _ts(1, 10, i), "view", 0.0) for i in range(3)]
    rows += [(10 + i, 1, _ts(1, 10, 30 + i), "click", 0.0) for i in range(2)]
    rows += [(20, 1, _ts(1, 10, 50), "error", 0.0)]
    rows += [(30, 1, _ts(1, 11, 0), "purchase", 0.0)]
    out = behavior.trending_event_types(_events(spark, rows), k=2).collect()
    got = [(r.hour, r.event_type, r.n, r.rk) for r in out]
    assert got == [
        (_ts(1, 10), "view", 3, 1),
        (_ts(1, 10), "click", 2, 2),
        (_ts(1, 11), "purchase", 1, 1),
    ]


def test_session_paths_order_and_gap_split(spark):
    rows = [
        (1, 1, _ts(1, 10, 0), "view", 0.0),
        (2, 1, _ts(1, 10, 5), "click", 0.0),
        # >30 min gap -> new session
        (3, 1, _ts(1, 12, 0), "purchase", 0.0),
        (4, 2, _ts(1, 9, 0), "view", 0.0),
        (5, 2, _ts(1, 9, 1), "click", 0.0),
    ]
    out = behavior.session_paths(_events(spark, rows), k=10).collect()
    got = {r.path: r.n_sessions for r in out}
    assert got == {"view>click": 2, "purchase": 1}


def test_repurchase_intervals_day_gaps(spark):
    rows = [
        (1, 1, _ts(1), "purchase", 0.0),
        (2, 1, _ts(3), "purchase", 0.0),  # gap 2 days
        (3, 1, _ts(3, 12), "purchase", 0.0),  # gap 0 days (12h)
        (4, 1, _ts(2), "view", 0.0),  # non-purchase ignored
        (5, 2, _ts(9), "purchase", 0.0),  # first purchase: no interval
    ]
    out = {r.gap_days: r.n_intervals for r in
           behavior.repurchase_intervals(_events(spark, rows)).collect()}
    assert out == {0: 1, 2: 1}


def test_customer_deciles_partition_by_segment(spark):
    orders = spark.createDataFrame(
        [(i, i, float(100 * i), _ts(1)) for i in range(1, 5)],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    )
    cust = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B"), (5, "B")],  # 5 never ordered
        "c_custkey long, c_mktsegment string",
    )
    out = distributions.customer_spend_deciles(orders, cust, n_buckets=2).collect()
    got = {(r.c_mktsegment, r.decile): (r.n_customers, r.total_spend) for r in out}
    # A: cust2 (200) decile 1, cust1 (100) decile 2
    assert got[("A", 1)] == (1, 200.0) and got[("A", 2)] == (1, 100.0)
    # B: cust4 (400) + cust3 (300) split, zero-spend cust5 in the bottom bucket
    assert got[("B", 1)] == (2, 700.0) and got[("B", 2)] == (1, 0.0)


def test_ship_latency_percentiles(spark):
    orders = spark.createDataFrame(
        [(1, "1-URGENT", _ts(1)), (2, "1-URGENT", _ts(1))],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [(1, _ts(3)), (1, _ts(9)), (2, _ts(5))],  # order 1 first-ship day 3
        "l_orderkey long, l_shipdate timestamp",
    )
    out = distributions.ship_latency_percentiles(orders, li).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_orders == 2 and r.p50_days == 3.0  # latencies {2, 4} -> p50 = 3


def test_zipf_slope_on_power_law(spark):
    # exact power law freq = 64 / rank -> slope -1 in log-log
    words = []
    vocab = ["w%02d" % i for i in range(1, 9)]
    for rank, w in enumerate(vocab, start=1):
        words += [w] * (64 // rank)
    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    r = corpus_stats.zipf_slope(docs, k=8).collect()[0]
    assert r.n_terms == 8
    # freq = floor(64/rank) is close to but not exactly the power law
    assert -1.1 < r.zipf_slope < -0.85


def test_quantize_int8_roundtrip_and_zero_vector(spark):
    vecs = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in embeddings_mod.quantize_int8(vecs).collect()}
    r1 = out[1]
    assert r1.scale_nano == round(1.0 / 127 * 1e9)
    # 0.5 / (1.0/127 as double) lands EXACTLY on 63.5 in binary, and both
    # engines round half away from zero on the identical raw (unrounded)
    # scale — the boundary case that pins the q arithmetic cross-engine
    assert r1.q == "64,-127,32"
    assert r1.q_l1 == 64 + 127 + 32
    r2 = out[2]
    assert r2.scale_nano == 0 and r2.q == "0,0,0" and r2.q_l1 == 0
