"""PageRank, association rules, weighted sampling, winsorization, TWA:
semantics pinned on tiny inline fixtures."""

from __future__ import annotations

import datetime as dt
import math

import pyspark.sql.functions as F

from pagila_etl_airflow_assignment_spark.llm import sampling
from pagila_etl_airflow_assignment_spark.operators import behavior, distributions, graph


def _ts(day: int, hour: int = 0):
    return dt.datetime(2024, 1, day, hour)


def _lineitem(spark, basket_parts):
    rows = []
    for ok, parts in basket_parts.items():
        for p in parts:
            rows.append((ok, p, 1, 1.0, 1.0, 0.0, _ts(1)))
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_shipdate timestamp",
    )


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_pagerank_hub_ranks_highest_and_matches_manual(spark):
    # star: 1 connected to 2,3,4 (hub), plus an isolated pair 5-6
    li = _lineitem(spark, {10: [1, 2], 11: [1, 3], 12: [1, 4], 13: [5, 6]})
    out = graph.copurchase_pagerank(li, iters=2, k=10).collect()
    ranks = {r.p_partkey: r.pagerank for r in out}
    assert ranks[1] == max(ranks.values())
    # manual power iteration on the star (deg1=3, leaves deg 1):
    # r1(1)=0.15+0.85*(3*1/1)=2.7 ; r1(leaf)=0.15+0.85*(1/3)=0.43333...
    # r2(1)=0.15+0.85*3*(0.4333../1)=1.255 ; r2(leaf)=0.15+0.85*(2.7/3)=0.915
    assert math.isclose(ranks[1], 1.255, abs_tol=1e-6)
    assert math.isclose(ranks[2], 0.915, abs_tol=1e-6)
    # symmetric pair: r stays at 1.0 fixed point
    assert math.isclose(ranks[5], 1.0, abs_tol=1e-6)


def test_association_rules_confidence_and_lift(spark):
    # 4 baskets; {1,2} together twice, 1 appears 3x, 2 appears 2x
    li = _lineitem(spark, {10: [1, 2], 11: [1, 2], 12: [1, 3], 13: [3, 4]})
    out = graph.association_rules(li, min_support=2, k=10).collect()
    rules = {(r.part_a, r.part_b): r for r in out}
    r = rules[(1, 2)]
    assert r.n_pair == 2
    assert math.isclose(r.support, 0.5, abs_tol=1e-9)  # 2/4 baskets
    assert math.isclose(r.confidence, round(2 / 3, 6), abs_tol=1e-9)
    assert math.isclose(r.lift, round(2 * 4 / (3 * 2), 6), abs_tol=1e-9)


def test_weighted_sample_prefers_heavy_docs_and_is_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "t", "en", "web", 10 if i % 2 else 100000) for i in range(200)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    s1 = sampling.weighted_sample_wor(docs, k=50).collect()
    s2 = sampling.weighted_sample_wor(docs, k=50).collect()
    assert [r.doc_id for r in s1] == [r.doc_id for r in s2]  # deterministic
    heavy = sum(1 for r in s1 if r.n_chars == 100000)
    assert heavy >= 45  # 10000x weight ratio -> heavy docs dominate


def test_winsorized_mean_clips_outliers(spark):
    rows = [(i, 1, _ts(1, 0), "view", 1.0) for i in range(99)]
    rows.append((99, 1, _ts(1, 0), "view", 1000.0))
    out = distributions.winsorized_stats(_events(spark, rows), lo=0.01, hi=0.9).collect()
    r = out[0]
    assert r.n == 100 and r.n_clipped >= 1
    assert r.mean_raw > 10 and r.mean_winsorized < 2  # outlier neutralized


def test_time_weighted_average_uses_holding_times(spark):
    # value 10 held 1h, value 0 held 3h, final event excluded
    ev = _events(
        spark,
        [
            (1, 1, _ts(1, 0), "view", 10.0),
            (2, 1, _ts(1, 1), "view", 0.0),
            (3, 1, _ts(1, 4), "view", 99.0),
        ],
    )
    out = behavior.time_weighted_value(ev).collect()
    assert len(out) == 1
    assert out[0].n_spans == 2
    assert math.isclose(out[0].twa_value, 10 * 1 / 4, abs_tol=1e-9)
