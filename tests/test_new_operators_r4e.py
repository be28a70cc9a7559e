"""Round-4e..4g operators: Q6/Q8/Q9/Q20 shapes, MAD outliers, counting IVM,
random projection, set algebra, phonetic blocking, BFS, CUPED/CUSUM/PSI,
equi-depth bins, golden records, BI shapes (growth/ABC/LTV/share-shift/
new-vs-returning/discount-lift), attribution variants, hybrid dedup,
cross-source matrix, char entropy, islands (bursts/streaks), lateness audit,
survival hazard, WAU overlap, WOE/IV, proportion z, Benford.

Semantics pinned on tiny inline fixtures; the differential check vs DuckDB
runs via tools/verify_local.py and the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import datetime as dt
import math

import pyspark.sql.functions as F

from pagila_etl_airflow_assignment_spark.llm import embeddings as emb
from pagila_etl_airflow_assignment_spark.operators import distributions, ivm, tpch_shapes


def _ts(day: int):
    return dt.datetime(1996, 1, day)


def test_q6_predicates_conjoin(spark):
    li = spark.createDataFrame(
        [
            (100.0, 0.06, 10.0, _ts(5)),   # qualifies
            (100.0, 0.06, 30.0, _ts(5)),   # qty too big
            (100.0, 0.02, 10.0, _ts(5)),   # discount outside band
            (100.0, 0.06, 10.0, dt.datetime(1995, 5, 1)),  # wrong year
        ],
        "l_extendedprice double, l_discount double, l_quantity double, l_shipdate timestamp",
    )
    row = tpch_shapes.forecast_revenue_change(li).collect()[0]
    assert row.n_lines == 1
    assert row.revenue == 6.0


def test_q20_dominance_is_strict_majority(spark):
    li = spark.createDataFrame(
        [
            (1, 1, 6.0),   # supplier 1 ships 6 of part 1's 10 -> dominant
            (1, 2, 4.0),
            (2, 1, 5.0),   # exactly 50% -> NOT dominant (strict >)
            (2, 2, 5.0),
        ],
        "l_partkey long, l_suppkey long, l_quantity double",
    )
    supp = spark.createDataFrame(
        [(1, "s1"), (2, "s2")], "s_suppkey long, s_name string"
    )
    rows = tpch_shapes.dominant_part_suppliers(li, supp).collect()
    assert [r.s_suppkey for r in rows] == [1]


def test_mad_robust_to_single_outlier(spark):
    # 9 values at 10.0 plus one at 1000.0: median 10, MAD 0 -> the outlier is
    # beyond any positive cutoff*MAD threshold
    ev = spark.createDataFrame(
        [(i, _ts(1), 1, "a", 10.0) for i in range(9)] + [(9, _ts(1), 1, "a", 1000.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    row = distributions.mad_outlier_stats(ev).collect()[0]
    assert row.median_value == 10.0
    assert row.mad_value == 0.0
    assert row.n_outliers == 1


def test_counting_ivm_drops_dead_groups(spark):
    # customer 1: only order is key 11 (pre-existing, deleted) -> group dies;
    # customer 2: key 1 stays, key 7 inserted -> n_orders 2
    orders = spark.createDataFrame(
        [(11, 1, 50.0), (1, 2, 10.0), (7, 2, 20.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    rows = {r.o_custkey: r for r in ivm.maintained_agg_view_counting(orders).collect()}
    assert 1 not in rows
    assert rows[2].n_orders == 2 and rows[2].total_spend == 30.0


def test_random_projection_shape_and_linearity(spark):
    v1 = [1.0] + [0.0] * 63
    v0 = [0.0] * 64
    vecs = spark.createDataFrame(
        [(1, v1), (2, v0)], "vec_id long, embedding array<float>"
    )
    out = {
        r.vec_id: [int(v) for v in r.projected_micro.split(",")]
        for r in emb.random_projection(vecs).collect()
    }
    assert len(out[1]) == emb.RP_OUT_DIM
    assert out[2] == [0] * emb.RP_OUT_DIM
    # unit basis vector projects to column 0 of the sign matrix / sqrt(dim),
    # emitted in micro-units as exact integers
    mat = emb._rp_sign_matrix()
    expect = [round(row[0] / math.sqrt(emb.RP_OUT_DIM) * 1e6) for row in mat]
    assert out[1] == expect


def test_set_ops_retained_then_churned(spark):
    orders = spark.createDataFrame(
        [
            (1, 1, dt.datetime(1996, 2, 1)),
            (2, 1, dt.datetime(1997, 2, 1)),   # cust 1: active 96+97, not 98 -> kept
            (3, 2, dt.datetime(1996, 3, 1)),   # cust 2: only 96 -> dropped
            (4, 3, dt.datetime(1996, 4, 1)),
            (5, 3, dt.datetime(1997, 4, 1)),
            (6, 3, dt.datetime(1998, 4, 1)),   # cust 3: still active 98 -> dropped
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    from pagila_etl_airflow_assignment_spark.operators import warehouse

    rows = warehouse.customer_activity_set_ops(orders).collect()
    assert [r.o_custkey for r in rows] == [1]


def test_phonetic_code_blocks_sound_alikes(spark):
    from pagila_etl_airflow_assignment_spark.operators import warehouse

    part = spark.createDataFrame(
        [(1, "red bolt"), (2, "red bolte"), (3, "red washer")],
        "p_partkey long, p_name string",
    )
    rows = warehouse.phonetic_part_match(part).collect()
    assert [(r.name_a, r.name_b) for r in rows] == [("red bolt", "red bolte")]


def test_bfs_hops_and_visited_exclusion(spark):
    # chain 1-2-3-4-5 (each consecutive pair co-ordered twice); source = part 1?
    # degree: interior nodes have degree 2, endpoints 1 -> max-degree tie goes
    # to smallest partkey among degree-2 nodes = 2
    rows = []
    ok = 0
    for a, b in [(1, 2), (2, 3), (3, 4), (4, 5)]:
        rows += [(ok, a), (ok, b)]
        ok += 1
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    from pagila_etl_airflow_assignment_spark.operators import graph

    out = {r.node: r.hops for r in graph.bfs_hop_distance(li).collect()}
    assert out[2] == 0
    assert out[1] == 1 and out[3] == 1
    assert out[4] == 2
    assert out[5] == 3


def test_cuped_preserves_pooled_mean_and_tightens(spark):
    from pagila_etl_airflow_assignment_spark.operators import stats

    # pre-period x strongly predicts post-period y; cohorts differ only
    # through their x (selection), so CUPED pulls the adjusted means together
    rows = []
    for u in range(8):
        base = 10.0 * (u % 4)
        rows.append((u * 2, dt.datetime(2024, 1, 5), u, "a", base))        # pre
        rows.append((u * 2 + 1, dt.datetime(2024, 1, 20), u, "a", base + 1.0))  # post
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.cohort: r for r in stats.cuped_adjustment(ev).collect()}
    assert set(out) == {0, 1}
    # raw means differ (cohort 0 has x in {0,20}, cohort 1 in {10,30})
    assert out[0].mean_raw != out[1].mean_raw
    # theta ~= 1 (y = x + 1), so adjusted means collapse to the same value
    assert abs(out[0].mean_cuped - out[1].mean_cuped) < 1e-6


def test_cusum_flags_sustained_drift(spark):
    from pagila_etl_airflow_assignment_spark.operators import distributions

    # 20 days at 10.0, then 10 days at 11.0: each late day is only +~0.67
    # from the overall level but the cumulative sum exits the band
    rows = []
    eid = 0
    for d in range(1, 31):
        v = 10.0 if d <= 20 else 11.0
        for _ in range(3):
            rows.append((eid, dt.datetime(2024, 1, d), 1, "a", v))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = distributions.cusum_drift(ev).collect()
    assert any(r.is_drift for r in out)
    # retrospective CUSUM centers on the POOLED level: the first days are
    # inside the band, |cusum| peaks AT the change point (day 20), and the
    # chart returns to ~0 by the final day (deviations sum to zero)
    assert not any(r.is_drift for r in out[:3])
    assert out[19].is_drift
    assert not out[-1].is_drift


def test_equidepth_buckets_are_equal_population(spark):
    from pagila_etl_airflow_assignment_spark.operators import distributions

    ev = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1), 1, "a", float(i)) for i in range(100)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = distributions.equidepth_histogram(ev).collect()
    assert len(rows) == 10
    assert all(r.n == 10 for r in rows)
    assert rows[0].lo == 0.0 and rows[-1].hi == 99.0


def test_golden_records_merge_variants(spark):
    from pagila_etl_airflow_assignment_spark.operators import warehouse

    part = spark.createDataFrame(
        [(1, "red bolt"), (2, "red bolte"), (3, "red bolt"), (4, "green gear")],
        "p_partkey long, p_name string",
    )
    rows = {r.golden_name for r in warehouse.part_golden_records(part).collect()}
    out = {r.golden_name: r for r in warehouse.part_golden_records(part).collect()}
    merged = [r for r in out.values() if r.n_variants == 2]
    assert len(merged) == 1
    assert merged[0].variants == "red bolt|red bolte"
    assert merged[0].n_rows == 3  # two 'red bolt' rows + one variant row
    singleton = [r for r in out.values() if r.n_variants == 1]
    assert singleton[0].golden_name == "green gear"


def test_cm_join_size_is_one_sided_overestimate(spark):
    from pagila_etl_airflow_assignment_spark.operators import cmsketch

    rows = []
    for u in range(30):
        for _ in range(u % 3 + 1):
            rows.append((len(rows), dt.datetime(2024, 1, 1), u, "click", 1.0))
        if u % 2 == 0:
            rows.append((len(rows), dt.datetime(2024, 1, 2), u, "purchase", 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = cmsketch.cm_join_size_estimate(ev).collect()[0]
    exact = sum((u % 3 + 1) for u in range(30) if u % 2 == 0)
    assert out.exact_join_size == exact
    assert out.cm_join_size >= out.exact_join_size  # one-sided by construction


def test_bigram_backoff_fires_on_heldout_bigrams(spark):
    from pagila_etl_airflow_assignment_spark.llm import corpus_stats

    docs = spark.createDataFrame(
        [
            (0, "the cat sat"),   # trains: bigrams "the cat", "cat sat"
            (2, "the cat ran"),   # trains: "the cat", "cat ran"
            (1, "the cat sat"),   # scored, all bigrams in-model
            (3, "dog cat sat"),   # "dog cat" unseen -> backoff on c("cat")
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in corpus_stats.bigram_backoff_logprob(docs).collect()}
    assert out[1].n_bigrams == 2
    # doc 3's unseen bigram scores via backoff: 0.4 * c(cat)/N = 0.4*2/6
    import math

    s_seen_the_cat = 2 / 2  # c("the cat")=2 / c("the")=2
    s_cat_sat = 1 / 2
    expect1 = round(-(math.log(s_seen_the_cat) + math.log(s_cat_sat)) / 2, 6)
    assert abs(out[1].avg_neg_logscore - expect1) < 1e-6
    s_backoff = 0.4 * 2 / 6
    expect3 = round(-(math.log(s_backoff) + math.log(s_cat_sat)) / 2, 6)
    assert abs(out[3].avg_neg_logscore - expect3) < 1e-6


def test_seasonal_decompose_recovers_planted_offsets(spark):
    from pagila_etl_airflow_assignment_spark.operators import distributions

    # hour 0 runs 2.0 above hour 1 consistently; level = pooled mean
    rows = []
    for d in range(1, 11):
        rows.append((2 * d, dt.datetime(2024, 1, d, 0), 1, "a", 12.0))
        rows.append((2 * d + 1, dt.datetime(2024, 1, d, 1), 1, "a", 10.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.hr: r for r in distributions.seasonal_decompose_hourly(ev).collect()}
    assert out[0].level == 11.0
    assert out[0].seasonal_offset == 1.0 and out[1].seasonal_offset == -1.0
    assert out[0].resid_var == 0.0 and out[1].resid_var == 0.0


def test_link_prediction_excludes_existing_edges(spark):
    from pagila_etl_airflow_assignment_spark.operators import graph

    # path 1-2-3 (edges (1,2),(2,3) with support 2): candidate non-edge (1,3)
    # shares neighbor 2; jaccard = |{2}| / |{2} u {2}| = 1.0
    rows = []
    ok = 0
    for a, b in [(1, 2), (2, 3)]:
        for _ in range(2):
            rows += [(ok, a), (ok, b)]
            ok += 1
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = graph.link_prediction_jaccard(li).collect()
    assert [(r.x, r.y, r.score) for r in out] == [(1, 3, 1.0)]


def test_fd_profile_flags_violations(spark):
    from pagila_etl_airflow_assignment_spark.operators import profile

    part = spark.createDataFrame(
        [
            (1, "red bolt", "Brand#1", "ECONOMY"),
            (2, "red bolt", "Brand#2", "ECONOMY"),  # name -> brand violated
            (3, "blue gear", "Brand#1", "ECONOMY"),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string",
    )
    out = {r.fd: r for r in profile.fd_profile(part).collect()}
    assert not out["p_name->p_brand"].holds
    assert out["p_name->p_brand"].violating_lhs == 1
    assert out["p_name->p_type"].holds
    assert out["p_partkey->p_name"].holds


def test_similarity_profile_bins_cover_and_count(spark):
    from pagila_etl_airflow_assignment_spark.llm import embeddings as e2

    vecs = spark.createDataFrame(
        [(i, [1.0 if j == i % 4 else 0.0 for j in range(64)]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    rows = e2.similarity_profile(vecs).collect()
    assert sum(r.n_pairs for r in rows) == 5  # 10 vectors -> 5 disjoint pairs
    for r in rows:
        assert 0 <= r.bin < e2.SIM_PROFILE_BINS
        assert r.cos_lo < r.cos_hi


def test_funnel_latency_counts_only_completers(spark):
    from pagila_etl_airflow_assignment_spark.operators import analytics

    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0), 1, "view", 0.0),
            (2, dt.datetime(2024, 1, 1, 1), 1, "click", 0.0),
            (3, dt.datetime(2024, 1, 1, 2), 1, "purchase", 0.0),
            (4, dt.datetime(2024, 1, 2, 0), 2, "view", 0.0),  # never converts
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    row = analytics.funnel_latency(ev).collect()[0]
    assert row.n_converted == 1
    assert row.p50_s == 7200.0 and row.max_s == 7200.0


def test_scd3_tracks_current_and_previous(spark):
    from pagila_etl_airflow_assignment_spark.operators import analytics

    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1), 1, "view", 0.0),
            (2, dt.datetime(2024, 1, 2), 1, "click", 0.0),
            (3, dt.datetime(2024, 1, 3), 1, "purchase", 0.0),
            (4, dt.datetime(2024, 1, 1), 2, "view", 0.0),  # single state
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {r.user_id: r for r in analytics.scd3_user_state(ev).collect()}
    assert out[1].current_state == "purchase"
    assert out[1].previous_state == "click"
    assert out[1].state_since == dt.datetime(2024, 1, 3)
    assert out[2].current_state == "view" and out[2].previous_state is None


def test_psi_zero_for_identical_periods_and_positive_under_shift(spark):
    from pagila_etl_airflow_assignment_spark.operators import distributions

    stable = [
        (i, dt.datetime(2024, 1, 5 + 20 * (i % 2)), 1, "a", float((i // 2) % 10))
        for i in range(200)
    ]
    shifted = [
        (1000 + i, dt.datetime(2024, 1, 5), 1, "b", float(i % 10))
        for i in range(100)
    ] + [
        (2000 + i, dt.datetime(2024, 1, 25), 1, "b", 50.0 + i % 10)
        for i in range(100)
    ]
    ev = spark.createDataFrame(
        stable + shifted,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {r.event_type: r.psi for r in distributions.psi_drift(ev).collect()}
    assert abs(out["a"]) < 0.01        # identical distributions -> ~0
    assert out["b"] > 0.25             # wholesale shift -> retrain territory


def test_abc_classes_follow_cumulative_share(spark):
    from pagila_etl_airflow_assignment_spark.operators import warehouse

    # one dominant part (80% exactly), one mid, one tail
    li = spark.createDataFrame(
        [(1, 80.0, 0.0), (2, 15.0, 0.0), (3, 5.0, 0.0)],
        "l_partkey long, l_extendedprice double, l_discount double",
    )
    part = spark.createDataFrame([(1,), (2,), (3,)], "p_partkey long")
    out = {r.abc_class: r for r in warehouse.abc_classification(li, part).collect()}
    assert out["A"].n_parts == 1 and out["A"].class_revenue == 80.0
    assert out["B"].n_parts == 1 and out["B"].class_revenue == 15.0
    assert out["C"].n_parts == 1


def test_revenue_growth_lag_and_trailing(spark):
    from pagila_etl_airflow_assignment_spark.operators import warehouse

    orders = spark.createDataFrame(
        [
            (1, 1, dt.datetime(2024, 1, 1), 100.0),   # week of Jan 1
            (2, 1, dt.datetime(2024, 1, 8), 150.0),   # next week
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    rows = warehouse.weekly_revenue_growth(orders).collect()
    assert rows[0].wow_growth is None
    assert rows[1].wow_growth == 0.5
    assert rows[1].trailing_4wk_avg == 125.0


def test_cohort_ltv_accumulates_within_cohort(spark):
    from pagila_etl_airflow_assignment_spark.operators import warehouse

    orders = spark.createDataFrame(
        [
            (1, 1, dt.datetime(2024, 1, 5), 10.0),
            (2, 1, dt.datetime(2024, 2, 5), 20.0),
            (3, 2, dt.datetime(2024, 2, 10), 5.0),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    rows = warehouse.cohort_ltv(orders).collect()
    jan = [r for r in rows if str(r.cohort) == "2024-01-01"]
    assert [(r.age_months, r.cumulative_ltv) for r in jan] == [(0, 10.0), (1, 30.0)]
    feb = [r for r in rows if str(r.cohort) == "2024-02-01"]
    assert [(r.age_months, r.cumulative_ltv) for r in feb] == [(0, 5.0)]


def test_position_attribution_u_shape(spark):
    from pagila_etl_airflow_assignment_spark.operators import temporal

    # three touches in hours 1,2,3 then purchase: 0.4 / 0.2 / 0.4
    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 1), 1, "click", 0.0),
            (2, dt.datetime(2024, 1, 1, 2), 1, "click", 0.0),
            (3, dt.datetime(2024, 1, 1, 3), 1, "click", 0.0),
            (4, dt.datetime(2024, 1, 1, 4), 1, "purchase", 9.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = {r.click_hour: r.attributed_purchases for r in temporal.position_attribution(ev).collect()}
    assert out == {1: 0.4, 2: 0.2, 3: 0.4}


def test_new_vs_returning_splits_by_first_month(spark):
    from pagila_etl_airflow_assignment_spark.operators import warehouse

    orders = spark.createDataFrame(
        [
            (1, 1, dt.datetime(2024, 1, 5), 10.0),
            (2, 1, dt.datetime(2024, 2, 5), 20.0),   # returning in Feb
            (3, 2, dt.datetime(2024, 2, 10), 5.0),   # new in Feb
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    out = {str(r.month): r for r in warehouse.new_vs_returning(orders).collect()}
    assert out["2024-01-01"].new_revenue == 10.0
    assert out["2024-02-01"].new_revenue == 5.0
    assert out["2024-02-01"].returning_revenue == 20.0
    assert out["2024-02-01"].new_customers == 1


def test_discount_lift_recovers_planted_slope(spark):
    from pagila_etl_airflow_assignment_spark.operators import warehouse

    # qty = 100*discount + 1 exactly -> slope 100
    li = spark.createDataFrame(
        [(1, d / 100, 100 * (d / 100) + 1.0) for d in range(0, 10)],
        "l_partkey long, l_discount double, l_quantity double",
    )
    part = spark.createDataFrame([(1, "B1")], "p_partkey long, p_brand string")
    row = warehouse.discount_quantity_lift(li, part).collect()[0]
    assert abs(row.qty_per_discount_unit - 100.0) < 1e-6


def test_hybrid_pairs_merge_provenance(spark):
    from pagila_etl_airflow_assignment_spark.llm import dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # lexical dup of 1
            (3, "totally different words here now"),
        ],
        "doc_id long, text string",
    )
    v = [1.0] + [0.0] * 63
    vecs = spark.createDataFrame(
        [(1, v, 0), (2, [0.0] * 63 + [1.0], 0), (3, v, 0)],  # 1~3 semantic
        "vec_id long, embedding array<float>, label int",
    )
    out = {(r.doc_a, r.doc_b): (r.lexical, r.semantic)
           for r in dedup.hybrid_near_pairs(docs, vecs).collect()}
    assert out[(1, 2)] == (True, False)
    assert out[(1, 3)] == (False, True)


def test_cross_source_matrix_counts_pairs(spark):
    from pagila_etl_airflow_assignment_spark.llm import dedup

    docs = spark.createDataFrame(
        [
            (1, "same text", "srcA"),
            (2, "same text", "srcB"),
            (3, "same text", "srcB"),
            (4, "unique", "srcA"),
        ],
        "doc_id long, text string, source string",
    )
    out = {(r.source_a, r.source_b): r.dup_pairs
           for r in dedup.cross_source_dup_matrix(docs).collect()}
    assert out[("srcA", "srcB")] == 2   # doc1 x {doc2, doc3}
    assert out[("srcB", "srcB")] == 1   # doc2 x doc3
    assert ("srcA", "srcA") not in out  # no within-A dup


def test_char_entropy_orders_degenerate_below_diverse(spark):
    from pagila_etl_airflow_assignment_spark.llm import text as t2

    docs = spark.createDataFrame(
        [(1, "aaaaaaaaaa"), (2, "abcdefghij")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.char_bigram_entropy for r in t2.char_entropy(docs).collect()}
    assert out[1] == 0.0            # single repeated bigram
    assert out[2] > 2.0             # 9 distinct bigrams -> ln(9) ~ 2.197


def test_burst_collapse_islands(spark):
    from pagila_etl_airflow_assignment_spark.operators import sequences

    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "click", 0.0),
            (2, dt.datetime(2024, 1, 1, 0, 0, 30), 1, "click", 0.0),  # same burst
            (3, dt.datetime(2024, 1, 1, 0, 5, 0), 1, "click", 0.0),   # new burst
            (4, dt.datetime(2024, 1, 1, 0, 0, 10), 1, "view", 0.0),   # other type
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = sequences.burst_collapse(ev).collect()
    clicks = [r for r in rows if r.event_type == "click"]
    assert [r.n_events for r in clicks] == [2, 1]
    assert len([r for r in rows if r.event_type == "view"]) == 1


def test_activity_streaks_longest_run(spark):
    from pagila_etl_airflow_assignment_spark.operators import sequences

    days = [1, 2, 3, 7, 8]  # longest = 3 days
    ev = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, d, 10), 1, "click", 0.0) for i, d in enumerate(days)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    row = sequences.activity_streaks(ev).collect()[0]
    assert row.longest_streak_days == 3
    assert str(row.streak_start) == "2024-01-01" and str(row.streak_end) == "2024-01-03"


def test_out_of_order_audit_measures_lateness(spark):
    from pagila_etl_airflow_assignment_spark.operators import sequences

    # arrival order (event_id): t=100s, t=40s (60s late), t=200s
    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 1, 40), 1, "click", 0.0),
            (2, dt.datetime(2024, 1, 1, 0, 0, 40), 1, "click", 0.0),
            (3, dt.datetime(2024, 1, 1, 0, 3, 20), 1, "click", 0.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    row = sequences.out_of_order_audit(ev).collect()[0]
    assert row.n == 3 and row.n_late == 1
    assert row.max_lateness_s == 60.0


def test_discrete_hazard_at_risk_shrinks(spark):
    from pagila_etl_airflow_assignment_spark.operators import analytics

    # 3 signups; user 1 converts day 0, user 2 day 2, user 3 censored
    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "signup", 0.0),
        (2, dt.datetime(2024, 1, 1, 5), 1, "purchase", 0.0),
        (3, dt.datetime(2024, 1, 1), 2, "signup", 0.0),
        (4, dt.datetime(2024, 1, 3), 2, "purchase", 0.0),
        (5, dt.datetime(2024, 1, 1), 3, "signup", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.day: r for r in analytics.discrete_hazard(ev).collect()}
    assert out[0].n_at_risk == 3 and out[0].n_converted == 1
    assert out[1].n_at_risk == 2 and out[1].n_converted == 0
    assert out[2].n_at_risk == 2 and out[2].n_converted == 1
    assert out[3].n_at_risk == 1  # censored user stays at risk
    assert out[2].hazard == 0.5


def test_wau_overlap_jaccard(spark):
    from pagila_etl_airflow_assignment_spark.operators import analytics

    # week1 Mondays 2024-01-01; week2 2024-01-08. users {1,2} then {2,3}
    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 2), 1, "click", 0.0),
            (2, dt.datetime(2024, 1, 3), 2, "click", 0.0),
            (3, dt.datetime(2024, 1, 9), 2, "click", 0.0),
            (4, dt.datetime(2024, 1, 10), 3, "click", 0.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    rows = analytics.wau_overlap(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_both == 1 and r.n_cur == 2 and r.n_prev == 2
    assert abs(r.jaccard - 1 / 3) < 1e-6


def test_woe_separates_predictive_bins(spark):
    from pagila_etl_airflow_assignment_spark.operators import stats

    # low-value clicks never convert, high-value always do
    rows = []
    eid = 0
    for u in range(20):
        v = 1.0 if u < 10 else 100.0
        rows.append((eid, dt.datetime(2024, 1, 1, 1), u, "click", v)); eid += 1
        if u >= 10:
            rows.append((eid, dt.datetime(2024, 1, 2), u, "purchase", 5.0)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = stats.woe_iv_binning(ev).collect()
    assert out[0].woe < 0 < out[-1].woe  # low bins bad, high bins good
    assert sum(r.iv_contrib for r in out) > 0.3  # strongly predictive


def test_benford_digit_extraction_and_shares(spark):
    from pagila_etl_airflow_assignment_spark.operators import profile

    orders = spark.createDataFrame(
        [(i, 1, dt.datetime(2024, 1, 1), v) for i, v in
         enumerate([123.45, 0.019, 250.0, 1999.0, 0.5])],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    out = {r.d: r.n for r in profile.benford_audit(orders).collect()}
    assert out == {1: 3, 2: 1, 5: 1}  # 123->1, 0.019->1, 250->2, 1999->1, 0.5->5


def test_prop_ztest_detects_lopsided_conversion(spark):
    from pagila_etl_airflow_assignment_spark.operators import stats

    rows = []
    eid = 0
    for u in range(40):
        rows.append((eid, dt.datetime(2024, 1, 1), u, "click", 1.0)); eid += 1
        if u % 2 == 0:  # only cohort A (even users) converts
            rows.append((eid, dt.datetime(2024, 1, 2), u, "purchase", 1.0)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    out = {r.event_type: r for r in stats.proportion_ztest(ev).collect()}
    assert out["click"].z_stat > 3.0  # total separation -> large z


def test_ann_recall_is_one_when_methods_agree(spark):
    from pagila_etl_airflow_assignment_spark.llm import similarity

    # orthonormal-ish corpus where every method finds the same neighbors
    vecs = spark.createDataFrame(
        [(i, [(1.0 if j == i % 8 else 0.01 * ((i + j) % 3)) for j in range(64)])
         for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    rows = similarity.lsh_recall_at_k(vecs, [0, 1]).collect()
    for r in rows:
        assert r.n_true == 5
        assert 0.0 <= r.recall_at_k <= 1.0


def test_langid_confusion_diagonal_dominates(spark):
    from pagila_etl_airflow_assignment_spark.llm import text as t3

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in the house with a hat", "en"),
            (2, "le chat et le chien dans la maison pour les amis", "fr"),
            (3, "xyzzy qwerty", "en"),  # no lexicon hits -> 'und'
        ],
        "doc_id long, text string, lang string",
    )
    out = {(r.true_lang, r.pred_lang): r.n for r in t3.langid_confusion(docs).collect()}
    assert out[("en", "en")] == 1
    assert out[("fr", "fr")] == 1
    assert out[("en", "und")] == 1


def test_sla_rate_counts_first_ship(spark):
    from pagila_etl_airflow_assignment_spark.operators import warehouse

    orders = spark.createDataFrame(
        [(1, dt.datetime(1996, 1, 1), "1-URGENT"), (2, dt.datetime(1996, 1, 1), "1-URGENT")],
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, dt.datetime(1996, 1, 10)),  # within 30d
            (1, dt.datetime(1996, 6, 1)),   # later line ignored (first ship counts)
            (2, dt.datetime(1996, 3, 15)),  # outside 30d
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    row = warehouse.sla_compliance(orders, li).collect()[0]
    assert row.n_orders == 2 and row.n_within_sla == 1 and row.sla_rate == 0.5
