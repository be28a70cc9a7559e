"""Round-8 operators: hand-computed fixtures pinning the statistics the
DuckDB oracles certify at corpus scale (SURVEY.md §2 L-392..L-399)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F


def _events(spark, rows):
    """rows: (user_id, event_type, ts_str_or_dt, value)"""
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


# --- Spearman (L-393) ----------------------------------------------------------------


def test_spearman_perfect_monotone(spark):
    from pagila_etl_airflow_assignment_spark.operators.stats import spearman_daily

    rows = []
    for d, (nx, ny) in enumerate([(1, 2), (2, 4), (3, 9)], start=1):
        day = f"2024-01-0{d}"
        rows += [(1, "click", f"{day} 10:00:00", 0.0)] * nx
        rows += [(1, "error", f"{day} 11:00:00", 0.0)] * ny
    r = spearman_daily(_events(spark, rows)).collect()[0]
    assert (r.n_days, r.rho_milli) == (3, 1000)


def test_spearman_ties_use_average_ranks(spark):
    """x = (1,1,2), y = (2,2,1): average-rank Pearson gives exactly -1
    (the 6*sum(d^2) shortcut would NOT — it has no tie correction)."""
    from pagila_etl_airflow_assignment_spark.operators.stats import spearman_daily

    rows = []
    for d, (nx, ny) in enumerate([(1, 2), (1, 2), (2, 1)], start=1):
        day = f"2024-01-0{d}"
        rows += [(1, "click", f"{day} 10:00:00", 0.0)] * nx
        rows += [(1, "error", f"{day} 11:00:00", 0.0)] * ny
    r = spearman_daily(_events(spark, rows)).collect()[0]
    assert r.rho_milli == -1000
    # doubled-rank dispersion: x ranks (1.5,1.5,3) -> r2 = (3,3,6),
    # var2x = 3*54 - 144 = 18; same for y
    assert (r.var2x, r.var2y) == (18, 18)


# --- runs test (L-394) ---------------------------------------------------------------


def test_runs_test_hand_computed(spark):
    """Daily counts (1,1,2,2,3,3): lower median = 2, median days dropped,
    signs (-,-,+,+) -> R=2, a=b=2, mu=3, sigma=sqrt(2/3), z=-1225 milli."""
    from pagila_etl_airflow_assignment_spark.operators.stats import runs_test_daily

    rows = []
    for d, c in enumerate([1, 1, 2, 2, 3, 3], start=1):
        rows += [(1, "view", f"2024-01-0{d} 10:00:00", 0.0)] * c
    r = runs_test_daily(_events(spark, rows)).collect()[0]
    assert (r.n_above, r.n_below, r.runs) == (2, 2, 2)
    want = round(1000.0 * (2 - 3) / math.sqrt(2.0 / 3.0))
    assert r.z_milli == want


def test_runs_test_alternating_max_runs(spark):
    """(1,5,1,5,1,5,1,5): median 1 dropped... pick (1,5,2,5,1,5,2,5):
    median(lower, k=4) of sorted (1,1,2,2,5,5,5,5) = 2 -> drop the 2s,
    signs (-,+,+,-,+,+) -> runs=4."""
    from pagila_etl_airflow_assignment_spark.operators.stats import runs_test_daily

    rows = []
    for d, c in enumerate([1, 5, 2, 5, 1, 5, 2, 5], start=1):
        rows += [(1, "view", f"2024-01-0{d} 10:00:00", 0.0)] * c
    r = runs_test_daily(_events(spark, rows)).collect()[0]
    assert (r.n_above, r.n_below, r.runs) == (4, 2, 4)


# --- Theil index (L-395) -------------------------------------------------------------


def test_theil_zero_for_equal_users(spark):
    from pagila_etl_airflow_assignment_spark.operators.stats import theil_index_users

    rows = [(1, "buy", "2024-01-01 10:00:00", 5.0), (2, "buy", "2024-01-01 11:00:00", 5.0)]
    r = theil_index_users(_events(spark, rows)).collect()[0]
    assert (r.n_users, r.total_cents, r.theil_milli, r.theil_norm_milli) == (
        2,
        1000,
        0,
        0,
    )


def test_theil_hand_computed(spark):
    """Users with 100 and 300 cents: T = 0.5*(0.5*ln0.5 + 1.5*ln1.5)."""
    from pagila_etl_airflow_assignment_spark.operators.stats import theil_index_users

    rows = [(1, "buy", "2024-01-01 10:00:00", 1.0), (2, "buy", "2024-01-01 11:00:00", 3.0)]
    r = theil_index_users(_events(spark, rows)).collect()[0]
    t = 0.5 * (0.5 * math.log(0.5) + 1.5 * math.log(1.5))
    assert r.theil_milli == round(1000.0 * t)
    assert r.theil_norm_milli == round(1000.0 * t / math.log(2.0))


# --- EVT return level (L-397) --------------------------------------------------------


def test_evt_return_level_hand_computed(spark):
    """Daily maxima 100/200/300 cents: m=200, s=100; Gumbel MoM + RL30."""
    from pagila_etl_airflow_assignment_spark.operators.stats import evt_return_level

    rows = []
    for d, mx in enumerate([1.00, 2.00, 3.00], start=1):
        day = f"2024-01-0{d}"
        rows.append((1, "buy", f"{day} 10:00:00", mx))
        rows.append((1, "buy", f"{day} 11:00:00", 0.50))  # non-max noise
    r = evt_return_level(_events(spark, rows)).collect()[0]
    beta = 100.0 * math.sqrt(6.0) / math.pi
    mu = 200.0 - 0.5772156649015329 * beta
    rl = mu - beta * math.log(-math.log(1.0 - 1.0 / 30.0))
    assert (r.n_days, r.max_mean_centi, r.max_sd_centi) == (3, 200, 100)
    assert r.rl_centi == round(rl)


# --- Yule's K (L-396) ----------------------------------------------------------------


def test_yule_k_hand_computed(spark):
    """'a a b': N=3, types {a:2, b:1}, s2=5 -> K_milli = 1e7*2/9 = 2222222.
    All-distinct text -> K = 0."""
    from pagila_etl_airflow_assignment_spark.llm.corpus_stats import yule_k

    docs = spark.createDataFrame(
        [
            (1, "a a b", "en", "s1", 5),
            (2, "x y z", "en", "s2", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.source: r for r in yule_k(docs).collect()}
    assert (got["s1"].n_tokens, got["s1"].n_types) == (3, 2)
    assert got["s1"].yule_k_milli == round(1e7 * 2 / 9)
    assert got["s2"].yule_k_milli == 0


# --- Q12 shape (L-392) ---------------------------------------------------------------


def test_shipmode_priority_counts(spark):
    from pagila_etl_airflow_assignment_spark.operators.tpch_shapes import (
        shipmode_priority_counts,
    )

    li = spark.createDataFrame(
        [
            (1, "A", "F", "1997-03-01"),
            (2, "A", "F", "1997-03-02"),
            (3, "N", "O", "1997-03-03"),
            (4, "N", "O", "1996-03-03"),  # outside the year predicate
        ],
        "l_orderkey long, l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    orders = spark.createDataFrame(
        [(1, "1-URGENT"), (2, "5-LOW"), (3, "2-HIGH"), (4, "2-HIGH")],
        "o_orderkey long, o_orderpriority string",
    )
    got = {
        (r.l_returnflag, r.l_linestatus): (r.high_line_count, r.low_line_count)
        for r in shipmode_priority_counts(li, orders).collect()
    }
    assert got == {("A", "F"): (1, 1), ("N", "O"): (1, 0)}


# --- brand transitions (L-399) -------------------------------------------------------


def test_brand_transition_matrix(spark):
    """cust 1: orders A -> B -> B gives A->B and B->B; dominant brand by
    quantity with lexicographic tie-break."""
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        brand_transition_matrix,
    )

    li = spark.createDataFrame(
        [
            # order 1: brand A dominates (qty 5 vs 2)
            (1, 101, 5.0),
            (1, 102, 2.0),
            # order 2: tie 3 vs 3 -> smallest brand wins = A? no: parts 102
            # (B) and 103 (B) both brand B -> B with 6
            (2, 102, 3.0),
            (2, 103, 3.0),
            # order 3: brand B
            (3, 103, 4.0),
        ],
        "l_orderkey long, l_partkey long, l_quantity double",
    )
    part = spark.createDataFrame(
        [(101, "Brand#A"), (102, "Brand#B"), (103, "Brand#B")],
        "p_partkey long, p_brand string",
    )
    orders = spark.createDataFrame(
        [
            (1, 9, "2024-01-01"),
            (2, 9, "2024-01-05"),
            (3, 9, "2024-01-09"),
        ],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    got = {
        (r.prev_brand, r.next_brand): (r.n_pairs, r.share_milli)
        for r in brand_transition_matrix(li, orders, part).collect()
    }
    assert got == {
        ("Brand#A", "Brand#B"): (1, 1000),
        ("Brand#B", "Brand#B"): (1, 1000),
    }


def test_brand_transition_tie_breaks_to_smallest_brand(spark):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        brand_transition_matrix,
    )

    li = spark.createDataFrame(
        [(1, 101, 3.0), (1, 102, 3.0), (2, 102, 1.0)],
        "l_orderkey long, l_partkey long, l_quantity double",
    )
    part = spark.createDataFrame(
        [(101, "Brand#A"), (102, "Brand#B")], "p_partkey long, p_brand string"
    )
    orders = spark.createDataFrame(
        [(1, 9, "2024-01-01"), (2, 9, "2024-01-02")],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    got = [
        (r.prev_brand, r.next_brand)
        for r in brand_transition_matrix(li, orders, part).collect()
    ]
    assert got == [("Brand#A", "Brand#B")]


# --- Kish neff (L-398) ---------------------------------------------------------------


def test_kish_neff_equal_sizes_deff_one(spark):
    """Equal-size docs -> equal weights -> neff == n_draws, deff == 1.000."""
    from pagila_etl_airflow_assignment_spark.llm.sampling import kish_neff

    docs = spark.createDataFrame(
        [(i, "t", "en", "s", 250) for i in range(1, 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = kish_neff(docs).collect()[0]
    assert r.n_draws == 50
    assert r.neff_milli == 50 * 1000
    assert r.deff_milli == 1000


def test_kish_neff_skewed_sizes_deff_above_one(spark):
    from pagila_etl_airflow_assignment_spark.llm.sampling import kish_neff

    docs = spark.createDataFrame(
        [(1, "t", "en", "s", 900), (2, "t", "en", "s", 50), (3, "t", "en", "s", 50)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = kish_neff(docs).collect()[0]
    assert r.deff_milli > 1000  # unequal weights always inflate variance


# --- Mann-Kendall (L-401) --------------------------------------------------------------


def test_mann_kendall_increasing_trend(spark):
    """counts (1,2,3): S=3, no ties -> var18 = 3*2*11 = 66, z continuity-
    corrected."""
    from pagila_etl_airflow_assignment_spark.operators.stats import mann_kendall_daily

    rows = []
    for d, c in enumerate([1, 2, 3], start=1):
        rows += [(1, "view", f"2024-01-0{d} 10:00:00", 0.0)] * c
    r = mann_kendall_daily(_events(spark, rows)).collect()[0]
    assert (r.n_days, r.s_stat, r.var18) == (3, 3, 66)
    assert r.z_milli == round(1000.0 * 2 / math.sqrt(66 / 18.0))


def test_mann_kendall_all_tied_is_zero(spark):
    from pagila_etl_airflow_assignment_spark.operators.stats import mann_kendall_daily

    rows = []
    for d in range(1, 4):
        rows += [(1, "view", f"2024-01-0{d} 10:00:00", 0.0)] * 2
    r = mann_kendall_daily(_events(spark, rows)).collect()[0]
    assert (r.s_stat, r.var18, r.z_milli) == (0, 0, 0)


# --- Theil-Sen slope (L-402) -------------------------------------------------------------


def test_sen_slope_linear_series(spark):
    from pagila_etl_airflow_assignment_spark.operators.stats import sen_slope_daily

    rows = []
    for d, c in enumerate([1, 2, 3], start=1):
        rows += [(1, "view", f"2024-01-0{d} 10:00:00", 0.0)] * c
    r = sen_slope_daily(_events(spark, rows)).collect()[0]
    assert (r.n_pairs, r.sen_slope_milli) == (3, 1000)


def test_sen_slope_even_pairs_median(spark):
    """counts (1,2,4,4): slopes milli sorted (0,1000,1000,1000,1500,2000),
    lower/upper median both 1000."""
    from pagila_etl_airflow_assignment_spark.operators.stats import sen_slope_daily

    rows = []
    for d, c in enumerate([1, 2, 4, 4], start=1):
        rows += [(1, "view", f"2024-01-0{d} 10:00:00", 0.0)] * c
    r = sen_slope_daily(_events(spark, rows)).collect()[0]
    assert (r.n_pairs, r.sen_slope_milli) == (6, 1000)


# --- Poisson gap check (L-400) -----------------------------------------------------------


def test_poisson_gap_check_hand_computed(spark):
    """One user, gaps exactly 1s/1s/1s: mean 1e6 us, single bit-20 bin,
    KS = |1 - F_exp(2^20 - 1)|."""
    from pagila_etl_airflow_assignment_spark.operators.stats import poisson_gap_check

    rows = [
        (1, "click", "2024-01-01 10:00:00", 0.0),
        (1, "click", "2024-01-01 10:00:01", 0.0),
        (1, "click", "2024-01-01 10:00:02", 0.0),
        (1, "click", "2024-01-01 10:00:03", 0.0),
    ]
    df = spark.createDataFrame(
        [(i + 1, *r) for i, r in enumerate(rows)],
        "event_id long, user_id long, event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = poisson_gap_check(df).collect()[0]
    assert (r.event_type, r.n_gaps, r.mean_gap_micros) == ("click", 3, 1000000)
    want = abs(1.0 - (1.0 - math.exp(-(2**20 - 1) * 3 / 3000000.0)))
    assert r.ks_binned_milli == round(1000.0 * want)


# --- Burrows' delta (L-403) ---------------------------------------------------------------


def test_burrows_delta_two_sources(spark):
    """s1 = 'a a b', s2 = 'a b b': per-word z gap is sqrt(2) for both words
    -> delta = 1414 milli; identical sources -> 0."""
    from pagila_etl_airflow_assignment_spark.llm.corpus_stats import burrows_delta

    docs = spark.createDataFrame(
        [
            (1, "a a b", "en", "s1", 5),
            (2, "a b b", "en", "s2", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = burrows_delta(docs).collect()
    assert len(r) == 1
    assert (r[0].source_a, r[0].source_b, r[0].n_terms) == ("s1", "s2", 2)
    assert r[0].delta_milli == 1414

    same = spark.createDataFrame(
        [
            (1, "a a b", "en", "s1", 5),
            (2, "a a b", "en", "s2", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert burrows_delta(same).collect()[0].delta_milli == 0


# --- G2 keyness (L-406) ---------------------------------------------------------------


def test_keyness_g2_distinctive_term_tops(spark):
    """'zzz' appears 5x, only in s1 -> top keyword for s1 with the
    hand-computed G2 (b-half contributes 0)."""
    from pagila_etl_airflow_assignment_spark.llm.corpus_stats import keyness_g2

    s1 = "zzz zzz zzz zzz zzz " + "common word here now yes " * 4
    s2 = "common word here now yes " * 8
    docs = spark.createDataFrame(
        [(1, s1.strip(), "en", "s1", 5), (2, s2.strip(), "en", "s2", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = keyness_g2(docs).collect()
    top_s1 = [r for r in got if r.source == "s1"][0]
    assert top_s1.term == "zzz" and top_s1.f_source == 5
    a, cw, ts, tc = 5, 5, 25, 65
    g2 = 2.0 * (a * math.log(a * tc / (cw * ts)))
    assert top_s1.g2_micro == round(1e6 * g2)


# --- price index (L-404) ---------------------------------------------------------------


def test_price_index_base_month_is_1000(spark):
    """part 1: 10 units @ 10.00 in m1, 20 units @ 11.00 in m2 -> all three
    indexes 1100 at m2 (single part => L = P = F); base month pins 1000."""
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        price_index_monthly,
    )

    li = spark.createDataFrame(
        [
            (1, 1, 100.00, 10.0, "2024-01-05"),
            (2, 1, 220.00, 20.0, "2024-02-05"),
        ],
        "l_orderkey long, l_partkey long, l_extendedprice double, "
        "l_quantity double, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    got = {str(r.month): r for r in price_index_monthly(li).collect()}
    m1, m2 = got["2024-01-01"], got["2024-02-01"]
    assert (m1.laspeyres_milli, m1.paasche_milli, m1.fisher_milli) == (
        1000,
        1000,
        1000,
    )
    assert (m2.laspeyres_milli, m2.paasche_milli, m2.fisher_milli) == (
        1100,
        1100,
        1100,
    )


def test_price_index_matched_model_drops_new_parts(spark):
    """a part absent from the base month never enters any index."""
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        price_index_monthly,
    )

    li = spark.createDataFrame(
        [
            (1, 1, 100.00, 10.0, "2024-01-05"),
            (2, 1, 100.00, 10.0, "2024-02-05"),
            (3, 2, 999.00, 1.0, "2024-02-20"),  # new part, no base row
        ],
        "l_orderkey long, l_partkey long, l_extendedprice double, "
        "l_quantity double, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    got = {str(r.month): r for r in price_index_monthly(li).collect()}
    assert got["2024-02-01"].n_parts == 1
    assert got["2024-02-01"].laspeyres_milli == 1000


# --- Hill tail index (L-405) -------------------------------------------------------------


def test_hill_tail_index_mirror_model(spark):
    """Replicate the exact quantized computation in Python on a
    deterministic Pareto-ish series."""
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        hill_tail_index,
    )

    vals = [round(100000.0 / ((i + 1) ** 0.5), 2) for i in range(250)]
    orders = spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(vals)],
        "o_orderkey long, o_totalprice double",
    )
    got = {r.k: r for r in hill_tail_index(orders).collect()}
    cents = sorted(
        (round(v * 100) for v in vals), reverse=True
    )
    for k in (50, 100, 200):
        pool = cents[: k + 1]
        x_ref = pool[-1]
        s_nano = sum(round(1e9 * math.log(c / x_ref)) for c in pool[:k])
        want = round(1000.0 * k / (s_nano / 1e9))
        assert got[k].x_ref_cents == x_ref
        assert got[k].hill_alpha_milli == want


def test_hill_tail_index_degenerate_equal_values(spark):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        hill_tail_index,
    )

    orders = spark.createDataFrame(
        [(i + 1, 10.0) for i in range(300)], "o_orderkey long, o_totalprice double"
    )
    for r in hill_tail_index(orders).collect():
        assert r.hill_alpha_milli == 0
