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


# --- Granger-lite (L-407) ---------------------------------------------------------------


def _granger_mirror(xs, ys):
    """Mirror the engine's exact centered-moment / Frisch-Waugh chain."""
    pairs = [(ys[t], ys[t - 1], xs[t - 1]) for t in range(1, len(ys))]
    m = len(pairs)
    sy = sum(p[0] for p in pairs); s1 = sum(p[1] for p in pairs)
    s2 = sum(p[2] for p in pairs)
    syy = sum(p[0] * p[0] for p in pairs); s11 = sum(p[1] * p[1] for p in pairs)
    s22 = sum(p[2] * p[2] for p in pairs); s1y = sum(p[1] * p[0] for p in pairs)
    s2y = sum(p[2] * p[0] for p in pairs); s12 = sum(p[1] * p[2] for p in pairs)
    cyy = m * syy - sy * sy; c11 = m * s11 - s1 * s1; c22 = m * s22 - s2 * s2
    c1y = m * s1y - s1 * sy; c2y = m * s2y - s2 * sy; c12 = m * s12 - s1 * s2
    if c11 <= 0:
        return 0
    rss_a = cyy - c1y * c1y / c11
    num2 = c2y - c12 * c1y / c11
    den2 = c22 - c12 * c12 / c11
    rss_b = rss_a - num2 * num2 / den2 if den2 > 1e-9 else rss_a
    extra = num2 * num2 / den2 if den2 > 1e-9 else 0.0
    if m <= 3 or rss_b <= 1e-9:
        return 0
    return round(1000.0 * extra / (rss_b / (m - 3)))


def test_granger_lite_mirror_model(spark):
    """Clicks lead errors by one day (plus wiggle): the engine must equal
    the Python mirror of the same exact-moment chain, and the leading
    direction must dominate the reverse."""
    from pagila_etl_airflow_assignment_spark.operators.stats import granger_lite_daily

    xs = [3, 7, 2, 9, 4, 8, 1, 6, 5, 7, 3, 9]
    ys = [0] + [x + (i % 2) for i, x in enumerate(xs[:-1], start=1)]
    rows = []
    for d, (x, y) in enumerate(zip(xs, ys), start=1):
        day = f"2024-01-{d:02d}"
        rows += [(1, "click", f"{day} 10:00:00", 0.0)] * x
        rows += [(1, "error", f"{day} 11:00:00", 0.0)] * y
    got = {r.direction: r for r in granger_lite_daily(_events(spark, rows)).collect()}
    fwd, rev = got["clicks->errors"], got["errors->clicks"]
    assert fwd.n_obs == len(xs) - 1
    assert fwd.f_milli == _granger_mirror(xs, ys)
    assert rev.f_milli == _granger_mirror(ys, xs)
    assert fwd.f_milli > rev.f_milli  # the planted lead direction wins


# --- Brown-Forsythe (L-408) -----------------------------------------------------------


def test_brown_forsythe_hand_computed(spark):
    """A = (0.01,0.02,0.03), B = (0.10,0.20,0.30) cents: med-deviations
    z_A=(1,0,1), z_B=(10,0,10) -> F = 54 / (67.333/4) with the engine's
    micro quantization."""
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        brown_forsythe_test,
    )

    rows = [
        (1, "click", "2024-01-01 10:00:00", 0.01),
        (1, "click", "2024-01-01 10:01:00", 0.02),
        (1, "click", "2024-01-01 10:02:00", 0.03),
        (1, "error", "2024-01-01 10:03:00", 0.10),
        (1, "error", "2024-01-01 10:04:00", 0.20),
        (1, "error", "2024-01-01 10:05:00", 0.30),
    ]
    r = brown_forsythe_test(_events(spark, rows)).collect()[0]
    assert (r.k_groups, r.n_total) == (2, 6)
    bss_m = round(1e6 * 2 * 2 / 3) + round(1e6 * 20 * 20 / 3)
    wss_m = round(1e6 * (2 - 2 * 2 / 3)) + round(1e6 * (200 - 20 * 20 / 3))
    f = ((bss_m / 1e6 - 22 * 22 / 6) / 1) / ((wss_m / 1e6) / 4)
    assert r.f_milli == round(1000.0 * f)


def test_brown_forsythe_equal_spreads_near_zero(spark):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        brown_forsythe_test,
    )

    rows = []
    for i, v in enumerate([0.01, 0.02, 0.03]):
        rows.append((1, "click", f"2024-01-01 10:0{i}:00", v))
        rows.append((1, "error", f"2024-01-01 11:0{i}:00", v + 0.50))
    r = brown_forsythe_test(_events(spark, rows)).collect()[0]
    assert r.f_milli == 0  # identical spreads around different medians


# --- Mantel-Haenszel (L-409) ---------------------------------------------------------


def test_mantel_haenszel_single_stratum_equals_pooled(spark):
    """All users light-activity -> one stratum -> OR_MH == pooled OR.
    treat (odd ids): 1 conv of 2; ctrl: 1 of 2 -> OR = 1.000."""
    from pagila_etl_airflow_assignment_spark.operators.stats import mantel_haenszel_or

    rows = [
        (1, "purchase", "2024-01-01 10:00:00", 0.0),
        (3, "view", "2024-01-01 10:00:00", 0.0),
        (2, "purchase", "2024-01-01 10:00:00", 0.0),
        (4, "view", "2024-01-01 10:00:00", 0.0),
    ]
    r = mantel_haenszel_or(_events(spark, rows)).collect()[0]
    assert r.n_strata == 1
    assert r.or_pooled_milli == r.or_mh_milli == 1000


def test_mantel_haenszel_mirror_two_strata(spark):
    """Heavy users (>=67 events) land in stratum 1; mirror the micro-
    quantized MH chain in Python."""
    from pagila_etl_airflow_assignment_spark.operators.stats import mantel_haenszel_or

    rows = []
    # stratum 0: 8 light users, odd=treat; conv pattern
    light = {1: 1, 3: 1, 5: 0, 7: 0, 2: 1, 4: 0, 6: 0, 8: 0}
    for uid, conv in light.items():
        rows.append((uid, "purchase" if conv else "view", "2024-01-01 10:00:00", 0.0))
    # stratum 1: 4 heavy users (70 events each)
    heavy = {11: 1, 13: 0, 12: 0, 14: 0}
    for uid, conv in heavy.items():
        for i in range(69):
            rows.append((uid, "view", "2024-01-02 10:00:00", 0.0))
        rows.append((uid, "purchase" if conv else "view", "2024-01-02 11:00:00", 0.0))
    r = mantel_haenszel_or(_events(spark, rows)).collect()[0]
    assert r.n_strata == 2
    # mirror: stratum cells (a=conv_treat, b, c=conv_ctrl, d)
    cells = [(2, 2, 1, 3), (1, 1, 0, 2)]
    ad = sum(round(1e6 * a * d / (a + b + c + d)) for a, b, c, d in cells)
    bc = sum(round(1e6 * b * c / (a + b + c + d)) for a, b, c, d in cells)
    assert r.or_mh_milli == round(1000.0 * ad / bc)
    ta, tb, tc, td = (sum(x) for x in zip(*cells))
    assert r.or_pooled_milli == round(1000.0 * ta * td / (tb * tc))


# --- Theil decomposition (L-410) --------------------------------------------------------


def test_theil_decomposition_identity_and_degenerate(spark):
    """One customer per nation -> within = 0, between = total; the
    additive identity holds to quantization."""
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        theil_decomposition_nation,
    )

    orders = spark.createDataFrame(
        [(1, 101, 100.00), (2, 102, 300.00)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(101, 1), (102, 2)], "c_custkey long, c_nationkey long"
    )
    nation = spark.createDataFrame(
        [(1, "AAA"), (2, "BBB")], "n_nationkey long, n_name string"
    )
    got = {r.component: r.theil_milli for r in theil_decomposition_nation(
        orders, customer, nation
    ).collect()}
    assert got["within"] == 0
    t = 0.5 * (0.5 * math.log(0.5) + 1.5 * math.log(1.5))
    assert got["total"] == round(1000.0 * t)
    assert got["between"] == got["total"]


def test_theil_decomposition_additivity(spark):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        theil_decomposition_nation,
    )

    orders = spark.createDataFrame(
        [(i, 100 + i, float(v)) for i, v in enumerate(
            [10, 40, 25, 25, 70, 5, 90, 35], start=1
        )],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(100 + i, 1 + (i % 3)) for i in range(1, 9)],
        "c_custkey long, c_nationkey long",
    )
    nation = spark.createDataFrame(
        [(1, "AAA"), (2, "BBB"), (3, "CCC")], "n_nationkey long, n_name string"
    )
    got = {r.component: r.theil_milli for r in theil_decomposition_nation(
        orders, customer, nation
    ).collect()}
    assert abs(got["total"] - (got["between"] + got["within"])) <= 1
    assert got["total"] > 0


# --- Kruskal-Wallis (L-412) ------------------------------------------------------------


def test_kruskal_wallis_textbook_two_groups(spark):
    """A={1,2}, B={3,4}: ranks 1..4, R_A=3, R_B=7 ->
    H = 12/(4*5)*(9/2+49/2) - 3*5 = 2.4; no ties -> hc == h."""
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        kruskal_wallis_test,
    )

    rows = [
        (1, "a", "2024-01-01 10:00:00", 1.0),
        (1, "a", "2024-01-01 11:00:00", 2.0),
        (1, "b", "2024-01-01 12:00:00", 3.0),
        (1, "b", "2024-01-01 13:00:00", 4.0),
    ]
    r = kruskal_wallis_test(_events(spark, rows)).collect()[0]
    assert (r.k_groups, r.n_total, r.h_milli, r.hc_milli) == (2, 4, 2400, 2400)


def test_kruskal_wallis_tie_correction(spark):
    """A={1,1}, B={2,2}: doubled avg ranks 3,3,7,7 -> H = 2.4;
    C = 1 - 12/60 = 0.8 -> Hc = 3.0."""
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        kruskal_wallis_test,
    )

    rows = [
        (1, "a", "2024-01-01 10:00:00", 1.0),
        (1, "a", "2024-01-01 11:00:00", 1.0),
        (1, "b", "2024-01-01 12:00:00", 2.0),
        (1, "b", "2024-01-01 13:00:00", 2.0),
    ]
    r = kruskal_wallis_test(_events(spark, rows)).collect()[0]
    assert (r.h_milli, r.hc_milli) == (2400, 3000)


# --- Cramer's V (L-414) ----------------------------------------------------------------


def test_cramers_v_perfect_association(spark):
    """2x2, each type entirely on its own weekday: chi2 = N = 4, V = 1."""
    from pagila_etl_airflow_assignment_spark.operators.stats import cramers_v_dow

    rows = [
        (1, "x", "2024-01-01 10:00:00", 0.0),  # Monday
        (2, "x", "2024-01-01 11:00:00", 0.0),
        (3, "y", "2024-01-02 10:00:00", 0.0),  # Tuesday
        (4, "y", "2024-01-02 11:00:00", 0.0),
    ]
    r = cramers_v_dow(_events(spark, rows)).collect()[0]
    assert (r.n_total, r.n_types, r.n_dows) == (4, 2, 2)
    assert (r.chi2_milli, r.v_milli) == (4000, 1000)


def test_cramers_v_independence_is_zero(spark):
    """Identical type mix on both days -> chi2 = 0, V = 0."""
    from pagila_etl_airflow_assignment_spark.operators.stats import cramers_v_dow

    rows = []
    for day in ("2024-01-01", "2024-01-02"):
        rows += [(1, "x", f"{day} 10:00:00", 0.0),
                 (2, "y", f"{day} 11:00:00", 0.0)]
    r = cramers_v_dow(_events(spark, rows)).collect()[0]
    assert (r.chi2_milli, r.v_milli) == (0, 0)


# --- Permutation entropy (L-415) -------------------------------------------------------


def test_permutation_entropy_two_patterns(spark):
    """Daily counts (1,2,3,2): codes 7 (rise-rise) and 6 (rise-fall),
    each p=1/2 -> H = ln 2, pe = round(1000*ln2/ln6) = 387."""
    import math

    from pagila_etl_airflow_assignment_spark.operators.stats import (
        permutation_entropy_daily,
    )

    rows = []
    for d, c in enumerate([1, 2, 3, 2], start=1):
        rows += [(1, "view", f"2024-01-0{d} 10:00:00", 0.0)] * c
    r = permutation_entropy_daily(_events(spark, rows)).collect()[0]
    assert r.n_windows == 2
    per_term = round(-1e6 * 0.5 * math.log(0.5))
    want = round(2 * per_term / 1000.0 / math.log(6.0))
    assert r.pe_milli == want


def test_permutation_entropy_monotone_is_zero(spark):
    """Strictly rising counts -> a single ordinal pattern -> PE = 0."""
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        permutation_entropy_daily,
    )

    rows = []
    for d, c in enumerate([1, 2, 3, 4, 5], start=1):
        rows += [(1, "view", f"2024-01-0{d} 10:00:00", 0.0)] * c
    r = permutation_entropy_daily(_events(spark, rows)).collect()[0]
    assert (r.n_windows, r.pe_milli) == (3, 0)


# --- TPC-H Q4 shape (L-411) ------------------------------------------------------------


def _orders(spark, rows):
    """rows: (o_orderkey, o_orderdate, o_orderpriority)"""
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string, o_orderpriority string"
    )
    return df.withColumn("o_orderdate", F.to_timestamp("o_orderdate"))


def _lineitem_ship(spark, rows):
    """rows: (l_orderkey, l_partkey, l_quantity, l_shipdate)"""
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double, l_shipdate string"
    )
    return df.withColumn("l_shipdate", F.to_timestamp("l_shipdate"))


def test_late_order_priority_semi_join_counts_each_order_once(spark):
    orders = _orders(
        spark,
        [
            (1, "1996-01-10", "1-URGENT"),   # two late lines -> counted once
            (2, "1996-02-10", "1-URGENT"),   # on-time line only
            (3, "1996-03-10", "5-LOW"),      # one late line
            (4, "1995-06-01", "1-URGENT"),   # late line but outside quarter
        ],
    )
    lines = _lineitem_ship(
        spark,
        [
            (1, 1, 1.0, "1996-06-01"),
            (1, 1, 1.0, "1996-07-01"),
            (2, 1, 1.0, "1996-02-20"),
            (3, 1, 1.0, "1996-08-01"),
            (4, 1, 1.0, "1996-01-01"),
        ],
    )
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        late_order_priority,
    )

    got = {
        r.o_orderpriority: r.late_orders
        for r in late_order_priority(orders, lines).collect()
    }
    assert got == {"1-URGENT": 1, "5-LOW": 1}


def test_late_order_priority_boundary_exactly_90_days(spark):
    """Ship date exactly order + 90 days is late (>=)."""
    orders = _orders(spark, [(1, "1996-01-01", "3-MEDIUM")])
    lines = _lineitem_ship(spark, [(1, 1, 1.0, "1996-03-31")])  # +90 days
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        late_order_priority,
    )

    rows = late_order_priority(orders, lines).collect()
    assert [(r.o_orderpriority, r.late_orders) for r in rows] == [
        ("3-MEDIUM", 1)
    ]


# --- Measure correlation (L-413) -------------------------------------------------------


def test_measure_correlation_signs(spark):
    """qty == price (r=+1), discount anti-monotone (r=-1), tax monotone."""
    df = spark.createDataFrame(
        [
            (1.0, 1.0, 0.03, 0.01),
            (2.0, 2.0, 0.02, 0.02),
            (3.0, 3.0, 0.01, 0.03),
        ],
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double",
    )
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        measure_correlation,
    )

    got = {r.pair: r.corr_micro for r in measure_correlation(df).collect()}
    assert got == {
        "q~p": 1000000,
        "q~d": -1000000,
        "q~t": 1000000,
        "p~d": -1000000,
        "p~t": 1000000,
        "d~t": -1000000,
    }


def test_measure_correlation_constant_column_guard(spark):
    """Zero variance -> corr fixed at 0, not NaN."""
    df = spark.createDataFrame(
        [
            (1.0, 10.0, 0.05, 0.01),
            (2.0, 20.0, 0.05, 0.02),
        ],
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double",
    )
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        measure_correlation,
    )

    got = {r.pair: r.corr_micro for r in measure_correlation(df).collect()}
    assert got["q~d"] == 0 and got["p~d"] == 0 and got["d~t"] == 0
    assert got["q~p"] == 1000000


# --- Bullwhip ratio (L-416) ------------------------------------------------------------


def test_bullwhip_ratio_hand_computed(spark):
    """Ordered monthly centi-qty (4000,1000,0) vs shipped (3000,1000,1000):
    numerators 26e6 vs 8e6 -> ratio 3.25 -> 3250 milli."""
    orders = _orders(
        spark, [(1, "1996-01-05", "1-URGENT"), (2, "1996-02-05", "1-URGENT")]
    )
    lines = _lineitem_ship(
        spark,
        [
            (1, 1, 30.0, "1996-01-10"),
            (1, 1, 10.0, "1996-03-10"),
            (2, 1, 10.0, "1996-02-10"),
        ],
    )
    part = spark.createDataFrame(
        [(1, "BrandA")], "p_partkey long, p_brand string"
    )
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        bullwhip_ratio,
    )

    rows = bullwhip_ratio(lines, orders, part).collect()
    assert [(r.p_brand, r.n_months, r.ratio_milli) for r in rows] == [
        ("BrandA", 3, 3250)
    ]
