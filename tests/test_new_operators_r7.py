"""Round-7 hardening tests: advisor fixes, rotation invariants."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# --- isqrt overflow guard (ADVICE r6: (s0+1)^2 wrapped for inputs near 2^63) -------


def test_isqrt_exact_near_int64_max(spark):
    """The up-correction probe must not form (s0+1)^2: for x near 2^63 that
    square exceeds int64 and previously wrapped negative (non-ANSI), firing
    the <= branch and returning s0+1 incorrectly."""
    from pagila_etl_airflow_assignment_spark.functions import isqrt

    xs = [
        2**63 - 1,  # int64 max: seed s0 = 3037000499, (s0+1)^2 overflows
        3037000499**2,  # largest perfect square in int64
        3037000499**2 - 1,
        3037000499**2 + 1,
        9223372036854775806,
    ]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    for r in df.select("x", isqrt("x").alias("s")).collect():
        assert r.s == math.isqrt(r.x), (r.x, r.s)


def test_isqrt_sql_exact_near_int64_max():
    """DuckDB twin: naive (s0+1)^2 raises out-of-range there; the rewritten
    probe must evaluate cleanly and exactly across the full BIGINT domain."""
    duckdb = pytest.importorskip("duckdb")
    from pagila_etl_airflow_assignment_spark.functions import isqrt_sql

    con = duckdb.connect()
    for x in [0, 1, 2, 3, 2**63 - 1, 3037000499**2, 3037000499**2 - 1]:
        got = con.execute(f"SELECT {isqrt_sql(str(x))} AS s").fetchone()[0]
        assert got == math.isqrt(x), (x, got)


# --- kendall_tau_daily laziness (ADVICE r6: eager daily.count() at build time) -----


def test_kendall_tau_plan_construction_runs_no_job(spark):
    """Building the kendall plan must be lazy — the day count rides the plan
    as a broadcast 1-row cross join, not a driver-side count()."""
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        kendall_tau_daily,
    )

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    events = spark.createDataFrame(
        [(1, "click", "2024-01-01 00:00:00", 1.0)],
        "user_id long, event_type string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    df = kendall_tau_daily(events)  # plan construction only
    after = tracker.getJobIdsForGroup(None)
    assert len(after) == len(before), "plan construction triggered a Spark job"
    row = df.collect()[0]
    assert row.n_days == 1 and row.tau_a_milli == 0


def test_kendall_tau_values_small_grid(spark):
    """3-day grid with strictly concordant counts -> tau_a = +1.000."""
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        kendall_tau_daily,
    )

    rows = []
    # day1: 1 click / 1 error; day2: 2/2; day3: 3/3 (strictly increasing both)
    for d, n in [("2024-01-01", 1), ("2024-01-02", 2), ("2024-01-03", 3)]:
        for t in ["click"] * n + ["error"] * n:
            rows.append((1, t, f"{d} 10:00:00", 0.0))
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = kendall_tau_daily(events).collect()[0]
    assert (r.n_days, r.concordant, r.discordant, r.tied) == (3, 3, 0, 0)
    assert r.tau_a_milli == 1000


# --- driver-sample rotation invariants (re-cut each round) ---------------------------


def test_rotation_head_is_never_certified_backlog():
    """The first 50 emitted names must all come from the never-driver-sampled
    backlog (so the round's CORRECTNESS sample certifies 50 first-time
    queries), and emission must cover the registry exactly once."""
    from pagila_etl_airflow_assignment_spark import registry

    names = list(registry.queries())
    assert len(names) == len(set(names))
    backlog = set(registry._NEVER_DRIVER_SAMPLED_R10)
    certified = set(registry._DRIVER_CERTIFIED_R9)
    head = names[:50]
    assert all(n in backlog for n in head), [n for n in head if n not in backlog]
    # certified-green queries are re-sampled last, never displacing the backlog
    tail = names[-len(certified):]
    assert set(tail) == certified
    # every listed name still exists in the registry (no stale rotation rows)
    assert backlog <= set(names) and certified <= set(names)


# --- round-7 new operators -----------------------------------------------------------

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_edit_distance_pairs_finds_near_dups(spark):
    """Identical docs -> dist 0; one-word substitution -> small positive
    dist; unrelated docs never pair."""
    from pagila_etl_airflow_assignment_spark.llm import dedup

    # long enough that a one-word substitution keeps shingle-Jaccard high
    # (the LSH blocking stage is recall-approximate; this fixture is a
    # deterministic band hit)
    base = (
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
        "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
        "quis nostrud exercitation ullamco laboris nisi aliquip commodo consequat"
    )
    texts = [
        base,
        base,
        base.replace(" dolor ", " color "),
        "zebra quokka wombat platypus echidna cassowary kookaburra dingo emu bilby",
    ]
    docs = spark.createDataFrame(
        [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)], DOC_SCHEMA
    )
    got = {(r.doc_a, r.doc_b): r.dist for r in dedup.edit_distance_pairs(docs).collect()}
    assert got[(1, 2)] == 0
    assert 0 < got[(1, 3)] <= 2  # one-char substitution after normalization
    assert all(4 not in pair for pair in got)


def test_dedup_aware_epochs_weights(spark):
    """3 copies of one content + 1 unique in one source: effective epochs =
    (3*(t/3) + t) / 4 = t/2 at milli, floor arithmetic."""
    from pagila_etl_airflow_assignment_spark.llm.sampling import (
        TARGET_EPOCHS_MILLI,
        dedup_aware_epochs,
    )

    docs = spark.createDataFrame(
        [
            (1, "same text", "en", "srcA", 9),
            (2, "same text", "en", "srcA", 9),
            (3, "same text", "en", "srcA", 9),
            (4, "unique text", "en", "srcA", 11),
        ],
        DOC_SCHEMA,
    )
    r = dedup_aware_epochs(docs).collect()[0]
    t = TARGET_EPOCHS_MILLI
    assert (r.source, r.docs, r.unique_docs, r.max_copies) == ("srcA", 4, 1, 3)
    assert r.effective_epochs_milli == (3 * (t // 3) + t) // 4


def test_sprt_daily_decision_boundaries(spark):
    """All-convert days push the LLR up by L1 per trial; the decision flips
    to accept_h1 exactly when cum >= upper."""
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        SPRT_L1_MICRO,
        SPRT_UPPER_MICRO,
        sprt_daily,
    )
    import datetime as dt

    rows = []
    # 20 users purchase every day -> each day adds 20 * L1_MICRO
    for d in range(5):
        for u in range(20):
            rows.append((u, "purchase", dt.datetime(2024, 1, 1 + d, 10), 1.0))
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )
    out = sprt_daily(events).collect()
    per_day = 20 * SPRT_L1_MICRO
    for i, r in enumerate(out, start=1):
        assert r.cum_llr_micro == i * per_day
        want = "accept_h1" if i * per_day >= SPRT_UPPER_MICRO else "continue"
        assert r.decision == want


def test_bh_fdr_monotone_reject_prefix(spark):
    """The reject set is always a prefix of the |z| ranking, crit values
    decrease with rank, and m equals the row count."""
    from conftest import SF_SMALL
    from pagila_etl_airflow_assignment_spark.operators.stats import bh_fdr_panel
    from pagila_etl_airflow_assignment_spark.sources.parquet import load_table

    rows = bh_fdr_panel(load_table(spark, SF_SMALL, "events")).collect()
    assert rows, "panel empty"
    m = len(rows)
    assert [r.bh_rank for r in rows] == list(range(1, m + 1))
    crits = [r.z_crit_micro for r in rows]
    assert crits == sorted(crits, reverse=True)
    flags = [r.rejected for r in rows]
    assert flags == sorted(flags, reverse=True)  # prefix property


def test_croston_hand_computed(spark):
    """Demand 10 at month1, zero months 2-3, demand 20 at month4, alpha=0.2:
    z = (200*20000 + 800*10000) DIV 1000 = 12000 milli,
    x = (200*3000 + 800*1000) DIV 1000 = 1400 milli (interval 3),
    forecast = 12000*1000 DIV 1400 = 8571 milli/month."""
    import datetime as dt
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        croston_forecast,
    )

    part = spark.createDataFrame(
        [(1, "n", "Brand#55", "T", 50, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    li = spark.createDataFrame(
        [
            (1, 1, 1, 10.0, 1.0, 0.0, dt.datetime(2024, 1, 15)),
            (2, 1, 1, 20.0, 1.0, 0.0, dt.datetime(2024, 4, 15)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    r = croston_forecast(li, part).collect()[0]
    assert (r.n_months, r.demand_months) == (4, 2)
    assert (r.size_milli, r.interval_milli) == (12000, 1400)
    assert r.forecast_per_month_milli == 12000 * 1000 // 1400


def test_knn_reciprocity_two_clusters(spark):
    """Two tight 2-vector clusters with k exceeding the sample: every
    nearest-neighbor edge at rank 1 is mutual (each vector's top neighbor
    is its cluster twin)."""
    from pagila_etl_airflow_assignment_spark.llm.similarity import knn_reciprocity

    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.99, 0.01]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = {r.rank: r for r in knn_reciprocity(emb, k=2).collect()}
    assert rows[1].edges == 4 and rows[1].reciprocal == 4
    assert rows[1].reciprocity_milli == 1000


def test_dp_noisy_counts_mechanism(spark):
    """Noise is deterministic per group key, counts clamp at zero, and the
    milli noise rounds to the count offset with half-up semantics."""
    from pagila_etl_airflow_assignment_spark.llm.text import dp_noisy_counts

    docs = spark.createDataFrame(
        [(i, "t", "en", "srcA", 1) for i in range(1, 6)]
        + [(i, "t", "fr", "srcB", 1) for i in range(6, 9)],
        DOC_SCHEMA,
    )
    rows = {(r.lang, r.source): r for r in dp_noisy_counts(docs).collect()}
    a, b = rows[("en", "srcA")], rows[("fr", "srcB")]
    assert (a.true_n, b.true_n) == (5, 3)
    for r in (a, b):
        off = (abs(r.noise_milli) + 500) // 1000 * (1 if r.noise_milli >= 0 else -1)
        assert r.noisy_n == max(0, r.true_n + off)
    # determinism: same input -> same noise
    again = {(r.lang, r.source): r.noise_milli for r in dp_noisy_counts(docs).collect()}
    assert again[("en", "srcA")] == a.noise_milli


def test_max_drawdown_hand_computed(spark):
    """Daily nets +10, -3, -4, +2, -5: cumulative 10,7,3,5,0 -> worst
    drawdown 10 (peak day1 -> trough day5)."""
    import datetime as dt
    from pagila_etl_airflow_assignment_spark.operators.analytics import (
        max_drawdown_daily,
    )

    nets = [10.0, -3.0, -4.0, 2.0, -5.0]
    rows = [
        (1, "view", dt.datetime(2024, 1, 1 + i, 12), v) for i, v in enumerate(nets)
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )
    r = max_drawdown_daily(events).collect()[0]
    assert r.n_days == 5
    assert r.max_drawdown_cents == 1000
    assert (str(r.peak_day), str(r.trough_day)) == ("2024-01-01", "2024-01-05")
    assert (r.peak_cents, r.trough_cents) == (1000, 0)


def test_log_compaction_hand_computed(spark):
    """Keys 1..10, one status: inserts 10; updates at %3==0 (3,6,9) and
    %7==0 (7); delete at %10==DELETE_MOD. Check totals."""
    from pagila_etl_airflow_assignment_spark.operators import cdc

    orders = spark.createDataFrame(
        [(k, "O", 1.0) for k in range(1, 11)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    r = cdc.log_compaction_audit(orders).collect()[0]
    expected_records = 10 + 3 + 1 + 1  # v1 all, v2 {3,6,9}, v3 {7}, v4 {DELETE_MOD}
    assert r.log_records == expected_records
    assert r.live_keys + r.tombstoned_keys == 10
    assert r.tombstoned_keys == 1
    assert r.superseded_records == expected_records - 10
    assert r.write_amp_milli == 1000 * expected_records // r.live_keys


def test_velocity_flags_threshold(spark):
    """3 events inside one hour trip the rule; spread-out events do not."""
    import datetime as dt
    from pagila_etl_airflow_assignment_spark.operators.behavior import velocity_flags

    rows = [
        # user 1: burst of 3 within 10 minutes
        (1, "click", dt.datetime(2024, 1, 1, 10, 0), 0.0),
        (1, "click", dt.datetime(2024, 1, 1, 10, 5), 0.0),
        (1, "click", dt.datetime(2024, 1, 1, 10, 9), 0.0),
        # user 2: 3 events spread over 3 hours
        (2, "click", dt.datetime(2024, 1, 1, 10, 0), 0.0),
        (2, "click", dt.datetime(2024, 1, 1, 11, 30), 0.0),
        (2, "click", dt.datetime(2024, 1, 1, 13, 0), 0.0),
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )
    got = {r.user_id: r for r in velocity_flags(events).collect()}
    assert 1 in got and 2 not in got
    assert got[1].flagged_events == 1 and got[1].max_in_window == 3


def test_dfg_waits_hand_computed(spark):
    """view -> click -> purchase with 10s and 30s waits for one user; a
    second user repeats view -> click with 20s: median/mean per edge."""
    import datetime as dt
    from pagila_etl_airflow_assignment_spark.operators.sequences import dfg_waits

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        (1, 1, "view", t0, 0.0),
        (2, 1, "click", t0 + dt.timedelta(seconds=10), 0.0),
        (3, 1, "purchase", t0 + dt.timedelta(seconds=40), 0.0),
        (4, 2, "view", t0, 0.0),
        (5, 2, "click", t0 + dt.timedelta(seconds=20), 0.0),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp,"
        " value double"
    )
    got = {(r.src, r.dst): r for r in dfg_waits(events).collect()}
    vc = got[("view", "click")]
    assert (vc.n_transitions, vc.mean_wait_s, vc.median_wait_s) == (2, 15, 10)
    cp = got[("click", "purchase")]
    assert (cp.n_transitions, cp.mean_wait_s, cp.median_wait_s) == (1, 30, 30)


def _li_part(spark, demands):
    """(lineitem, part) for one brand with monthly demand list (qty per
    consecutive month starting 2024-01; zeros skipped)."""
    import datetime as dt

    part = spark.createDataFrame(
        [(1, "n", "Brand#55", "T", 50, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    rows = [
        (i, 1, 1, float(q), 1.0, 0.0, dt.datetime(2024, 1 + i, 15))
        for i, q in enumerate(demands)
        if q > 0
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    return li, part


def test_demand_classification_quadrants(spark):
    """Demand every month, equal sizes -> ADI 1.0, CV^2 0 -> smooth;
    demand 1 month of 4 -> ADI 4.0 -> intermittent (sizes equal)."""
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        demand_classification,
    )

    li, part = _li_part(spark, [10, 10, 10, 10])
    r = demand_classification(li, part).collect()[0]
    assert (r.adi_milli, r.cv2_milli, r.pattern) == (1000, 0, "smooth")

    li2, part2 = _li_part(spark, [10, 0, 0, 0])
    # single demand month in a 1-month span (zeros produce no rows, so the
    # span collapses): ADI 1000, CV2 0 -> smooth. Use two demand months far
    # apart instead: months 1 and 4 -> span 4, demand 2 -> ADI 2000.
    li3, part3 = _li_part(spark, [10, 0, 0, 10])
    r3 = demand_classification(li3, part3).collect()[0]
    assert (r3.adi_milli, r3.cv2_milli, r3.pattern) == (2000, 0, "intermittent")


def test_ss_policy_hand_computed(spark):
    """S=400, s=100, demands 350, 50, 200: month1 serve 350 (post 50 < 100
    -> reorder to 400); month2 serve 50 (post 350); month3 serve 200 (post
    150). No stockouts, 1 order, fill rate 1000."""
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        ss_policy_simulation,
    )

    li, part = _li_part(spark, [350, 50, 200])
    r = ss_policy_simulation(li, part).collect()[0]
    assert (r.total_demand, r.served) == (600, 600)
    assert (r.stockout_months, r.orders_placed, r.fill_rate_milli) == (0, 1, 1000)
    assert r.avg_month_end_units == (50 + 350 + 150) // 3


def test_purged_kfold_embargo_accounting(spark):
    """10 days, k=5, embargo 2: every fold has 2 test days; per fold,
    train + purged + test == 10 and the embargo removes up to 2 days each
    side of the test block."""
    import datetime as dt
    from pagila_etl_airflow_assignment_spark.llm.sampling import purged_kfold

    rows = [
        (d, "view", dt.datetime(2024, 1, 1 + d, 10), 0.0) for d in range(10)
    ]
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )
    out = {r.fold: r for r in purged_kfold(events).collect()}
    assert sorted(out) == [0, 1, 2, 3, 4]
    for f, r in out.items():
        assert r.test_days == 2
        assert r.test_days + r.train_days + r.purged_days == 10
    # middle fold (2): test idx 5-6, embargo covers 3,4,7,8 -> train = 4
    assert out[2].train_days == 4 and out[2].purged_days == 4
    # first fold: test idx 1-2, embargo 3,4 -> train 6
    assert out[0].train_days == 6 and out[0].purged_days == 2


def test_ljung_box_composes_acf(spark):
    """Q equals the integer recomposition of acf_daily's milli values, and
    a strongly weekly-periodic series rejects whiteness."""
    import datetime as dt
    from pagila_etl_airflow_assignment_spark.operators.analytics import (
        LJUNG_BOX_CRIT_MICRO,
        acf_daily,
        ljung_box_daily,
    )

    rows = []
    for d in range(28):  # 4 weekly cycles, weekend spike
        n = 40 if (d % 7) in (5, 6) else 5
        for i in range(n):
            rows.append((i, "view", dt.datetime(2024, 1, 1 + d, 10, 0, i % 60), 0.0))
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )
    r = ljung_box_daily(events).collect()[0]
    assert r.n_days == 28 and r.h == 7
    acf = {a.lag: a.acf_milli for a in acf_daily(events, 7).collect()}
    want = sum(28 * 30 * acf[k] * acf[k] // (28 - k) for k in range(1, 8))
    assert r.q_micro == want
    assert r.reject_whiteness == 1 and r.q_micro > LJUNG_BOX_CRIT_MICRO


def test_burn_rate_alerts_both_windows_required(spark):
    """An isolated 1-hour error spike inside a clean 6-hour context must NOT
    alert (long window suppresses); a sustained 6-hour burn must."""
    import datetime as dt
    from pagila_etl_airflow_assignment_spark.operators.analytics import (
        burn_rate_alerts,
    )

    rows = []
    # hours 0-11 clean (20 views), hour 12 spike (10 errors + 10 views),
    # hours 18-23 sustained burn (10 errors + 10 views each)
    for h in range(24):
        errs = 10 if (h == 12 or 18 <= h <= 23) else 0
        for i in range(errs):
            rows.append((i, "error", dt.datetime(2024, 1, 1, h, 1, i), 0.0))
        for i in range(20 - errs if errs else 20):
            rows.append((i, "view", dt.datetime(2024, 1, 1, h, 2, i), 0.0))
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )
    alerts = {r.hour.hour for r in burn_rate_alerts(events).collect()}
    assert 12 not in alerts  # blip suppressed by the 6h window
    assert 23 in alerts  # sustained burn alerts once the long window fills
    # short burn at alerting hours = 1000 * 10 * 20 / 20 = 10000 > 4500


def test_update_lag_profile_shape(spark):
    """Lag weeks are non-negative, shares sum to ~1000, tail share is
    monotone non-increasing, lag 0 (same-week updates) dominates nothing
    beyond the 45-day return window (max 7 weeks)."""
    from conftest import SF_SMALL
    from pagila_etl_airflow_assignment_spark.registry import queries

    df = queries()["rental_update_lag_profile"](spark.getActiveSession() or spark, SF_SMALL)
    rows = sorted(df.collect(), key=lambda r: r.lag_weeks)
    assert rows[0].lag_weeks >= 0 and rows[-1].lag_weeks <= 7
    tails = [r.tail_share_milli for r in rows]
    assert tails == sorted(tails, reverse=True)
    assert tails[0] == 1000  # smallest lag's tail covers everything


def test_unbounded_window_walker_detects_and_clears(spark):
    """The plan-audit walker must flag an unpartitioned window over a raw
    scan-shaped relation and clear (a) partitioned windows, (b) unpartitioned
    windows over aggregates, and (c) literal Range grids."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import plan_audit as pa
    from pyspark.sql import Window

    import tempfile, shutil
    d = tempfile.mkdtemp(prefix="winwalk-")
    try:
        spark.range(0, 1000).selectExpr("id", "id % 7 AS k").write.mode(
            "overwrite"
        ).parquet(d)
        df = spark.read.parquet(d)

        bad = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
        assert pa.unbounded_windows(bad._jdf.queryExecution().executedPlan()) == 1

        good_part = df.withColumn(
            "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
        )
        assert (
            pa.unbounded_windows(good_part._jdf.queryExecution().executedPlan())
            == 0
        )

        agg = df.groupBy("k").count()
        good_agg = agg.withColumn("rn", F.row_number().over(Window.orderBy("k")))
        assert (
            pa.unbounded_windows(good_agg._jdf.queryExecution().executedPlan())
            == 0
        )

        grid = spark.range(0, 24).withColumn(
            "rn", F.row_number().over(Window.orderBy("id"))
        )
        assert pa.unbounded_windows(grid._jdf.queryExecution().executedPlan()) == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_norm_clip_threshold_hand_computed(spark):
    """10 unit-norm vectors + 1 outlier of norm 10: p99.5 rank = ceil(.995*11)
    = 11 -> threshold IS the outlier norm, nothing strictly exceeds it;
    at p90 the rank-10 value (1.0) clips exactly the outlier, which carries
    100/(10+100) of the squared mass."""
    from pagila_etl_airflow_assignment_spark.llm.embeddings import (
        norm_clip_threshold,
    )

    vecs = [(i, [1.0, 0.0]) for i in range(10)] + [(10, [10.0, 0.0])]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    r = norm_clip_threshold(emb).collect()[0]
    assert (r.n_vecs, r.clip_nano, r.n_clipped) == (11, 10_000_000_000, 0)
    r90 = norm_clip_threshold(emb, pct_milli=900).collect()[0]
    assert (r90.clip_nano, r90.n_clipped) == (1_000_000_000, 1)
    assert r90.clipped_mass_milli == round(1000 * 100 / 110)


def test_norm_clip_threshold_empty_input_zero_rows(spark):
    """Empty embeddings -> zero rows (matching the oracle's GROUP BY), not a
    single all-NULL row from a global aggregate."""
    from pagila_etl_airflow_assignment_spark.llm.embeddings import (
        norm_clip_threshold,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert norm_clip_threshold(emb).count() == 0


def test_interrupted_ts_detects_level_and_slope_change(spark):
    """Flat pre-period (100/day), incident at day 11 (errors spike), then a
    declining post-period: level change ~-30, slope turns negative."""
    import datetime as dt
    from pagila_etl_airflow_assignment_spark.operators.analytics import (
        interrupted_time_series,
    )

    rows = []
    for d in range(1, 11):  # pre: flat 100 cents/day
        rows.append((1, "view", dt.datetime(2024, 1, d, 12), 1.00))
    for i in range(5):  # incident day 11: error burst
        rows.append((1, "error", dt.datetime(2024, 1, 11, 12, i), 0.0))
    rows.append((1, "view", dt.datetime(2024, 1, 11, 13), 0.70))
    for d in range(12, 21):  # post: declining from 0.65 by 0.05/day
        rows.append((1, "view", dt.datetime(2024, 1, d, 12), 0.65 - 0.05 * (d - 12)))
    events = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )
    r = interrupted_time_series(events).collect()[0]
    assert str(r.incident_day) == "2024-01-11"
    assert (r.pre_days, r.post_days) == (10, 10)
    assert abs(r.slope_pre) < 1e-6  # flat pre
    assert r.slope_change < 0 and r.level_change < 0


def test_ht_estimate_recovers_total_on_uniform_docs(spark):
    """Identical docs -> constant words/chars ratio -> the HT ratio
    estimator is EXACT regardless of which units the design picks."""
    from pagila_etl_airflow_assignment_spark.llm.sampling import ht_estimate

    text = "alpha beta gamma delta"  # 4 words, 22 chars
    docs = spark.createDataFrame(
        [(i, text, "en", "s", len(text)) for i in range(1, 201)], DOC_SCHEMA
    )
    r = ht_estimate(docs).collect()[0]
    assert r.true_total_words == 800
    assert r.ht_estimate_words == 800
    assert r.err_milli == 0
    assert r.n_thresholds == 50
