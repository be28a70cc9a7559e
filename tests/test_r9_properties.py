"""Property tests for the round-9 statistical devices (the five operators
registered as L-417..L-421): each Spark plan must equal a direct Python
reference implementation of the same exact-arithmetic chain on arbitrary
series — the device-level guarantee that the DuckDB oracles then certify at
corpus scale."""

from __future__ import annotations

import datetime as _dt
import math

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

# Device-property suite: every test drives Spark per Hypothesis example,
# so the file costs minutes. Runs under SPARK_GRAFT_FULL_TESTS=1 (round-close
# / CI profile); the fast default keeps the oracle-differential coverage.
pytestmark = pytest.mark.slow

from pyspark.sql import functions as F


def _round_half_away(x: float) -> int:
    """Match Spark/DuckDB round(): half away from zero, not banker's."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _avg2_ranks(vals):
    """Doubled average ranks (2*avg_rank is always an integer)."""
    s = sorted(vals)
    return [2 * (s.index(v) + 1) + s.count(v) - 1 for v in vals]


# --- Page-Hinkley -----------------------------------------------------------

# per-day lists of event centi-values; >= 2 days, 1-3 events per day
VALUE_SERIES = st.lists(
    st.lists(st.integers(-500, 500), min_size=1, max_size=3),
    min_size=2,
    max_size=10,
)


def _events_from_values(spark, series):
    rows = []
    for d, centis in enumerate(series, start=1):
        day = f"2024-01-{d:02d}"
        rows += [
            (1, "click", f"{day} 10:00:00", c / 100.0) for c in centis
        ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


@settings(max_examples=10, deadline=None)
@given(series=VALUE_SERIES)
def test_page_hinkley_matches_reference(spark, series):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        page_hinkley_daily,
    )

    xs = [sum(cs) / len(cs) for cs in series]  # exact centi-sum / count
    cx = 0.0
    terms = []
    for t, x in enumerate(xs, start=1):
        cx += x  # same sequential double chain as the cumulative window
        terms.append(_round_half_away(1e6 * (x - cx / t)))
    g, gmin, best_ph, best_day = 0, 0, None, None
    for d, term in enumerate(terms, start=1):
        g += term
        gmin = min(gmin, g)
        ph = g - gmin
        if best_ph is None or ph > best_ph:
            best_ph, best_day = ph, d
    r = page_hinkley_daily(_events_from_values(spark, series)).collect()[0]
    assert r.n_days == len(series)
    assert r.ph_max_milli == _round_half_away(best_ph / 1000.0)
    assert r.alarm_day.day == best_day


# --- Friedman test ----------------------------------------------------------

COUNT_SERIES = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=2, max_size=14
)


def _events_from_counts(spark, series):
    rows = []
    for d, (nx, ny) in enumerate(series, start=1):
        day = f"2024-01-{d:02d}"
        rows += [(1, "click", f"{day} 10:00:00", 0.0)] * nx
        rows += [(1, "error", f"{day} 11:00:00", 0.0)] * ny
        # every day exists in the grid even when both counts are 0
        rows.append((1, "view", f"{day} 12:00:00", 0.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


@settings(max_examples=10, deadline=None)
@given(series=COUNT_SERIES)
def test_friedman_matches_reference(spark, series):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        friedman_test_daily,
    )

    # only types that appear at least once enter the treatment set; the view
    # row makes every day a block, and densification fills absent cells with 0
    present = [
        j
        for j, sel in enumerate(
            [
                any(nx > 0 for nx, _ in series),
                any(ny > 0 for _, ny in series),
                True,  # view appears every day
            ]
        )
        if sel
    ]
    blocks = [
        [[nx, ny, 1][j] for j in present] for nx, ny in series
    ]  # click, error, view restricted to present types
    k = len(present)
    n = len(blocks)
    r2 = [_avg2_ranks(b) for b in blocks]
    r2_j = [sum(day[j] for day in r2) for j in range(k)]
    sum_sq = sum(v * v for day in r2 for v in day)
    s_t2 = sum((rj - n * (k + 1)) ** 2 for rj in r2_j)
    denom = sum_sq - n * k * (k + 1) ** 2
    want = (
        _round_half_away(1000.0 * (k - 1) * s_t2 / denom) if denom > 0 else 0
    )
    r = friedman_test_daily(_events_from_counts(spark, series)).collect()[0]
    assert (r.n_blocks, r.k_treatments) == (n, k)
    assert r.q_milli == want


# --- Dickey-Fuller -----------------------------------------------------------

REVENUE_SERIES = st.lists(
    st.integers(1, 10_000_000), min_size=2, max_size=14
)


def _orders_from_revenue(spark, centis):
    rows = [
        (d, f"2024-01-{d:02d}", c / 100.0)
        for d, c in enumerate(centis, start=1)
    ]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate string, o_totalprice double"
    )


@settings(max_examples=10, deadline=None)
@given(centis=REVENUE_SERIES)
def test_dickey_fuller_matches_reference(spark, centis):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        dickey_fuller_daily_revenue,
    )

    pairs = [
        (centis[i - 1], centis[i] - centis[i - 1])
        for i in range(1, len(centis))
    ]
    m = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(dy for _, dy in pairs)
    sxx = sum(x * x for x, _ in pairs)
    sxy = sum(x * dy for x, dy in pairs)
    syy = sum(dy * dy for _, dy in pairs)
    cxx = float(m * sxx - sx * sx)
    cxy = float(m * sxy - sx * sy)
    cyy = float(m * syy - sy * sy)
    gamma = _round_half_away(1e6 * cxy / cxx) if cxx > 0 else 0
    if cxx > 0 and m > 2 and cyy - cxy * cxy / cxx > 1e-9:
        t_milli = _round_half_away(
            1000.0
            * (cxy / cxx)
            / math.sqrt(m * (cyy - cxy * cxy / cxx) / ((m - 2.0) * cxx))
        )
    else:
        t_milli = 0
    r = dickey_fuller_daily_revenue(
        _orders_from_revenue(spark, centis)
    ).collect()[0]
    assert (r.n_obs, r.gamma_micro, r.t_milli) == (m, gamma, t_milli)


# --- Weibull fit + Cp/Cpk -----------------------------------------------------

LATENCIES = st.lists(st.integers(0, 60), min_size=2, max_size=20)


def _latency_tables(spark, lats):
    orders = spark.createDataFrame(
        [(i, "2024-01-01") for i in range(len(lats))],
        "o_orderkey long, o_orderdate string",
    )
    base = _dt.date(2024, 1, 1)
    lineitem = spark.createDataFrame(
        [
            (i, (base + _dt.timedelta(days=lat)).isoformat())
            for i, lat in enumerate(lats)
        ],
        "l_orderkey long, l_shipdate string",
    )
    return lineitem, orders


@settings(max_examples=10, deadline=None)
@given(lats=LATENCIES)
def test_weibull_matches_reference(spark, lats):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        weibull_latency_fit,
    )

    pos = sorted(v for v in lats if v >= 1)
    lineitem, orders = _latency_tables(spark, lats)
    r = weibull_latency_fit(lineitem, orders).collect()[0]
    n = len(pos)
    assert r.n_lines == n
    if n == 0:
        assert (r.q25_days, r.q75_days) == (None, None)
        return
    q25 = pos[(n + 3) // 4 - 1]
    q75 = pos[(3 * n + 3) // 4 - 1]
    assert (r.q25_days, r.q75_days) == (q25, q75)
    if q75 > q25 and q25 >= 1:
        ll4, ll43 = math.log(math.log(4.0)), math.log(math.log(4.0 / 3.0))
        shape = 1000.0 * (ll4 - ll43) / (math.log(q75) - math.log(q25))
        scale = 1000.0 * math.exp(
            math.log(q75)
            - ll4 * (math.log(q75) - math.log(q25)) / (ll4 - ll43)
        )
        assert r.shape_milli == _round_half_away(shape)
        assert r.scale_milli == _round_half_away(scale)
    else:
        assert (r.shape_milli, r.scale_milli) == (0, 0)


@settings(max_examples=10, deadline=None)
@given(lats=LATENCIES)
def test_cpk_matches_reference(spark, lats):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        cpk_latency,
    )

    lineitem, orders = _latency_tables(spark, lats)
    r = cpk_latency(lineitem, orders).collect()[0]
    n = len(lats)
    s = sum(lats)
    ss = sum(v * v for v in lats)
    mu = s / n
    num = float(n * ss - s * s)
    assert r.n_lines == n
    assert r.mean_milli == _round_half_away(1000.0 * mu)
    if n > 1 and num > 0:
        sigma = math.sqrt(num / (n * (n - 1.0)))
        assert r.sigma_milli == _round_half_away(1000.0 * sigma)
        assert r.cp_milli == _round_half_away(1000.0 * 120.0 / (6.0 * sigma))
        assert r.cpk_milli == _round_half_away(
            1000.0 * min(120.0 - mu, mu - 0.0) / (3.0 * sigma)
        )
    else:
        assert (r.sigma_milli, r.cp_milli, r.cpk_milli) == (0, 0, 0)
