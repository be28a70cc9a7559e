"""Property tests for the round-8 statistical devices: each Spark plan must
equal a direct Python reference implementation of the same exact-arithmetic
chain on arbitrary daily series — the device-level guarantee that the DuckDB
oracles then certify at corpus scale."""

from __future__ import annotations

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


# daily count series for two types; counts >= 0, at least 2 days
SERIES = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=2, max_size=14
)


def _events_from_series(spark, series):
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


def _avg2_ranks(vals):
    """Doubled average ranks (2*avg_rank is always an integer)."""
    s = sorted(vals)
    return [
        2 * (s.index(v) + 1) + s.count(v) - 1  # 2*min_rank + ties - 1
        for v in vals
    ]


@settings(max_examples=10, deadline=None)
@given(series=SERIES)
def test_spearman_matches_reference(spark, series):
    from pagila_etl_airflow_assignment_spark.operators.stats import spearman_daily

    xs = [t[0] for t in series]
    ys = [t[1] for t in series]
    rx, ry = _avg2_ranks(xs), _avg2_ranks(ys)
    n = len(series)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    want = (
        _round_half_away(1000.0 * (n * sxy - sx * sy) / math.sqrt(float(vx) * vy))
        if vx > 0 and vy > 0
        else 0
    )
    r = spearman_daily(_events_from_series(spark, series)).collect()[0]
    assert (r.n_days, r.var2x, r.var2y) == (n, vx, vy)
    assert r.rho_milli == want


@settings(max_examples=10, deadline=None)
@given(series=SERIES)
def test_mann_kendall_matches_reference(spark, series):
    from pagila_etl_airflow_assignment_spark.operators.stats import mann_kendall_daily

    # engine sees total daily counts incl. the 1 grid "view" event
    cs = [t[0] + t[1] + 1 for t in series]
    n = len(cs)
    s_stat = sum(
        (cs[j] > cs[i]) - (cs[j] < cs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in Counter(cs).values())
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    want = (
        _round_half_away(
            1000.0
            * (s_stat - (1 if s_stat > 0 else -1))
            / math.sqrt(var18 / 18.0)
        )
        if var18 > 0 and s_stat != 0
        else 0
    )
    r = mann_kendall_daily(_events_from_series(spark, series)).collect()[0]
    assert (r.n_days, r.s_stat, r.var18) == (n, s_stat, var18)
    assert r.z_milli == want


@settings(max_examples=10, deadline=None)
@given(series=SERIES)
def test_sen_slope_matches_reference(spark, series):
    from pagila_etl_airflow_assignment_spark.operators.stats import sen_slope_daily

    cs = [t[0] + t[1] + 1 for t in series]
    n = len(cs)
    slopes = sorted(
        _round_half_away(1000.0 * (cs[j] - cs[i]) / (j - i))
        for i in range(n)
        for j in range(i + 1, n)
    )
    m = len(slopes)
    lo, hi = slopes[(m + 1) // 2 - 1], slopes[m // 2]
    want = _round_half_away((lo + hi) / 2.0)
    r = sen_slope_daily(_events_from_series(spark, series)).collect()[0]
    assert (r.n_pairs, r.sen_slope_milli) == (m, want)


@settings(max_examples=10, deadline=None)
@given(series=SERIES)
def test_runs_test_matches_reference(spark, series):
    from pagila_etl_airflow_assignment_spark.operators.stats import runs_test_daily

    cs = [t[0] + t[1] + 1 for t in series]
    med = sorted(cs)[(len(cs) + 1) // 2 - 1]
    signs = [c > med for c in cs if c != med]
    a, b = sum(signs), len(signs) - sum(signs)
    runs = (
        1 + sum(1 for i in range(1, len(signs)) if signs[i] != signs[i - 1])
        if signs
        else 0
    )
    r = runs_test_daily(_events_from_series(spark, series)).collect()[0]
    got = (
        r.n_above or 0,
        r.n_below or 0,
        r.runs if r.runs is not None else 0,
    )
    assert got == (a, b, runs)
    if a > 0 and b > 0 and a + b > 1:
        nn = a + b
        var = 2.0 * a * b * (2.0 * a * b - nn) / (float(nn) * nn * (nn - 1))
        if var > 0:
            want = _round_half_away(1000.0 * (runs - (2.0 * a * b / nn + 1)) / math.sqrt(var))
            assert r.z_milli == want


# amounts per (customer, nation) for the Theil decomposition identity
AMOUNTS = st.lists(
    st.tuples(st.integers(1, 500), st.integers(0, 3)), min_size=2, max_size=20
)


@settings(max_examples=10, deadline=None)
@given(amounts=AMOUNTS)
def test_theil_decomposition_additive_on_arbitrary_data(spark, amounts):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        theil_decomposition_nation,
    )

    orders = spark.createDataFrame(
        [(i, 100 + i, float(v)) for i, (v, _) in enumerate(amounts, start=1)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(100 + i, g + 1) for i, (_, g) in enumerate(amounts, start=1)],
        "c_custkey long, c_nationkey long",
    )
    nation = spark.createDataFrame(
        [(g, f"N{g}") for g in (1, 2, 3, 4)], "n_nationkey long, n_name string"
    )
    got = {
        r.component: r.theil_milli
        for r in theil_decomposition_nation(orders, customer, nation).collect()
    }
    # additive identity to quantization error; components non-negative
    assert abs(got["total"] - (got["between"] + got["within"])) <= 1
    assert got["between"] >= 0 and got["within"] >= 0
