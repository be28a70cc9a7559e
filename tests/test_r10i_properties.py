"""Property tests for the round-10i devices (L-563..L-565)."""

from __future__ import annotations

import math
from collections import defaultdict

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


def _rha(x: float) -> int:
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def _r(x: float, dp: int) -> float:
    return _rha(x * 10**dp) / 10**dp


def _mean_hup_signed(total: int, n: int) -> int:
    if total >= 0:
        return (2 * total + n) // (2 * n)
    return -((2 * -total + n) // (2 * n))


# --- quantile normalization (L-563) -----------------------------------------------------

DIM = 5
QN_VECS = st.lists(
    st.lists(
        st.integers(-8, 8).map(lambda v: v / 4.0), min_size=DIM, max_size=DIM
    ),
    min_size=2,
    max_size=12,
)


def _qn_ref(vecs):
    xm = [[_rha(x * 1e6) for x in v] for v in vecs]
    cols = defaultdict(list)  # pos -> [(value, vec_id)]
    for i, v in enumerate(xm):
        for p in range(DIM):
            cols[p + 1].append((v[p], i))
    targets = {}
    n = len(vecs)
    for r in range(1, n + 1):
        vals = []
        for p in cols:
            cols[p].sort()
            vals.append(cols[p][r - 1][0])
        targets[r] = _mean_hup_signed(sum(vals), DIM)
    out = []
    for p in sorted(cols):
        l1 = sum(abs(cols[p][r - 1][0] - targets[r]) for r in range(1, n + 1))
        sa = sum(targets[r] for r in range(1, n + 1))
        sq = sum(targets[r] ** 2 for r in range(1, n + 1))
        out.append((p, l1, sa, sq))
    return out


@settings(max_examples=10, deadline=None)
@given(vecs=QN_VECS)
def test_quantile_normalize_matches_reference(spark, vecs):
    from pagila_etl_airflow_assignment_spark.llm.embeddings import (
        quantile_normalize,
    )

    df = spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    got = [
        (r["pos"], r["l1_shift_micro"], r["sum_after"], r["sumsq_after"])
        for r in quantile_normalize(df).collect()
    ]
    ref = _qn_ref(vecs)
    assert got == ref
    # the self-certifying invariant: identical after-sums per dimension
    assert len({(sa, sq) for _, _, sa, sq in got}) == 1


# --- mantissa arc (L-564) ---------------------------------------------------------------

ARC_PRICES = st.lists(
    st.integers(1, 10_000_000).map(lambda c: c / 100.0),
    min_size=1,
    max_size=30,
)


def _arc_ref(prices):
    n = len(prices)
    cm = sm = 0
    for p in prices:
        m = math.log10(p) - math.floor(math.log10(p))
        cm += _rha(1e6 * math.cos(2 * math.pi * m))
        sm += _rha(1e6 * math.sin(2 * math.pi * m))
    l2 = (cm / n / 1e6) ** 2 + (sm / n / 1e6) ** 2
    return (n, cm, sm, _rha(1e6 * l2), _r(n * l2, 6))


@settings(max_examples=12, deadline=None)
@given(prices=ARC_PRICES)
def test_mantissa_arc_matches_reference(spark, prices):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        mantissa_arc_test,
    )

    df = spark.createDataFrame(
        [
            (i, i, "F", p, "2024-01-01", "1-URGENT")
            for i, p in enumerate(prices)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    [got] = mantissa_arc_test(df).collect()
    assert (
        got["n"],
        got["cos_micro"],
        got["sin_micro"],
        got["l2_micro"],
        got["arc_stat"],
    ) == _arc_ref(prices)


# --- Kingman VUT (L-565) ----------------------------------------------------------------

KV_ARRIVALS = st.lists(
    st.tuples(st.integers(0, 86_399_000), st.integers(1, 40_000)),
    min_size=2,
    max_size=20,
    unique_by=lambda t: t[0],
)


def _kv_ref(arrivals):
    rows = sorted(arrivals)
    n = len(rows)
    gaps = [b[0] - a[0] for a, b in zip(rows, rows[1:])]
    ng = len(gaps)
    sg, sgg = sum(gaps), sum(g * g for g in gaps)
    ss = sum(s for _, s in rows)
    sss = sum(s * s for _, s in rows)
    mean_gap = sg / ng
    var_gap = (sgg - sg * sg / ng) / (ng - 1) if ng > 1 else None
    mean_svc = ss / n
    var_svc = (sss - ss * ss / n) / (n - 1) if n > 1 else None
    ca2 = _r(var_gap / mean_gap**2, 6) if ng > 1 else None
    cs2 = _r(var_svc / mean_svc**2, 6) if n > 1 else None
    rho = mean_svc / mean_gap if mean_gap > 0 else None
    wq = None
    if ng > 1 and mean_gap > 0 and mean_svc > 0 and rho < 1:
        wq = _r(
            (rho / (1 - rho))
            * ((var_gap / mean_gap**2 + var_svc / mean_svc**2) / 2)
            * (mean_svc / 1000.0),
            6,
        )
    return (
        n,
        _rha(1e9 / mean_gap) if mean_gap > 0 else None,
        _rha(mean_svc),
        ca2,
        cs2,
        _r(rho, 6) if rho is not None else None,
        wq,
    )


@settings(max_examples=10, deadline=None)
@given(arrivals=KV_ARRIVALS)
def test_kingman_matches_reference(spark, arrivals):
    from pagila_etl_airflow_assignment_spark.operators.stats import kingman_vut

    rows = []
    for i, (ms, svc_milli) in enumerate(sorted(arrivals)):
        h, rem = divmod(ms // 1000, 3600)
        m, s = divmod(rem, 60)
        frac = ms % 1000
        rows.append(
            (
                i,
                1,
                "purchase",
                f"2024-01-01 {h:02d}:{m:02d}:{s:02d}.{frac:03d}",
                svc_milli / 1000.0,
            )
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    [got] = kingman_vut(df).collect()
    assert (
        got["n"],
        got["lambda_micro_per_s"],
        got["tau_s_milli"],
        got["ca2"],
        got["cs2"],
        got["rho"],
        got["wq_seconds"],
    ) == _kv_ref(arrivals)
