"""Property tests for the round-10l devices (L-573..L-575)."""

from __future__ import annotations

import datetime as dt
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


BASE = dt.date(2024, 1, 1)


# --- CVaR (L-573) -----------------------------------------------------------------------

CV_DAYS = st.lists(st.integers(0, 100000), min_size=1, max_size=25)


def _cvar_ref(day_cents, levels=(50, 100)):
    n = len(day_cents)
    ordered = sorted(day_cents)
    out = []
    for a in levels:
        nt = (a * n + 999) // 1000
        tail = ordered[:nt]
        out.append(
            (
                a,
                n,
                nt,
                max(tail),
                _mean_hup_signed(sum(tail), nt),
            )
        )
    return out


@settings(max_examples=12, deadline=None)
@given(days=CV_DAYS)
def test_cvar_matches_reference(spark, days):
    from pagila_etl_airflow_assignment_spark.operators.stats import cvar_daily

    rows = [
        (1, "purchase", f"{(BASE + dt.timedelta(days=i)).isoformat()} 10:00:00",
         cents / 100.0)
        for i, cents in enumerate(days)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = [
        (
            r["alpha_milli"],
            r["n_days"],
            r["n_tail"],
            r["var_cents"],
            r["cvar_cents"],
        )
        for r in cvar_daily(df).collect()
    ]
    assert got == _cvar_ref(days)


# --- burstiness + memory (L-574) --------------------------------------------------------
#
# Per-user strictly increasing click times (seconds).

BM_USERS = st.lists(
    st.lists(st.integers(0, 86399), min_size=1, max_size=8, unique=True),
    min_size=1,
    max_size=6,
)


def _bm_ref(users):
    gaps = []
    pairs = []
    for times in users:
        ts = sorted(times)
        g = [b - a for a, b in zip(ts, ts[1:])]
        gaps.extend(g)
        pairs.extend(zip(g, g[1:]))
    n, npairs = len(gaps), len(pairs)
    mean_gap = _r(sum(gaps) / n, 6) if n else None
    b = None
    if n > 1:
        sg, sgg = sum(gaps), sum(x * x for x in gaps)
        mu = sg / n
        sd = math.sqrt((sgg - sg * sg / n) / (n - 1))
        if sd + mu > 0:
            b = _r((sd - mu) / (sd + mu), 6)
    m = None
    if npairs > 1:
        px = sum(x for x, _ in pairs)
        py = sum(y for _, y in pairs)
        pxx = sum(x * x for x, _ in pairs)
        pyy = sum(y * y for _, y in pairs)
        pxy = sum(x * y for x, y in pairs)
        cxy = pxy - px * py / npairs
        cxx = pxx - px * px / npairs
        cyy = pyy - py * py / npairs
        if cxx > 0 and cyy > 0:
            m = _r(cxy / math.sqrt(cxx * cyy), 6)
    return (n, npairs, mean_gap, b, m)


@settings(max_examples=10, deadline=None)
@given(users=BM_USERS)
def test_burstiness_memory_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        burstiness_memory,
    )

    rows = []
    eid = 0
    for u, times in enumerate(users):
        for t in sorted(times):
            h, rem = divmod(t, 3600)
            mnt, sec = divmod(rem, 60)
            rows.append(
                (eid, u, "click", f"2024-01-01 {h:02d}:{mnt:02d}:{sec:02d}", 0.0)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    [got] = burstiness_memory(df).collect()
    ref = _bm_ref(users)
    assert (
        got["n_gaps"],
        got["n_pairs"],
        got["mean_gap_s"],
        got["burstiness"],
        got["memory"],
    ) == ref


# --- SimRank (L-575) --------------------------------------------------------------------
#
# Baskets: list of item lists (basket per order). Core = 4 nodes, 2 rounds.

SR_BASKETS = st.lists(
    st.lists(st.integers(1, 8), min_size=2, max_size=4, unique=True),
    min_size=1,
    max_size=10,
)


def _sr_ref(baskets, core=4, rounds=2, top=15, c_milli=800):
    pairs = set()
    for b in baskets:
        bs = sorted(set(b))
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                pairs.add((bs[i], bs[j]))
    sym = defaultdict(set)
    for a, b in pairs:
        sym[a].add(b)
        sym[b].add(a)
    deg = {u: len(vs) for u, vs in sym.items()}
    core_nodes = sorted(deg, key=lambda u: (-deg[u], u))[:core]
    cset = set(core_nodes)
    nbr = {u: sorted(v for v in sym[u] if v in cset) for u in core_nodes}
    nd = {u: len(nbr[u]) for u in core_nodes}
    s = {
        (a, b): 1_000_000 if a == b else 0
        for a in core_nodes
        for b in core_nodes
    }
    for _ in range(rounds):
        new = {}
        for a in core_nodes:
            for b in core_nodes:
                if a == b:
                    new[(a, b)] = 1_000_000
                    continue
                tot = sum(s[(u, v)] for u in nbr[a] for v in nbr[b])
                new[(a, b)] = _rha(
                    c_milli * tot / (1000.0 * max(1, nd[a] * nd[b]))
                )
        s = new
    rows = []
    for a in core_nodes:
        for b in core_nodes:
            if a < b and nd[a] > 0 and nd[b] > 0:
                rows.append((a, b, nd[a], nd[b], s[(a, b)]))
    rows.sort(key=lambda t: (-t[4], t[0], t[1]))
    return [(r + 1, *row) for r, row in enumerate(rows[:top])]


@settings(max_examples=8, deadline=None)
@given(baskets=SR_BASKETS)
def test_simrank_matches_reference(spark, baskets):
    from pagila_etl_airflow_assignment_spark.operators.graph import (
        simrank_core,
    )

    rows = []
    ln = 0
    for o, items in enumerate(baskets):
        for pk in items:
            rows.append(
                (o, ln, pk, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-01")
            )
            ln += 1
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    ).withColumn("l_shipdate", F.to_date("l_shipdate"))
    got = [
        (r["rnk"], r["part_a"], r["part_b"], r["n_a"], r["n_b"], r["s_micro"])
        for r in simrank_core(df, core=4, rounds=2).collect()
    ]
    assert got == _sr_ref(baskets)
