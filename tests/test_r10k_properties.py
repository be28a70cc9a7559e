"""Property tests for the round-10k devices (L-569..L-572)."""

from __future__ import annotations

import datetime as dt
import hashlib
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


def _mean_hup(total: int, n: int) -> int:
    return (2 * total + n) // (2 * n)


BASE = dt.date(2024, 1, 1)


# --- join-agg IVM (L-569) ---------------------------------------------------------------
#
# Orders: (orderkey, nation 0..3, cents). The identity: maintained view ==
# first-principles aggregate of the final state over the join.

JA_ORDERS = st.lists(
    st.tuples(st.integers(1, 60), st.integers(0, 3), st.integers(100, 99999)),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


def _ja_ref(rows, ins_mod=7, del_mod=11):
    live = [
        (o, nat, c)
        for o, nat, c in rows
        if o % ins_mod == 0 or (o % ins_mod != 0 and o % del_mod != 0)
    ]
    ins = defaultdict(int)
    dele = defaultdict(int)
    for o, nat, c in rows:
        if o % ins_mod == 0:
            ins[nat] += c
        elif o % del_mod == 0:
            dele[nat] += c
    agg = defaultdict(lambda: [0, 0])
    for _, nat, c in live:
        agg[nat][0] += 1
        agg[nat][1] += c
    return [
        (nat, n, s, ins.get(nat, 0), dele.get(nat, 0))
        for nat, (n, s) in sorted(agg.items())
    ]


@settings(max_examples=12, deadline=None)
@given(rows=JA_ORDERS)
def test_join_agg_ivm_identity(spark, rows):
    from pagila_etl_airflow_assignment_spark.operators.ivm import (
        maintained_join_agg_view,
    )

    orders = spark.createDataFrame(
        [
            (o, nat, "F", c / 100.0, "2024-01-01", "1-URGENT")
            for o, nat, c in rows
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    customer = spark.createDataFrame(
        [(nat, f"c{nat}", nat, 0.0, "BUILDING") for nat in range(4)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    got = [
        (
            r["nation"],
            r["n_live"],
            r["revenue_cents"],
            r["ins_cents"],
            r["del_cents"],
        )
        for r in maintained_join_agg_view(orders, customer, 7, 11).collect()
    ]
    assert got == _ja_ref(rows)


# --- AMS F2 (L-570) ---------------------------------------------------------------------

AMS_USERS = st.lists(
    st.tuples(st.integers(0, 50), st.integers(1, 6)),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)


def _ams_ref(users):
    from pagila_etl_airflow_assignment_spark.llm.hashing import (
        HASH_P,
        universal_params,
    )
    from pagila_etl_airflow_assignment_spark.operators.cmsketch import (
        AMS_GROUPS,
        AMS_SKETCHES,
    )

    n_users = len(users)
    f2 = sum(f * f for _, f in users)
    zs = []
    params = universal_params(AMS_SKETCHES)
    for a, b in params:
        z = 0
        for u, f in users:
            h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % HASH_P
            sgn = 1 - 2 * ((a * h + b) % HASH_P % 2)
            z += sgn * f
        zs.append(z)
    per_group = AMS_SKETCHES // AMS_GROUPS
    means = [
        sum(zs[g * per_group + i] ** 2 for i in range(per_group)) // per_group
        for g in range(AMS_GROUPS)
    ]
    ms = sorted(means)
    est = (ms[1] + ms[2]) // 2
    rel = _mean_hup(1000 * abs(est - f2), f2)
    return (n_users, f2, est, rel)


@settings(max_examples=10, deadline=None)
@given(users=AMS_USERS)
def test_ams_f2_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.cmsketch import ams_f2

    rows = []
    for u, f in users:
        for i in range(f):
            rows.append((u, "click", f"2024-01-01 0{i}:00:00", 0.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    [got] = ams_f2(df).collect()
    assert (
        got["n_users"],
        got["f2_exact"],
        got["f2_estimate"],
        got["rel_err_milli"],
    ) == _ams_ref(users)


# --- MG heavy hitters (L-571) -----------------------------------------------------------

MG_EVENTS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 9), st.integers(1, 6)),
    min_size=1,
    max_size=20,
    unique_by=lambda t: (t[0], t[1]),
)


def _mg_ref(cells, k=2, top=10):
    by_day = defaultdict(dict)
    for d, u, c in cells:
        by_day[d][u] = c
    caps = {}
    tracked = defaultdict(list)
    for d, users in by_day.items():
        ranked = sorted(users.items(), key=lambda t: (-t[1], t[0]))
        for u, c in ranked[:k]:
            tracked[u].append((d, c))
        caps[d] = ranked[k][1] if len(ranked) > k else 0
    all_caps = sum(caps.values())
    exact = defaultdict(int)
    for d, users in by_day.items():
        for u, c in users.items():
            exact[u] += c
    out = []
    for u, entries in tracked.items():
        lb = sum(c for _, c in entries)
        cwt = sum(caps[d] for d, _ in entries)
        ub = lb + all_caps - cwt
        out.append(
            (
                u,
                len(entries),
                lb,
                ub,
                exact[u],
                1 if lb <= exact[u] <= ub else 0,
            )
        )
    out.sort(key=lambda t: (-t[2], t[0]))
    return [(r + 1, *row) for r, row in enumerate(out[:top])]


@settings(max_examples=12, deadline=None)
@given(cells=MG_EVENTS)
def test_heavy_hitters_matches_reference(spark, cells):
    from pagila_etl_airflow_assignment_spark.operators.cmsketch import (
        heavy_hitters_mg,
    )

    rows = []
    eid = 0
    for d, u, c in cells:
        day = (BASE + dt.timedelta(days=d)).isoformat()
        for i in range(c):
            rows.append((u, "click", f"{day} 0{i}:00:00", 0.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = [
        (
            r["rnk"],
            r["user_id"],
            r["n_days_tracked"],
            r["lb"],
            r["ub"],
            r["exact"],
            r["within_bounds"],
        )
        for r in heavy_hitters_mg(df, k=2).collect()
    ]
    ref = _mg_ref(cells, k=2)
    assert got == ref
    assert all(row[6] == 1 for row in got)  # the MG guarantee itself


# --- top-k stability (L-572) ------------------------------------------------------------

TS_ROWS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(1, 8), st.integers(100, 9999)),
    min_size=2,
    max_size=30,
)


def _ts_ref(rows, k=3):
    rev = defaultdict(int)
    for yoff, pk, cents in rows:
        rev[(1994 + yoff, pk)] += cents
    by_year = defaultdict(list)
    for (yr, pk), r in rev.items():
        by_year[yr].append((pk, r))
    ranks = {}
    for yr, items in by_year.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        for rnk, (pk, _) in enumerate(items[:k], start=1):
            ranks[(yr, pk)] = rnk
    out = []
    for yr in sorted(by_year):
        if yr + 1 not in by_year:
            continue
        common = [
            (pk, ranks[(yr, pk)], ranks[(yr + 1, pk)])
            for pk in {p for (y, p) in ranks if y == yr}
            if (yr + 1, pk) in ranks
        ]
        if not common:
            continue
        nc = len(common)
        conc = disc = 0
        for i in range(nc):
            for j in range(nc):
                if common[i][0] < common[j][0]:
                    s = (common[i][1] - common[j][1]) * (
                        common[i][2] - common[j][2]
                    )
                    if s > 0:
                        conc += 1
                    else:
                        disc += 1
        tau = (
            _r((conc - disc) / (nc * (nc - 1) / 2), 6) if nc > 1 else None
        )
        out.append(
            (
                yr,
                yr + 1,
                nc,
                _mean_hup(1000 * nc, 2 * k - nc),
                conc,
                disc,
                tau,
            )
        )
    return out


@settings(max_examples=12, deadline=None)
@given(rows=TS_ROWS)
def test_topk_stability_matches_reference(spark, rows):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        topk_stability,
    )

    df = spark.createDataFrame(
        [
            (i, 1, pk, 1, 1.0, cents / 100.0, 0.0, 0.0, "N", "O",
             f"{1994 + yoff}-06-01")
            for i, (yoff, pk, cents) in enumerate(rows)
        ],
        "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    ).withColumn("l_shipdate", F.to_date("l_shipdate"))
    got = [
        (
            r["year_a"],
            r["year_b"],
            r["n_common"],
            r["jaccard_milli"],
            r["n_conc"],
            r["n_disc"],
            r["tau"],
        )
        for r in topk_stability(df, k=3).collect()
    ]
    assert got == _ts_ref(rows, k=3)
