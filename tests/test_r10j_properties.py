"""Property tests for the round-10j devices (L-566..L-568)."""

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


def _mean_hup(total: int, n: int) -> int:
    return (2 * total + n) // (2 * n)


BASE = dt.date(2024, 1, 1)


# --- padding waste (L-566) --------------------------------------------------------------

PW_LENS = st.lists(st.integers(0, 40), min_size=1, max_size=25)


def _pw_ref(lens, bucket_counts=(1, 2, 4, 8)):
    n = len(lens)
    ordered = sorted(lens)
    out = []
    for b in bucket_counts:
        buckets = defaultdict(list)
        for r, ln in enumerate(ordered, start=1):
            buckets[(r - 1) * b // n].append(ln)
        total = sum(lens)
        padded = sum(len(v) * max(v) for v in buckets.values())
        waste = padded - total
        wm = _mean_hup(1000 * waste, padded) if padded > 0 else 0
        out.append((b, n, total, padded, waste, wm))
    return out


@settings(max_examples=12, deadline=None)
@given(lens=PW_LENS)
def test_padding_waste_matches_reference(spark, lens):
    from pagila_etl_airflow_assignment_spark.llm.packing import (
        padding_waste_curve,
    )

    df = spark.createDataFrame(
        [(i, " ".join(["w"] * ln), "en", "s0", 2 * ln) for i, ln in enumerate(lens)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = [
        (
            r["n_buckets"],
            r["n_docs"],
            r["total_tokens"],
            r["padded_tokens"],
            r["waste_tokens"],
            r["waste_milli"],
        )
        for r in padding_waste_curve(df).collect()
    ]
    assert got == _pw_ref(lens)


# --- O'Brien-Fleming (L-567) ------------------------------------------------------------
#
# Users: (day_offset 0..9, purchase_cents). Arm comes from md5 parity.

OBF_USERS = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 40000)),
    min_size=4,
    max_size=24,
)


def _md5_arm(u):
    import hashlib

    return int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2


def _obf_ref(users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        OBF_BOUNDS_MILLI,
    )

    days = sorted({d for d, _ in users})
    nd = len(days)
    out = []
    for look in range(1, 6):
        cutoff = days[(look * nd + 4) // 5 - 1]
        arms = {0: [], 1: []}
        for u, (d, cents) in enumerate(users):
            if d <= cutoff:
                arms[_md5_arm(u)].append(cents)
        n_a, n_b = len(arms[0]), len(arms[1])
        sa, sb = sum(arms[0]), sum(arms[1])
        qa = sum(y * y for y in arms[0])
        qb = sum(y * y for y in arms[1])
        z = None
        if n_a > 1 and n_b > 1:
            va = (qa - sa * sa / n_a) / (n_a - 1)
            vb = (qb - sb * sb / n_b) / (n_b - 1)
            se2 = va / n_a + vb / n_b
            if se2 > 0:
                z = _r((sa / n_a - sb / n_b) / math.sqrt(se2), 6)
        bound = OBF_BOUNDS_MILLI[look - 1]
        crossed = 1 if z is not None and abs(z) * 1000 > bound else 0
        out.append(
            (
                look,
                BASE + dt.timedelta(days=cutoff),
                n_a,
                n_b,
                z,
                bound,
                crossed,
            )
        )
    return out


@settings(max_examples=8, deadline=None)
@given(users=OBF_USERS)
def test_obrien_fleming_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        obrien_fleming,
    )

    rows = []
    for u, (d, cents) in enumerate(users):
        day = (BASE + dt.timedelta(days=d)).isoformat()
        rows.append((u, "purchase", f"{day} 10:00:00", cents / 100.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = [
        (
            r["look"],
            r["cutoff_day"],
            r["n_a"],
            r["n_b"],
            r["z_stat"],
            r["bound_milli"],
            r["crossed"],
        )
        for r in obrien_fleming(df).collect()
    ]
    assert got == _obf_ref(users)


# --- cache hit curve (L-568) ------------------------------------------------------------

CH_ROWS = st.lists(st.integers(1, 12), min_size=1, max_size=40)


def _ch_ref(partkeys, sizes=(1, 4, 16, 64, 256)):
    freq = defaultdict(int)
    for p in partkeys:
        freq[p] += 1
    ordered = sorted(freq.items(), key=lambda t: (-t[1], t[0]))
    total = len(partkeys)
    n_items = len(ordered)
    out = []
    for c in sizes:
        hits = sum(f for _, f in ordered[: min(c, n_items)])
        out.append((c, n_items, hits, total, _mean_hup(1000 * hits, total)))
    return out


@settings(max_examples=12, deadline=None)
@given(partkeys=CH_ROWS)
def test_cache_hit_curve_matches_reference(spark, partkeys):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        cache_hit_curve,
    )

    df = spark.createDataFrame(
        [
            (i, 1, p, i, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-01")
            for i, p in enumerate(partkeys)
        ],
        "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    ).withColumn("l_shipdate", F.to_date("l_shipdate"))
    got = [
        (r["cache_size"], r["n_items"], r["hits"], r["total"], r["hit_milli"])
        for r in cache_hit_curve(df).collect()
    ]
    assert got == _ch_ref(partkeys)
