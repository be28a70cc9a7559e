"""Property tests for the round-9 statistical/warehouse devices
(L-422..L-440): each Spark plan must equal a direct Python reference of the
same exact-arithmetic chain on arbitrary series — the device-level guarantee
the DuckDB oracles then certify at corpus scale."""

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


def _rha(x: float) -> int:
    """Match Spark/DuckDB round(): half away from zero, not banker's."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


# per-day lists of event centi-values (>= 2 days, 1-4 events per day)
DAY_VALUE_SERIES = st.lists(
    st.lists(st.integers(-500, 500), min_size=1, max_size=4),
    min_size=2,
    max_size=12,
)

# per-day event counts (>= 2 days)
DAY_COUNTS = st.lists(st.integers(1, 6), min_size=2, max_size=34)


def _events_from_values(spark, series, event_type="click"):
    import datetime as _dt

    rows = []
    base = _dt.date(2024, 1, 1)
    for d, centis in enumerate(series):
        # real date arithmetic: f"2024-01-{d}" breaks past day 31 (the
        # silent-NULL to_timestamp dropped a day and a randomized
        # Hypothesis run caught it via kpss/hurst n_days mismatches)
        day = (base + _dt.timedelta(days=d)).isoformat()
        rows += [
            (1, event_type, f"{day} 10:00:00", c / 100.0) for c in centis
        ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def _events_from_counts(spark, counts):
    return _events_from_values(spark, [[100] * c for c in counts])


# --- Jarque-Bera ------------------------------------------------------------


def _jb_ref(counts):
    n = len(counts)
    s1 = sum(counts)
    s2 = sum(c * c for c in counts)
    s3 = sum(c**3 for c in counts)
    s4 = sum(c**4 for c in counts)
    mean, r2, r3, r4 = s1 / n, s2 / n, s3 / n, s4 / n
    m2 = r2 - mean * mean
    m3 = r3 - 3 * mean * r2 + 2 * mean**3
    m4 = r4 - 4 * mean * r3 + 6 * mean * mean * r2 - 3 * mean**4
    if m2 <= 0:
        return 0, 0, 0
    g1 = m3 / m2**1.5
    g2 = m4 / (m2 * m2) - 3.0
    return (
        _rha(1000 * g1),
        _rha(1000 * g2),
        _rha(1000 * n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)),
    )


@settings(max_examples=8, deadline=None)
@given(counts=DAY_COUNTS)
def test_jarque_bera_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        jarque_bera_daily,
    )

    r = jarque_bera_daily(_events_from_counts(spark, counts)).collect()[0]
    sk, ek, jb = _jb_ref(counts)
    assert r.n_days == len(counts)
    assert (r.skew_milli, r.exkurt_milli, r.jb_milli) == (sk, ek, jb)


# --- Durbin-Watson ----------------------------------------------------------


def _dw_ref(series):
    ys = [sum(cs) for cs in series]
    n = len(ys)
    st_ = sum(range(1, n + 1))
    stt = sum(t * t for t in range(1, n + 1))
    sy = sum(ys)
    sty = sum(t * y for t, y in zip(range(1, n + 1), ys))
    ctt = float(n * stt - st_ * st_)
    cty = float(n * sty - st_ * sy)
    tbar, ybar = st_ / n, sy / n
    slope = cty / ctt if ctt > 0 else 0.0
    es = [
        _rha(1000 * (y - (ybar + slope * (t - tbar))))
        for t, y in zip(range(1, n + 1), ys)
    ]
    see = sum(e * e for e in es)
    sdd = sum((b - a) ** 2 for a, b in zip(es, es[1:]))
    dw = _rha(1000 * sdd / see) if see > 0 else 0
    return _rha(1e6 * cty / ctt) if ctt > 0 else 0, dw


@settings(max_examples=8, deadline=None)
@given(series=DAY_VALUE_SERIES)
def test_durbin_watson_matches_reference(spark, series):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        durbin_watson_daily,
    )

    r = durbin_watson_daily(_events_from_values(spark, series)).collect()[0]
    slope_micro, dw_milli = _dw_ref(series)
    assert r.n_days == len(series)
    assert (r.slope_micro, r.dw_milli) == (slope_micro, dw_milli)


# --- Grubbs -----------------------------------------------------------------


def _grubbs_ref(series):
    ms = [_rha(1e6 * (sum(cs) / len(cs)) / 100.0) for cs in series]
    n = len(ms)
    s1 = sum(ms)
    s2 = sum(m * m for m in ms)
    devs = [abs(n * m - s1) for m in ms]
    best = max(range(n), key=lambda i: (devs[i], -i))
    css_n = float(n * s2 - s1 * s1)
    if css_n > 0 and n > 1:
        g = _rha(
            1000 * devs[best] / (n * math.sqrt(css_n / n / (n - 1)))
        )
    else:
        g = 0
    return g, best + 1


@settings(max_examples=8, deadline=None)
@given(series=DAY_VALUE_SERIES)
def test_grubbs_matches_reference(spark, series):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        grubbs_test_daily,
    )

    r = grubbs_test_daily(_events_from_values(spark, series)).collect()[0]
    g, day = _grubbs_ref(series)
    assert r.n_days == len(series)
    assert r.g_milli == g
    assert r.outlier_day.day == day


# --- Levene / Bartlett -------------------------------------------------------

GROUPED_VALUES = st.lists(
    st.lists(st.integers(-500, 500), min_size=2, max_size=6),
    min_size=2,
    max_size=4,
)


def _grouped_events(spark, groups):
    rows = []
    for gi, vals in enumerate(groups):
        for c in vals:
            rows.append((1, f"type{gi}", "2024-01-05 10:00:00", c / 100.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def _levene_ref(groups):
    k = len(groups)
    n_total = sum(len(g) for g in groups)
    szs, bsss, wsss = [], [], []
    for g in groups:
        sc, cnt = sum(g), len(g)
        zs = [_rha(1000 * abs(c - sc / cnt)) for c in g]
        sz = sum(zs)
        szz = sum(z * z for z in zs)
        szs.append(sz)
        bsss.append(_rha(sz * float(sz) / cnt / 1e6))
        wsss.append(_rha((szz - float(sz) * sz / cnt) / 1e6))
    sz_all = float(sum(szs))
    bss, wss = sum(bsss), sum(wsss)
    if k > 1 and n_total > k and wss > 0:
        return _rha(
            1000
            * ((bss - sz_all * sz_all / n_total / 1e6) / (k - 1))
            / (wss / (n_total - k))
        )
    return 0


@settings(max_examples=8, deadline=None)
@given(groups=GROUPED_VALUES)
def test_levene_matches_reference(spark, groups):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        levene_test,
    )

    r = levene_test(_grouped_events(spark, groups)).collect()[0]
    assert r.k_groups == len(groups)
    assert r.n_total == sum(len(g) for g in groups)
    assert r.w_milli == _levene_ref(groups)


def _bartlett_ref(groups):
    groups = [g for g in groups if len(g) > 1]
    k = len(groups)
    n_total = sum(len(g) for g in groups)
    pooled_m, lns_m, inv_p = 0, 0, 0
    for g in groups:
        n, sc = len(g), sum(g)
        scc = sum(c * c for c in g)
        css = float(scc) - float(sc) * sc / n
        pooled_m += _rha(1e3 * css)
        lns_m += _rha(1e6 * (n - 1) * math.log(css / (n - 1))) if css > 0 else 0
        inv_p += _rha(1e12 / (n - 1))
    if k > 1 and n_total > k and pooled_m > 0:
        return _rha(
            1000.0
            * (
                (n_total - k) * math.log(pooled_m / 1e3 / (n_total - k))
                - lns_m / 1e6
            )
            / (1.0 + (inv_p / 1e12 - 1.0 / (n_total - k)) / (3.0 * (k - 1)))
        )
    return 0


@settings(max_examples=8, deadline=None)
@given(groups=GROUPED_VALUES)
def test_bartlett_matches_reference(spark, groups):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        bartlett_test,
    )

    r = bartlett_test(_grouped_events(spark, groups)).collect()[0]
    assert r.k_groups == len(groups)
    assert r.chi2_milli == _bartlett_ref(groups)


# --- Cochran-Armitage --------------------------------------------------------

# per day-part bucket: (total events, errors among them); 1-4 buckets
CA_BUCKETS = st.lists(
    st.tuples(st.integers(1, 8), st.integers(0, 8)).map(
        lambda t: (max(t), min(t))
    ),
    min_size=1,
    max_size=4,
)


def _ca_events(spark, buckets):
    rows = []
    for b, (n, r) in enumerate(buckets):
        hour = b * 6
        for i in range(n):
            et = "error" if i < r else "click"
            rows.append((1, et, f"2024-01-05 {hour:02d}:30:00", 1.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def _ca_ref(buckets):
    n_total = sum(n for n, _ in buckets)
    r_total = sum(r for _, r in buckets)
    swr = sum(b * r for b, (_, r) in enumerate(buckets))
    swn = sum(b * n for b, (n, _) in enumerate(buckets))
    sw2n = sum(b * b * n for b, (n, _) in enumerate(buckets))
    if 0 < r_total < n_total:
        p = r_total / n_total
        var = p * (1 - p) * (sw2n - float(swn) * swn / n_total)
        if var > 0:
            return _rha(1000 * (swr - p * swn) / math.sqrt(var))
    return 0


@settings(max_examples=8, deadline=None)
@given(buckets=CA_BUCKETS)
def test_cochran_armitage_matches_reference(spark, buckets):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        cochran_armitage_trend,
    )

    r = cochran_armitage_trend(_ca_events(spark, buckets)).collect()[0]
    assert r.n_groups == len(buckets)
    assert r.n_total == sum(n for n, _ in buckets)
    assert r.z_milli == _ca_ref(buckets)


# --- McNemar / Cochran's Q ----------------------------------------------------

# per user: (active first half, active second half), at least one true
USER_HALVES = st.lists(
    st.sampled_from([(1, 0), (0, 1), (1, 1)]), min_size=1, max_size=20
)


@settings(max_examples=8, deadline=None)
@given(halves=USER_HALVES)
def test_mcnemar_matches_reference(spark, halves):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        mcnemar_test,
    )

    rows = []
    for u, (a, b) in enumerate(halves):
        if a:
            rows.append((u, "click", "2024-01-05 10:00:00", 1.0))
        if b:
            rows.append((u, "click", "2024-01-25 10:00:00", 1.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = mcnemar_test(df).collect()[0]
    n01 = sum(1 for a, b in halves if not a and b)
    n10 = sum(1 for a, b in halves if a and not b)
    assert (r.n_users, r.n01, r.n10) == (len(halves), n01, n10)
    exp = (
        _rha(1000 * (abs(n01 - n10) - 1) ** 2 / (n01 + n10))
        if n01 + n10 > 0
        else 0
    )
    assert r.chi2_milli == exp


USER_FLAGS = st.lists(
    st.tuples(st.booleans(), st.booleans(), st.booleans()),
    min_size=1,
    max_size=20,
)


@settings(max_examples=8, deadline=None)
@given(flags=USER_FLAGS)
def test_cochran_q_matches_reference(spark, flags):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        COCHRAN_Q_TYPES,
        cochran_q_test,
    )

    rows = []
    for u, fs in enumerate(flags):
        rows.append((u, "signup", "2024-01-05 10:00:00", 1.0))
        for t, f in zip(COCHRAN_Q_TYPES, fs):
            if f:
                rows.append((u, t, "2024-01-06 10:00:00", 1.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = cochran_q_test(df).collect()[0]
    k = 3
    t_total = sum(sum(fs) for fs in flags)
    srr = sum(sum(fs) ** 2 for fs in flags)
    cs = [sum(fs[j] for fs in flags) for j in range(k)]
    denom = k * t_total - srr
    exp = (
        _rha(
            1000.0
            * (k - 1)
            * (k * sum(c * c for c in cs) - t_total * t_total)
            / denom
        )
        if denom > 0
        else 0
    )
    assert r.n_users == len(flags)
    assert r.q_milli == exp


# --- KPSS ---------------------------------------------------------------------


def _kpss_ref(counts):
    n = len(counts)
    s1 = sum(counts)
    es = [n * c - s1 for c in counts]
    cs, acc = [], 0
    for e in es:
        acc += e
        cs.append(acc)
    see = sum(e * e for e in es)
    scc = sum(c * c for c in cs)
    return _rha(1e6 * scc / (n * see)) if see > 0 else 0


@settings(max_examples=8, deadline=None)
@given(counts=DAY_COUNTS)
def test_kpss_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import kpss_daily

    r = kpss_daily(_events_from_counts(spark, counts)).collect()[0]
    assert r.n_days == len(counts)
    assert r.kpss_micro == _kpss_ref(counts)


# --- Wilcoxon signed-rank ------------------------------------------------------

# per day: (clicks, errors)
DAY_PAIRS = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(
        lambda t: t[0] + t[1] > 0
    ),
    min_size=2,
    max_size=14,
)


def _wilcoxon_ref(pairs):
    ds = [x - y for x, y in pairs if x != y]
    n = len(ds)
    if n == 0:
        return 0, 0, 0
    groups = {}
    for d in ds:
        groups.setdefault(abs(d), [0, 0])
        groups[abs(d)][0] += 1
        if d > 0:
            groups[abs(d)][1] += 1
    w2, tie3, cum = 0, 0, 0
    for ad in sorted(groups):
        t, pos = groups[ad]
        w2 += pos * (2 * cum + t + 1)
        tie3 += t**3 - t
        cum += t
    var = n * (n + 1.0) * (2 * n + 1) / 24.0 - tie3 / 48.0
    z = (
        _rha(1000 * (w2 / 2.0 - n * (n + 1.0) / 4.0) / math.sqrt(var))
        if var > 0
        else 0
    )
    return n, w2, z


@settings(max_examples=8, deadline=None)
@given(pairs=DAY_PAIRS)
def test_wilcoxon_matches_reference(spark, pairs):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        wilcoxon_signed_rank_daily,
    )

    rows = []
    for d, (x, y) in enumerate(pairs, start=1):
        day = f"2024-01-{d:02d}"
        rows += [(1, "click", f"{day} 10:00:00", 1.0)] * x
        rows += [(1, "error", f"{day} 11:00:00", 1.0)] * y
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = wilcoxon_signed_rank_daily(df).collect()[0]
    n, w2, z = _wilcoxon_ref(pairs)
    assert (r.n_pairs, r.w2_plus, r.z_milli) == (n, w2, z)


# --- Periodogram ---------------------------------------------------------------


def _spectral_ref(counts):
    n = len(counts)
    s1 = sum(counts)
    out = {}
    for p in range(2, 15):
        a = sum(
            _rha(1e6 * (c - s1 / n) * math.cos(2 * math.pi * t / p))
            for t, c in enumerate(counts, start=1)
        )
        b = sum(
            _rha(1e6 * (c - s1 / n) * math.sin(2 * math.pi * t / p))
            for t, c in enumerate(counts, start=1)
        )
        out[p] = _rha(math.sqrt(float(a) * a + float(b) * b) / n)
    return out


@settings(max_examples=6, deadline=None)
@given(counts=DAY_COUNTS)
def test_spectral_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        spectral_periodogram_daily,
    )

    rows = spectral_periodogram_daily(
        _events_from_counts(spark, counts)
    ).collect()
    exp = _spectral_ref(counts)
    assert {r.period: r.amp_micro for r in rows} == exp


# --- Hurst R/S -------------------------------------------------------------------


def _hurst_ref(counts):
    rs = {}
    for w in (4, 8, 16):
        vals = []
        for b in range(len(counts) // w):
            blk = counts[b * w : (b + 1) * w]
            sb = sum(blk)
            wc, acc = [], 0
            for j, c in enumerate(blk, start=1):
                acc += c
                wc.append(w * acc - j * sb)
            denom2 = w * sum(c * c for c in blk) - sb * sb
            if denom2 > 0:
                vals.append(
                    _rha(1000 * (max(wc) - min(wc)) / math.sqrt(denom2))
                )
        rs[w] = _rha(sum(vals) / len(vals)) if vals else 0
    if rs[4] > 0 and rs[16] > 0:
        h = _rha(
            1000
            * (math.log(rs[16] / 1000.0) - math.log(rs[4] / 1000.0))
            / (2 * math.log(2.0))
        )
    else:
        h = 0
    return rs, h


@settings(max_examples=8, deadline=None)
@given(counts=DAY_COUNTS)
def test_hurst_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        hurst_rs_daily,
    )

    r = hurst_rs_daily(_events_from_counts(spark, counts)).collect()[0]
    rs, h = _hurst_ref(counts)
    assert r.n_days == len(counts)
    assert (r.rs4_milli, r.rs8_milli, r.rs16_milli) == (rs[4], rs[8], rs[16])
    assert r.hurst_milli == h


# --- Atkinson index ------------------------------------------------------------

CUST_REVENUES = st.lists(st.integers(1, 10**7), min_size=1, max_size=25)


@settings(max_examples=8, deadline=None)
@given(revs=CUST_REVENUES)
def test_atkinson_matches_reference(spark, revs):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        atkinson_index_customers,
    )

    rows = [
        (u, u, "O", r / 100.0, "1995-03-01 00:00:00", "1-URGENT")
        for u, r in enumerate(revs)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    r = atkinson_index_customers(df).collect()[0]
    n = len(revs)
    s_ln = sum(_rha(1e6 * math.log(c / 100.0)) for c in revs)
    s_rev = sum(revs)
    exp = _rha(
        1000
        * (1.0 - math.exp(s_ln / 1e6 / n) / (s_rev / 100.0 / n))
    )
    assert (r.n_customers, r.atkinson_milli) == (n, exp)


# --- Wilson ranking --------------------------------------------------------------

BRAND_COUNTS = st.lists(
    st.tuples(st.integers(1, 12), st.integers(0, 12)).map(
        lambda t: (max(t), min(t))
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=8, deadline=None)
@given(brands=BRAND_COUNTS)
def test_wilson_matches_reference(spark, brands):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        WILSON_TOP_K,
        WILSON_Z,
        wilson_return_ranking,
    )

    li_rows, part_rows = [], []
    key = 0
    for b, (n, r) in enumerate(brands):
        part_rows.append((b, f"part{b}", f"Brand#{b:02d}", "t", 1, 1.0))
        for i in range(n):
            key += 1
            li_rows.append(
                (key, b, 1, 1, 1.0, 10.0, 0.0, 0.0,
                 "R" if i < r else "N", "O", "1995-03-05 00:00:00")
            )
    li = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    part = spark.createDataFrame(
        part_rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    got = wilson_return_ranking(li, part).collect()
    z2 = WILSON_Z * WILSON_Z
    exp = []
    for b, (n, r) in enumerate(brands):
        lb = _rha(
            1000
            * (
                (r + z2 / 2.0) / (n + z2)
                - WILSON_Z
                / (n + z2)
                * math.sqrt(float(r) * (n - r) / n + z2 / 4.0)
            )
        )
        exp.append((f"Brand#{b:02d}", n, r, lb))
    exp.sort(key=lambda t: (-t[3], t[0]))
    exp = exp[:WILSON_TOP_K]
    assert [tuple(r) for r in got] == exp


# --- OTIF fill rate ----------------------------------------------------------------

# per order: list of line ship lags (days); all in one month
ORDER_LAGS = st.lists(
    st.lists(st.integers(0, 60), min_size=1, max_size=4),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(orders_lags=ORDER_LAGS)
def test_otif_matches_reference(spark, orders_lags):
    import datetime as dt

    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        OTIF_DAYS,
        otif_fill_rate,
    )

    base = dt.date(1995, 3, 10)
    o_rows, li_rows = [], []
    for ok, lags in enumerate(orders_lags):
        o_rows.append((ok, ok, "O", 1.0, "1995-03-10 00:00:00", "1-URGENT"))
        for i, lag in enumerate(lags):
            ship = base + dt.timedelta(days=lag)
            li_rows.append(
                (ok, 1, 1, i, 1.0, 10.0, 0.0, 0.0, "N", "O",
                 f"{ship.isoformat()} 00:00:00")
            )
    o = spark.createDataFrame(
        o_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    r = otif_fill_rate(li, o).collect()[0]
    n = len(orders_lags)
    otif = sum(1 for lags in orders_lags if max(lags) <= OTIF_DAYS)
    assert (r.n_orders, r.otif_orders, r.otif_milli) == (
        n,
        otif,
        _rha(1000 * otif / n),
    )


# --- Tracking signal ----------------------------------------------------------------

# one brand, monthly centi-quantities
MONTHLY_QTY = st.lists(st.integers(1, 5000), min_size=2, max_size=12)


@settings(max_examples=8, deadline=None)
@given(qtys=MONTHLY_QTY)
def test_tracking_signal_matches_reference(spark, qtys):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        tracking_signal_brands,
    )

    o_rows, li_rows = [], []
    for m, q in enumerate(qtys):
        o_rows.append(
            (m, 1, "O", 1.0, f"1995-{m + 1:02d}-05 00:00:00", "1-URGENT")
        )
        li_rows.append(
            (m, 1, 1, 1, q / 100.0, 10.0, 0.0, 0.0, "N", "O",
             f"1995-{m + 1:02d}-10 00:00:00")
        )
    o = spark.createDataFrame(
        o_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    part = spark.createDataFrame(
        [(1, "p", "Brand#11", "t", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    r = tracking_signal_brands(li, o, part).collect()[0]
    es = [b - a for a, b in zip(qtys, qtys[1:])]
    m = len(es)
    ce, cae = sum(es), sum(abs(e) for e in es)
    exp = _rha(1000.0 * ce * m / cae) if cae > 0 else 0
    assert (r.p_brand, r.n_months, r.ts_milli) == ("Brand#11", m, exp)


# --- Bass diffusion -----------------------------------------------------------------

# monthly new-customer counts
MONTHLY_NEW = st.lists(st.integers(1, 40), min_size=3, max_size=12)


@settings(max_examples=8, deadline=None)
@given(news=MONTHLY_NEW)
def test_bass_matches_reference(spark, news):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        bass_diffusion_fit,
    )

    rows, cust = [], 0
    for m, k in enumerate(news):
        for _ in range(k):
            rows.append(
                (cust, cust, "O", 1.0, f"1995-{m + 1:02d}-05 00:00:00",
                 "1-URGENT")
            )
            cust += 1
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    r = bass_diffusion_fit(df).collect()[0]
    n = len(news)
    xs, ys, acc = [], [], 0
    for k in news:
        xs.append(acc)
        ys.append(k)
        acc += k
    sy = float(sum(ys)); sx = float(sum(xs))
    sx2 = float(sum(x * x for x in xs)); sx3 = float(sum(x**3 for x in xs))
    sx4 = float(sum(x**4 for x in xs))
    sxy = float(sum(x * y for x, y in zip(xs, ys)))
    sx2y = float(sum(x * x * y for x, y in zip(xs, ys)))
    dn = float(n)
    det = (dn * (sx2 * sx4 - sx3 * sx3) - sx * (sx * sx4 - sx3 * sx2)
           + sx2 * (sx * sx3 - sx2 * sx2))
    det_a = (sy * (sx2 * sx4 - sx3 * sx3) - sx * (sxy * sx4 - sx2y * sx3)
             + sx2 * (sxy * sx3 - sx2y * sx2))
    det_b = (dn * (sxy * sx4 - sx2y * sx3) - sy * (sx * sx4 - sx3 * sx2)
             + sx2 * (sx * sx2y - sx2 * sxy))
    det_c = (dn * (sx2 * sx2y - sx3 * sxy) - sx * (sx * sx2y - sx2 * sxy)
             + sy * (sx * sx3 - sx2 * sx2))
    a = det_a / det if det != 0 else 0.0
    b = det_b / det if det != 0 else 0.0
    c = det_c / det if det != 0 else 0.0
    if c < 0 and b * b - 4 * a * c >= 0:
        m_root = (-b - math.sqrt(b * b - 4 * a * c)) / (2 * c)
    else:
        m_root = 0.0
    p_micro = _rha(1e6 * a / m_root) if m_root > 0 else 0
    q_micro = _rha(-1e6 * c * m_root) if m_root > 0 else 0
    assert r.n_months == n
    assert (r.p_micro, r.q_micro, r.m_est) == (
        p_micro, q_micro, _rha(m_root)
    )


# --- Theta forecast backtest ----------------------------------------------------------

MONTHLY_REV = st.lists(st.integers(100, 10**6), min_size=3, max_size=12)


def _theta_ref(cents):
    al = 0.5
    n = len(cents)
    sae_t, sae_n, scored = 0, 0, 0
    for T in range(3, n + 1):
        ses = 0
        for s in range(1, T):
            y = cents[s - 1]
            w = (1 - al) ** (T - 2) if s == 1 else al * (1 - al) ** (T - 1 - s)
            ses += _rha(y / 100.0 * 1e6 * w)
        m1 = T - 1
        st1 = sum(range(1, T))
        stt1 = sum(t * t for t in range(1, T))
        sy1 = sum(cents[:m1])
        sty1 = sum(t * y for t, y in zip(range(1, T), cents[:m1]))
        den = m1 * stt1 - st1 * st1
        slope = (m1 * sty1 - st1 * sy1) / den if den != 0 else 0.0
        trend = sy1 / m1 + slope * (T - st1 / m1)
        theta = _rha(0.5 * (ses + 1e6 * trend / 100.0))
        y_self = _rha(cents[T - 1] / 100.0 * 1e6)
        y_prev = _rha(cents[T - 2] / 100.0 * 1e6)
        sae_t += abs(y_self - theta)
        sae_n += abs(y_self - y_prev)
        scored += 1
    return (
        _rha(sae_t / scored) if scored else 0,
        _rha(sae_n / scored) if scored else 0,
    )


@settings(max_examples=8, deadline=None)
@given(revs=MONTHLY_REV)
def test_theta_matches_reference(spark, revs):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        theta_forecast_backtest,
    )

    rows = [
        (m, 1, "O", r / 100.0, f"1995-{m + 1:02d}-05 00:00:00", "1-URGENT")
        for m, r in enumerate(revs)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    r = theta_forecast_backtest(df).collect()[0]
    mae_t, mae_n = _theta_ref(revs)
    assert r.n_months == len(revs)
    assert (r.theta_mae_micro, r.naive_mae_micro) == (mae_t, mae_n)


# --- PACF (Durbin-Levinson) ------------------------------------------------------


def _pacf_ref(counts):
    n = len(counts)
    s1 = sum(counts)
    xs = [n * c - s1 for c in counts]
    s0 = sum(x * x for x in xs)

    def lag_sum(k):
        return sum(x * y for x, y in zip(xs[k:], xs[:-k] if k else xs))

    r1 = lag_sum(1) / s0 if s0 > 0 else 0.0
    r2 = lag_sum(2) / s0 if s0 > 0 else 0.0
    r3 = lag_sum(3) / s0 if s0 > 0 else 0.0
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1) if 1 - r1 * r1 != 0 else 0.0
    phi21 = r1 * (1 - phi22)
    den = 1 - phi21 * r1 - phi22 * r2
    p3 = _rha(1000 * (r3 - phi21 * r2 - phi22 * r1) / den) if den != 0 else 0
    return _rha(1000 * r1), _rha(1000 * phi22), p3


@settings(max_examples=8, deadline=None)
@given(counts=st.lists(st.integers(1, 6), min_size=4, max_size=20))
def test_pacf_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import pacf_daily

    r = pacf_daily(_events_from_counts(spark, counts)).collect()[0]
    p1, p2, p3 = _pacf_ref(counts)
    assert r.n_days == len(counts)
    assert (r.pacf1_milli, r.pacf2_milli, r.pacf3_milli) == (p1, p2, p3)


# --- Breusch-Pagan -----------------------------------------------------------------


def _bp_ref(series):
    ys = [sum(cs) for cs in series]
    n = len(ys)
    st_ = sum(range(1, n + 1))
    stt = sum(t * t for t in range(1, n + 1))
    sy = sum(ys)
    sty = sum(t * y for t, y in zip(range(1, n + 1), ys))
    ctt = float(n * stt - st_ * st_)
    cty = float(n * sty - st_ * sy)
    tbar, ybar = st_ / n, sy / n
    slope = cty / ctt if ctt > 0 else 0.0
    us = [
        _rha((y - (ybar + slope * (t - tbar))) / 100.0) ** 2
        for t, y in zip(range(1, n + 1), ys)
    ]
    su = sum(us)
    stu = sum(t * u for t, u in zip(range(1, n + 1), us))
    suu = sum(u * u for u in us)
    dt = n * stt - st_ * st_
    du = n * suu - su * su
    if dt > 0 and du > 0:
        return _rha(1000 * n * (n * stu - st_ * su) ** 2 / (float(dt) * du))
    return 0


@settings(max_examples=8, deadline=None)
@given(series=DAY_VALUE_SERIES)
def test_breusch_pagan_matches_reference(spark, series):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        breusch_pagan_daily,
    )

    r = breusch_pagan_daily(_events_from_values(spark, series)).collect()[0]
    assert r.n_days == len(series)
    assert r.bp_milli == _bp_ref(series)


# --- Sign test / capture-recapture ---------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(pairs=DAY_PAIRS)
def test_sign_test_matches_reference(spark, pairs):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        sign_test_daily,
    )

    rows = []
    for d, (x, y) in enumerate(pairs, start=1):
        day = f"2024-01-{d:02d}"
        rows += [(1, "click", f"{day} 10:00:00", 1.0)] * x
        rows += [(1, "error", f"{day} 11:00:00", 1.0)] * y
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = sign_test_daily(df).collect()[0]
    nz = [(x, y) for x, y in pairs if x != y]
    m = len(nz)
    s = sum(1 for x, y in nz if x > y)
    d = 2 * s - m
    exp = (
        _rha(1000 * (d - (1 if d > 0 else -1)) / math.sqrt(m))
        if m > 0 and d != 0
        else 0
    )
    assert (r.m_days, r.s_plus, r.z_milli) == (m, s, exp)


@settings(max_examples=8, deadline=None)
@given(halves=USER_HALVES)
def test_capture_recapture_matches_reference(spark, halves):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        capture_recapture,
    )

    rows = []
    for u, (a, b) in enumerate(halves):
        if a:
            rows.append((u, "click", "2024-01-05 10:00:00", 1.0))
        if b:
            rows.append((u, "click", "2024-01-25 10:00:00", 1.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = capture_recapture(df).collect()[0]
    n1 = sum(a for a, _ in halves)
    n2 = sum(b for _, b in halves)
    m = sum(a * b for a, b in halves)
    assert (r.n1, r.n2, r.m_both) == (n1, n2, m)
    assert r.n_hat == _rha((n1 + 1) * (n2 + 1) / (m + 1) - 1)


# --- Design effect ---------------------------------------------------------------------

USER_VALUE_GROUPS = st.lists(
    st.lists(st.integers(-500, 500), min_size=1, max_size=5),
    min_size=2,
    max_size=10,
)


def _deff_ref(groups):
    k = len(groups)
    n_total = sum(len(g) for g in groups)
    s_all = sum(sum(g) for g in groups)
    b_m = sum(_rha(1e6 * float(sum(g)) * sum(g) / len(g)) for g in groups)
    w_m = sum(
        _rha(
            1e6
            * (
                float(sum(c * c for c in g))
                - float(sum(g)) * sum(g) / len(g)
            )
        )
        for g in groups
    )
    sn2 = sum(len(g) ** 2 for g in groups)
    msb = (
        (b_m / 1e6 - float(s_all) * s_all / n_total) / (k - 1)
        if k > 1 and n_total > k
        else 0.0
    )
    msw = (w_m / 1e6) / (n_total - k) if n_total > k else 0.0
    m0 = (n_total - sn2 / n_total) / (k - 1) if k > 1 else 0.0
    icc = (
        (msb - msw) / (msb + (m0 - 1) * msw)
        if msb + (m0 - 1) * msw > 0
        else 0.0
    )
    return _rha(1000 * icc), _rha(1000 * (1.0 + (n_total / k - 1.0) * icc))


@settings(max_examples=8, deadline=None)
@given(groups=USER_VALUE_GROUPS)
def test_design_effect_matches_reference(spark, groups):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        design_effect_users,
    )

    rows = []
    for u, vals in enumerate(groups):
        for c in vals:
            rows.append((u, "click", "2024-01-05 10:00:00", c / 100.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = design_effect_users(df).collect()[0]
    icc, deff = _deff_ref(groups)
    assert (r.n_clusters, r.n_total) == (len(groups), sum(len(g) for g in groups))
    assert (r.icc_milli, r.deff_milli) == (icc, deff)


# --- Little's law ------------------------------------------------------------------------

# per user: sorted minute offsets within a 3-day window
USER_MINUTES = st.lists(
    st.lists(st.integers(0, 3 * 1440 - 1), min_size=1, max_size=8).map(
        lambda xs: sorted(set(xs))
    ),
    min_size=1,
    max_size=5,
)


def _littles_ref(users):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    gap = 30 * 60 * 1000000
    day_us = 86400 * 1000000
    sessions = []
    for minutes in users:
        cur = []
        prev = None
        for m in minutes:
            us = int(
                (base + dt.timedelta(minutes=m) - dt.datetime(1970, 1, 1))
                .total_seconds() * 1e6
            )
            if prev is not None and us - prev <= gap:
                cur.append(us)
            else:
                if cur:
                    sessions.append((cur[0], cur[-1]))
                cur = [us]
            prev = us
        if cur:
            sessions.append((cur[0], cur[-1]))
    pred, obs = {}, {}
    for s, e in sessions:
        sd = s // day_us
        pred.setdefault(sd, [0, 0])
        pred[sd][0] += 1
        pred[sd][1] += e - s
        d = sd
        while d <= e // day_us:
            lo = max(s, d * day_us)
            hi = min(e, (d + 1) * day_us)
            obs[d] = obs.get(d, 0) + (hi - lo)
            d += 1
    out = {}
    for d in set(pred) | set(obs):
        n, dur = pred.get(d, [0, 0])
        out[d] = (
            n,
            _rha(1e6 * obs.get(d, 0) / day_us),
            _rha(1e6 * dur / day_us),
        )
    return out


@settings(max_examples=8, deadline=None)
@given(users=USER_MINUTES)
def test_littles_law_matches_reference(spark, users):
    import datetime as dt

    from pagila_etl_airflow_assignment_spark.operators.analytics import (
        littles_law_daily,
    )

    base = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for u, minutes in enumerate(users):
        for m in minutes:
            ts = base + dt.timedelta(minutes=m)
            rows.append((eid, u, "click", ts.strftime("%Y-%m-%d %H:%M:%S"), 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r.day - dt.date(1970, 1, 1)).days: (
            r.n_started,
            r.l_obs_micro,
            r.l_pred_micro,
        )
        for r in littles_law_daily(df).collect()
    }
    assert got == _littles_ref(users)


# --- Tukey fences -----------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(groups=GROUPED_VALUES)
def test_tukey_fences_matches_reference(spark, groups):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        tukey_fences_by_type,
    )

    rows = tukey_fences_by_type(_grouped_events(spark, groups)).collect()
    got = {
        r.event_type: (r.q1_cents, r.q3_cents, r.n_low, r.n_high)
        for r in rows
    }
    exp = {}
    for gi, vals in enumerate(groups):
        s = sorted(vals)
        tot = len(s)
        cum = 0
        q1 = q3 = None
        seen = {}
        for v in s:
            seen[v] = seen.get(v, 0) + 1
        cum = 0
        for v in sorted(seen):
            cum += seen[v]
            if q1 is None and 4 * cum >= tot:
                q1 = v
            if q3 is None and 4 * cum >= 3 * tot:
                q3 = v
        lo2, hi2 = 5 * q1 - 3 * q3, 5 * q3 - 3 * q1
        exp[f"type{gi}"] = (
            q1,
            q3,
            sum(1 for v in vals if 2 * v < lo2),
            sum(1 for v in vals if 2 * v > hi2),
        )
    assert got == exp


# --- 2x2 devices --------------------------------------------------------------------

UNIT_CELLS = st.lists(
    st.sampled_from([(1, 1), (1, 0), (0, 1), (0, 0)]),
    min_size=1,
    max_size=25,
)


def _two_flag_events(spark, cells, t1, t2):
    rows = []
    for u, (a, b) in enumerate(cells):
        rows.append((u, "signup", "2024-01-05 10:00:00", 1.0))
        if a:
            rows.append((u, t1, "2024-01-05 11:00:00", 1.0))
        if b:
            rows.append((u, t2, "2024-01-05 12:00:00", 1.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def _cells_of(cells):
    n11 = sum(1 for a, b in cells if a and b)
    n10 = sum(1 for a, b in cells if a and not b)
    n01 = sum(1 for a, b in cells if not a and b)
    n00 = sum(1 for a, b in cells if not a and not b)
    return n11, n10, n01, n00


@settings(max_examples=8, deadline=None)
@given(cells=UNIT_CELLS)
def test_cohens_kappa_matches_reference(spark, cells):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        KAPPA_A_TYPE,
        KAPPA_B_TYPE,
        cohens_kappa_daily,
    )

    df = _two_flag_events(spark, cells, KAPPA_A_TYPE, KAPPA_B_TYPE)
    r = cohens_kappa_daily(df).collect()[0]
    n11, n10, n01, n00 = _cells_of(cells)
    n = len(cells)
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / n / n
    po = (n11 + n00) / n
    exp = _rha(1000 * (po - pe) / (1 - pe)) if 1 - pe != 0 else 0
    assert (r.n_units, r.kappa_milli) == (n, exp)


@settings(max_examples=8, deadline=None)
@given(cells=UNIT_CELLS)
def test_phi_matches_reference(spark, cells):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        OR_EXPOSURE_TYPE,
        phi_coefficient_daily,
    )

    df = _two_flag_events(spark, cells, OR_EXPOSURE_TYPE, "error")
    r = phi_coefficient_daily(df).collect()[0]
    n11, n10, n01, n00 = _cells_of(cells)
    margins = (n11 + n10) * (n01 + n00) * (n11 + n01) * (n10 + n00)
    exp = (
        _rha(1000 * (n11 * n00 - n10 * n01) / math.sqrt(margins))
        if margins > 0
        else 0
    )
    assert (r.n_units, r.phi_milli) == (len(cells), exp)


@settings(max_examples=8, deadline=None)
@given(cells=UNIT_CELLS)
def test_odds_ratio_matches_reference(spark, cells):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        OR_EXPOSURE_TYPE,
        OR_OUTCOME_TYPE,
        odds_ratio_ci_daily,
    )

    df = _two_flag_events(spark, cells, OR_EXPOSURE_TYPE, OR_OUTCOME_TYPE)
    r = odds_ratio_ci_daily(df).collect()[0]
    n11, n10, n01, n00 = _cells_of(cells)
    orr = (n11 + 0.5) * (n00 + 0.5) / ((n10 + 0.5) * (n01 + 0.5))
    se = math.sqrt(
        1 / (n11 + 0.5) + 1 / (n10 + 0.5) + 1 / (n01 + 0.5) + 1 / (n00 + 0.5)
    )
    assert r.n_units == len(cells)
    assert r.or_milli == _rha(1000 * orr)
    assert r.ci_lo_milli == _rha(1000 * math.exp(math.log(orr) - 1.96 * se))
    assert r.ci_hi_milli == _rha(1000 * math.exp(math.log(orr) + 1.96 * se))


# --- Transfer entropy -------------------------------------------------------------------


def _te_ref(pairs):
    n_days = len(pairs)
    xs = [x for x, _ in pairs]
    ys = [y for _, y in pairs]
    xt = [1 if xs[i] > xs[i - 1] else 0 for i in range(1, n_days)]
    yt = [1 if ys[i] > ys[i - 1] else 0 for i in range(1, n_days)]
    trips = [
        (xt[i], xt[i - 1], yt[i], yt[i - 1]) for i in range(1, len(xt))
    ]
    if not trips:
        return None
    from collections import Counter

    cells = Counter(trips)
    n = len(trips)

    def te(role):
        # role maps cell -> (a, b, c)
        def marg(keyf):
            mm = Counter()
            for cell, m in cells.items():
                mm[keyf(cell)] += m
            return mm

        abc = marg(lambda t: role(t))
        bc = marg(lambda t: role(t)[1:])
        ab = marg(lambda t: role(t)[:2])
        b = marg(lambda t: role(t)[1])
        tot = 0
        for cell, m in cells.items():
            a_, b_, c_ = role(cell)
            tot += _rha(
                1e6
                * m
                * math.log(
                    abc[(a_, b_, c_)] * b[b_] / (bc[(b_, c_)] * ab[(a_, b_)])
                )
            )
        return _rha(tot / n)

    te_xy = te(lambda t: (t[2], t[3], t[1]))  # a=yt, b=yl, c=xl
    te_yx = te(lambda t: (t[0], t[1], t[3]))  # a=xt, b=xl, c=yl
    return n, te_xy, te_yx


@settings(max_examples=8, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 4)),
        min_size=4,
        max_size=20,
    )
)
def test_transfer_entropy_matches_reference(spark, pairs):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        transfer_entropy_daily,
    )

    rows = []
    for d, (x, y) in enumerate(pairs, start=1):
        day = f"2024-01-{d:02d}"
        rows += [(1, "click", f"{day} 10:00:00", 1.0)] * x
        rows += [(1, "error", f"{day} 11:00:00", 1.0)] * y
        rows.append((1, "signup", f"{day} 09:00:00", 1.0))  # keep day present
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = transfer_entropy_daily(df).collect()
    exp = _te_ref(pairs)
    assert exp is not None
    r = got[0]
    assert (r.n_obs, r.te_xy_micro, r.te_yx_micro) == exp


# --- Eigenvector centrality ---------------------------------------------------------------

BASKETS = st.lists(
    st.lists(st.integers(1, 8), min_size=2, max_size=4).map(
        lambda xs: sorted(set(xs))
    ).filter(lambda xs: len(xs) >= 2),
    min_size=1,
    max_size=6,
)


def _eig_ref(baskets, iters=3):
    edges = set()
    for b in baskets:
        for a in b:
            for c in b:
                if a != c:
                    edges.add((a, c))
    nodes = {a for a, _ in edges}
    x = {v: sum(1 for s, _ in edges if s == v) for v in nodes}
    for _ in range(iters - 1):
        s = sum(x.values())
        xn = {v: _rha(1e6 * x[v] / s) for v in x}
        nxt = {}
        for a, c in edges:
            nxt[c] = nxt.get(c, 0) + xn[a]
        x = nxt
    s = sum(x.values())
    scored = sorted(
        ((_rha(1e6 * xv / s), v) for v, xv in x.items()),
        key=lambda t: (-t[0], t[1]),
    )
    return [(v, sc) for sc, v in scored[:20]]


@settings(max_examples=8, deadline=None)
@given(baskets=BASKETS)
def test_eigenvector_matches_reference(spark, baskets):
    from pagila_etl_airflow_assignment_spark.operators.graph import (
        eigenvector_centrality,
    )

    rows = []
    for ok, parts in enumerate(baskets):
        for i, pk in enumerate(parts):
            rows.append(
                (ok, pk, 1, i, 1.0, 10.0, 0.0, 0.0, "N", "O",
                 "1995-03-05 00:00:00")
            )
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    got = [(r.p_partkey, r.score_micro) for r in
           eigenvector_centrality(li).collect()]
    assert got == _eig_ref(baskets)


# --- Median polish ---------------------------------------------------------------------


def _lower_wmed(vals):
    s = sorted(vals)
    tot = len(s)
    cum = 0
    for v in s:
        cum += 1
        if 2 * cum >= tot:
            return v


def _polish_ref(cells):
    # cells: {(brand, month): cents}
    r = dict(cells)
    brands = sorted({b for b, _ in cells})
    months = sorted({m for _, m in cells})
    row_eff = {b: 0 for b in brands}
    for _ in range(2):
        for b in brands:
            med = _lower_wmed([r[k] for k in r if k[0] == b])
            row_eff[b] += med
            for k in list(r):
                if k[0] == b:
                    r[k] -= med
        for m in months:
            vals = [r[k] for k in r if k[1] == m]
            if not vals:
                continue
            med = _lower_wmed(vals)
            for k in list(r):
                if k[1] == m:
                    r[k] -= med
    out = {}
    for b in brands:
        res = [abs(r[k]) for k in r if k[0] == b]
        out[b] = (row_eff[b], _lower_wmed(res), max(res))
    return out


@settings(max_examples=8, deadline=None)
@given(
    grid=st.dictionaries(
        st.tuples(st.integers(0, 3), st.integers(1, 6)),
        st.integers(-10**6, 10**6),
        min_size=2,
        max_size=18,
    )
)
def test_median_polish_matches_reference(spark, grid):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        median_polish_brands,
    )

    o_rows, li_rows, part_rows, key = [], [], {}, 0
    for (b, m), cents in grid.items():
        part_rows[b] = (b, f"p{b}", f"Brand#{b:02d}", "t", 1, 1.0)
        key += 1
        o_rows.append(
            (key, 1, "O", 1.0, f"1995-{m:02d}-05 00:00:00", "1-URGENT")
        )
        li_rows.append(
            (key, b, 1, 1, 1.0, cents / 100.0, 0.0, 0.0, "N", "O",
             f"1995-{m:02d}-06 00:00:00")
        )
    o = spark.createDataFrame(
        o_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    pt = spark.createDataFrame(
        list(part_rows.values()),
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    got = {
        r.p_brand: (
            r.row_eff_cents,
            r.med_abs_resid_cents,
            r.max_abs_resid_cents,
        )
        for r in median_polish_brands(li, o, pt).collect()
    }
    exp = {
        f"Brand#{b:02d}": v for b, v in _polish_ref(grid).items()
    }
    assert got == exp


# --- Bowker symmetry ---------------------------------------------------------------------

USER_SEQS = st.lists(
    st.lists(st.sampled_from(["click", "view", "purchase"]),
             min_size=1, max_size=8),
    min_size=1,
    max_size=6,
)


def _bowker_ref(seqs):
    from collections import Counter

    trans = Counter()
    for seq in seqs:
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    keys = sorted({k for p in trans for k in p})
    df, b_micro = 0, 0
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            nij, nji = trans.get((a, b), 0), trans.get((b, a), 0)
            if nij + nji > 0:
                df += 1
                b_micro += _rha(1e6 * (nij - nji) ** 2 / (nij + nji))
    return sum(trans.values()), df, _rha(b_micro / 1000.0)


@settings(max_examples=8, deadline=None)
@given(seqs=USER_SEQS)
def test_bowker_matches_reference(spark, seqs):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        bowker_symmetry_test,
    )

    rows, eid = [], 0
    for u, seq in enumerate(seqs):
        for i, t in enumerate(seq):
            rows.append((eid, u, t, f"2024-01-05 10:{i:02d}:00", 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = bowker_symmetry_test(df).collect()[0]
    n, dfree, bow = _bowker_ref(seqs)
    assert (r.n_transitions, r.df, r.bowker_milli) == (n, dfree, bow)


# --- c-chart / turning points / Mood median ---------------------------------------------


@settings(max_examples=8, deadline=None)
@given(counts=st.lists(st.integers(0, 9), min_size=2, max_size=20))
def test_c_chart_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        c_chart_daily,
    )

    rows = []
    for d, c in enumerate(counts, start=1):
        day = f"2024-01-{d:02d}"
        rows.append((1, "click", f"{day} 09:00:00", 1.0))  # keep day present
        rows += [(1, "error", f"{day} 10:00:00", 1.0)] * c
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = c_chart_daily(df).collect()[0]
    n, s = len(counts), sum(counts)
    cb = s / n
    ucl, lcl = cb + 3 * math.sqrt(cb), cb - 3 * math.sqrt(cb)
    assert r.n_days == n
    assert r.cbar_milli == _rha(1000 * cb)
    assert r.ucl_milli == _rha(1000 * ucl)
    assert r.n_above == sum(1 for c in counts if c > ucl)
    assert r.n_below == sum(1 for c in counts if c < lcl)


@settings(max_examples=8, deadline=None)
@given(counts=st.lists(st.integers(1, 6), min_size=3, max_size=24))
def test_turning_points_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        turning_points_daily,
    )

    r = turning_points_daily(_events_from_counts(spark, counts)).collect()[0]
    n = len(counts)
    turns = sum(
        1
        for i in range(1, n - 1)
        if (counts[i - 1] < counts[i] > counts[i + 1])
        or (counts[i - 1] > counts[i] < counts[i + 1])
    )
    z = _rha(
        1000 * (turns - 2.0 * (n - 2) / 3.0)
        / math.sqrt((16.0 * n - 29) / 90.0)
    )
    assert (r.n_days, r.n_turns, r.z_milli) == (n, turns, z)


@settings(max_examples=8, deadline=None)
@given(groups=GROUPED_VALUES)
def test_mood_median_matches_reference(spark, groups):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        mood_median_test,
    )

    got = mood_median_test(_grouped_events(spark, groups)).collect()
    allv = [c for g in groups for c in g]
    gmed = _lower_wmed(allv)
    n_total = len(allv)
    a_total = sum(1 for c in allv if c > gmed)
    k = len(groups)
    if not (0 < a_total < n_total):
        assert got == []
        return
    chi_micro = 0
    for g in groups:
        n_g = len(g)
        a_g = sum(1 for c in g if c > gmed)
        ea = n_g * a_total / n_total
        eb = n_g * (n_total - a_total) / n_total
        chi_micro += _rha(
            1e6 * ((a_g - ea) ** 2 / ea + ((n_g - a_g) - eb) ** 2 / eb)
        )
    r = got[0]
    assert (r.k_groups, r.n_total) == (k, n_total)
    assert r.chi2_milli == _rha(chi_micro / 1000.0)


# --- Kraljic matrix ------------------------------------------------------------------------

# lines: (suppkey, partkey, revenue cents)
KRALJIC_LINES = st.lists(
    st.tuples(st.integers(1, 4), st.integers(1, 6), st.integers(1, 10**6)),
    min_size=2,
    max_size=20,
)


def _kraljic_ref(lines):
    from collections import defaultdict

    ns = defaultdict(set)
    for s, p, _ in lines:
        ns[p].add(s)
    supp = defaultdict(lambda: [0, 0, 0])  # spend, n_lines, s_excl
    for s, p, rev in lines:
        supp[s][0] += rev
        supp[s][1] += 1
        supp[s][2] += 10**6 // len(ns[p])
    k = len(supp)
    t_spend = sum(v[0] for v in supp.values())
    risks = {s: _rha(v[2] / v[1]) for s, v in supp.items()}
    t_risk = sum(risks.values())
    out = defaultdict(lambda: [0, 0])
    for s, v in supp.items():
        hs = k * v[0] >= t_spend
        hr = k * risks[s] >= t_risk
        q = ("strategic" if hr else "leverage") if hs else (
            "bottleneck" if hr else "non_critical"
        )
        out[q][0] += 1
        out[q][1] += v[0]
    return {q: tuple(v) for q, v in out.items()}


@settings(max_examples=8, deadline=None)
@given(lines=KRALJIC_LINES)
def test_kraljic_matches_reference(spark, lines):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        kraljic_matrix,
    )

    li_rows = [
        (i, p, s, 1, 1.0, rev / 100.0, 0.0, 0.0, "N", "O",
         "1995-03-05 00:00:00")
        for i, (s, p, rev) in enumerate(lines)
    ]
    li = spark.createDataFrame(
        li_rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    got = {
        r.quadrant: (r.n_suppliers, r.spend_cents)
        for r in kraljic_matrix(li).collect()
    }
    assert got == _kraljic_ref(lines)


# --- KS uniformity / Hellinger / Cox-Stuart / Page --------------------------------------

# events at specific seconds-of-day (one day)
EVENT_SECONDS = st.lists(st.integers(0, 86399), min_size=1, max_size=30)


@settings(max_examples=8, deadline=None)
@given(secs=EVENT_SECONDS)
def test_ks_uniformity_matches_reference(spark, secs):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        ks_uniformity_seconds,
    )

    rows = [
        (1, "click",
         f"2024-01-05 {s // 3600:02d}:{s % 3600 // 60:02d}:{s % 60:02d}",
         1.0)
        for s in secs
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = ks_uniformity_seconds(df).collect()[0]
    n = len(secs)
    from collections import Counter

    cnt = Counter(secs)
    cum, best = 0, None
    for s in sorted(cnt):
        # gap-end (pre-jump) deviation at the last empty bin before s,
        # then the post-jump deviation at s itself: the grid sup is the
        # max of the two evaluated at every occupied bin.
        pre = abs(86400 * cum - n * s)
        cum += cnt[s]
        post = abs(86400 * cum - n * (s + 1))
        dev = max(pre, post)
        if best is None or dev > best[0]:
            best = (dev, s)
    assert r.n_events == n
    assert r.d_micro == _rha(1e6 * best[0] / (n * 86400))
    assert r.worst_second == best[1]


@settings(max_examples=8, deadline=None)
@given(
    hours=st.lists(
        st.tuples(st.integers(0, 23), st.sampled_from(["click", "error"])),
        min_size=2,
        max_size=30,
    ).filter(
        lambda hs: any(t == "click" for _, t in hs)
        and any(t == "error" for _, t in hs)
    )
)
def test_hellinger_matches_reference(spark, hours):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        hellinger_hourly,
    )

    rows = [
        (1, t, f"2024-01-05 {h:02d}:30:00", 1.0) for h, t in hours
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = hellinger_hourly(df).collect()[0]
    nx = sum(1 for _, t in hours if t == "click")
    ny = sum(1 for _, t in hours if t == "error")
    bc = 0
    for h in range(24):
        x = sum(1 for hh, t in hours if hh == h and t == "click")
        y = sum(1 for hh, t in hours if hh == h and t == "error")
        bc += _rha(1e6 * math.sqrt(x / nx * y / ny))
    assert (r.n_x, r.n_y, r.bc_micro) == (nx, ny, bc)
    assert r.hellinger_milli == _rha(
        1000 * math.sqrt(max(0.0, 1.0 - bc / 1e6))
    )


@settings(max_examples=8, deadline=None)
@given(counts=st.lists(st.integers(1, 6), min_size=2, max_size=25))
def test_cox_stuart_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        cox_stuart_daily,
    )

    r = cox_stuart_daily(_events_from_counts(spark, counts)).collect()[0]
    n = len(counts)
    m = n // 2
    off = n - m
    pairs = [(counts[i], counts[i + off]) for i in range(m)]
    nz = [(a, b) for a, b in pairs if a != b]
    mm = len(nz)
    sp = sum(1 for a, b in nz if b > a)
    d = 2 * sp - mm
    z = (
        _rha(1000 * (d - (1 if d > 0 else -1)) / math.sqrt(mm))
        if mm > 0 and d != 0
        else 0
    )
    assert (r.n_pairs, r.s_plus, r.z_milli) == (mm, sp, z)


@settings(max_examples=8, deadline=None)
@given(
    days=st.lists(
        st.tuples(
            st.integers(0, 5), st.integers(0, 5),
            st.integers(0, 5), st.integers(0, 5),
        ).filter(lambda t: sum(t) > 0),
        min_size=1,
        max_size=10,
    )
)
def test_page_trend_matches_reference(spark, days):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        page_trend_test,
    )

    rows = []
    for d, parts in enumerate(days, start=1):
        day = f"2024-01-{d:02d}"
        for b, c in enumerate(parts):
            rows += [(1, "click", f"{day} {b * 6 + 1:02d}:00:00", 1.0)] * c
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = page_trend_test(df).collect()[0]
    k = 4
    l2 = 0
    for parts in days:
        for b, c in enumerate(parts):
            below = sum(1 for v in parts if v < c)
            ties = sum(1 for v in parts if v == c)
            l2 += (b + 1) * (2 * below + ties + 1)
    n = len(days)
    z = _rha(
        1000
        * (l2 / 2.0 - n * k * (k + 1) ** 2 / 4.0)
        / math.sqrt(n * k * k * (k + 1) * (k * k - 1) / 144.0)
    )
    assert (r.n_days, r.l2_stat, r.z_milli) == (n, l2, z)


# --- Seasonal MK / up-down runs / Bartels / log-rank -------------------------------------


@settings(max_examples=8, deadline=None)
@given(counts=st.lists(st.integers(1, 6), min_size=3, max_size=28))
def test_seasonal_mk_matches_reference(spark, counts):
    import datetime as dt

    from pagila_etl_airflow_assignment_spark.operators.stats import (
        seasonal_mann_kendall_daily,
    )

    r = seasonal_mann_kendall_daily(
        _events_from_counts(spark, counts)
    ).collect()[0]
    base = dt.date(2024, 1, 1)
    days = [(base + dt.timedelta(days=i), c) for i, c in enumerate(counts)]
    s_stat, var18 = 0, 0
    for dw in range(7):
        sub = [c for d, c in days if d.weekday() == dw]
        for i in range(len(sub)):
            for j in range(i + 1, len(sub)):
                s_stat += (sub[j] > sub[i]) - (sub[j] < sub[i])
        n = len(sub)
        from collections import Counter

        ties = Counter(sub)
        var18 += n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values()
        )
    z = (
        _rha(
            1000
            * (s_stat - (1 if s_stat > 0 else -1))
            / math.sqrt(var18 / 18.0)
        )
        if var18 > 0 and s_stat != 0
        else 0
    )
    assert (r.n_days, r.s_stat, r.var18, r.z_milli) == (
        len(counts),
        s_stat,
        var18,
        z,
    )


@settings(max_examples=8, deadline=None)
@given(counts=st.lists(st.integers(1, 5), min_size=3, max_size=28))
def test_updown_runs_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        updown_runs_daily,
    )

    r = updown_runs_daily(_events_from_counts(spark, counts)).collect()[0]
    sgs = [
        1 if b > a else -1
        for a, b in zip(counts, counts[1:])
        if a != b
    ]
    m = len(sgs)
    runs = sum(
        1 for i, s in enumerate(sgs) if i == 0 or s != sgs[i - 1]
    )
    z = (
        _rha(
            1000
            * (runs - (2.0 * m + 1) / 3.0)
            / math.sqrt((16.0 * m - 13) / 90.0)
        )
        if m > 1 and 16.0 * m - 13 > 0
        else 0
    )
    assert (r.n_moves, r.n_runs, r.z_milli) == (m, runs, z)


@settings(max_examples=8, deadline=None)
@given(counts=st.lists(st.integers(1, 6), min_size=2, max_size=25))
def test_bartels_rank_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        bartels_rank_daily,
    )

    r = bartels_rank_daily(_events_from_counts(spark, counts)).collect()[0]
    n = len(counts)
    r2 = [
        2 * sum(1 for v in counts if v < c)
        + sum(1 for v in counts if v == c)
        + 1
        for c in counts
    ]
    sr = sum(r2)
    srr = sum(x * x for x in r2)
    sdd = sum((a - b) ** 2 for a, b in zip(r2, r2[1:]))
    css = srr - sr * sr / n
    rvn = sdd / css if css > 0 else 0.0
    assert r.n_days == n
    assert r.rvn_milli == _rha(1000 * rvn)
    exp_z = (
        _rha(1000 * (rvn - 2.0) / math.sqrt(4.0 / n))
        if n > 1 and rvn > 0
        else 0
    )
    assert r.z_milli == exp_z


# users: (clicked_on_signup_day, purchase_delay_days or None)
LOGRANK_USERS = st.lists(
    st.tuples(
        st.booleans(),
        st.one_of(st.none(), st.integers(1, 20)),
    ),
    min_size=1,
    max_size=20,
)


def _logrank_ref(users, horizon=14):
    timed = []
    for g, delay in users:
        if delay is None or delay > horizon:
            timed.append((1 if g else 0, horizon, 0))
        else:
            timed.append((1 if g else 0, delay, 1))
    oe_micro, v_micro = 0, 0
    for t in range(horizon + 1):
        n1 = sum(1 for g, tt, _ in timed if g == 1 and tt >= t)
        n0 = sum(1 for g, tt, _ in timed if g == 0 and tt >= t)
        d1 = sum(1 for g, tt, e in timed if g == 1 and tt == t and e)
        d0 = sum(1 for g, tt, e in timed if g == 0 and tt == t and e)
        dt_, nt = d1 + d0, n1 + n0
        if dt_ > 0:
            oe_micro += _rha(1e6 * (d1 - n1 * dt_ / nt))
            if nt > 1:
                v_micro += _rha(
                    1e6 * dt_ * (nt - dt_) * n1 * n0 / (nt * nt * (nt - 1))
                )
    oe = _rha(oe_micro / 1000.0)
    z = (
        _rha(1000.0 * oe_micro / 1e6 / math.sqrt(v_micro / 1e6))
        if v_micro > 0
        else 0
    )
    return len(users), oe, z


@settings(max_examples=8, deadline=None)
@given(users=LOGRANK_USERS)
def test_logrank_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        logrank_test,
    )

    rows, eid = [], 0
    for u, (g, delay) in enumerate(users):
        rows.append((eid, u, "signup", "2024-01-02 10:00:00", 1.0))
        eid += 1
        if g:
            rows.append((eid, u, "click", "2024-01-02 11:00:00", 1.0))
            eid += 1
        if delay is not None:
            d = 2 + delay
            rows.append(
                (eid, u, "purchase", f"2024-01-{d:02d} 10:30:00", 1.0)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = logrank_test(df).collect()[0]
    assert (r.n_users, r.o_minus_e_milli, r.z_milli) == _logrank_ref(users)


# --- LSH P/R scorecard invariants -----------------------------------------------------------


def test_lsh_pr_scorecard_invariants(spark):
    from pagila_etl_airflow_assignment_spark.llm.dedup import (
        lsh_pr_scorecard,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    r = lsh_pr_scorecard(docs).collect()[0]
    assert 0 <= r.n_hits <= min(r.n_truth, r.n_cand)
    assert 0 <= r.precision_milli <= 1000
    assert 0 <= r.recall_milli <= 1000
    # ground truth matches the registered exact-Jaccard device
    assert r.n_truth == ngram_jaccard_pairs(docs).count()
    # every VERIFIED lsh pair is a candidate, so verified <= hits-universe
    assert minhash_lsh_pairs(docs).count() <= r.n_cand
