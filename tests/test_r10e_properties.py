"""Property tests for the round-10e devices (L-544..L-550): each Spark plan
must equal a direct Python reference of the same exact-arithmetic chain on
arbitrary inputs."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter, defaultdict

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
    """Exact half-up integer mean on non-negative operands."""
    return (2 * total + n) // (2 * n)


BASE = dt.date(2024, 1, 1)


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


# --- IV Wald (L-544) --------------------------------------------------------------------
#
# Per-user panels: (n_views, n_clicks, purchase_dollars).

USERS = st.lists(
    st.tuples(
        st.integers(0, 3), st.integers(0, 3), st.integers(0, 500)
    ),
    min_size=2,
    max_size=20,
)


def _user_rows(users):
    rows = []
    for u, (nv, nc, cents) in enumerate(users):
        for i in range(nv):
            rows.append((u, "view", f"2024-01-01 0{i}:00:00", 0.0))
        for i in range(nc):
            rows.append((u, "click", f"2024-01-01 1{i}:00:00", 0.0))
        if cents:
            rows.append((u, "purchase", "2024-01-01 20:00:00", cents / 100.0))
        if nv + nc + (1 if cents else 0) == 0:
            rows.append((u, "error", "2024-01-01 21:00:00", 0.0))
    return rows


def _iv_ref(users):
    cells = defaultdict(lambda: [0, 0, 0])  # z -> [n, sum_y, sum_d]
    for nv, nc, cents in users:
        z = 1 if nv > 0 else 0
        cells[z][0] += 1
        cells[z][1] += cents
        cells[z][2] += 1 if nc > 0 else 0
    out = {}
    for z, (n, sy, sd) in cells.items():
        out[z] = (n, _mean_hup(sy, n), _mean_hup(1000 * sd, n))
    n_z1, my1, md1 = out.get(1, (None, 0, 0))
    n_z0, my0, md0 = out.get(0, (None, 0, 0))
    itt = (my1 if 1 in out else 0) - (my0 if 0 in out else 0)
    fs = (md1 if 1 in out else 0) - (md0 if 0 in out else 0)
    wald = _r(1000.0 * itt / fs, 6) if fs != 0 else None
    return (n_z1, n_z0, itt, fs, wald)


@settings(max_examples=10, deadline=None)
@given(users=USERS)
def test_iv_wald_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import iv_wald

    [got] = iv_wald(_events(spark, _user_rows(users))).collect()
    assert (
        got["n_z1"],
        got["n_z0"],
        got["itt_cents"],
        got["first_stage_milli"],
        got["wald_cents"],
    ) == _iv_ref(users)


# --- Mediation + Sobel (L-545) ------------------------------------------------------------


def _mediation_ref(users):
    n = len(users)
    sx = sum(u[0] for u in users)
    sm = sum(u[1] for u in users)
    sy = sum(u[2] for u in users)
    sxx = sum(u[0] * u[0] for u in users)
    smm = sum(u[1] * u[1] for u in users)
    syy = sum(u[2] * u[2] for u in users)
    sxm = sum(u[0] * u[1] for u in users)
    sxy = sum(u[0] * u[2] for u in users)
    smy = sum(u[1] * u[2] for u in users)
    cxx = sxx - sx * sx / n
    cmm = smm - sm * sm / n
    cyy = syy - sy * sy / n
    cxm = sxm - sx * sm / n
    cxy = sxy - sx * sy / n
    cmy = smy - sm * sy / n
    det = cmm * cxx - cxm * cxm
    ok = cxx > 0 and det > 0 and n > 3
    c_total = _r(cxy / cxx, 6) if cxx > 0 else None
    if not ok:
        return (n, None, None, None, c_total, None, None)
    a = cxm / cxx
    b = (cmy * cxx - cxy * cxm) / det
    cprime = (cxy * cmm - cmy * cxm) / det
    sa2 = ((cmm - a * cxm) / (n - 2)) / cxx
    sb2 = ((cyy - b * cmy - cprime * cxy) / (n - 3)) * cxx / det
    var = a * a * sb2 + b * b * sa2
    sobel = _r(a * b / math.sqrt(var), 6) if var > 0 else None
    return (
        n,
        _r(a, 6),
        _r(b, 6),
        _r(cprime, 6),
        c_total,
        _r(a * b, 6),
        sobel,
    )


@settings(max_examples=10, deadline=None)
@given(users=USERS)
def test_mediation_sobel_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        mediation_sobel,
    )

    [got] = mediation_sobel(_events(spark, _user_rows(users))).collect()
    assert (
        got["n"],
        got["a_path"],
        got["b_path"],
        got["c_direct"],
        got["c_total"],
        got["indirect"],
        got["sobel_z"],
    ) == _mediation_ref(users)


# --- Cook's distance (L-546) ---------------------------------------------------------------

DAYS = st.lists(st.integers(0, 100000), min_size=4, max_size=20)


def _cooks_ref(day_cents, top=10):
    n = len(day_cents)
    xs = list(range(n))
    sx = sum(xs)
    sy = sum(day_cents)
    cxx = sum(x * x for x in xs) - sx * sx / n
    cxy = sum(x * y for x, y in zip(xs, day_cents)) - sx * sy / n
    beta = cxy / cxx
    e = [
        _rha(y - ((sy / n) + beta * (x - sx / n)))
        for x, y in zip(xs, day_cents)
    ]
    sse = sum(v * v for v in e)
    rows = []
    for x, y, ec in zip(xs, day_cents, e):
        lev = _r(1.0 / n + (x - sx / n) ** 2 / cxx, 9)
        d = (
            _r((ec * ec * lev) / (2.0 * (sse / (n - 2)) * (1.0 - lev) ** 2), 6)
            if sse > 0
            else None
        )
        rows.append((d, x, y, ec, lev))
    rows.sort(key=lambda t: (t[0] is None, -(t[0] or 0), t[1]))
    return [
        (BASE + dt.timedelta(days=x), y, ec, lev, d)
        for d, x, y, ec, lev in rows[:top]
    ]


@settings(max_examples=10, deadline=None)
@given(days=DAYS)
def test_cooks_distance_matches_reference(spark, days):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        cooks_distance,
    )

    rows = [
        (1, "click", f"{(BASE + dt.timedelta(days=i)).isoformat()} 12:00:00",
         cents / 100.0)
        for i, cents in enumerate(days)
    ]
    got = [
        (r["day"], r["y_cents"], r["e_cents"], r["leverage"], r["cooks_d"])
        for r in cooks_distance(_events(spark, rows)).collect()
    ]
    assert got == _cooks_ref(days)


# --- Sinkhorn OT (L-547) ---------------------------------------------------------------
#
# Arbitrary weekday/weekend hourly click histograms; 2024-01-01 is a Monday,
# 2024-01-06 a Saturday.

HOURS = st.lists(
    st.tuples(st.integers(0, 23), st.booleans(), st.integers(1, 4)),
    min_size=2,
    max_size=20,
)


def _sinkhorn_ref(hist_a, hist_b, iters=6):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        _SINKHORN_K_NANO,
    )

    tot_a, tot_b = sum(hist_a), sum(hist_b)
    k = [
        [_SINKHORN_K_NANO[min(abs(i - j), 24 - abs(i - j))] for j in range(24)]
        for i in range(24)
    ]
    v = [1_000_000] * 24
    u = [0] * 24
    for _ in range(iters):
        for i in range(24):
            s = sum(k[i][j] * v[j] for j in range(24))
            u[i] = (
                _rha(1e21 * hist_a[i] / tot_a / s)
                if s > 0 and hist_a[i] > 0
                else 0
            )
        for j in range(24):
            s = sum(k[i][j] * u[i] for i in range(24))
            v[j] = (
                _rha(1e21 * hist_b[j] / tot_b / s)
                if s > 0 and hist_b[j] > 0
                else 0
            )
    p = [
        [
            _rha(u[i] * float(k[i][j]) * v[j] / 1e9)
            for j in range(24)
        ]
        for i in range(24)
    ]
    cost = _rha(
        sum(
            p[i][j] * min(abs(i - j), 24 - abs(i - j))
            for i in range(24)
            for j in range(24)
        )
        / 1e6
    )
    mass = _rha(sum(sum(row) for row in p) / 1e6)
    row_err = max(
        abs(_rha(sum(p[i]) / 1e6) - _rha(1e6 * hist_a[i] / tot_a))
        for i in range(24)
    )
    col_err = max(
        abs(
            _rha(sum(p[i][j] for i in range(24)) / 1e6)
            - _rha(1e6 * hist_b[j] / tot_b)
        )
        for j in range(24)
    )
    return (tot_a, tot_b, iters, cost, mass, row_err, col_err)


@settings(max_examples=8, deadline=None)
@given(hours=HOURS)
def test_sinkhorn_matches_reference(spark, hours):
    from pagila_etl_airflow_assignment_spark.operators.stats import sinkhorn_ot

    hist_a = [0] * 24
    hist_b = [0] * 24
    rows = []
    # ensure both marginals are non-empty
    hours = hours + [(9, False, 1), (15, True, 1)]
    for h, weekend, cnt in hours:
        day = "2024-01-06" if weekend else "2024-01-01"
        (hist_b if weekend else hist_a)[h] += cnt
        for _ in range(cnt):
            rows.append((1, "click", f"{day} {h:02d}:30:00", 0.0))
    [got] = sinkhorn_ot(_events(spark, rows)).collect()
    assert (
        got["n_weekday"],
        got["n_weekend"],
        got["iterations"],
        got["cost_micro"],
        got["mass_micro"],
        got["max_row_err_micro"],
        got["max_col_err_micro"],
    ) == _sinkhorn_ref(hist_a, hist_b)


# --- Oaxaca-Blinder (L-548) ---------------------------------------------------------------
#
# Customers: (segment_is_a, n_orders >= 1, total_cents).

CUSTS = st.lists(
    st.tuples(st.booleans(), st.integers(1, 5), st.integers(100, 100000)),
    min_size=4,
    max_size=20,
)


def _oaxaca_ref(custs):
    g = {True: [], False: []}
    for is_a, x, y in custs:
        g[is_a].append((x, y))

    def stats(side):
        n = len(side)
        sx = sum(x for x, _ in side)
        sy = sum(y for _, y in side)
        sxx = sum(x * x for x, _ in side)
        sxy = sum(x * y for x, y in side)
        return n, sx, sy, sxx, sxy

    n_a, sx_a, sy_a, sxx_a, sxy_a = stats(g[True])
    n_b, sx_b, sy_b, sxx_b, sxy_b = stats(g[False])
    cxx_a = sxx_a - sx_a * sx_a / n_a
    cxy_a = sxy_a - sx_a * sy_a / n_a
    cxx_b = sxx_b - sx_b * sx_b / n_b
    cxy_b = sxy_b - sx_b * sy_b / n_b
    xbar_a, xbar_b = sx_a / n_a, sx_b / n_b
    ybar_a, ybar_b = sy_a / n_a, sy_b / n_b
    ok = cxx_a > 0 and cxx_b > 0
    expl = _r((cxy_a / cxx_a) * (xbar_a - xbar_b), 6) if ok else None
    unexpl = (
        _r(
            xbar_b * (cxy_a / cxx_a - cxy_b / cxx_b)
            + (
                (ybar_a - (cxy_a / cxx_a) * xbar_a)
                - (ybar_b - (cxy_b / cxx_b) * xbar_b)
            ),
            6,
        )
        if ok
        else None
    )
    return (
        n_a,
        n_b,
        _mean_hup(sy_a, n_a),
        _mean_hup(sy_b, n_b),
        _r(ybar_a - ybar_b, 6),
        expl,
        unexpl,
    )


@settings(max_examples=10, deadline=None)
@given(custs=CUSTS)
def test_oaxaca_matches_reference(spark, custs):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        oaxaca_blinder,
    )

    custs = custs + [(True, 1, 500), (False, 1, 700)]  # both sides non-empty
    orders = []
    cust_rows = []
    okey = 0
    for ck, (is_a, nord, cents) in enumerate(custs):
        seg = "BUILDING" if is_a else "MACHINERY"
        cust_rows.append((ck, f"c{ck}", 0, 0.0, seg))
        per = cents // nord
        rem = cents - per * (nord - 1)
        for i in range(nord):
            amt = rem if i == nord - 1 else per
            orders.append((okey, ck, "F", amt / 100.0, "2024-01-01", "1-URGENT"))
            okey += 1
    odf = spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    cdf = spark.createDataFrame(
        cust_rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    [got] = oaxaca_blinder(odf, cdf).collect()
    assert (
        got["n_a"],
        got["n_b"],
        got["mean_a_cents"],
        got["mean_b_cents"],
        got["gap_cents"],
        got["explained_cents"],
        got["unexplained_cents"],
    ) == _oaxaca_ref(custs)


# --- fairness audit + label noise (L-549/550) ------------------------------------------
#
# The rate algebra gets its own differential against the module's OWN
# certified scorers (classifier_scores / gopher_rules / lang_id), mirroring
# the MAP@k pattern.

DOCS = st.lists(
    st.tuples(
        st.text(alphabet="the and is of water une der el ", min_size=5, max_size=60),
        st.sampled_from(["en", "de", "fr"]),
        st.sampled_from(["s0", "s1", "s2"]),
    ),
    min_size=3,
    max_size=14,
)


def _docs_df(spark, docs):
    return spark.createDataFrame(
        [
            (i, text, lang, src, len(text))
            for i, (text, lang, src) in enumerate(docs)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@settings(max_examples=8, deadline=None)
@given(docs=DOCS)
def test_fairness_audit_matches_rate_algebra(spark, docs):
    from pagila_etl_airflow_assignment_spark.llm.text import (
        classifier_scores,
        fairness_audit,
        gopher_rules,
    )

    df = _docs_df(spark, docs)
    pred = {
        r["doc_id"]: 1 if r["clf_keep"] else 0
        for r in classifier_scores(df).collect()
    }
    truth = {
        r["doc_id"]: 1 if r["gopher_keep"] else 0
        for r in gopher_rules(df).collect()
    }
    per = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, sel, pos, tp, fp
    for i, (_, _, src) in enumerate(docs):
        c = per[src]
        c[0] += 1
        c[1] += pred[i]
        c[2] += truth[i]
        c[3] += pred[i] * truth[i]
        c[4] += pred[i] * (1 - truth[i])

    def rates(n, sel, pos, tp, fp):
        s = (2 * 1000 * sel + n) // (2 * n)
        t = (2 * 1000 * tp + pos) // (2 * pos) if pos > 0 else None
        f = (
            (2 * 1000 * fp + (n - pos)) // (2 * (n - pos))
            if n - pos > 0
            else None
        )
        return s, t, f

    tot = [sum(c[i] for c in per.values()) for i in range(5)]
    o_sel, o_tpr, o_fpr = rates(*tot)
    ref = {}
    for src, c in per.items():
        s, t, f = rates(*c)
        ref[src] = (
            c[0],
            s,
            t,
            f,
            s - o_sel,
            None if t is None or o_tpr is None else t - o_tpr,
            None if f is None or o_fpr is None else f - o_fpr,
        )
    got = {
        r["source"]: (
            r["n"],
            r["sel_milli"],
            r["tpr_milli"],
            r["fpr_milli"],
            r["dp_gap_milli"],
            r["tpr_gap_milli"],
            r["fpr_gap_milli"],
        )
        for r in fairness_audit(df).collect()
    }
    assert got == ref


@settings(max_examples=8, deadline=None)
@given(docs=DOCS)
def test_label_noise_matches_threshold_algebra(spark, docs):
    from pagila_etl_airflow_assignment_spark.llm.text import (
        label_noise_estimate,
        lang_id,
    )

    df = _docs_df(spark, docs)
    scored = {
        r["doc_id"]: (
            r["pred_lang"],
            (2 * 1000 * r["lexicon_hits"] + max(r["n_words"], 1))
            // (2 * max(r["n_words"], 1)),
        )
        for r in lang_id(df).collect()
    }
    by_pred = defaultdict(list)
    for i in scored:
        by_pred[scored[i][0]].append(scored[i][1])
    t = {
        p: (2 * sum(confs) + len(confs)) // (2 * len(confs))
        for p, confs in by_pred.items()
    }
    cells = defaultdict(lambda: [0, 0])
    for i, (_, lang, _) in enumerate(docs):
        pl, conf = scored[i]
        c = cells[(lang, pl)]
        c[0] += 1
        c[1] += 1 if conf >= t[pl] else 0
    n_conf = sum(c[1] for c in cells.values())
    off = sum(c[1] for (lg, pl), c in cells.items() if lg != pl)
    noise = (2 * 1000 * off + n_conf) // (2 * n_conf) if n_conf > 0 else 0
    ref = {
        (lg, pl): (c[0], c[1], noise) for (lg, pl), c in cells.items()
    }
    got = {
        (r["lang"], r["pred_lang"]): (
            r["n_docs"],
            r["n_confident"],
            r["noise_milli"],
        )
        for r in label_noise_estimate(df).collect()
    }
    assert got == ref
