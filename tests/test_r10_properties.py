"""Property tests for the round-10 devices: each Spark plan must equal a
direct Python reference of the same semantics on arbitrary inputs — the
device-level guarantee the DuckDB oracles then certify at corpus scale."""

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


# --- outer-join IVM (L-468/L-469) --------------------------------------------------------
#
# Random right-side tables over a small key domain: orderkeys 1..60 so the
# %7 / %11 fixture mods populate every delta path (match insert/delete and
# both null flips); custkeys 1..6 with some customers receiving no orders.

IVM_ORDERS = st.lists(
    st.tuples(st.integers(1, 60), st.integers(1, 6)),  # (orderkey, custkey)
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[0],
)
IVM_CUSTS = st.sets(st.integers(1, 6), min_size=1, max_size=6)


def _ivm_tables(spark, custs, orders):
    cust = spark.createDataFrame(
        [(c, f"SEG{c % 3}") for c in sorted(custs)],
        "c_custkey long, c_mktsegment string",
    )
    if orders:
        odf = spark.createDataFrame(
            [
                (ok, ck, (ok * 37 % 1000) + 0.25, "1995-06-01 00:00:00")
                for ok, ck in orders
            ],
            "o_orderkey long, o_custkey long, o_totalprice double,"
            " o_orderdate string",
        )
    else:
        odf = spark.createDataFrame(
            [],
            "o_orderkey long, o_custkey long, o_totalprice double,"
            " o_orderdate string",
        )
    return cust, odf.withColumn("o_orderdate", F.to_timestamp("o_orderdate"))


def _final_left_join_ref(custs, orders):
    """Direct reference: final right state = inserts + (pre minus deletes);
    LEFT join against it."""
    b_final = [
        (ok, ck)
        for ok, ck in orders
        if ok % 7 == 0 or ok % 11 != 0  # insert batch, or survivor of deletes
    ]
    out = set()
    for c in custs:
        matches = [(ok, ck) for ok, ck in b_final if ck == c]
        if matches:
            for ok, _ in matches:
                out.add((c, f"SEG{c % 3}", ok, _rha(100 * ((ok * 37 % 1000) + 0.25)) / 100))
        else:
            out.add((c, f"SEG{c % 3}", None, None))
    return out


@settings(max_examples=12, deadline=None)
@given(custs=IVM_CUSTS, orders=IVM_ORDERS)
def test_outer_join_ivm_matches_direct_join(spark, custs, orders):
    from pagila_etl_airflow_assignment_spark.operators.ivm import (
        maintained_left_join_view,
    )

    # only orders whose custkey exists keep LEFT semantics interesting;
    # the generator may emit orphan custkeys — drop them as the fixture
    # (TPC-H FK integrity) guarantees none exist
    orders = [(ok, ck) for ok, ck in orders if ck in custs]
    cust, odf = _ivm_tables(spark, custs, orders)
    got = {
        (r.c_custkey, r.c_mktsegment, r.o_orderkey, r.order_total)
        for r in maintained_left_join_view(cust, odf).collect()
    }
    assert got == _final_left_join_ref(custs, orders)


@settings(max_examples=12, deadline=None)
@given(custs=IVM_CUSTS, orders=IVM_ORDERS)
def test_outer_join_delta_ledger_applies_to_view(spark, custs, orders):
    """Applying the ledger to the pre-delta view must yield exactly the
    maintained view: V0 minus retracts plus emits = V1 as multisets (all
    rows here are distinct, so set algebra suffices)."""
    from pagila_etl_airflow_assignment_spark.operators.ivm import (
        left_join_view_delta_ledger,
        maintained_left_join_view,
    )

    orders = [(ok, ck) for ok, ck in orders if ck in custs]
    cust, odf = _ivm_tables(spark, custs, orders)

    # pre-delta view, directly
    pre = [(ok, ck) for ok, ck in orders if ok % 7 != 0]
    v0 = set()
    for c in custs:
        matches = [ok for ok, ck in pre if ck == c]
        if matches:
            for ok in matches:
                v0.add((c, ok))
        else:
            v0.add((c, None))

    ledger = left_join_view_delta_ledger(cust, odf).collect()
    retracts = {
        (r.c_custkey, r.o_orderkey) for r in ledger if r.action == "retract"
    }
    emits = {(r.c_custkey, r.o_orderkey) for r in ledger if r.action == "emit"}
    assert retracts <= v0, "ledger retracts a row the view does not hold"
    assert not (emits & (v0 - retracts)), "ledger emits an already-live row"
    applied = (v0 - retracts) | emits

    v1 = {
        (r.c_custkey, r.o_orderkey)
        for r in maintained_left_join_view(cust, odf).collect()
    }
    assert applied == v1


# --- t-digest merge report (L-470) --------------------------------------------------------

TD_DAY_VALUES = st.lists(
    st.lists(st.integers(-400, 49000), min_size=1, max_size=8),
    min_size=1,
    max_size=5,
)


def _tdigest_ref(day_values):
    """Direct reference of the whole chain: per-day digests -> merge ->
    7 probes -> exact lower weighted quantiles."""
    from collections import Counter

    D = 32

    def scale(cum, m, n):
        x = (2 * cum - m - n) / n
        k = math.floor(D * (math.asin(x) / math.pi + 0.5))
        return min(max(k, 0), D - 1)

    day_cents = []  # (day, cid, w, mean_mc)
    for day, vals in enumerate(day_values):
        cnt = Counter(vals)
        n = sum(cnt.values())
        cum = 0
        buckets = {}
        for c in sorted(cnt):
            m = cnt[c]
            cum += m
            cid = scale(cum, m, n)
            w0, s0 = buckets.get(cid, (0, 0))
            buckets[cid] = (w0 + m, s0 + m * c)
        for cid, (w, s) in buckets.items():
            day_cents.append((day, cid, w, _rha(1000.0 * s / w)))

    tw = sum(w for _, _, w, _ in day_cents)
    cumw, merged = 0, {}
    for day, cid, w, mc in sorted(day_cents, key=lambda t: (t[3], t[0], t[1])):
        cumw += w
        gid = scale(cumw, w, tw)
        w0, s0 = merged.get(gid, (0, 0))
        merged[gid] = (w0 + w, s0 + w * mc)
    cents = sorted(
        (gid, w, _rha(1.0 * s / w)) for gid, (w, s) in merged.items()
    )
    n_cent = len(cents)

    allv = Counter()
    for vals in day_values:
        allv.update(vals)
    n = sum(allv.values())

    out = {}
    for p in (1, 5, 25, 50, 75, 95, 99):
        cw, est = 0, None
        for gid, w, mc in cents:
            cw += w
            if 100 * cw >= p * tw:
                est = mc
                break
        cum, exact = 0, None
        for c in sorted(allv):
            cum += allv[c]
            if 100 * cum >= p * n:
                exact = 1000 * c
                break
        out[p] = (n_cent, est, exact, est - exact)
    return out


@settings(max_examples=10, deadline=None)
@given(day_values=TD_DAY_VALUES)
def test_tdigest_matches_reference(spark, day_values):
    from pagila_etl_airflow_assignment_spark.operators.quantile_sketch import (
        tdigest_merge_report,
    )

    rows = []
    for day, vals in enumerate(day_values, start=1):
        for i, c in enumerate(vals):
            rows.append(
                (1, "click", f"2024-01-{day:02d} 10:{i:02d}:00", c / 100.0)
            )
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.p_pct: (r.n_centroids, r.est_mcenti, r.exact_mcenti, r.err_mcenti)
        for r in tdigest_merge_report(df).collect()
    }
    assert got == _tdigest_ref(day_values)


# --- moments-sketch tail bounds (L-471) ---------------------------------------------------

MO_VALUES = st.lists(st.integers(-400, 49000), min_size=2, max_size=30)


def _moments_ref(cents):
    n = len(cents)
    s1 = sum(cents)
    s2 = sum(c * c for c in cents)
    s3 = sum(c**3 for c in cents)
    s4 = sum(c**4 for c in cents)
    mu = s1 / n
    var = s2 / n - mu * mu
    mu4 = (s4 - 4 * mu * s3 + 6 * mu * mu * s2 - 3 * n * mu**4) / n
    out = {}
    for d in (5000, 10000, 20000):
        cheb2 = _rha(1e6 * min(1.0, var / (float(d) * d)))
        cheb4 = _rha(1e6 * min(1.0, mu4 / float(d) ** 4))
        true = _rha(1e6 * sum(1 for c in cents if abs(c - mu) >= d) / n)
        out[d] = (n, cheb2, cheb4, true, true <= min(cheb2, cheb4))
    return out


@settings(max_examples=10, deadline=None)
@given(cents=MO_VALUES)
def test_moments_bounds_match_reference(spark, cents):
    from pagila_etl_airflow_assignment_spark.operators.quantile_sketch import (
        moments_tail_bounds,
    )

    rows = [
        (1, "click", f"2024-01-05 10:{i % 60:02d}:{i // 60:02d}", c / 100.0)
        for i, c in enumerate(cents)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.d_centi: (r.n, r.cheb2_micro, r.cheb4_micro, r.true_micro, r.bound_holds)
        for r in moments_tail_bounds(df).collect()
    }
    assert got == _moments_ref(cents)


# --- AR(2) Yule-Walker forecast (L-472) ---------------------------------------------------

AR2_COUNTS = st.lists(st.integers(1, 50), min_size=3, max_size=20)


def _ar2_ref(counts):
    n = len(counts)
    s1 = sum(counts)
    mu = s1 / n
    xs = [n * c - s1 for c in counts]
    s0 = sum(x * x for x in xs)
    sl1 = sum(xs[t] * xs[t - 1] for t in range(1, n))
    sl2 = sum(xs[t] * xs[t - 2] for t in range(2, n))
    r1 = sl1 / s0 if s0 > 0 else 0.0
    r2 = sl2 / s0 if s0 > 0 else 0.0
    den = 1 - r1 * r1
    phi1 = r1 * (1 - r2) / den if den != 0 else 0.0
    phi2 = (r2 - r1 * r1) / den if den != 0 else 0.0
    cn, cn1 = counts[-1], counts[-2]
    f1 = mu + phi1 * (cn - mu) + phi2 * (cn1 - mu)
    f2 = mu + phi1 * (f1 - mu) + phi2 * (cn - mu)
    return (n, _rha(1e6 * phi1), _rha(1e6 * phi2), _rha(1000 * f1), _rha(1000 * f2))


@settings(max_examples=10, deadline=None)
@given(counts=AR2_COUNTS)
def test_ar2_forecast_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        ar2_yule_walker_forecast,
    )

    rows = []
    for d, c in enumerate(counts, start=1):
        rows += [(1, "click", f"2024-01-{d:02d} 10:00:00", 1.0)] * c
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = ar2_yule_walker_forecast(df).collect()[0]
    assert (
        r.n_days,
        r.phi1_micro,
        r.phi2_micro,
        r.f1_milli,
        r.f2_milli,
    ) == _ar2_ref(counts)


# --- Bartlett cumulative periodogram (L-473) ----------------------------------------------

CP_COUNTS = st.lists(st.integers(1, 50), min_size=3, max_size=16)


def _cumper_ref(counts):
    n = len(counts)
    mu = sum(counts) / n
    m = (n - 1) // 2
    devs = []
    ijs = []
    for j in range(1, m + 1):
        a = sum(
            _rha(1e6 * (c - mu) * math.cos(2 * math.pi * j * t / n))
            for t, c in enumerate(counts, start=1)
        )
        b = sum(
            _rha(1e6 * (c - mu) * math.sin(2 * math.pi * j * t / n))
            for t, c in enumerate(counts, start=1)
        )
        ijs.append(a * a + b * b)
    tot = sum(ijs)
    cum, best = 0, None
    for j, ij in enumerate(ijs, start=1):
        cum += ij
        d = abs(m * cum - j * tot)
        if best is None or d > best[0]:
            best = (d, j)
    d_milli = _rha(1000 * best[0] / (m * tot)) if tot > 0 else 0
    return (n, m, d_milli, best[1])


@settings(max_examples=10, deadline=None)
@given(counts=CP_COUNTS)
def test_cumulative_periodogram_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        cumulative_periodogram_test,
    )

    rows = []
    for d, c in enumerate(counts, start=1):
        rows += [(1, "click", f"2024-01-{d:02d} 10:00:00", 1.0)] * c
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = cumulative_periodogram_test(df).collect()[0]
    assert (r.n_days, r.m_freqs, r.d_milli, r.worst_freq) == _cumper_ref(counts)


# --- restricted mean survival time (L-474) -------------------------------------------------

# per-user conversion offsets: None = censored, else days to purchase 0..35
RMST_USERS = st.lists(
    st.one_of(st.none(), st.integers(0, 35)), min_size=1, max_size=12
)


def _rmst_ref(offsets, max_days=30):
    n_users = len(offsets)
    conv = {}
    for o in offsets:
        if o is not None and 0 <= o <= max_days:
            conv[o] = conv.get(o, 0) + 1
    out = {}
    ln_sum, died, smicro = 0.0, False, []
    at_risk = n_users
    for day in range(0, max_days + 1):
        d = conv.get(day, 0)
        if at_risk > 0 and d == at_risk:
            died = True
        if at_risk > 0 and d < at_risk:
            ln_sum += math.log((at_risk - d) / at_risk)
        smicro.append(0 if died else _rha(1e6 * math.exp(ln_sum)))
        at_risk -= d
    for tau in (7, 14, 30):
        out[tau] = (n_users, _rha(sum(smicro[:tau]) / 1000.0))
    return out


@settings(max_examples=10, deadline=None)
@given(offsets=RMST_USERS)
def test_rmst_matches_reference(spark, offsets):
    import datetime as dt

    from pagila_etl_airflow_assignment_spark.operators.analytics import (
        restricted_mean_survival,
    )

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for u, off in enumerate(offsets, start=1):
        eid += 1
        rows.append((eid, base, u, "signup", 0.0))
        if off is not None:
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(days=off, hours=1), u, "purchase", 0.0)
            )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    got = {r.tau_days: (r.n_users, r.rmst_milli) for r in restricted_mean_survival(ev).collect()}
    assert got == _rmst_ref(offsets)


# --- Jonckheere-Terpstra (L-475) ------------------------------------------------------------

# values (centi) per ordered group (3 groups)
JT_GROUPS = st.tuples(
    st.lists(st.integers(0, 8), min_size=1, max_size=8),
    st.lists(st.integers(0, 8), min_size=1, max_size=8),
    st.lists(st.integers(0, 8), min_size=1, max_size=8),
)


def _jt_ref(groups):
    from collections import Counter

    n = sum(len(g) for g in groups)
    jt2 = 0
    for i in range(3):
        for j in range(i + 1, 3):
            for x in groups[i]:
                for y in groups[j]:
                    if x < y:
                        jt2 += 2
                    elif x == y:
                        jt2 += 1
    sum_n2 = sum(len(g) ** 2 for g in groups)
    g25 = sum(len(g) * (len(g) - 1) * (2 * len(g) + 5) for g in groups)
    g2 = sum(len(g) * (len(g) - 1) for g in groups)
    g3 = sum(len(g) * (len(g) - 1) * (len(g) - 2) for g in groups)
    ties = Counter()
    for g in groups:
        ties.update(g)
    t25 = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    t2 = sum(t * (t - 1) for t in ties.values())
    t3 = sum(t * (t - 1) * (t - 2) for t in ties.values())
    if n >= 3:
        var = (
            (n * (n - 1) * (2 * n + 5) - g25 - t25) / 72
            + g3 * t3 / (36.0 * n * (n - 1) * (n - 2))
            + g2 * t2 / (8.0 * n * (n - 1))
        )
        z = _rha(1000 * (jt2 / 2 - (n * n - sum_n2) / 4) / math.sqrt(var)) if var > 0 else 0
    else:
        z = 0
    return (n, jt2, z)


@settings(max_examples=10, deadline=None)
@given(groups=JT_GROUPS)
def test_jonckheere_matches_reference(spark, groups):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        jonckheere_terpstra_dayparts,
    )

    hours = (3, 10, 20)  # night / day / evening block representatives
    rows = []
    for gi, vals in enumerate(groups):
        for k, c in enumerate(vals):
            rows.append(
                (1, "click", f"2024-01-05 {hours[gi]:02d}:{k:02d}:00", c / 100.0)
            )
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = jonckheere_terpstra_dayparts(df).collect()[0]
    assert (r.n_total, r.jt2, r.z_milli) == _jt_ref(groups)


# --- Erlang-C staffing (L-476) ---------------------------------------------------------

ERL_SHAPE = st.tuples(st.integers(10, 400), st.integers(1, 5), st.integers(1, 5))


def _erlang_ref(n, days, mu):
    lam = n / (24 * days)
    a = lam / mu
    c0 = max(1, min(math.ceil(a), 12))
    out = {}
    for c in range(c0, c0 + 8):
        rho = a / c
        if a < c:
            s = sum(
                _rha(1e12 * a**k / math.factorial(k)) for k in range(c)
            )
            ell = _rha(1e12 * a**c / (math.factorial(c) * (1 - rho)))
            pw = _rha(1e6 * ell / (s + ell))
            wq = _rha(1000 * 3600 * (ell / (s + ell)) / (c * mu - lam))
        else:
            pw, wq = 1000000, 0
        out[c] = (_rha(1e6 * rho), pw, wq)
    return out


@settings(max_examples=10, deadline=None)
@given(shape=ERL_SHAPE)
def test_erlang_c_matches_reference(spark, shape):
    from pagila_etl_airflow_assignment_spark.operators.analytics import (
        erlang_c_staffing,
    )

    n, days, mu = shape
    rows = [
        (
            i,
            "click",
            f"2024-01-{(i % days) + 1:02d} {(i // days) % 24:02d}:00:00",
            1.0,
        )
        for i in range(n)
    ]
    df = (
        spark.createDataFrame(
            rows, "user_id long, event_type string, ts string, value double"
        )
        .withColumn("ts", F.to_timestamp("ts"))
    )
    got = {
        r.servers: (r.rho_micro, r.p_wait_micro, r.wq_ms)
        for r in erlang_c_staffing(df, mu=mu).collect()
    }
    assert got == _erlang_ref(n, days, mu)


# --- MAP@k (L-477) -----------------------------------------------------------------------


def test_map_eval_matches_python_ap_of_the_certified_rankings(spark):
    """AP computed in Python from the module's own exact/LSH rankings
    (each independently certified) must equal map_eval's output — the AP
    formula gets its own differential."""
    from pagila_etl_airflow_assignment_spark.llm import similarity

    vecs = spark.createDataFrame(
        [
            (i, [0.1 * ((i * 13 + j * 7) % 23 - 11) for j in range(64)], 0)
            for i in range(30)
        ],
        "vec_id long, embedding array<float>, label int",
    )
    qids = [0, 1, 2]
    k = 5
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_topk(vecs, qids, k).collect()
    }
    approx = sorted(
        (r.query_id, r.rank, r.vec_id)
        for r in similarity.lsh_bucket_topk(vecs, qids, k).collect()
    )
    ref = {}
    for q in qids:
        ranked = [v for (qq, _, v) in approx if qq == q]
        hits, cum, ap_scaled = 0, 0, 0
        for i, v in enumerate(ranked, start=1):
            if (q, v) in exact:
                cum += 1
                hits += 1
                ap_scaled += cum * (60 // i)
        ref[q] = (hits, ap_scaled, 1000 * ap_scaled // 300)
    got = {
        r.query_id: (r.n_hits, r.ap_scaled, r.ap_milli)
        for r in similarity.map_eval(vecs, qids, k).collect()
    }
    assert got == ref


# --- Brier decomposition (L-478) -----------------------------------------------------------

BRIER_DOCS = st.lists(
    st.tuples(st.text(alphabet="abcdef ghij", min_size=1, max_size=30), st.integers(10, 600)),
    min_size=2,
    max_size=12,
)


def _brier_ref(docs):
    import hashlib
    import re

    def p_label(text, n_chars):
        norm = re.sub(r"\s+", " ", text.strip()).lower()
        toks = re.split(r"\s+", norm)
        wsum = sum(
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 2001
            for t in toks
        )
        nt = len(toks)
        p = 500 + (2 * wsum + nt) // (2 * nt) - 1000
        return max(0, min(1000, p)), 1 if n_chars >= 300 else 0

    scored = [p_label(t, nc) for t, nc in docs]
    from collections import defaultdict

    bins = defaultdict(lambda: [0, 0, 0, 0])  # n, p_sum, pos, sq
    for p, lab in scored:
        b = min(9, p // 100)
        bins[b][0] += 1
        bins[b][1] += p
        bins[b][2] += lab
        bins[b][3] += (p - 1000 * lab) ** 2
    n = len(scored)
    pos_all = sum(v[2] for v in bins.values())
    sq_all = sum(v[3] for v in bins.values())
    rel_num = sum(
        _rha(float((v[1] - 1000 * v[2])) * (v[1] - 1000 * v[2]) / v[0])
        for v in bins.values()
    )
    res_num = sum(
        _rha(v[0] * (1000.0 * v[2] / v[0] - 1000.0 * pos_all / n) ** 2)
        for v in bins.values()
    )
    brier = (2 * sq_all + n) // (2 * n)
    rel = (2 * rel_num + n) // (2 * n)
    res = (2 * res_num + n) // (2 * n)
    unc = _rha(1e6 * (pos_all / n) * (1 - pos_all / n))
    return (n, brier, rel, res, unc, brier - rel + res - unc)


@settings(max_examples=10, deadline=None)
@given(docs=BRIER_DOCS)
def test_brier_decomposition_matches_reference(spark, docs):
    from pagila_etl_airflow_assignment_spark.llm.text import brier_decomposition

    df = spark.createDataFrame(
        [(i, t, "en", "webA", nc) for i, (t, nc) in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = brier_decomposition(df).collect()[0]
    assert (
        r.n_docs,
        r.brier_micro,
        r.rel_micro,
        r.res_micro,
        r.unc_micro,
        r.resid_micro,
    ) == _brier_ref(docs)


# --- Hilbert layout (L-479) -----------------------------------------------------------------


def _hilbert_xy2d_ref(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_unroll_matches_reference_and_is_unit_step(spark):
    """The 6 unrolled rotation rounds must reproduce the canonical xy2d on
    EVERY cell of the 64x64 grid, and the resulting curve must be
    unit-step (each consecutive position grid-adjacent) — the locality
    property the layout report's claim rests on."""
    import datetime as dt

    from pagila_etl_airflow_assignment_spark.operators.layout import (
        HB_N,
        _hilbert_rounds,
    )

    base = spark.range(HB_N * HB_N).selectExpr(
        f"CAST(id DIV {HB_N} AS BIGINT) AS gx",
        f"CAST(id % {HB_N} AS BIGINT) AS gy",
    )
    cur = base.selectExpr("gx", "gy", "gx AS x", "gy AS y", "CAST(0 AS BIGINT) AS d")
    from pyspark.sql import functions as F2

    for s, q, x_new, y_new in _hilbert_rounds():
        cur = cur.select(
            "gx",
            "gy",
            F2.expr(x_new).cast("long").alias("x"),
            F2.expr(y_new).cast("long").alias("y"),
            (F2.col("d") + s * s * F2.expr(q)).cast("long").alias("d"),
        )
    got = {(r.gx, r.gy): r.d for r in cur.collect()}
    inv = {}
    for (x, y), d in got.items():
        assert d == _hilbert_xy2d_ref(HB_N, x, y), (x, y)
        inv[d] = (x, y)
    assert len(inv) == HB_N * HB_N  # bijection
    for d in range(HB_N * HB_N - 1):
        x1, y1 = inv[d]
        x2, y2 = inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # unit-step everywhere


# --- k-truss (L-480) -------------------------------------------------------------------------

KT_BASKETS = st.lists(
    st.lists(st.integers(1, 9), min_size=2, max_size=4).map(
        lambda xs: sorted(set(xs))
    ).filter(lambda xs: len(xs) >= 2),
    min_size=1,
    max_size=7,
)


def _ktruss_ref(baskets, k=4, peels=2):
    edges = set()
    for b in baskets:
        for a in b:
            for c in b:
                if a < c:
                    edges.add((a, c))

    def support(oriented):
        sym = oriented | {(b, a) for a, b in oriented}
        adj = {}
        for a, b in sym:
            adj.setdefault(a, set()).add(b)
        return {
            (a, b): len(adj.get(a, set()) & adj.get(b, set()))
            for a, b in oriented
        }

    oriented = set(edges)
    for _ in range(peels):
        sup = support(oriented)
        oriented = {e for e, s in sup.items() if s >= k - 2}
    return {(a, b): s for (a, b), s in support(oriented).items() if s > 0}


@settings(max_examples=8, deadline=None)
@given(baskets=KT_BASKETS)
def test_ktruss_matches_reference(spark, baskets):
    import datetime as dt

    from pagila_etl_airflow_assignment_spark.operators.graph import ktruss_edges

    li = spark.createDataFrame(
        [
            (o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(1996, 1, 1))
            for o, parts in enumerate(baskets)
            for p in parts
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    got = {(r.part_a, r.part_b): r.support for r in ktruss_edges(li).collect()}
    assert got == _ktruss_ref(baskets)


# --- EWMA control chart (L-481) ---------------------------------------------------------------

EWMA_COUNTS = st.lists(st.integers(1, 40), min_size=2, max_size=12)


def _ewma_ref(counts):
    lam, L = 0.2, 3
    n = len(counts)
    s1 = sum(counts)
    s2 = sum(c * c for c in counts)
    mu = s1 / n
    sd = math.sqrt(s2 / n - mu * mu)
    out = {}
    for t, c in enumerate(counts, start=1):
        w_sum = sum(
            _rha(1e6 * lam * (1 - lam) ** (t - i) * counts[i - 1])
            for i in range(1, t + 1)
        )
        z = w_sum + _rha(1e6 * (1 - lam) ** t * mu)
        half = L * sd * math.sqrt(lam / (2 - lam) * (1 - (1 - lam) ** (2 * t)))
        lcl, ucl = _rha(1e6 * (mu - half)), _rha(1e6 * (mu + half))
        out[t] = (c, z, lcl, ucl, z < lcl or z > ucl)
    return out


@settings(max_examples=10, deadline=None)
@given(counts=EWMA_COUNTS)
def test_ewma_chart_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        ewma_control_chart,
    )

    rows = []
    for d, c in enumerate(counts, start=1):
        rows += [(1, "click", f"2024-01-{d:02d} 10:00:00", 1.0)] * c
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        t: (r.c, r.z_micro, r.lcl_micro, r.ucl_micro, r.breach)
        for t, r in enumerate(
            ewma_control_chart(df).orderBy("day").collect(), start=1
        )
    }
    assert got == _ewma_ref(counts)


# --- Siegel repeated-median slope (L-482) ----------------------------------------------------

SIEGEL_COUNTS = st.lists(st.integers(1, 40), min_size=2, max_size=12)


def _lower_median(vals):
    s = sorted(vals)
    cum, tot = 0, len(s)
    from collections import Counter

    cnt = Counter(s)
    for v in sorted(cnt):
        cum += cnt[v]
        if 2 * cum >= tot:
            return v
    return s[-1]


def _siegel_ref(counts):
    n = len(counts)
    meds = []
    for i in range(1, n + 1):
        slopes = [
            _rha(1e6 * (counts[j - 1] - counts[i - 1]) / (j - i))
            for j in range(1, n + 1)
            if j != i
        ]
        meds.append(_lower_median(slopes))
    slope = _lower_median(meds)
    resid = [
        1000 * counts[t - 1] - _rha(slope * t / 1000.0)
        for t in range(1, n + 1)
    ]
    return (n, slope, _lower_median(resid))


@settings(max_examples=10, deadline=None)
@given(counts=SIEGEL_COUNTS)
def test_siegel_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        siegel_slope_daily,
    )

    rows = []
    for d, c in enumerate(counts, start=1):
        rows += [(1, "click", f"2024-01-{d:02d} 10:00:00", 1.0)] * c
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = siegel_slope_daily(df).collect()[0]
    assert (r.n_days, r.slope_micro, r.intercept_milli) == _siegel_ref(counts)


# --- local clustering coefficient (L-483) ----------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(baskets=KT_BASKETS)
def test_clustering_coefficient_matches_reference(spark, baskets):
    import datetime as dt

    from pagila_etl_airflow_assignment_spark.operators.graph import (
        clustering_coefficient,
    )

    li = spark.createDataFrame(
        [
            (o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", dt.datetime(1996, 1, 1))
            for o, parts in enumerate(baskets)
            for p in parts
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    edges = set()
    for b in baskets:
        for a in b:
            for c in b:
                if a != c:
                    edges.add((a, c))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    ref = {}
    for v, nb in adj.items():
        d = len(nb)
        tri = sum(1 for u in nb for w in nb if u < w and (u, w) in edges)
        lcc = _rha(1e6 * 2.0 * tri / (d * (d - 1))) if d >= 2 else 0
        ref[v] = (d, tri, lcc)
    got = {
        r.p_partkey: (r.degree, r.triangles, r.lcc_micro)
        for r in clustering_coefficient(li).collect()
    }
    assert got == ref


# --- Fisher price index (L-484) ---------------------------------------------------------------

FISHER_LINES = st.lists(
    # (partkey, year_offset 0|1|2, qty, price_cents)
    st.tuples(
        st.integers(1, 5),
        st.integers(0, 2),
        st.integers(1, 9),
        st.integers(100, 5000),
    ),
    min_size=2,
    max_size=15,
)


def _fisher_ref(lines):
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])  # (pk, yr) -> [qty, rev_cents]
    for pk, yo, q, pc in lines:
        yr = 1995 + yo
        agg[(pk, yr)][0] += q
        agg[(pk, yr)][1] += q * pc  # extendedprice = qty * unit price
    base = {pk: v for (pk, yr), v in agg.items() if yr == 1995}
    out = {}
    years = sorted({yr for (_, yr) in agg if yr != 1995})
    for yr in years:
        rows = [
            (v[0], v[1] / 100.0, base[pk][0], base[pk][1] / 100.0)
            for (pk, y), v in agg.items()
            if y == yr and pk in base
        ]
        if not rows:
            continue
        l_num = sum(_rha(100 * (rev / q) * q0) for q, rev, q0, r0 in rows)
        l_den = sum(_rha(100 * r0) for q, rev, q0, r0 in rows)
        p_num = sum(_rha(100 * rev) for q, rev, q0, r0 in rows)
        p_den = sum(_rha(100 * (r0 / q0) * q) for q, rev, q0, r0 in rows)
        lasp = _rha(1e6 * l_num / l_den)
        paas = _rha(1e6 * p_num / p_den)
        fish = _rha(1e6 * math.sqrt((l_num / l_den) * (p_num / p_den)))
        out[yr] = (len(rows), lasp, paas, fish)
    return out


@settings(max_examples=10, deadline=None)
@given(lines=FISHER_LINES)
def test_fisher_index_matches_reference(spark, lines):
    import datetime as dt

    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        fisher_price_index,
    )

    li = spark.createDataFrame(
        [
            (
                i,
                pk,
                1,
                1,
                float(q),
                q * pc / 100.0,
                0.0,
                0.0,
                "N",
                "O",
                dt.datetime(1995 + yo, 6, 1),
            )
            for i, (pk, yo, q, pc) in enumerate(lines)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    got = {
        r.year: (r.n_parts, r.laspeyres_micro, r.paasche_micro, r.fisher_micro)
        for r in fisher_price_index(li).collect()
    }
    assert got == _fisher_ref(lines)


# --- Cliff's delta (L-485) ---------------------------------------------------------------------

CLIFF_PAIRS = st.tuples(
    st.lists(st.integers(0, 10), min_size=1, max_size=12),
    st.lists(st.integers(0, 10), min_size=1, max_size=12),
)


def _cliffs_ref(xs, ys):
    gt = sum(1 for x in xs for y in ys if x > y)
    lt = sum(1 for x in xs for y in ys if x < y)
    d = _rha(1000 * (gt - lt) / (len(xs) * len(ys)))
    return (len(xs), len(ys), gt, lt, d)


@settings(max_examples=10, deadline=None)
@given(pairs=CLIFF_PAIRS)
def test_cliffs_delta_matches_reference(spark, pairs):
    from pagila_etl_airflow_assignment_spark.operators.stats import cliffs_delta

    xs, ys = pairs
    rows = [
        (1, "click", f"2024-01-05 10:{i:02d}:00", c / 100.0)
        for i, c in enumerate(xs)
    ] + [
        (1, "error", f"2024-01-05 11:{i:02d}:00", c / 100.0)
        for i, c in enumerate(ys)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    r = cliffs_delta(df).collect()[0]
    assert (r.n_x, r.n_y, r.gt_pairs, r.lt_pairs, r.delta_milli) == _cliffs_ref(
        xs, ys
    )


# --- James-Stein (L-486) -------------------------------------------------------------------------

JS_GROUPS = st.lists(
    st.lists(st.integers(1, 30), min_size=1, max_size=6),
    min_size=1,
    max_size=5,
)


def _js_ref(groups):
    k = len(groups)
    g1 = sum(sum(g) for g in groups)
    gd = sum(len(g) for g in groups)
    xbar = g1 / gd
    ss_within = sum(
        sum(c * c for c in g) - sum(g) ** 2 / len(g) for g in groups
    )
    spread = sum((sum(g) / len(g) - xbar) ** 2 for g in groups)
    out = {}
    for gi, g in enumerate(groups):
        n = len(g)
        xi = sum(g) / n
        if k >= 4 and spread > 0 and gd > k:
            b = max(0.0, 1 - (k - 3) * (ss_within / (gd - k) / n) / spread)
        else:
            b = 1.0
        out[gi] = (n, _rha(1000 * xi), _rha(1000 * (xbar + b * (xi - xbar))), _rha(1000 * b))
    return out


@settings(max_examples=10, deadline=None)
@given(groups=JS_GROUPS)
def test_james_stein_matches_reference(spark, groups):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        james_stein_type_means,
    )

    types = ["click", "error", "purchase", "signup", "view"]
    rows = []
    for gi, g in enumerate(groups):
        for d, c in enumerate(g, start=1):
            rows += [(1, types[gi], f"2024-01-{d:02d} 10:00:00", 1.0)] * c
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        types.index(r.event_type): (
            r.n_days,
            r.raw_milli,
            r.shrunk_milli,
            r.shrink_factor_milli,
        )
        for r in james_stein_type_means(df).collect()
    }
    assert got == _js_ref(groups)


# --- classifier AUC (L-487) ----------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(docs=BRIER_DOCS)
def test_classifier_auc_matches_reference(spark, docs):
    import hashlib
    import re

    from pagila_etl_airflow_assignment_spark.llm.text import classifier_auc

    def p_label(text, n_chars):
        norm = re.sub(r"\s+", " ", text.strip()).lower()
        toks = re.split(r"\s+", norm)
        wsum = sum(
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 2001
            for t in toks
        )
        nt = len(toks)
        p = 500 + (2 * wsum + nt) // (2 * nt) - 1000
        return max(0, min(1000, p)), 1 if n_chars >= 300 else 0

    scored = [p_label(t, nc) for t, nc in docs]
    n_pos = sum(lab for _, lab in scored)
    n_neg = len(scored) - n_pos
    # average-rank sum of positives via the doubled-rank grid
    from collections import Counter

    grid = Counter()
    posg = Counter()
    for p, lab in scored:
        grid[p] += 1
        posg[p] += lab
    cb, r2 = 0, 0
    for p in sorted(grid):
        m = grid[p]
        r2 += posg[p] * (2 * cb + m + 1)
        cb += m
    if n_pos > 0 and n_neg > 0:
        auc = _rha(1e6 * (r2 - n_pos * (n_pos + 1)) / (2.0 * n_pos * n_neg))
    else:
        auc = 0
    df = spark.createDataFrame(
        [(i, t, "en", "webA", nc) for i, (t, nc) in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = classifier_auc(df).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc_micro, r.gini_micro) == (
        n_pos,
        n_neg,
        auc,
        2 * auc - 1000000,
    )


# --- Nelson-Aalen (L-488) ------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(offsets=RMST_USERS)
def test_nelson_aalen_matches_reference(spark, offsets):
    import datetime as dt

    from pagila_etl_airflow_assignment_spark.operators.analytics import (
        HAZARD_MAX_DAYS,
        nelson_aalen_hazard,
    )

    max_days = HAZARD_MAX_DAYS
    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for u, off in enumerate(offsets, start=1):
        eid += 1
        rows.append((eid, base, u, "signup", 0.0))
        if off is not None:
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(days=off, hours=1), u, "purchase", 0.0)
            )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    conv = {}
    for o in offsets:
        if o is not None and 0 <= o <= max_days:
            conv[o] = conv.get(o, 0) + 1
    at_risk = len(offsets)
    hm, vp = 0, 0
    ref = {}
    for day in range(0, max_days + 1):
        d = conv.get(day, 0)
        if at_risk > 0:
            hm += _rha(1e6 * d / at_risk)
            vp += _rha(1e12 * d / (at_risk * at_risk))
        ref[day] = (at_risk, d, hm, vp)
        at_risk -= d
    got = {
        r.day: (r.n_at_risk, r.n_converted, r.h_micro, r.var_pico)
        for r in nelson_aalen_hazard(ev).collect()
    }
    assert got == ref


# --- cross-spectrum (L-489) ------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)).filter(
            lambda t: t[0] + t[1] > 0
        ),
        min_size=2,
        max_size=12,
    )
)
def test_cross_spectrum_matches_reference(spark, pairs):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        cross_spectrum_daily,
    )

    rows = []
    for d, (x, y) in enumerate(pairs, start=1):
        day = f"2024-01-{d:02d}"
        rows += [(1, "click", f"{day} 10:00:00", 1.0)] * x
        rows += [(1, "error", f"{day} 11:00:00", 1.0)] * y
        rows.append((1, "signup", f"{day} 09:00:00", 1.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    n = len(pairs)
    mx = sum(x for x, _ in pairs) / n
    my = sum(y for _, y in pairs) / n
    ref = {}
    for p in range(2, 15):
        sax = sum(
            _rha(1e6 * (x - mx) * math.cos(2 * math.pi * t / p))
            for t, (x, _) in enumerate(pairs, start=1)
        )
        sbx = sum(
            _rha(1e6 * (x - mx) * math.sin(2 * math.pi * t / p))
            for t, (x, _) in enumerate(pairs, start=1)
        )
        say = sum(
            _rha(1e6 * (y - my) * math.cos(2 * math.pi * t / p))
            for t, (_, y) in enumerate(pairs, start=1)
        )
        sby = sum(
            _rha(1e6 * (y - my) * math.sin(2 * math.pi * t / p))
            for t, (_, y) in enumerate(pairs, start=1)
        )
        c = sax * say + sbx * sby
        q = sax * sby - say * sbx
        ref[p] = (
            _rha(c / 1e12),
            _rha(q / 1e12),
            _rha(math.sqrt(float(c) * c + float(q) * q) / 1e12),
            _rha(1000 * math.atan2(q, c)) if (c != 0 or q != 0) else 0,
        )
    got = {
        r.period: (r.co_spectrum, r.quad_spectrum, r.amp_micro2, r.phase_milli)
        for r in cross_spectrum_daily(df).collect()
    }
    assert got == ref


# --- risk pooling (L-490) ------------------------------------------------------------------------


def test_risk_pooling_reference_fixture(spark):
    """Two perfectly anti-correlated streams pool to (near) zero sigma —
    pooling gain ~1000 milli; a single stream pools to itself — gain 0."""
    import datetime as dt

    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        risk_pooling_by_brand,
    )

    # brand X: stream 0 sells [10, 0], stream 1 sells [0, 10] (anti-corr)
    # brand Y: single stream, varying demand
    lines = [
        # (orderkey, partkey, suppkey, month, qty)
        (1, 1, 5, 1, 10.0),   # X stream 0 (5 % 5 = 0), Jan
        (2, 1, 6, 2, 10.0),   # X stream 1 (6 % 5 = 1), Feb
        (3, 2, 7, 1, 4.0),    # Y stream 2, Jan
        (4, 2, 7, 2, 8.0),    # Y stream 2, Feb
    ]
    li = spark.createDataFrame(
        [
            (o, pk, sk, 1, q, q, 0.0, 0.0, "N", "O", dt.datetime(1996, m, 15))
            for o, pk, sk, m, q in lines
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [(1, "X"), (2, "Y")], "p_partkey long, p_brand string"
    )
    got = {r.brand: r for r in risk_pooling_by_brand(li, part).collect()}
    # brand X: each stream sigma = 5 (values 10,0), sum = 10000 milli;
    # pooled per-month totals are [10, 10] -> sigma 0 -> gain 1000
    assert got["X"].sum_sigma_milli == 10000
    assert got["X"].pooled_sigma_milli == 0
    assert got["X"].pooling_gain_milli == 1000
    # brand Y: one active stream (others zero), pooled == that stream
    assert got["Y"].pooled_sigma_milli == 2000  # sigma of [4, 8] = 2
    assert got["Y"].pooling_gain_milli >= 0


# --- Good-Turing (L-491) -----------------------------------------------------------------------

GT_DOCS = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
        min_size=1,
        max_size=10,
    ),
    min_size=1,
    max_size=8,
)


def _gt_ref(docs):
    from collections import Counter

    tf = Counter()
    for toks in docs:
        tf.update(toks)
    n = sum(tf.values())
    fof = Counter(tf.values())
    out = {}
    for r in range(0, 11):
        n_r = fof.get(r, 0) if r <= 11 else 0
        n_r1 = fof.get(r + 1, 0)
        if r == 0:
            rs = 0
            pm = _rha(1e6 * n_r1 / n)
        elif n_r > 0 and n_r1 > 0:
            rs = _rha(1000.0 * (r + 1) * n_r1 / n_r)
            pm = _rha(1e6 * n_r * ((r + 1.0) * n_r1 / n_r) / n)
        else:
            rs = 1000 * r
            pm = _rha(1e6 * n_r * float(r) / n)
        out[r] = (n_r, rs, pm)
    return out


@settings(max_examples=10, deadline=None)
@given(docs=GT_DOCS)
def test_good_turing_matches_reference(spark, docs):
    from pagila_etl_airflow_assignment_spark.llm.corpus_stats import (
        good_turing_smoothing,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks), "en", "webA", 100) for i, toks in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r.r: (r.n_r, r.r_star_milli, r.prob_mass_micro)
        for r in good_turing_smoothing(df).collect()
    }
    assert got == _gt_ref(docs)
