"""Property tests for the round-10b devices (L-492..L-497): each Spark plan
must equal a direct Python reference of the same exact-arithmetic chain on
arbitrary inputs — the device-level guarantee the DuckDB oracles then certify
at corpus scale."""

from __future__ import annotations

import datetime as dt
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


BASE = dt.date(2024, 1, 1)


def _ts(day: int, hour: int) -> str:
    return f"{(BASE + dt.timedelta(days=day)).isoformat()} {hour:02d}:00:00"


def _events(spark, rows):
    """rows: (user_id, event_type, ts_string, value)"""
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


# --- Aalen-Johansen (L-492) ---------------------------------------------------------------
#
# Per-user optional first-purchase / first-error delays; None = never.

AJ_USERS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 20)),
        st.one_of(st.none(), st.integers(0, 20)),
    ),
    min_size=1,
    max_size=20,
)


def _aj_ref(users, horizon=14):
    timed = []
    for tp, te in users:
        if tp is not None and tp <= horizon and (te is None or tp <= te):
            timed.append((tp, 1))
        elif te is not None and te <= horizon:
            timed.append((te, 2))
        else:
            timed.append((horizon, 0))
    grid = {}
    for t, c in timed:
        m, d1, d2 = grid.get(t, (0, 0, 0))
        grid[t] = (m + 1, d1 + (c == 1), d2 + (c == 2))
    ts_sorted = sorted(grid)
    n_at, total = {}, 0
    for t in reversed(ts_sorted):
        total += grid[t][0]
        n_at[t] = total
    out, lnsum, dead, c1, c2 = [], 0.0, False, 0, 0
    for t in ts_sorted:
        m, d1, d2 = grid[t]
        n = n_at[t]
        s_prev = 0.0 if dead else math.exp(lnsum)
        if d1 + d2 > 0:
            c1 += _rha(1e6 * s_prev * d1 / n)
            c2 += _rha(1e6 * s_prev * d2 / n)
            out.append((t, n, d1, d2, c1, c2))
        if n > 0 and d1 + d2 < n:
            lnsum += math.log((n - d1 - d2) / n)
        elif n > 0 and d1 + d2 == n:
            dead = True
    return out


@settings(max_examples=12, deadline=None)
@given(users=AJ_USERS)
def test_aalen_johansen_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        aalen_johansen,
    )

    rows = []
    for u, (tp, te) in enumerate(users):
        rows.append((u, "signup", _ts(0, 10), 1.0))
        if tp is not None:
            rows.append((u, "purchase", _ts(tp, 11), 1.0))
        if te is not None:
            rows.append((u, "error", _ts(te, 12), 1.0))
    got = [
        (
            r["t"],
            r["n_at_risk"],
            r["d_purchase"],
            r["d_error"],
            r["cif_purchase_micro"],
            r["cif_error_micro"],
        )
        for r in aalen_johansen(_events(spark, rows)).collect()
    ]
    assert got == _aj_ref(users)


# --- Gehan-Wilcoxon (L-493) -----------------------------------------------------------------
#
# Per-user (in_group, purchase delay or None).

GEHAN_USERS = st.lists(
    st.tuples(st.booleans(), st.one_of(st.none(), st.integers(0, 20))),
    min_size=1,
    max_size=20,
)


def _gehan_ref(users, horizon=14):
    timed = [
        (
            1 if g else 0,
            min(delay, horizon) if delay is not None else horizon,
            1 if (delay is not None and delay <= horizon) else 0,
        )
        for g, delay in users
    ]
    w = v = 0
    for t in range(horizon + 1):
        n1 = sum(1 for g, tt, _ in timed if g == 1 and tt >= t)
        n0 = sum(1 for g, tt, _ in timed if g == 0 and tt >= t)
        d1 = sum(1 for g, tt, ev in timed if g == 1 and tt == t and ev == 1)
        d0 = sum(1 for g, tt, ev in timed if g == 0 and tt == t and ev == 1)
        dt_, nt = d1 + d0, n1 + n0
        if dt_ > 0:
            w += _rha(1e6 * nt * (d1 - n1 * dt_ / nt))
            if nt > 1:
                v += _rha(1e6 * dt_ * (nt - dt_) * n1 * n0 / (nt - 1))
    w_milli = _rha(w / 1000.0)
    z_milli = _rha(1000.0 * (w / 1e6) / math.sqrt(v / 1e6)) if v > 0 else 0
    return (len(users), w_milli, z_milli)


@settings(max_examples=12, deadline=None)
@given(users=GEHAN_USERS)
def test_gehan_wilcoxon_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        gehan_wilcoxon_test,
    )

    rows = []
    for u, (g, delay) in enumerate(users):
        rows.append((u, "signup", _ts(0, 10), 1.0))
        if g:
            rows.append((u, "view", _ts(0, 13), 1.0))
        if delay is not None:
            rows.append((u, "purchase", _ts(delay, 11), 1.0))
    r = gehan_wilcoxon_test(_events(spark, rows)).collect()[0]
    assert (r["n_users"], r["w_milli"], r["z_milli"]) == _gehan_ref(users)


# --- Ansari-Bradley / Cramer-von Mises (L-494/L-495) ---------------------------------------

TWO_SAMPLES = st.tuples(
    st.lists(st.integers(-300, 300), min_size=1, max_size=25),
    st.lists(st.integers(-300, 300), min_size=1, max_size=25),
)


def _grid(xs, ys):
    """Centi-grid cells: sorted (c, mx, my) with cumulative counts below."""
    cells = {}
    for c in xs:
        mx, my = cells.get(c, (0, 0))
        cells[c] = (mx + 1, my)
    for c in ys:
        mx, my = cells.get(c, (0, 0))
        cells[c] = (mx, my + 1)
    out, cumt, cumx, cumy = [], 0, 0, 0
    for c in sorted(cells):
        mx, my = cells[c]
        out.append((c, mx, my, cumt, cumx, cumy))
        cumt += mx + my
        cumx += mx
        cumy += my
    return out


def _ansari_ref(xs, ys):
    m, n = len(xs), len(ys)
    nn = m + n
    ab2 = s1 = s2 = 0
    for _, mx, my, cumt, _, _ in _grid(xs, ys):
        mt = mx + my
        r2 = 2 * cumt + mt + 1
        a2 = min(r2, 2 * (nn + 1) - r2)
        ab2 += mx * a2
        s1 += mt * a2
        s2 += mt * a2 * a2
    det = float(nn) * s2 - float(s1) * s1
    if nn > 1 and m > 0 and n > 0 and det > 0:
        z = (ab2 - float(m) * s1 / nn) / math.sqrt(
            float(m) * n * det / (float(nn) * nn * (nn - 1))
        )
        z_milli = _rha(1000 * z)
    else:
        z_milli = 0
    return (m, n, ab2, z_milli)


@settings(max_examples=15, deadline=None)
@given(samples=TWO_SAMPLES)
def test_ansari_bradley_matches_reference(spark, samples):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        ansari_bradley_test,
    )

    xs, ys = samples
    rows = [(1, "click", _ts(0, 10), c / 100.0) for c in xs]
    rows += [(2, "error", _ts(0, 11), c / 100.0) for c in ys]
    r = ansari_bradley_test(_events(spark, rows)).collect()[0]
    assert (r["n_x"], r["n_y"], r["ab_x2"], r["z_milli"]) == _ansari_ref(xs, ys)


def _cvm_ref(xs, ys):
    m, n = len(xs), len(ys)
    nn = m + n
    u4x = u4y = 0
    for _, mx, my, cumt, cumx, cumy in _grid(xs, ys):
        mt = mx + my
        r2 = 2 * cumt + mt + 1
        dx = r2 - (2 * cumx + mx + 1)
        dy = r2 - (2 * cumy + my + 1)
        u4x += mx * dx * dx
        u4y += my * dy * dy
    t_stat = (float(m) * u4x + float(n) * u4y) / 4.0 / (
        float(nn) * m * n
    ) - (4.0 * m * n - 1) / (6.0 * nn)
    t_micro = _rha(1e6 * t_stat)
    var_num = 4.0 * m * n * nn - 3.0 * (float(m) * m + float(n) * n) - 2.0 * m * n
    if var_num > 0:
        e = (float(nn) + 1) / (6.0 * nn)
        var = (float(nn) + 1) * var_num / (45.0 * float(nn) * nn * 4.0 * m * n)
        z_milli = _rha(1000 * (t_stat - e) / math.sqrt(var))
    else:
        z_milli = 0
    return (m, n, t_micro, z_milli)


@settings(max_examples=15, deadline=None)
@given(samples=TWO_SAMPLES)
def test_cvm_two_sample_matches_reference(spark, samples):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        cvm_two_sample_test,
    )

    xs, ys = samples
    rows = [(1, "click", _ts(0, 10), c / 100.0) for c in xs]
    rows += [(2, "error", _ts(0, 11), c / 100.0) for c in ys]
    r = cvm_two_sample_test(_events(spark, rows)).collect()[0]
    assert (r["n_x"], r["n_y"], r["t_micro"], r["z_milli"]) == _cvm_ref(xs, ys)


# --- Kendall's W / Quade (L-496/L-497) -----------------------------------------------------
#
# Count matrices: matrix[j][i] = events of type j on day i. Zero-everywhere
# judges/days never reach the engine's (type, day) aggregate, so the
# references drop them before densifying — same semantics.

@st.composite
def _count_matrix(draw):
    n = draw(st.integers(2, 10))
    k = draw(st.integers(2, 4))
    return [
        [draw(st.integers(0, 5)) for _ in range(n)] for _ in range(k)
    ]


COUNT_MATRIX = _count_matrix()


def _trim(matrix):
    n0 = len(matrix[0])
    days = [i for i in range(n0) if any(row[i] > 0 for row in matrix)]
    judges = [j for j, row in enumerate(matrix) if any(c > 0 for c in row)]
    return [[matrix[j][i] for i in days] for j in judges]


def _midranks(vals):
    """Doubled midranks of vals: 2r = 2*(# smaller) + ties + 1."""
    out = []
    for v in vals:
        below = sum(1 for u in vals if u < v)
        ties = sum(1 for u in vals if u == v)
        out.append(2 * below + ties + 1)
    return out


def _kendall_w_ref(matrix):
    m = _trim(matrix)
    if not m or not m[0]:
        return None
    k, n = len(m), len(m[0])
    ranks = [_midranks(row) for row in m]
    s4 = sum(
        (sum(ranks[j][i] for j in range(k)) - k * (n + 1)) ** 2
        for i in range(n)
    )
    tsum = 0
    for row in m:
        for v in set(row):
            t = row.count(v)
            tsum += t**3 - t
    denom = float(k) * k * (float(n) * n * n - n) - k * float(tsum)
    if denom > 0:
        w_micro = _rha(1e6 * 3.0 * s4 / denom)
        chi2_milli = _rha(1000 * k * (n - 1) * 3.0 * s4 / denom)
    else:
        w_micro = chi2_milli = 0
    return (k, n, w_micro, chi2_milli)


def _matrix_events(spark, matrix):
    rows = []
    for j, row in enumerate(matrix):
        for i, c in enumerate(row):
            rows += [(j, f"type{j}", _ts(i, 10), 1.0)] * c
    return _events(spark, rows)


@settings(max_examples=12, deadline=None)
@given(matrix=COUNT_MATRIX)
def test_kendall_w_matches_reference(spark, matrix):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        kendall_w_daily,
    )

    ref = _kendall_w_ref(matrix)
    if ref is None:
        return
    r = kendall_w_daily(_matrix_events(spark, matrix)).collect()[0]
    assert (r["k_judges"], r["n_days"], r["w_micro"], r["chi2_milli"]) == ref


def _quade_ref(matrix):
    m = _trim(matrix)
    if not m or not m[0]:
        return None
    k, n = len(m), len(m[0])
    # within-block (per-day) midranks of the k treatments
    r2 = [
        _midranks([m[j][i] for j in range(k)]) for i in range(n)
    ]  # r2[i][j]
    q2 = _midranks([max(m[j][i] for j in range(k)) - min(m[j][i] for j in range(k)) for i in range(n)])
    s4 = [[q2[i] * (r2[i][j] - (k + 1)) for j in range(k)] for i in range(n)]
    a16 = sum(s4[i][j] ** 2 for i in range(n) for j in range(k))
    b16n = sum(sum(s4[i][j] for i in range(n)) ** 2 for j in range(k))
    if float(n) * a16 - b16n > 0:
        f_milli = _rha(
            1000 * (n - 1) * float(b16n) / (float(n) * a16 - float(b16n))
        )
    else:
        f_milli = None
    return (n, k, f_milli)


@settings(max_examples=12, deadline=None)
@given(matrix=COUNT_MATRIX)
def test_quade_matches_reference(spark, matrix):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        quade_test_daily,
    )

    ref = _quade_ref(matrix)
    if ref is None:
        return
    r = quade_test_daily(_matrix_events(spark, matrix)).collect()[0]
    assert (r["n_blocks"], r["k_treatments"], r["f_milli"]) == ref


# --- Lomb-Scargle (L-498) -------------------------------------------------------------------
#
# Irregular sampling: unique day offsets, 1-3 click centi-values per day.

LOMB_DAYS = st.lists(
    st.tuples(
        st.integers(0, 40),
        st.lists(st.integers(1, 50000), min_size=1, max_size=3),
    ),
    min_size=2,
    max_size=15,
    unique_by=lambda t: t[0],
)


def _lomb_ref(days):
    days = sorted(days)
    n = len(days)
    yms = [_rha(1e4 * sum(vs) / len(vs)) for _, vs in days]
    ysum = sum(yms)
    t0 = min(d for d, _ in days)
    out = []
    for period in range(2, 15):
        syc = sys_ = sc2 = ss2 = syy = 0
        for (d, _), ym in zip(days, yms):
            t = d - t0
            yc = ym - ysum / float(n)
            syc += _rha(yc * math.cos(2 * math.pi * t / period))
            sys_ += _rha(yc * math.sin(2 * math.pi * t / period))
            sc2 += _rha(1e6 * math.cos(4 * math.pi * t / period))
            ss2 += _rha(1e6 * math.sin(4 * math.pi * t / period))
            a = _rha(yc / 1e2)
            syy += int(float(a) * a)
        w2t = math.atan2(float(ss2), float(sc2))
        aa = math.cos(w2t / 2) * float(syc) + math.sin(w2t / 2) * float(sys_)
        bb = math.cos(w2t / 2) * float(sys_) - math.sin(w2t / 2) * float(syc)
        cc = (n + math.cos(w2t) * float(sc2) / 1e6
              + math.sin(w2t) * float(ss2) / 1e6) / 2
        ss = (n - math.cos(w2t) * float(sc2) / 1e6
              - math.sin(w2t) * float(ss2) / 1e6) / 2
        syy2 = float(syy) * 1e4
        if n > 1 and syy2 > 0:
            p = _rha(
                1e6
                * ((aa * aa / cc if cc > 1e-9 else 0.0)
                   + (bb * bb / ss if ss > 1e-9 else 0.0))
                / (2.0 * (syy2 / (n - 1)))
            )
        else:
            p = None
        out.append((period, n, p))
    return out


@settings(max_examples=10, deadline=None)
@given(days=LOMB_DAYS)
def test_lomb_scargle_matches_reference(spark, days):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        lomb_scargle_daily,
    )

    rows = []
    for d, vs in days:
        rows += [(1, "click", _ts(d, 10), c / 100.0) for c in vs]
    got = [
        (r["period"], r["n_days"], r["power_micro"])
        for r in lomb_scargle_daily(_events(spark, rows)).collect()
    ]
    assert got == _lomb_ref(days)


# --- Allan variance (L-499) -----------------------------------------------------------------
#
# Per-hour event counts; interior zeros exercise the dense spine.

ALLAN_HOURS = st.lists(st.integers(0, 4), min_size=2, max_size=40).filter(
    lambda cs: any(c > 0 for c in cs)
)


def _allan_ref(counts):
    # engine bounds are the min/max PRESENT hours: trim zero edges
    lo = next(i for i, c in enumerate(counts) if c > 0)
    hi = max(i for i, c in enumerate(counts) if c > 0)
    dense = counts[lo : hi + 1]
    out = []
    for tau in (1, 2, 4, 8):
        m = len(dense) // tau
        sums = [sum(dense[i * tau : (i + 1) * tau]) for i in range(m)]
        pairs = m - 1
        # the engine's (tau, bin) aggregate emits a tau row only when at
        # least one adjacent-bin diff exists (m >= 2)
        if pairs > 0:
            sd2 = sum((sums[i + 1] - sums[i]) ** 2 for i in range(pairs))
            out.append(
                (tau, m, _rha(1e6 * float(sd2) / (2.0 * pairs * tau * tau)))
            )
    return out


@settings(max_examples=12, deadline=None)
@given(counts=ALLAN_HOURS)
def test_allan_variance_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        allan_variance_hourly,
    )

    rows = []
    for h, c in enumerate(counts):
        day, hr = divmod(h, 24)
        rows += [(1, "click", _ts(day, hr), 1.0)] * c
    got = [
        (r["tau_hours"], r["m_bins"], r["avar_micro"])
        for r in allan_variance_hourly(_events(spark, rows)).collect()
    ]
    assert got == _allan_ref(counts)


# --- ARCH LM (L-500) ------------------------------------------------------------------------

ARCH_DAYS = st.lists(st.integers(1, 100000), min_size=3, max_size=25)


def _arch_ref(cents):
    qs = [
        _rha(1e6 * math.log(float(v) / vp))
        for vp, v in zip(cents, cents[1:])
    ]
    us = [q * q for q in qs]
    pairs = list(zip(us, us[1:]))  # (ulag, u)
    n = len(pairs)
    sx = sum(p[0] for p in pairs)
    sy = sum(p[1] for p in pairs)
    sxx = sum(p[0] * p[0] for p in pairs)
    syy = sum(p[1] * p[1] for p in pairs)
    sxy = sum(p[0] * p[1] for p in pairs)
    dx = n * float(sxx) - float(sx) * float(sx)
    dy = n * float(syy) - float(sy) * float(sy)
    if n > 1 and dx > 0 and dy > 0:
        num = n * float(sxy) - float(sx) * float(sy)
        r2 = (num * num) / (dx * dy)
        return (n, _rha(1e6 * r2), _rha((1000 * n) * r2))
    return (n, None, None)


@settings(max_examples=12, deadline=None)
@given(cents=ARCH_DAYS)
def test_arch_lm_matches_reference(spark, cents):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        arch_lm_daily,
    )

    rows = [(1, "click", _ts(d, 10), c / 100.0) for d, c in enumerate(cents)]
    r = arch_lm_daily(_events(spark, rows)).collect()[0]
    assert (r["n_pairs"], r["r2_micro"], r["lm_milli"]) == _arch_ref(cents)


# --- DFA (L-501) ----------------------------------------------------------------------------

DFA_DAYS = st.lists(st.integers(1, 8), min_size=4, max_size=40)


def _dfa_ref(counts):
    n = len(counts)
    s_all = sum(counts)
    pref, zs = 0, []
    for k, c in enumerate(counts, start=1):
        pref += c
        zs.append(n * pref - k * s_all)
    f2 = {}
    for s in (4, 8, 16):
        tp, m = 0, 0
        for b in range(n // s):
            box = zs[b * s : (b + 1) * s]
            sz = sum(box)
            szz = sum(z * z for z in box)
            sjz = sum((j + 1) * z for j, z in enumerate(box))
            cterm = float(sjz) - (s + 1) / 2.0 * float(sz)
            x = (
                float(szz)
                - float(sz) * float(sz) / s
                - 12.0 * cterm * cterm / (float(s) * (float(s) * s - 1))
            )
            tp += _rha(1e12 * x / (float(s) * float(n) * n))
            m += 1
        f2[s] = _rha(float(tp) / m) if m else None
    if f2[4] and f2[16] and f2[4] > 0 and f2[16] > 0:
        alpha = _rha(
            1000
            * (math.log(f2[16] / 1e12) - math.log(f2[4] / 1e12))
            / (4.0 * math.log(2.0))
        )
    else:
        alpha = None
    return (n, f2[4], f2[8], f2[16], alpha)


@settings(max_examples=12, deadline=None)
@given(counts=DFA_DAYS)
def test_dfa_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import dfa_daily

    rows = []
    for d, c in enumerate(counts):
        rows += [(1, "click", _ts(d, 10), 1.0)] * c
    r = dfa_daily(_events(spark, rows)).collect()[0]
    assert (
        r["n_days"],
        r["f2_4_pico"],
        r["f2_8_pico"],
        r["f2_16_pico"],
        r["alpha_milli"],
    ) == _dfa_ref(counts)


# --- Sample entropy (L-502) -----------------------------------------------------------------

SAMPEN_DAYS = st.lists(st.integers(1, 6), min_size=3, max_size=25)


def _sampen_ref(counts):
    n = len(counts)
    s1 = sum(counts)
    s2 = sum(c * c for c in counts)
    r = (
        0.2 * math.sqrt((float(s2) - float(s1) * s1 / n) / (n - 1))
        if n > 1
        else 0.0
    )
    tmpl = [
        (
            counts[i],
            counts[i + 1] if i + 1 < n else None,
            counts[i + 2] if i + 2 < n else None,
        )
        for i in range(n)
    ]
    b_pairs = a_pairs = 0
    for i in range(n):
        for j in range(i + 1, n):
            a1, a2, a3 = tmpl[i]
            b1, b2, b3 = tmpl[j]
            if a2 is not None and b2 is not None and abs(a1 - b1) <= r and abs(a2 - b2) <= r:
                b_pairs += 1
                if a3 is not None and b3 is not None and abs(a3 - b3) <= r:
                    a_pairs += 1
    sampen = (
        _rha(-1000 * math.log(float(a_pairs) / b_pairs))
        if a_pairs > 0 and b_pairs > 0
        else None
    )
    return (n, b_pairs, a_pairs, sampen)


@settings(max_examples=12, deadline=None)
@given(counts=SAMPEN_DAYS)
def test_sample_entropy_matches_reference(spark, counts):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        sample_entropy_daily,
    )

    rows = []
    for d, c in enumerate(counts):
        rows += [(1, "click", _ts(d, 10), 1.0)] * c
    r = sample_entropy_daily(_events(spark, rows)).collect()[0]
    assert (
        r["n_days"],
        r["b_pairs"],
        r["a_pairs"],
        r["sampen_milli"],
    ) == _sampen_ref(counts)


# --- Engle-Granger (L-503) ------------------------------------------------------------------
#
# Per-day optional (x_cents, y_cents); days missing either side drop out.

EG_DAYS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(1, 50000)),
        st.one_of(st.none(), st.integers(1, 50000)),
    ),
    min_size=3,
    max_size=25,
)


def _eg_ref(days):
    kept = [(x, y) for x, y in days if x is not None and y is not None]
    n = len(kept)
    if n == 0:
        return None
    sx = sum(x for x, _ in kept)
    sy = sum(y for _, y in kept)
    sxx = sum(x * x for x, _ in kept)
    sxy = sum(x * y for x, y in kept)
    den = n * float(sxx) - float(sx) * float(sx)
    beta = (
        (n * float(sxy) - float(sx) * float(sy)) / den if den > 0 else 0.0
    )
    ybar, xbar = float(sy) / n, float(sx) / n
    es = [
        _rha(1e6 * (y - (ybar - beta * xbar) - beta * x)) for x, y in kept
    ]
    pairs = list(zip(es, es[1:]))
    np_ = len(pairs)
    if np_ == 0:
        # the engine's final aggregate runs over zero lag pairs: all NULLs
        return (None, None, None)
    see = sum(ep * ep for ep, _ in pairs)
    sed = sum(ep * (e - ep) for ep, e in pairs)
    sdd = sum((e - ep) * (e - ep) for ep, e in pairs)
    ssr = (
        float(sdd) - float(sed) * float(sed) / float(see)
        if see > 0
        else -1.0
    )
    if np_ > 2 and see > 0 and ssr > 0:
        adf = _rha(
            1000
            * (float(sed) / float(see))
            / math.sqrt(ssr / (np_ - 1) / float(see))
        )
    else:
        adf = None
    return (n, _rha(1e6 * beta), adf)


@settings(max_examples=12, deadline=None)
@given(days=EG_DAYS)
def test_engle_granger_matches_reference(spark, days):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        engle_granger_daily,
    )

    ref = _eg_ref(days)
    if ref is None:
        return
    rows = []
    for d, (x, y) in enumerate(days):
        if x is not None:
            rows.append((1, "click", _ts(d, 10), x / 100.0))
        if y is not None:
            rows.append((2, "purchase", _ts(d, 11), y / 100.0))
    r = engle_granger_daily(_events(spark, rows)).collect()[0]
    assert (r["n_days"], r["beta_micro"], r["adf_milli"]) == ref


# --- Isotonic calibration (L-504) -------------------------------------------------------------

ISO_USERS = st.lists(
    st.tuples(st.integers(1, 14), st.booleans()),
    min_size=1,
    max_size=30,
)


def _iso_ref(users):
    bins = {}
    for clicks, purchased in users:
        b = min(clicks, 10)
        w, y = bins.get(b, (0, 0))
        bins[b] = (w + 1, y + (1 if purchased else 0))
    order = sorted(bins)
    cw = cy = 0
    cum = {}
    for b in order:
        w, y = bins[b]
        cum[b] = (cw, cy, cw + w, cy + y)  # (cwe, cye, cwi, cyi)
        cw += w
        cy += y
    means = {
        (a, b): (cum[b][3] - cum[a][1]) / float(cum[b][2] - cum[a][0])
        for a in order
        for b in order
        if a <= b
    }
    out = []
    for i in order:
        fit = max(
            min(means[(a, b)] for b in order if b >= i)
            for a in order
            if a <= i
        )
        w, y = bins[i]
        out.append((i, w, _rha(1e6 * y / w), _rha(1e6 * fit)))
    return out


@settings(max_examples=12, deadline=None)
@given(users=ISO_USERS)
def test_isotonic_calibration_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        isotonic_calibration,
    )

    rows = []
    for u, (clicks, purchased) in enumerate(users):
        rows += [(u, "click", _ts(0, 10), 1.0)] * clicks
        if purchased:
            rows.append((u, "purchase", _ts(1, 10), 1.0))
    got = [
        (r["click_bin"], r["n_users"], r["rate_raw_micro"], r["rate_iso_micro"])
        for r in isotonic_calibration(_events(spark, rows)).collect()
    ]
    ref = _iso_ref(users)
    assert got == ref
    iso = [r[3] for r in got]
    assert iso == sorted(iso)  # monotone by construction


# --- Xbar-R chart (L-505) ----------------------------------------------------------------------

XBAR_DAYS = st.lists(
    st.lists(st.integers(0, 50000), min_size=1, max_size=9),
    min_size=1,
    max_size=12,
)


def _xbar_ref(days):
    subs = [vals[:5] for vals in days if len(vals) >= 5]
    if not subs:
        return []
    m = len(subs)
    ss = sum(sum(s) for s in subs)
    sr = sum(max(s) - min(s) for s in subs)
    out = []
    for d, vals in enumerate(days):
        if len(vals) < 5:
            continue
        s5 = vals[:5]
        s, r = sum(s5), max(s5) - min(s5)
        xbar = float(s) / 5
        center = float(ss) / (5 * m)
        rbar = float(sr) / m
        x_ooc = 1 if (xbar > center + 0.577 * rbar or xbar < center - 0.577 * rbar) else 0
        r_ooc = 1 if r > 2.114 * rbar else 0
        out.append((d, _rha(1000.0 * s / 5), r, x_ooc, r_ooc))
    return out


@settings(max_examples=12, deadline=None)
@given(days=XBAR_DAYS)
def test_xbar_r_chart_matches_reference(spark, days):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        xbar_r_chart,
    )

    rows = []
    eid = 0
    for d, vals in enumerate(days):
        for i, c in enumerate(vals):
            rows.append(
                (
                    eid,
                    1,
                    "click",
                    f"{(BASE + dt.timedelta(days=d)).isoformat()}"
                    f" 10:{i:02d}:00",
                    c / 100.0,
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = [
        (
            (r["day"] - BASE).days,
            r["xbar_milli"],
            r["r_cents"],
            r["x_ooc"],
            r["r_ooc"],
        )
        for r in xbar_r_chart(df).collect()
    ]
    assert got == _xbar_ref(days)


# --- Katz centrality (L-506) --------------------------------------------------------------------

KATZ_BASKETS = st.lists(
    st.lists(st.integers(1, 12), min_size=1, max_size=5, unique=True),
    min_size=1,
    max_size=12,
)


def _katz_ref(baskets, iters=4, k=50):
    edges = set()
    for b in baskets:
        if len(set(b)) > 30:
            continue
        for x in b:
            for y in b:
                if x != y:
                    edges.add((x, y))
    if not edges:
        return []
    nodes = {s for s, _ in edges}
    v = {n: 1000000 for n in nodes}
    total = {}
    for _ in range(iters):
        nxt = {}
        for s, d in edges:
            if s in v:
                nxt[d] = nxt.get(d, 0) + v[s]
        v = {d: _rha(0.05 * x) for d, x in nxt.items()}
        for d, x in v.items():
            total[d] = total.get(d, 0) + x
    ranked = sorted(total.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return ranked


@settings(max_examples=10, deadline=None)
@given(baskets=KATZ_BASKETS)
def test_katz_centrality_matches_reference(spark, baskets):
    from pagila_etl_airflow_assignment_spark.operators.graph import (
        katz_centrality,
    )

    rows = [
        (o + 1, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01 00:00:00")
        for o, basket in enumerate(baskets)
        for p in basket
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    got = [
        (r["p_partkey"], r["katz_micro"]) for r in katz_centrality(li).collect()
    ]
    assert got == _katz_ref(baskets)


# --- Kneser-Ney bigrams (L-507) -----------------------------------------------------------------

KN_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon"]
KN_DOCS = st.lists(
    st.lists(st.integers(0, 4), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


def _kn_ref(docs, d=0.75, k=20):
    cb = {}
    for words in docs:
        toks = [KN_WORDS[i] for i in words]
        for a, b in zip(toks, toks[1:]):
            cb[(a, b)] = cb.get((a, b), 0) + 1
    if not cb:
        return []
    c1, n1fw, n1bw = {}, {}, {}
    for (a, b), c in cb.items():
        c1[a] = c1.get(a, 0) + c
        n1fw[a] = n1fw.get(a, 0) + 1
        n1bw[b] = n1bw.get(b, 0) + 1
    nbb = len(cb)
    out = []
    for (a, b), c in cb.items():
        p = max(c - d, 0.0) / c1[a] + (d * n1fw[a] / c1[a]) * (
            float(n1bw[b]) / nbb
        )
        out.append((a, b, c, _rha(1e6 * p)))
    out.sort(key=lambda t: (-t[2], t[0], t[1]))
    return out[:k]


@settings(max_examples=10, deadline=None)
@given(docs=KN_DOCS)
def test_kneser_ney_matches_reference(spark, docs):
    from pagila_etl_airflow_assignment_spark.llm.corpus_stats import (
        kneser_ney_bigrams,
    )

    rows = [
        (i, " ".join(KN_WORDS[w] for w in words), "en", "src0", 1)
        for i, words in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    got = [
        (r["w1"], r["w2"], r["cnt"], r["p_kn_micro"])
        for r in kneser_ney_bigrams(df).collect()
    ]
    assert got == _kn_ref(docs)


# --- MSTTR (L-508) -------------------------------------------------------------------------------

MSTTR_DOCS = st.lists(
    st.tuples(
        st.sampled_from(["en", "fr"]),
        st.lists(st.integers(0, 4), min_size=0, max_size=130),
    ),
    min_size=1,
    max_size=6,
)


def _msttr_ref(docs, seg_len=50):
    out = []
    for lang in sorted({l for l, _ in docs}):
        n_docs = 0
        n_segs = 0
        st_ = 0
        for l2, words in docs:
            if l2 != lang:
                continue
            toks = [KN_WORDS[i] for i in words]
            segs = [
                toks[i * seg_len : (i + 1) * seg_len]
                for i in range(len(toks) // seg_len)
            ]
            if segs:
                n_docs += 1
                n_segs += len(segs)
                st_ += sum(len(set(seg)) for seg in segs)
        if n_segs:
            out.append(
                (lang, n_docs, n_segs, _rha(1e6 * st_ / (seg_len * float(n_segs))))
            )
    return out


@settings(max_examples=10, deadline=None)
@given(docs=MSTTR_DOCS)
def test_msttr_matches_reference(spark, docs):
    from pagila_etl_airflow_assignment_spark.llm.corpus_stats import (
        msttr_by_lang,
    )

    rows = [
        (i, " ".join(KN_WORDS[w] for w in words), lang, "src0", 1)
        for i, (lang, words) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    got = [
        (r["lang"], r["n_docs"], r["n_segments"], r["msttr_micro"])
        for r in msttr_by_lang(df).collect()
    ]
    assert got == _msttr_ref(docs)


# --- Beta-binomial shrinkage (L-509) -------------------------------------------------------------

BB_SOURCES = st.lists(
    st.lists(st.integers(100, 700), min_size=1, max_size=10),
    min_size=1,
    max_size=8,
)


def _bb_ref(sources, chars_min=400):
    rows = []
    stats = []
    for i, chars in enumerate(sources):
        n = len(chars)
        k = sum(1 for c in chars if c >= chars_min)
        pm = _rha(1e6 * k / n)
        stats.append((f"src{i}", n, k, pm))
    s = len(stats)
    sp = sum(t[3] for t in stats)
    spp = sum(t[3] * t[3] for t in stats)
    for source, n, k, pm in sorted(stats):
        if s > 1:
            v = (float(spp) - float(sp) * sp / s) / (s - 1) / 1e12
            m = float(sp) / s / 1e6
            if v > 0.0 and m * (1.0 - m) > v:
                common = m * (1.0 - m) / v - 1.0
                shrunk = (k + m * common) / (n + common)
            else:
                shrunk = float(k) / n
        else:
            shrunk = float(k) / n
        rows.append((source, n, pm, _rha(1e6 * shrunk)))
    return rows


@settings(max_examples=10, deadline=None)
@given(sources=BB_SOURCES)
def test_beta_binomial_matches_reference(spark, sources):
    from pagila_etl_airflow_assignment_spark.llm.corpus_stats import (
        beta_binomial_source_rates,
    )

    rows = []
    did = 0
    for i, chars in enumerate(sources):
        for c in chars:
            rows.append((did, "x", "en", f"src{i}", c))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    got = [
        (r["source"], r["n_docs"], r["pass_rate_micro"], r["shrunk_rate_micro"])
        for r in beta_binomial_source_rates(df).collect()
    ]
    assert got == _bb_ref(sources)
