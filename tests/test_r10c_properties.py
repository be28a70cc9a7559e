"""Property tests for the round-10c devices (L-510..L-513): each Spark plan
must equal a direct Python reference of the same exact-arithmetic chain on
arbitrary inputs — the device-level guarantee the DuckDB oracles then certify
at corpus scale."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

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


def _events(spark, rows):
    """rows: (user_id, event_type, ts_string, value)"""
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


# --- Anderson-Darling uniformity (L-510) ------------------------------------------------------
#
# Arbitrary multiset of second-of-day values.

AD_SECONDS = st.lists(st.integers(0, 86399), min_size=1, max_size=40)


def _ad_ref(seconds):
    cnt = Counter(seconds)
    n = len(seconds)
    cum = 0
    s_micro = 0
    for s in sorted(cnt):
        t = cnt[s]
        cum += t
        lo = t * (2 * cum - t)
        hi = t * (2 * (n - cum) + t)
        term = (
            lo * math.log((2 * s + 1) / 172800.0)
            + hi * math.log((172800 - 2 * s - 1) / 172800.0)
        ) / n
        s_micro += _rha(1e6 * term)
    a2_milli = _rha(1000.0 * (-float(n) - s_micro / 1e6))
    return (n, a2_milli, 1 if a2_milli > 2492 else 0)


@settings(max_examples=12, deadline=None)
@given(seconds=AD_SECONDS)
def test_anderson_darling_matches_reference(spark, seconds):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        anderson_darling_uniformity,
    )

    rows = []
    for i, s in enumerate(seconds):
        h, rem = divmod(s, 3600)
        m, sec = divmod(rem, 60)
        rows.append(
            (i, "click", f"{BASE.isoformat()} {h:02d}:{m:02d}:{sec:02d}", 1.0)
        )
    got = [
        (r["n_events"], r["a2_milli"], r["reject_5pct"])
        for r in anderson_darling_uniformity(_events(spark, rows)).collect()
    ]
    assert got == [_ad_ref(seconds)]


# --- Hodges-Lehmann pseudomedian (L-511) -------------------------------------------------------
#
# Per-day (clicks, errors) counts on consecutive days.

HL_DAYS = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=16,
)


def _hl_ref(days):
    ds = [c - e for c, e in days]
    walsh = sorted(
        ds[i] + ds[j] for i in range(len(ds)) for j in range(i, len(ds))
    )
    m = len(walsh)
    w_lo = walsh[(m + 1) // 2 - 1]
    w_hi = walsh[(m + 2) // 2 - 1]
    return (len(ds), m, _rha(1000.0 * (w_lo + w_hi) / 4.0))


@settings(max_examples=12, deadline=None)
@given(days=HL_DAYS)
def test_hodges_lehmann_matches_reference(spark, days):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        hodges_lehmann_daily,
    )

    rows = []
    for d, (c, e) in enumerate(days):
        day = (BASE + dt.timedelta(days=d)).isoformat()
        rows.append((d, "signup", f"{day} 09:00:00", 1.0))
        for k in range(c):
            rows.append((d, "click", f"{day} 10:{k:02d}:00", 1.0))
        for k in range(e):
            rows.append((d, "error", f"{day} 11:{k:02d}:00", 1.0))
    got = [
        (r["n_days"], r["n_pairs"], r["hl_milli"])
        for r in hodges_lehmann_daily(_events(spark, rows)).collect()
    ]
    assert got == [_hl_ref(days)]


# --- Pettitt changepoint (L-512) ---------------------------------------------------------------
#
# Daily click counts in day order (every day also carries one error row so
# zero-click days stay on the grid).

PETTITT_DAYS = st.lists(st.integers(0, 15), min_size=2, max_size=20)


def _pettitt_ref(xs):
    n = len(xs)
    cnt = Counter(xs)
    r2 = {}
    cum = 0
    for v in sorted(cnt):
        t = cnt[v]
        r2[v] = 2 * cum + t + 1
        cum += t
    best = None
    s2 = 0
    for t, x in enumerate(xs[:-1], start=1):
        s2 += r2[x]
        u = abs(s2 - t * (n + 1))
        if best is None or u > best[0]:
            best = (u, t - 1)
    u, day_idx = best
    p = _rha(
        1e6
        * min(
            1.0,
            2.0 * math.exp(-6.0 * u * u / (float(n) ** 3 + float(n) ** 2)),
        )
    )
    return (n, u, (BASE + dt.timedelta(days=day_idx)).isoformat(), p)


@settings(max_examples=12, deadline=None)
@given(xs=PETTITT_DAYS)
def test_pettitt_matches_reference(spark, xs):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        pettitt_daily,
    )

    rows = []
    for d, c in enumerate(xs):
        day = (BASE + dt.timedelta(days=d)).isoformat()
        rows.append((d, "error", f"{day} 09:00:00", 1.0))
        for k in range(c):
            rows.append((d, "click", f"{day} 10:{k:02d}:00", 1.0))
    got = [
        (r["n_days"], r["k_stat"], r["change_date"].isoformat(), r["p_micro"])
        for r in pettitt_daily(_events(spark, rows)).collect()
    ]
    assert got == [_pettitt_ref(xs)]


# --- Breslow-Day homogeneity (L-513) -----------------------------------------------------------
#
# Users: (high_activity_stratum, converted). user_id = index, so treat is the
# index parity exactly as the device derives it.

BD_USERS = st.lists(
    st.tuples(st.booleans(), st.booleans()), min_size=4, max_size=14
)


def _bd_ref(users):
    cells = {}
    for uid, (hi, conv) in enumerate(users):
        stratum = 1 if hi else 0
        treat = uid % 2 == 1
        a, b, c, d = cells.get(stratum, (0, 0, 0, 0))
        if treat and conv:
            a += 1
        elif treat:
            b += 1
        elif conv:
            c += 1
        else:
            d += 1
        cells[stratum] = (a, b, c, d)
    ad_m = sum(
        _rha(1e6 * a * d / (a + b + c + d)) for a, b, c, d in cells.values()
    )
    bc_m = sum(
        _rha(1e6 * b * c / (a + b + c + d)) for a, b, c, d in cells.values()
    )
    psi = ad_m / bc_m if bc_m > 0 else 1.0
    s_micro = 0
    for a, b, c, d in cells.values():
        n1, n0, m1 = a + b, c + d, a + c
        if abs(psi - 1.0) < 1e-12:
            e = n1 * m1 / (n1 + n0)
        else:
            bq = n0 - m1 + psi * (n1 + m1)
            disc = max(0.0, bq * bq + 4.0 * (1.0 - psi) * psi * n1 * m1)
            rplus = (-bq + math.sqrt(disc)) / (2.0 * (1.0 - psi))
            if max(0.0, rplus) <= min(n1, m1) and rplus >= max(
                0.0, float(m1 - n0)
            ):
                e = rplus
            else:
                e = (-bq - math.sqrt(disc)) / (2.0 * (1.0 - psi))
        if (
            e > 1e-9
            and n1 - e > 1e-9
            and m1 - e > 1e-9
            and n0 - m1 + e > 1e-9
        ):
            term = (a - e) * (a - e) * (
                1.0 / e + 1.0 / (n1 - e) + 1.0 / (m1 - e) + 1.0 / (n0 - m1 + e)
            )
        else:
            term = 0.0
        s_micro += _rha(1e6 * term)
    psi_micro = _rha(1e6 * psi)
    return (len(cells), _rha(psi_micro / 1000.0), _rha(s_micro / 1000.0))


@settings(max_examples=10, deadline=None)
@given(users=BD_USERS)
def test_breslow_day_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        breslow_day_homogeneity,
    )

    rows = []
    for uid, (hi, conv) in enumerate(users):
        n_clicks = 67 if hi else 1
        for k in range(n_clicks):
            rows.append(
                (uid, "click", f"{BASE.isoformat()} 10:{k % 60:02d}:{k // 60:02d}", 1.0)
            )
        if conv:
            rows.append((uid, "purchase", f"{BASE.isoformat()} 12:00:00", 1.0))
    got = [
        (r["n_strata"], r["or_mh_milli"], r["bd_chi2_milli"])
        for r in breslow_day_homogeneity(_events(spark, rows)).collect()
    ]
    assert got == [_bd_ref(users)]


# --- Brunner-Munzel (L-514) ---------------------------------------------------------------
#
# Observations: (is_weekend, cents). BASE is a Monday; weekend rows land on
# the following Saturday.

BM_OBS = st.lists(
    st.tuples(st.booleans(), st.integers(-8, 8)), min_size=2, max_size=24
).filter(lambda o: any(g for g, _ in o) and any(not g for g, _ in o))


def _bm_ref(obs):
    pooled_cnt = Counter(c for _, c in obs)
    r2 = {}
    cum = 0
    for v in sorted(pooled_cnt):
        t = pooled_cnt[v]
        r2[v] = 2 * cum + t + 1
        cum += t
    out = {}
    for g in (0, 1):
        gc = Counter(c for gg, c in obs if gg == g)
        w2 = {}
        cumg = 0
        for v in sorted(gc):
            m = gc[v]
            w2[v] = 2 * cumg + m + 1
            cumg += m
        n_g = sum(gc.values())
        sr2 = sum(m * r2[v] for v, m in gc.items())
        s_micro = 0
        for v, m in gc.items():
            if n_g > 1:
                dev = ((r2[v] - w2[v]) - sr2 / n_g + (n_g + 1)) / 2.0
                s_micro += _rha(1e6 * m * dev * dev / (n_g - 1))
            else:
                s_micro += _rha(0.0)
        out[g] = (n_g, sr2, s_micro)
    nx, rx, sx = out[0]
    ny, ry, sy = out[1]
    p_hat = _rha(1e6 * (ry / (2.0 * ny) - (ny + 1) / 2.0) / nx)
    den = nx * (sx / 1e6) + ny * (sy / 1e6)
    if den > 0:
        w = _rha(
            1000.0
            * nx
            * ny
            * (ry / (2.0 * ny) - rx / (2.0 * nx))
            / ((float(nx) + ny) * math.sqrt(den))
        )
    else:
        w = 0
    dfden = 0.0
    if nx > 1 and ny > 1:
        dfden = (nx * (sx / 1e6)) ** 2 / (nx - 1) + (ny * (sy / 1e6)) ** 2 / (
            ny - 1
        )
    df = _rha(1000.0 * den * den / dfden) if nx > 1 and ny > 1 and dfden > 0 else 0
    return (nx, ny, p_hat, w, df)


@settings(max_examples=12, deadline=None)
@given(obs=BM_OBS)
def test_brunner_munzel_matches_reference(spark, obs):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        brunner_munzel_weekend,
    )

    rows = []
    for i, (g, c) in enumerate(obs):
        day = (BASE + dt.timedelta(days=5 if g else 0)).isoformat()
        rows.append((i, "click", f"{day} 10:{i % 60:02d}:00", c / 100.0))
    got = [
        (
            r["n_weekday"],
            r["n_weekend"],
            r["p_hat_micro"],
            r["w_milli"],
            r["df_milli"],
        )
        for r in brunner_munzel_weekend(_events(spark, rows)).collect()
    ]
    assert got == [_bm_ref(obs)]


# --- Dunn post-hoc (L-515) ------------------------------------------------------------------

DUNN_OBS = st.lists(
    st.tuples(st.sampled_from(["click", "error", "purchase"]), st.integers(-6, 6)),
    min_size=2,
    max_size=24,
)


def _dunn_ref(obs):
    pooled_cnt = Counter(c for _, c in obs)
    r2 = {}
    cum = 0
    for v in sorted(pooled_cnt):
        t = pooled_cnt[v]
        r2[v] = 2 * cum + t + 1
        cum += t
    n_tot = len(obs)
    tie3 = float(sum(t**3 - t for t in pooled_cnt.values()))
    groups = {}
    for ty, c in obs:
        n, s = groups.get(ty, (0, 0))
        groups[ty] = (n + 1, s + r2[c])
    out = []
    for ta in sorted(groups):
        for tb in sorted(groups):
            if ta >= tb:
                continue
            na, ra = groups[ta]
            nb, rb = groups[tb]
            var = (
                n_tot * (n_tot + 1) / 12.0 - tie3 / (12.0 * (n_tot - 1))
            ) * (1.0 / na + 1.0 / nb) if n_tot > 1 else 0.0
            if n_tot > 1 and var > 0:
                z = _rha(
                    1000.0
                    * (ra / (2.0 * na) - rb / (2.0 * nb))
                    / math.sqrt(var)
                )
            else:
                z = 0
            out.append((ta, tb, na, nb, z))
    return out


@settings(max_examples=12, deadline=None)
@given(obs=DUNN_OBS)
def test_dunn_posthoc_matches_reference(spark, obs):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        dunn_posthoc_types,
    )

    rows = [
        (i, ty, f"{BASE.isoformat()} 10:{i % 60:02d}:00", c / 100.0)
        for i, (ty, c) in enumerate(obs)
    ]
    got = [
        (r["type_a"], r["type_b"], r["n_a"], r["n_b"], r["z_milli"])
        for r in dunn_posthoc_types(_events(spark, rows)).collect()
    ]
    assert got == _dunn_ref(obs)


# --- SAX motifs (L-516) -----------------------------------------------------------------------

SAX_DAYS = st.lists(st.integers(0, 20), min_size=3, max_size=24)


def _sax_ref(xs):
    n = len(xs)
    sx = sum(xs)
    sxx = sum(x * x for x in xs)
    var = (sxx - sx * sx / n) / (n - 1) if n > 1 else 0.0
    letters = []
    for x in xs:
        if n > 1 and var > 0:
            z = (x - sx / n) / math.sqrt(var)
            if z < -0.6745:
                letters.append("a")
            elif z < 0:
                letters.append("b")
            elif z < 0.6745:
                letters.append("c")
            else:
                letters.append("d")
        else:
            letters.append("b")
    words = Counter(
        "".join(letters[i : i + 3]) for i in range(len(letters) - 2)
    )
    ranked = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return [(w, c) for w, c in ranked]


@settings(max_examples=12, deadline=None)
@given(xs=SAX_DAYS)
def test_sax_motifs_matches_reference(spark, xs):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        sax_motifs_daily,
    )

    rows = []
    for d, c in enumerate(xs):
        day = (BASE + dt.timedelta(days=d)).isoformat()
        rows.append((d, "error", f"{day} 09:00:00", 1.0))
        for k in range(c):
            rows.append((d, "click", f"{day} 10:{k:02d}:00", 1.0))
    got = [
        (r["word"], r["n_occurrences"])
        for r in sax_motifs_daily(_events(spark, rows)).collect()
    ]
    assert got == _sax_ref(xs)


# --- Zero-inflation score test (L-517) ---------------------------------------------------------
#
# One user per cell; every cell carries a click so zero-purchase days exist.

ZI_CELLS = st.lists(st.integers(0, 6), min_size=1, max_size=20)


def _zi_ref(ys):
    n = len(ys)
    n0 = sum(1 for y in ys if y == 0)
    sy = sum(ys)
    lam = sy / n
    p0 = math.exp(-lam)
    den = n * p0 * (1.0 - p0) - sy * p0 * p0
    s = _rha(1000.0 * (n0 - n * p0) ** 2 / den) if den > 0 else 0
    return (n, n0, _rha(1e6 * lam), s)


@settings(max_examples=12, deadline=None)
@given(ys=ZI_CELLS)
def test_zero_inflation_matches_reference(spark, ys):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        zero_inflation_score,
    )

    rows = []
    for u, y in enumerate(ys):
        day = BASE.isoformat()
        rows.append((u, "click", f"{day} 09:00:00", 1.0))
        for k in range(y):
            rows.append((u, "purchase", f"{day} 10:{k:02d}:00", 1.0))
    got = [
        (r["n_cells"], r["n_zero"], r["lambda_micro"], r["s_milli"])
        for r in zero_inflation_score(_events(spark, rows)).collect()
    ]
    assert got == [_zi_ref(ys)]


# --- Raking IPF (L-518) -------------------------------------------------------------------------

RAKE_DOCS = st.lists(
    st.tuples(
        st.sampled_from(["en", "de", "fr"]),
        st.sampled_from(["web", "books"]),
        st.booleans(),
    ),
    min_size=1,
    max_size=30,
)


def _rake_ref(docs):
    kept = Counter((l, s) for l, s, long_ in docs if long_)
    t_l = Counter(l for l, _, _ in docs)
    t_s = Counter(s for _, s, _ in docs)
    cells = {k: [n, 1000000] for k, n in kept.items()}
    for _ in range(3):
        for axis in (0, 1):
            sums = {}
            for (l, s), (n, w) in cells.items():
                key = l if axis == 0 else s
                sums[key] = sums.get(key, 0) + w * n
            for k in cells:
                key = k[axis]
                target = t_l[key] if axis == 0 else t_s[key]
                n, w = cells[k]
                if sums[key] > 0:
                    cells[k] = [n, _rha(float(w) * target * 1e6 / sums[key])]
    return sorted((l, s, n, w) for (l, s), (n, w) in cells.items())


@settings(max_examples=10, deadline=None)
@given(docs=RAKE_DOCS)
def test_raking_ipf_matches_reference(spark, docs):
    from pagila_etl_airflow_assignment_spark.llm.sampling import raking_ipf

    rows = [
        (i, "text", l, s, 900 if long_ else 100)
        for i, (l, s, long_) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = [
        (r["lang"], r["source"], r["n_kept"], r["weight_micro"])
        for r in raking_ipf(df).collect()
    ]
    assert got == _rake_ref(docs)


# --- Jackknife ratio (L-519) ---------------------------------------------------------------------

JK_DAYS = st.lists(
    st.tuples(st.integers(0, 10), st.integers(0, 5)), min_size=1, max_size=16
)


def _jk_ref(days):
    n = len(days)
    sc = sum(c for c, _ in days)
    sp = sum(p for _, p in days)
    reps = [
        _rha(1e6 * float(sp - p) / (sc - c)) if sc - c > 0 else 0
        for c, p in days
    ]
    sr = sum(reps)
    srr = sum(r * r for r in reps)
    ratio = _rha(1e6 * float(sp) / sc) if sc > 0 else 0
    inner = float(srr) - float(sr) * sr / n
    se = (
        _rha(math.sqrt((float(n) - 1) / n * inner))
        if n > 1 and inner > 0
        else 0
    )
    return (n, ratio, se)


@settings(max_examples=12, deadline=None)
@given(days=JK_DAYS)
def test_jackknife_ratio_matches_reference(spark, days):
    from pagila_etl_airflow_assignment_spark.llm.sampling import (
        jackknife_ratio_daily,
    )

    rows = []
    for d, (c, p) in enumerate(days):
        day = (BASE + dt.timedelta(days=d)).isoformat()
        rows.append((d, "signup", f"{day} 08:00:00", 1.0))
        for k in range(c):
            rows.append((d, "click", f"{day} 10:{k:02d}:00", 1.0))
        for k in range(p):
            rows.append((d, "purchase", f"{day} 11:{k:02d}:00", 1.0))
    got = [
        (r["n_days"], r["ratio_micro"], r["se_jack_micro"])
        for r in jackknife_ratio_daily(_events(spark, rows)).collect()
    ]
    assert got == [_jk_ref(days)]


# --- OCR garbage (L-520) --------------------------------------------------------------------------

import re as _re  # noqa: E402

OCR_DOCS = st.lists(
    st.tuples(
        st.text(alphabet="abRTz#$ qwrt", min_size=0, max_size=30),
        st.sampled_from(["web", "books"]),
    ),
    min_size=1,
    max_size=15,
)


def _ocr_ref(docs):
    per_src = {}
    for text, src in docs:
        norm = _re.sub(r"\s+", " ", text.strip()).lower()
        toks = len(_re.split(r"\s+", norm))
        runs = len(_re.findall(r"[b-df-hj-np-tv-xz]{4,}", text.lower()))
        flips = len(_re.findall(r"[a-z][A-Z]", text))
        syms = len(_re.findall(r"[^A-Za-z0-9 ]", text))
        chars = len(text)
        g = _rha(
            1000.0
            * (
                0.4 * min(1.0, 20.0 * runs / toks if toks > 0 else 0.0)
                + 0.3 * min(1.0, 10.0 * flips / toks if toks > 0 else 0.0)
                + 0.3 * min(1.0, 5.0 * syms / chars if chars > 0 else 0.0)
            )
        )
        n, sg, fl = per_src.get(src, (0, 0, 0))
        per_src[src] = (n + 1, sg + g, fl + (1 if g > 500 else 0))
    return sorted(
        (src, n, _rha(float(sg) / n), fl)
        for src, (n, sg, fl) in per_src.items()
    )


@settings(max_examples=12, deadline=None)
@given(docs=OCR_DOCS)
def test_ocr_garbage_matches_reference(spark, docs):
    from pagila_etl_airflow_assignment_spark.llm.text import ocr_garbage_scores

    rows = [
        (i, text, "en", src, len(text)) for i, (text, src) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = [
        (r["source"], r["n_docs"], r["avg_garbage_milli"], r["n_flagged"])
        for r in ocr_garbage_scores(df).collect()
    ]
    assert got == _ocr_ref(docs)


# --- Classifier PR-AUC (L-521) ---------------------------------------------------------------------

import hashlib as _hashlib  # noqa: E402

PR_DOCS = st.lists(
    st.tuples(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=1,
            max_size=6,
        ),
        st.booleans(),
    ),
    min_size=1,
    max_size=20,
)


def _pr_ref(docs):
    grid = {}
    for words, long_ in docs:
        text = " ".join(words)
        norm = _re.sub(r"\s+", " ", text.strip()).lower()
        toks = _re.split(r"\s+", norm)
        nt = len(toks)
        wsum = sum(
            int(_hashlib.md5(t.encode()).hexdigest()[:15], 16) % 2001
            for t in toks
        )
        p = min(1000, max(0, 500 + (2 * wsum + nt) // (2 * nt) - 1000))
        label = 1 if long_ else 0
        m, pos = grid.get(p, (0, 0))
        grid[p] = (m + 1, pos + label)
    n_pos = sum(pos for _, pos in grid.values())
    n_neg = sum(m - pos for m, pos in grid.values())
    ap = 0
    k_cum = tp_cum = 0
    for p in sorted(grid, reverse=True):
        m, pos = grid[p]
        k_cum += m
        tp_cum += pos
        if n_pos > 0:
            ap += _rha(
                1e6 * float(pos) * tp_cum / (float(n_pos) * k_cum)
            )
    base = (
        _rha(1e6 * float(n_pos) / (n_pos + n_neg)) if n_pos + n_neg > 0 else 0
    )
    return (n_pos, n_neg, ap, base)


@settings(max_examples=10, deadline=None)
@given(docs=PR_DOCS)
def test_classifier_pr_auc_matches_reference(spark, docs):
    from pagila_etl_airflow_assignment_spark.llm.text import classifier_pr_auc

    rows = [
        (i, " ".join(words), "en", "web", 900 if long_ else 100)
        for i, (words, long_) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = [
        (r["n_pos"], r["n_neg"], r["ap_micro"], r["baseline_micro"])
        for r in classifier_pr_auc(df).collect()
    ]
    assert got == [_pr_ref(docs)]


# --- MIN/MAX IVM (L-522) --------------------------------------------------------------------------
#
# Rows: (l_orderkey, l_suppkey, price_cents). The device's maintenance path
# must equal the direct aggregate of the final state, and the rescan flag
# must mark exactly the groups whose deleted max touched the stored max.

IVM_ROWS = st.lists(
    st.tuples(st.integers(1, 40), st.integers(1, 5), st.integers(100, 900)),
    min_size=1,
    max_size=40,
)


def _ivm_ref(rows, ins_mod=7, del_mod=11):
    pre = [(o, s, c) for o, s, c in rows if o % ins_mod != 0]
    ins = [(o, s, c) for o, s, c in rows if o % ins_mod == 0]
    dels = [(o, s, c) for o, s, c in pre if o % del_mod == 0]
    live = [(o, s, c) for o, s, c in pre if o % del_mod != 0]
    mx = {}
    for _, s, c in pre:
        mx[s] = max(mx.get(s, c), c)
    dmx = {}
    for _, s, c in dels:
        dmx[s] = max(dmx.get(s, c), c)
    flag = {s: (1 if s in dmx and dmx[s] == mx[s] else 0) for s in mx}
    final = {}
    for _, s, c in live + ins:
        n, m = final.get(s, (0, None))
        final[s] = (n + 1, c if m is None or c > m else m)
    return sorted(
        (s, n, m, flag.get(s, 0)) for s, (n, m) in final.items()
    )


@settings(max_examples=15, deadline=None)
@given(rows=IVM_ROWS)
def test_ivm_minmax_matches_reference(spark, rows):
    from pagila_etl_airflow_assignment_spark.operators.ivm import (
        maintained_max_view,
    )

    df = spark.createDataFrame(
        [(o, s, c / 100.0) for o, s, c in rows],
        "l_orderkey long, l_suppkey long, l_extendedprice double",
    )
    got = [
        (r["l_suppkey"], r["n_live"], r["max_cents"], r["rescanned"])
        for r in maintained_max_view(df).collect()
    ]
    assert got == _ivm_ref(rows)


# --- Harrell's C-index (L-524) ---------------------------------------------------------------------
#
# Users: (click count, purchase delay days or None). All users fit under the
# md5 sample cap, so the pair set is exact.

CIDX_USERS = st.lists(
    st.tuples(st.integers(0, 9), st.one_of(st.none(), st.integers(0, 20))),
    min_size=1,
    max_size=16,
)


def _cidx_ref(users, horizon=14):
    per = []
    for clicks, delay in users:
        if delay is not None and delay <= horizon:
            per.append((clicks, delay, 1))
        else:
            per.append((clicks, horizon, 0))
    n_pairs = 0
    c2 = 0
    for sa, ta, eva in per:
        for sb, tb, _ in per:
            if ta < tb and eva == 1:
                n_pairs += 1
                c2 += 2 if sa > sb else (1 if sa == sb else 0)
    c = _rha(1e6 * c2 / (2.0 * n_pairs)) if n_pairs > 0 else 0
    return (len(per), n_pairs, c)


@settings(max_examples=12, deadline=None)
@given(users=CIDX_USERS)
def test_harrell_c_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        harrell_c_index,
    )

    rows = []
    for u, (clicks, delay) in enumerate(users):
        day0 = BASE.isoformat()
        rows.append((u, "signup", f"{day0} 08:00:00", 1.0))
        for k in range(clicks):
            rows.append((u, "click", f"{day0} 09:{k:02d}:00", 1.0))
        if delay is not None:
            dp = (BASE + dt.timedelta(days=delay)).isoformat()
            rows.append((u, "purchase", f"{dp} 12:00:00", 1.0))
    got = [
        (r["n_users"], r["n_pairs"], r["c_index_micro"])
        for r in harrell_c_index(_events(spark, rows)).collect()
    ]
    assert got == [_cidx_ref(users)]


# --- Krippendorff's alpha (L-525) -------------------------------------------------------------------
#
# Docs: (long, n_tokens, n_symbols); text = 'aa ' * tokens + '#' * symbols.

KRIPP_DOCS = st.lists(
    st.tuples(st.booleans(), st.integers(0, 50), st.integers(0, 30)),
    min_size=1,
    max_size=20,
)


def _kripp_ref(docs):
    n_units = len(docs)
    n_pos = 0
    dis = 0
    for long_, ntok, nsym in docs:
        text = "aa " * ntok + "#" * nsym
        norm = _re.sub(r"\s+", " ", text.strip()).lower()
        toks = len(_re.split(r"\s+", norm))
        syms = len(_re.findall(r"[^A-Za-z0-9 ]", text))
        k = (
            (1 if (900 if long_ else 100) >= 300 else 0)
            + (1 if toks >= 40 else 0)
            + (1 if syms * 1000 <= 80 * max(len(text), 1) else 0)
        )
        n_pos += k
        dis += k * (3 - k)
    nn = 3 * n_units
    do = _rha(1e6 * dis / nn)
    de = _rha(1e6 * 2.0 * n_pos * (nn - n_pos) / (float(nn) * (nn - 1)))
    if 0 < n_pos < nn:
        alpha = _rha(
            1000.0
            * (
                1.0
                - (dis / nn)
                / (2.0 * n_pos * (nn - n_pos) / (float(nn) * (nn - 1)))
            )
        )
    else:
        alpha = 1000
    return (n_units, n_pos, nn - n_pos, do, de, alpha)


@settings(max_examples=12, deadline=None)
@given(docs=KRIPP_DOCS)
def test_krippendorff_matches_reference(spark, docs):
    from pagila_etl_airflow_assignment_spark.llm.corpus_stats import (
        krippendorff_alpha_filters,
    )

    rows = [
        (i, "aa " * ntok + "#" * nsym, "en", "web", 900 if long_ else 100)
        for i, (long_, ntok, nsym) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = [
        (
            r["n_units"],
            r["n_pos"],
            r["n_neg"],
            r["do_micro"],
            r["de_micro"],
            r["alpha_milli"],
        )
        for r in krippendorff_alpha_filters(df).collect()
    ]
    assert got == [_kripp_ref(docs)]


# --- Trained Naive Bayes (L-526) ---------------------------------------------------------------------

NB_DOCS = st.lists(
    st.tuples(
        st.sampled_from(["en", "de"]),
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=5
        ),
    ),
    min_size=2,
    max_size=20,
)


def _md5i(s):
    return int(_hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _nb_ref(docs):
    train, test = [], []
    for i, (lang, words) in enumerate(docs):
        (train if _md5i(str(i)) % 2 == 0 else test).append((i, lang, words))
    ctc = Counter()
    totc = Counter()
    for _, lang, words in train:
        for w in words:
            ctc[(lang, w)] += 1
            totc[lang] += 1
    vocab = len({w for (_, w) in ctc})
    prior = Counter(lang for _, lang, _ in train)
    ndt = sum(prior.values())
    classes = sorted(set(prior) & set(totc))
    pred_counts = Counter()
    for _, lang, words in test:
        if not classes or not words:
            continue
        best = None
        for cls in classes:
            pm = _rha(1e6 * math.log(prior[cls] / ndt))
            ll = sum(
                _rha(
                    1e6
                    * math.log(
                        (ctc.get((cls, w), 0) + 1.0) / (totc[cls] + vocab)
                    )
                )
                for w in words
            )
            score = ll + pm
            if best is None or score > best[0] or (
                score == best[0] and cls < best[1]
            ):
                best = (score, cls)
        pred_counts[(lang, best[1])] += 1
    return sorted(
        (a, p, n) for (a, p), n in pred_counts.items()
    )


@settings(max_examples=10, deadline=None)
@given(docs=NB_DOCS)
def test_naive_bayes_matches_reference(spark, docs):
    from pagila_etl_airflow_assignment_spark.llm.text import (
        naive_bayes_confusion,
    )

    rows = [
        (i, " ".join(words), lang, "web", 100)
        for i, (lang, words) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = [
        (r["actual_lang"], r["predicted_lang"], r["n_docs"])
        for r in naive_bayes_confusion(df).collect()
    ]
    assert got == _nb_ref(docs)


# --- Decision stump (L-527) ----------------------------------------------------------------------

STUMP_USERS = st.lists(
    st.tuples(st.integers(1, 8), st.booleans()), min_size=2, max_size=20
)


def _ent(a, m):
    if m > 0 and 0 < a < m:
        return -(a / m) * math.log(a / m) - ((m - a) / m) * math.log(
            (m - a) / m
        )
    return 0.0


def _stump_ref(users):
    per = [(k + (1 if conv else 0), 1 if conv else 0) for k, conv in users]
    grid = {}
    for v, y in per:
        c, p = grid.get(v, (0, 0))
        grid[v] = (c + 1, p + y)
    n = sum(c for c, _ in grid.values())
    p = sum(q for _, q in grid.values())
    cl = pl = 0
    best = None
    for v in sorted(grid):
        c, q = grid[v]
        cl += c
        pl += q
        if cl >= n:
            continue
        ig = (
            _ent(p, n)
            - (cl / n) * _ent(pl, cl)
            - ((n - cl) / n) * _ent(p - pl, n - cl)
        )
        igm = _rha(1e6 * ig)
        if best is None or igm > best[0]:
            best = (igm, v, cl, pl)
    if best is None:
        return None
    igm, v, cl, pl = best
    return (n, v, igm, cl, pl, n - cl, p - pl)


@settings(max_examples=12, deadline=None)
@given(users=STUMP_USERS)
def test_decision_stump_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        decision_stump_engagement,
    )

    rows = []
    for u, (k, conv) in enumerate(users):
        for j in range(k):
            rows.append((u, "click", f"{BASE.isoformat()} 10:{j:02d}:00", 1.0))
        if conv:
            rows.append((u, "purchase", f"{BASE.isoformat()} 12:00:00", 1.0))
    got = [
        (
            r["n_users"],
            r["split_value"],
            r["ig_micro"],
            r["n_left"],
            r["pos_left"],
            r["n_right"],
            r["pos_right"],
        )
        for r in decision_stump_engagement(_events(spark, rows)).collect()
    ]
    ref = _stump_ref(users)
    assert got == ([ref] if ref is not None else [])


# --- Regression discontinuity (L-528) ------------------------------------------------------------

RDD_USERS = st.lists(
    st.tuples(st.integers(1, 12), st.booleans()), min_size=4, max_size=24
)


def _rdd_ref(users):
    per = [(k + (1 if conv else 0), 1 if conv else 0) for k, conv in users]
    vs = sorted(v for v, _ in per)
    n = len(vs)
    c = vs[(n + 1) // 2 - 1]
    bw = max(c // 2, 1)
    sides = {}
    for v, y in per:
        if c - bw <= v < c + bw:
            side = 1 if v >= c else 0
            m, sx, sy, sxx, sxy = sides.get(side, (0, 0, 0, 0, 0))
            x = v - c
            sides[side] = (m + 1, sx + x, sy + y, sxx + x * x, sxy + x * y)

    def fit(side):
        if side not in sides:
            return None, None, None
        m, sx, sy, sxx, sxy = sides[side]
        den = float(m) * sxx - float(sx) * sx
        b = (float(m) * sxy - float(sx) * sy) / den if den != 0 else 0.0
        a = (float(sy) - b * sx) / m
        return m, a, b

    nl, al, bl = fit(0)
    nr, ar, br = fit(1)
    jump = (
        _rha(1e6 * (ar - al)) if al is not None and ar is not None else None
    )
    sl = _rha(1e6 * bl) if bl is not None else None
    sr = _rha(1e6 * br) if br is not None else None
    return (c, bw, nl, nr, jump, sl, sr)


@settings(max_examples=12, deadline=None)
@given(users=RDD_USERS)
def test_rdd_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        regression_discontinuity,
    )

    rows = []
    for u, (k, conv) in enumerate(users):
        for j in range(k):
            rows.append((u, "click", f"{BASE.isoformat()} 10:{j:02d}:00", 1.0))
        if conv:
            rows.append((u, "purchase", f"{BASE.isoformat()} 12:00:00", 1.0))
    got = [
        (
            r["cutoff"],
            r["bandwidth"],
            r["n_left"],
            r["n_right"],
            r["jump_micro"],
            r["slope_l_micro"],
            r["slope_r_micro"],
        )
        for r in regression_discontinuity(_events(spark, rows)).collect()
    ]
    assert got == [_rdd_ref(users)]


# --- Randomization inference (L-529) ---------------------------------------------------------------

RI_USERS = st.lists(st.booleans(), min_size=4, max_size=24).filter(
    lambda u: len(u) >= 4
)


def _ri_ref(users, reps=32):
    per = [(u, 1 if conv else 0) for u, conv in enumerate(users)]
    nt = sum(1 for u, _ in per if u % 2 == 1)
    nc = sum(1 for u, _ in per if u % 2 == 0)
    ct = sum(y for u, y in per if u % 2 == 1)
    cc = sum(y for u, y in per if u % 2 == 0)
    dobs = _rha(1e6 * (ct / nt - cc / nc))
    n_ext = 0
    for r in range(reps):
        t = [(_md5i(f"{u}_{r}") % 2 == 1, y) for u, y in per]
        nt_r = sum(1 for tr, _ in t if tr)
        nc_r = len(t) - nt_r
        if nt_r > 0 and nc_r > 0:
            d = _rha(
                1e6
                * (
                    sum(y for tr, y in t if tr) / nt_r
                    - sum(y for tr, y in t if not tr) / nc_r
                )
            )
        else:
            d = 0
        if abs(d) >= abs(dobs):
            n_ext += 1
    p = _rha(1e6 * (1.0 + n_ext) / (reps + 1))
    return (len(per), dobs, reps, n_ext, p)


@settings(max_examples=10, deadline=None)
@given(users=RI_USERS)
def test_randomization_inference_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        randomization_inference,
    )

    rows = []
    for u, conv in enumerate(users):
        rows.append((u, "click", f"{BASE.isoformat()} 10:00:00", 1.0))
        if conv:
            rows.append((u, "purchase", f"{BASE.isoformat()} 12:00:00", 1.0))
    got = [
        (
            r["n_users"],
            r["diff_obs_micro"],
            r["n_reps"],
            r["n_extreme"],
            r["p_micro"],
        )
        for r in randomization_inference(_events(spark, rows)).collect()
    ]
    assert got == [_ri_ref(users)]


# --- Chatterjee's xi (L-530) -----------------------------------------------------------------------

XI_DAYS = st.lists(
    st.tuples(st.integers(0, 10), st.integers(0, 10)), min_size=2, max_size=20
)


def _xi_ref(days):
    n = len(days)
    ys = [y for _, y in days]
    r = {v: sum(1 for w in ys if w <= v) for v in set(ys)}
    l = {v: sum(1 for w in ys if w >= v) for v in set(ys)}
    order = sorted(range(n), key=lambda i: (days[i][0], i))
    sdr = sum(
        abs(r[ys[order[i + 1]]] - r[ys[order[i]]]) for i in range(n - 1)
    )
    den = sum(l[y] * (n - l[y]) for y in ys)
    xi = _rha(1000.0 * (1.0 - n * sdr / (2.0 * den))) if den > 0 else 0
    return (n, sdr, 2 * den, xi)


@settings(max_examples=12, deadline=None)
@given(days=XI_DAYS)
def test_chatterjee_xi_matches_reference(spark, days):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        chatterjee_xi_daily,
    )

    rows = []
    for d, (c, e) in enumerate(days):
        day = (BASE + dt.timedelta(days=d)).isoformat()
        rows.append((d, "signup", f"{day} 08:00:00", 1.0))
        for k in range(c):
            rows.append((d, "click", f"{day} 10:{k:02d}:00", 1.0))
        for k in range(e):
            rows.append((d, "error", f"{day} 11:{k:02d}:00", 1.0))
    got = [
        (r["n_days"], r["sum_abs_dr"], r["denom2"], r["xi_milli"])
        for r in chatterjee_xi_daily(_events(spark, rows)).collect()
    ]
    assert got == [_xi_ref(days)]


# --- Held-out bigram perplexity (L-531) --------------------------------------------------------------

PPL_DOCS = st.lists(
    st.tuples(
        st.sampled_from(["en", "de"]),
        st.lists(
            st.sampled_from(["aa", "bb", "cc"]), min_size=2, max_size=6
        ),
    ),
    min_size=2,
    max_size=16,
)


def _ppl_ref(docs):
    train, test = [], []
    for i, (lang, words) in enumerate(docs):
        (train if _md5i(str(i)) % 2 == 0 else test).append((lang, words))
    cbi = Counter()
    cuni = Counter()
    vocab = set()
    for _, words in train:
        vocab.update(words)
        for a, b in zip(words, words[1:]):
            cbi[(a, b)] += 1
            cuni[a] += 1
    v = len(vocab)
    per_lang = {}
    for lang, words in test:
        for a, b in zip(words, words[1:]):
            nll = _rha(
                1e6 * -math.log((cbi.get((a, b), 0) + 1.0) / (cuni.get(a, 0) + v))
            )
            n, s = per_lang.get(lang, (0, 0))
            per_lang[lang] = (n + 1, s + nll)
    return sorted(
        (
            lang,
            n,
            _rha(float(s) / n),
            _rha(1000.0 * math.exp(float(s) / n / 1e6)),
        )
        for lang, (n, s) in per_lang.items()
    )


@settings(max_examples=10, deadline=None)
@given(docs=PPL_DOCS)
def test_heldout_perplexity_matches_reference(spark, docs):
    from pagila_etl_airflow_assignment_spark.llm.text import (
        heldout_bigram_perplexity,
    )

    rows = [
        (i, " ".join(words), lang, "web", 100)
        for i, (lang, words) in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = [
        (r["lang"], r["n_bigrams"], r["avg_nll_micro"], r["ppl_milli"])
        for r in heldout_bigram_perplexity(df).collect()
    ]
    ref = _ppl_ref(docs)
    # a train half with no bigrams still defines v=0 smoothing; the device
    # and reference share that convention exactly
    assert got == ref


# --- Wagner-Whitin (L-532) ----------------------------------------------------------------------------

WW_DEMANDS = st.lists(st.integers(0, 2000), min_size=12, max_size=12)


def _ww_ref(demands, K=50_000, h=1):
    T = 12
    d = [0] + list(demands)
    INF = 10**15
    cost = {}
    for i in range(1, T + 1):
        for j in range(i, T + 1):
            cost[(i, j)] = K + h * sum((t - i) * d[t] for t in range(i, j + 1))
    f = [0] + [INF] * T
    for j in range(1, T + 1):
        f[j] = min(f[i - 1] + cost[(i, j)] for i in range(1, j + 1))
    out = []
    for j in range(1, T + 1):
        om = min(
            i for i in range(1, j + 1) if f[i - 1] + cost[(i, j)] == f[j]
        )
        out.append((j, d[j], f[j], om))
    return out


@settings(max_examples=8, deadline=None)
@given(demands=WW_DEMANDS)
def test_wagner_whitin_matches_reference(spark, demands):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        wagner_whitin_plan,
    )

    rows = []
    k = 0
    for m, dem in enumerate(demands, start=1):
        # one line per month carrying the whole demand as quantity
        rows.append((k, f"1995-{m:02d}-15 00:00:00", float(dem)))
        k += 1
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_shipdate string, l_quantity double"
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    got = [
        (r["month"], r["demand_units"], r["f_cost"], r["order_month"])
        for r in wagner_whitin_plan(df).collect()
    ]
    assert got == _ww_ref(demands)


# --- User-level DP (L-533) ------------------------------------------------------------------------

DPU_USERS = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=1, max_size=15
)


def _dpu_ref(users, cap=5, eps_milli=1000):
    out = []
    for etype in ("click", "error"):
        idx = 0 if etype == "click" else 1
        counts = [u[idx] for u in users if u[idx] > 0]
        if not counts:
            continue
        true_n = sum(counts)
        clamped = sum(min(c, cap) for c in counts)
        u = (_md5i(etype) + 0.5) / float(1 << 60)
        cen = u - 0.5
        b = cap * 1000 * 1000 / eps_milli
        noise = _rha(
            -b * math.copysign(1.0, cen) * math.log(1.0 - 2.0 * abs(cen))
        )
        step = (
            -((-noise + 500) // 1000) if noise < 0 else (noise + 500) // 1000
        )
        out.append((etype, true_n, clamped, noise, max(0, clamped + step)))
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(users=DPU_USERS)
def test_dp_user_level_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        dp_user_level_counts,
    )

    rows = []
    for u, (nc, ne) in enumerate(users):
        for k in range(nc):
            rows.append((u, "click", f"{BASE.isoformat()} 10:{k:02d}:00", 1.0))
        for k in range(ne):
            rows.append((u, "error", f"{BASE.isoformat()} 11:{k:02d}:00", 1.0))
    if not rows:
        return
    got = [
        (
            r["event_type"],
            r["true_n"],
            r["clamped_n"],
            r["noise_milli"],
            r["noisy_n"],
        )
        for r in dp_user_level_counts(_events(spark, rows)).collect()
    ]
    assert got == _dpu_ref(users)


# --- Qini uplift (L-534) --------------------------------------------------------------------------

QINI_USERS = st.lists(
    st.tuples(st.integers(0, 9), st.booleans()), min_size=2, max_size=24
)


def _qini_ref(users):
    per = []
    for u, (score_clicks, conv) in enumerate(users):
        score = score_clicks
        per.append((u, score, 1 if conv else 0))
    n = len(per)
    order = sorted(per, key=lambda r: (-r[1], r[0]))
    cum = {}
    for rank, (u, score, conv) in enumerate(order, start=1):
        d = (rank - 1) * 10 // n + 1
        nt, nc, ct, cc = cum.get(d, (0, 0, 0, 0))
        if u % 2 == 1:
            nt += 1
            ct += conv
        else:
            nc += 1
            cc += conv
        cum[d] = (nt, nc, ct, cc)
    out = []
    ant = anc = act = acc = 0
    for d in sorted(cum):
        nt, nc, ct, cc = cum[d]
        ant += nt
        anc += nc
        act += ct
        acc += cc
        q = _rha(1e6 * (act - acc * ant / anc)) if anc > 0 else 0
        out.append((d, ant, anc, act, acc, q))
    return out


@settings(max_examples=12, deadline=None)
@given(users=QINI_USERS)
def test_qini_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        qini_uplift_curve,
    )

    rows = []
    for u, (clicks, conv) in enumerate(users):
        rows.append((u, "signup", f"{BASE.isoformat()} 08:00:00", 1.0))
        for k in range(clicks):
            rows.append((u, "click", f"{BASE.isoformat()} 10:{k:02d}:00", 1.0))
        if conv:
            rows.append((u, "purchase", f"{BASE.isoformat()} 12:00:00", 1.0))
    got = [
        (r["decile"], r["n_t"], r["n_c"], r["conv_t"], r["conv_c"], r["qini_micro"])
        for r in qini_uplift_curve(_events(spark, rows)).collect()
    ]
    assert got == _qini_ref(users)


# --- Yuen's trimmed test (L-535) --------------------------------------------------------------------

YUEN_OBS = st.lists(
    st.tuples(st.booleans(), st.integers(-8, 8)), min_size=2, max_size=24
).filter(lambda o: any(g for g, _ in o) and any(not g for g, _ in o))


def _yuen_group(cs):
    n = len(cs)
    gt = n // 5
    xs = sorted(cs)
    lo = xs[gt]
    hi = xs[n - gt - 1]
    kept = xs[gt : n - gt]
    h = n - 2 * gt
    ts = sum(kept)
    tsq = sum(x * x for x in kept)
    tm = ts / h if h > 0 else 0.0
    if h > 1 and n > 1:
        sw = float(ts) + gt * (float(lo) + hi)
        sww = float(tsq) + gt * (float(lo) * lo + float(hi) * hi)
        d = (float(n) - 1) * ((sww - sw * sw / n) / (n - 1)) / (
            float(h) * (h - 1)
        )
    else:
        d = 0.0
    return n, h, tm, d


def _yuen_ref(obs):
    g0 = [c for g, c in obs if not g]
    g1 = [c for g, c in obs if g]
    n0, h0, tm0, d0 = _yuen_group(g0)
    n1, h1, tm1, d1 = _yuen_group(g1)
    tdiff = _rha(1e6 * (tm1 - tm0) / 100.0)
    t = (
        _rha(1000.0 * (tm1 - tm0) / math.sqrt(d0 + d1))
        if d0 + d1 > 0
        else 0
    )
    dfden = (
        d0 * d0 / (h0 - 1) + d1 * d1 / (h1 - 1)
        if h0 > 1 and h1 > 1
        else 0.0
    )
    df = (
        _rha(1000.0 * (d0 + d1) ** 2 / dfden)
        if h0 > 1 and h1 > 1 and dfden > 0
        else 0
    )
    return (n0, n1, h0, h1, tdiff, t, df)


@settings(max_examples=12, deadline=None)
@given(obs=YUEN_OBS)
def test_yuen_matches_reference(spark, obs):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        yuen_trimmed_test,
    )

    rows = []
    for i, (g, c) in enumerate(obs):
        day = (BASE + dt.timedelta(days=5 if g else 0)).isoformat()
        rows.append((i, "click", f"{day} 10:{i % 60:02d}:00", c / 100.0))
    got = [
        (
            r["n_weekday"],
            r["n_weekend"],
            r["h_weekday"],
            r["h_weekend"],
            r["tdiff_micro"],
            r["t_milli"],
            r["df_milli"],
        )
        for r in yuen_trimmed_test(_events(spark, rows)).collect()
    ]
    assert got == [_yuen_ref(obs)]


# --- Wasserstein hourly (L-536) ---------------------------------------------------------------------

EMD_HOURS = st.lists(
    st.tuples(st.integers(0, 23), st.booleans()), min_size=1, max_size=40
)


def _emd_ref(obs):
    cx = [0] * 24
    cy = [0] * 24
    for h, is_err in obs:
        (cy if is_err else cx)[h] += 1
    nx, ny = sum(cx), sum(cy)
    ax = ay = 0
    s = 0
    for h in range(23):
        ax += cx[h]
        ay += cy[h]
        s += abs(ny * ax - nx * ay)
    emd = _rha(1e6 * s / (float(nx) * ny)) if nx > 0 and ny > 0 else 0
    return (nx, ny, emd)


@settings(max_examples=12, deadline=None)
@given(obs=EMD_HOURS)
def test_wasserstein_matches_reference(spark, obs):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        wasserstein_hourly,
    )

    rows = [
        (
            i,
            "error" if is_err else "click",
            f"{BASE.isoformat()} {h:02d}:05:00",
            1.0,
        )
        for i, (h, is_err) in enumerate(obs)
    ]
    got = [
        (r["n_x"], r["n_y"], r["emd_micro"])
        for r in wasserstein_hourly(_events(spark, rows)).collect()
    ]
    assert got == [_emd_ref(obs)]


# --- Energy distance (L-537) --------------------------------------------------------------------------

ED_OBS = st.lists(
    st.tuples(st.booleans(), st.integers(-8, 8)), min_size=2, max_size=24
)


def _ed_ref(obs):
    xs = [c for g, c in obs if not g]
    ys = [c for g, c in obs if g]
    nx, ny = len(xs), len(ys)

    def msum(a, b):
        return sum(abs(u - v) for u in a for v in b)

    dxy = msum(xs, ys)
    dxx = msum(xs, xs)
    dyy = msum(ys, ys)
    exy = _rha(1e6 * dxy / (float(nx) * ny) / 100.0) if nx and ny else 0
    exx = _rha(1e6 * dxx / (float(nx) * nx) / 100.0) if nx else 0
    eyy = _rha(1e6 * dyy / (float(ny) * ny) / 100.0) if ny else 0
    en = (
        _rha(
            1e6
            * (
                2.0 * dxy / (float(nx) * ny)
                - dxx / (float(nx) * nx)
                - dyy / (float(ny) * ny)
            )
            / 100.0
        )
        if nx and ny
        else 0
    )
    return (nx, ny, exy, exx, eyy, en)


@settings(max_examples=12, deadline=None)
@given(obs=ED_OBS.filter(lambda o: any(g for g, _ in o) and any(not g for g, _ in o)))
def test_energy_distance_matches_reference(spark, obs):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        energy_distance_weekend,
    )

    rows = []
    for i, (g, c) in enumerate(obs):
        day = (BASE + dt.timedelta(days=5 if g else 0)).isoformat()
        rows.append((i, "click", f"{day} 10:{i % 60:02d}:00", c / 100.0))
    got = [
        (
            r["n_x"],
            r["n_y"],
            r["exy_micro"],
            r["exx_micro"],
            r["eyy_micro"],
            r["energy_micro"],
        )
        for r in energy_distance_weekend(_events(spark, rows)).collect()
    ]
    assert got == [_ed_ref(obs)]


# --- Silver-Meal vs Wagner-Whitin (L-538) -----------------------------------------------------------


def _sm_ref(demands, K=50_000, h=1):
    T = 12
    d = [0] + list(demands)
    cost = {}
    for i in range(1, T + 1):
        for j in range(i, T + 1):
            cost[(i, j)] = K + h * sum((t - i) * d[t] for t in range(i, j + 1))
    stops = {}
    for i in range(1, T + 1):
        jstar = T
        for j in range(i, T):
            if cost[(i, j + 1)] * (j - i + 1) > cost[(i, j)] * (j - i + 2):
                jstar = j
                break
        stops[i] = jstar
    orders = []
    i = 1
    while i <= T:
        orders.append(i)
        i = stops[i] + 1
    total = sum(cost[(i, stops[i])] for i in orders)
    f = [0] + [10**15] * T
    for j in range(1, T + 1):
        f[j] = min(f[i - 1] + cost[(i, j)] for i in range(1, j + 1))
    opt = f[T]
    gap = _rha(1000.0 * total / opt) if opt > 0 else 0
    return [
        (i, stops[i], cost[(i, stops[i])], total, opt, gap) for i in orders
    ]


@settings(max_examples=8, deadline=None)
@given(demands=WW_DEMANDS)
def test_silver_meal_matches_reference(spark, demands):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        silver_meal_plan,
    )

    rows = [
        (m, f"1995-{m:02d}-15 00:00:00", float(dem))
        for m, dem in enumerate(demands, start=1)
    ]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_shipdate string, l_quantity double"
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    got = [
        (
            r["order_month"],
            r["cover_through"],
            r["order_cost"],
            r["total_sm_cost"],
            r["optimal_cost"],
            r["gap_milli"],
        )
        for r in silver_meal_plan(df).collect()
    ]
    assert got == _sm_ref(demands)
