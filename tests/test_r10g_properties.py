"""Property tests for the round-10g devices (L-556..L-559)."""

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


def _mean_hup(total: int, n: int) -> int:
    return (2 * total + n) // (2 * n)


# --- top-k IVM (L-556) ------------------------------------------------------------------
#
# The maintenance identity: maintained view == first-principles top-k of the
# final table state, for ANY base table. Rows: (orderkey, suppkey, cents).

IVM_ROWS = st.lists(
    st.tuples(st.integers(1, 40), st.integers(1, 4), st.integers(100, 99999)),
    min_size=1,
    max_size=30,
)


def _topk_ref(rows, k=3, ins_mod=7, del_mod=5):
    pre = [(o, i, s, c) for i, (o, s, c) in enumerate(rows) if o % ins_mod != 0]
    ins = [(o, i, s, c) for i, (o, s, c) in enumerate(rows) if o % ins_mod == 0]
    live = [(o, i, s, c) for (o, i, s, c) in pre if o % del_mod != 0]
    deletes = [(o, i, s, c) for (o, i, s, c) in pre if o % del_mod == 0]
    final = live + ins
    by_g = defaultdict(list)
    for o, i, s, c in final:
        by_g[s].append((c, o, i))
    kth = {}
    pre_by_g = defaultdict(list)
    for o, i, s, c in pre:
        pre_by_g[s].append((c, o, i))
    for s, vs in pre_by_g.items():
        vs.sort(key=lambda t: (-t[0], t[1], t[2]))
        kth[s] = min(c for c, _, _ in vs[:k])
    dmx = defaultdict(lambda: None)
    for o, i, s, c in deletes:
        dmx[s] = c if dmx[s] is None else max(dmx[s], c)
    out = []
    for s, vs in sorted(by_g.items()):
        vs.sort(key=lambda t: (-t[0], t[1], t[2]))
        n_live = len(vs)
        resc = (
            1
            if s in kth and dmx[s] is not None and dmx[s] >= kth[s]
            else 0
        )
        for r, (c, _, _) in enumerate(vs[:k], start=1):
            out.append((s, r, c, n_live, resc))
    return out


@settings(max_examples=10, deadline=None)
@given(rows=IVM_ROWS)
def test_topk_ivm_identity(spark, rows):
    from pagila_etl_airflow_assignment_spark.operators.ivm import (
        maintained_topk_view,
    )

    df = spark.createDataFrame(
        [
            (o, i, 1, s, 1.0, c / 100.0, 0.0, 0.0, "N", "O", "2024-01-01")
            for i, (o, s, c) in enumerate(rows)
        ],
        "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate string",
    ).withColumn("l_shipdate", F.to_date("l_shipdate"))
    got = [
        (r["l_suppkey"], r["rnk"], r["price_cents"], r["n_live"], r["rescanned"])
        for r in maintained_topk_view(df, 3, 7, 5).collect()
    ]
    assert got == _topk_ref(rows)


# --- shot boundaries (L-557) ------------------------------------------------------------

SHOT_TEXT = st.lists(
    st.text(alphabet="ab XYZ.", min_size=128, max_size=300), min_size=1, max_size=4
)


def _shots_ref(texts, nf=16, nb=8, tau=3):
    out = []
    for doc_id, text in enumerate(texts):
        l = len(text)
        if l < nf * nb:
            continue
        g = nf * nb
        bins = defaultdict(lambda: [0, 0])
        for pos, ch in enumerate(text):
            gi = pos * g // l
            bins[(gi // nb, gi % nb)][0] += ord(ch)
            bins[(gi // nb, gi % nb)][1] += 1
        frames = defaultdict(lambda: [0, 0])
        for (f, b), (s, c) in bins.items():
            frames[f][0] += s
            frames[f][1] += c
        bit = {
            (f, b): int(
                _mean_hup(1000 * s, c) > _mean_hup(1000 * frames[f][0], frames[f][1])
            )
            for (f, b), (s, c) in bins.items()
        }
        n_frames = len(frames)
        hams = []
        for f in range(n_frames - 1):
            h = sum(
                1
                for b in range(nb)
                if (f, b) in bit and (f + 1, b) in bit and bit[(f, b)] != bit[(f + 1, b)]
            )
            hams.append(h)
        n_cuts = sum(1 for h in hams if h >= tau)
        out.append(
            (
                doc_id,
                n_frames,
                n_cuts,
                max(hams),
                _mean_hup(1000 * n_frames, n_cuts + 1),
            )
        )
    return out


@settings(max_examples=8, deadline=None)
@given(texts=SHOT_TEXT)
def test_shot_boundaries_matches_reference(spark, texts):
    from pagila_etl_airflow_assignment_spark.llm.multimodal import (
        shot_boundaries,
    )

    df = spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = [
        (
            r["doc_id"],
            r["n_frames"],
            r["n_cuts"],
            r["max_hamming"],
            r["mean_shot_frames_milli"],
        )
        for r in shot_boundaries(df).collect()
    ]
    assert got == _shots_ref(texts)


# --- QTE deciles (L-558) ----------------------------------------------------------------

QTE_USERS = st.lists(
    st.tuples(st.booleans(), st.integers(0, 50000)),
    min_size=2,
    max_size=24,
)


def _qte_ref(users):
    groups = {1: [], 0: []}
    for i, (clicked, cents) in enumerate(users):
        groups[1 if clicked else 0].append((cents, i))
    qs = {}
    for t, vs in groups.items():
        vs.sort()
        n = len(vs)
        qs[t] = {
            d: vs[(d * n + 9) // 10 - 1][0] if n else None for d in range(1, 10)
        }
    out = []
    for d in range(1, 10):
        qt = qs[1].get(d) if groups[1] else None
        qc = qs[0].get(d) if groups[0] else None
        out.append(
            (
                d,
                len(groups[1]) if groups[1] else None,
                len(groups[0]) if groups[0] else None,
                qt,
                qc,
                None if qt is None or qc is None else qt - qc,
            )
        )
    return out


@settings(max_examples=10, deadline=None)
@given(users=QTE_USERS)
def test_qte_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import qte_deciles

    rows = []
    for u, (clicked, cents) in enumerate(users):
        if clicked:
            rows.append((u, "click", "2024-01-01 01:00:00", 0.0))
        else:
            rows.append((u, "view", "2024-01-01 01:00:00", 0.0))
        if cents:
            rows.append((u, "purchase", "2024-01-01 02:00:00", cents / 100.0))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = [
        (
            r["decile"],
            r["n_treated"],
            r["n_control"],
            r["q_treated"],
            r["q_control"],
            r["qte_cents"],
        )
        for r in qte_deciles(df).collect()
    ]
    assert got == _qte_ref(users)


# --- FWL (L-559) ------------------------------------------------------------------------

FWL_USERS = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 4), st.integers(0, 20000)),
    min_size=4,
    max_size=24,
)


def _fwl_ref(users):
    n = len(users)
    sx = sum(u[0] for u in users)
    sd = sum(u[1] for u in users)
    sy = sum(u[2] for u in users)
    sxx = sum(u[0] * u[0] for u in users)
    sdd = sum(u[1] * u[1] for u in users)
    sxd = sum(u[0] * u[1] for u in users)
    sxy = sum(u[0] * u[2] for u in users)
    sdy = sum(u[1] * u[2] for u in users)
    cxx = sxx - sx * sx / n
    cdd = sdd - sd * sd / n
    cxd = sxd - sx * sd / n
    cxy = sxy - sx * sy / n
    cdy = sdy - sd * sy / n
    det = cdd * cxx - cxd * cxd
    if not (cxx > 0 and det > 0):
        return (n, None, None, None)
    direct = (cdy * cxx - cxy * cxd) / det
    gamma = cxd / cxx
    fwl = (cdy - gamma * cxy) / (cdd - gamma * cxd)
    return (n, _r(direct, 6), _r(fwl, 6), _r(abs(direct - fwl), 9))


@settings(max_examples=10, deadline=None)
@given(users=FWL_USERS)
def test_fwl_matches_reference_and_identity_holds(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.stats import (
        fwl_partial_out,
    )

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
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    [got] = fwl_partial_out(df).collect()
    ref = _fwl_ref(users)
    assert (
        got["n"],
        got["beta_direct"],
        got["beta_fwl"],
        got["identity_gap"],
    ) == ref
    if ref[3] is not None:
        assert ref[3] <= 1e-6  # the FWL identity itself
