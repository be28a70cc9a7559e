"""Property tests for the round-10h devices (L-560..L-562)."""

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


# --- LOF (L-560) ------------------------------------------------------------------------

DIM = 6
LOF_VECS = st.lists(
    st.tuples(
        st.lists(
            st.integers(-8, 8).map(lambda v: v / 4.0),
            min_size=DIM,
            max_size=DIM,
        ),
        st.integers(0, 2),
    ),
    min_size=4,
    max_size=12,
    unique_by=lambda t: tuple(t[0]),
)


def _lof_ref(rows, k, top):
    xm = {i: [_rha(x * 1e6) for x in v] for i, (v, _) in enumerate(rows)}
    ids = sorted(xm)
    d = {}
    for i in ids:
        for j in ids:
            if i != j:
                d[(i, j)] = _rha(
                    math.sqrt(
                        sum((a - b) ** 2 for a, b in zip(xm[i], xm[j]))
                    )
                )
    nn = {
        i: sorted((j for j in ids if j != i), key=lambda j: (d[(i, j)], j))[:k]
        for i in ids
    }
    kdist = {i: max(d[(i, j)] for j in nn[i]) for i in ids}
    lrd = {}
    for i in ids:
        s = sum(max(kdist[j], d[(i, j)]) for j in nn[i])
        lrd[i] = _rha(1e12 * k / max(1, s))
    lof = {
        i: _r(sum(lrd[j] for j in nn[i]) / (k * lrd[i]), 6) for i in ids
    }
    ranked = sorted(ids, key=lambda i: (-lof[i], i))[:top]
    return [
        (r + 1, i, kdist[i], lrd[i], lof[i]) for r, i in enumerate(ranked)
    ]


@settings(max_examples=10, deadline=None)
@given(rows=LOF_VECS)
def test_lof_matches_reference(spark, rows):
    from pagila_etl_airflow_assignment_spark.llm.embeddings import lof_outliers

    df = spark.createDataFrame(
        [(i, v, lab) for i, (v, lab) in enumerate(rows)],
        "vec_id long, embedding array<float>, label int",
    )
    k, top = 2, 6
    got = [
        (r["rnk"], r["vec_id"], r["kdist_micro"], r["lrd_micro"], r["lof"])
        for r in lof_outliers(df, k=k, sample=64, top=top).collect()
    ]
    assert got == _lof_ref(rows, k, top)


# --- alpha footprint (L-561) ------------------------------------------------------------

FP_USERS = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=6),
    min_size=1,
    max_size=10,
)


def _fp_ref(users):
    df_counts = defaultdict(int)
    acts = set()
    for seq in users:
        acts.update(seq)
        for x, y in zip(seq, seq[1:]):
            df_counts[(x, y)] += 1
    out = []
    for a in sorted(acts):
        for b in sorted(acts):
            if a >= b:
                continue
            ab, ba = df_counts.get((a, b), 0), df_counts.get((b, a), 0)
            rel = (
                "parallel"
                if ab > 0 and ba > 0
                else "causal_ab"
                if ab > 0
                else "causal_ba"
                if ba > 0
                else "choice"
            )
            out.append((a, b, ab, ba, rel))
    return out


@settings(max_examples=12, deadline=None)
@given(users=FP_USERS)
def test_alpha_footprint_matches_reference(spark, users):
    from pagila_etl_airflow_assignment_spark.operators.sequences import (
        alpha_footprint,
    )

    rows = []
    eid = 0
    for u, seq in enumerate(users):
        for i, act in enumerate(seq):
            rows.append((eid, u, act, f"2024-01-01 {i:02d}:00:00", 0.0))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts string,"
        " value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = [
        (r["a"], r["b"], r["df_ab"], r["df_ba"], r["relation"])
        for r in alpha_footprint(df).collect()
    ]
    assert got == _fp_ref(users)


# --- temperature scaling (L-562) --------------------------------------------------------
#
# NLL algebra pinned against the module's OWN certified scorers
# (classifier_scores / gopher_rules), the MAP@k pattern.

TS_DOCS = st.lists(
    st.text(alphabet="the and is of water une der el ", min_size=5, max_size=80),
    min_size=2,
    max_size=10,
)


@settings(max_examples=8, deadline=None)
@given(texts=TS_DOCS)
def test_temperature_scaling_matches_nll_algebra(spark, texts):
    from pagila_etl_airflow_assignment_spark.llm.text import (
        TEMP_GRID_CENTI,
        classifier_scores,
        gopher_rules,
        temperature_scaling,
    )

    df = spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    logits = {
        r["doc_id"]: r["logit_milli"] for r in classifier_scores(df).collect()
    }
    ys = {
        r["doc_id"]: 1 if r["gopher_keep"] else 0
        for r in gopher_rules(df).collect()
    }
    ref = {}
    for t in TEMP_GRID_CENTI:
        total = 0
        for i in logits:
            z = logits[i] / 1000.0 / (t / 100.0)
            nll = math.log(1.0 + math.exp(-abs(z)))
            pred = 1 if logits[i] >= 0 else 0
            if pred != ys[i]:
                nll += abs(z)
            total += _rha(1e6 * nll)
        ref[t] = total
    best = min(sorted(ref), key=lambda t: (ref[t], t))
    got = {
        r["t_centi"]: (r["nll_micro_nat"], r["is_best"])
        for r in temperature_scaling(df).collect()
    }
    assert got == {
        t: (ref[t], 1 if t == best else 0) for t in TEMP_GRID_CENTI
    }
