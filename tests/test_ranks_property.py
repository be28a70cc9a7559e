"""Property tests: the ranks.py two-level devices are bit-identical to the
naive global-window forms on arbitrary data — the load-bearing claim that let
round 7 swap them into certified queries without touching any oracle."""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import Window
from pyspark.sql import functions as F

from pagila_etl_airflow_assignment_spark.ranks import (
    kth_smallest,
    with_global_row_number,
    with_global_running_sum,
)

# rows: (id, v, wt); duplicates in v are the interesting case (tie handling),
# wt may be zero/negative (running sums must not assume positivity)
ROWS = st.lists(
    st.tuples(
        st.integers(0, 10_000),
        st.integers(-50, 50),
        st.integers(-5, 20),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)
GRAN = st.sampled_from([1, 3, 10, 100])  # bucket granularity (monotone floor)


@settings(max_examples=12, deadline=None)
@given(rows=ROWS, gran=GRAN)
def test_two_level_rank_and_cumsum_match_naive(spark, rows, gran):
    df = spark.createDataFrame(rows, "id long, v long, wt long").cache()
    bucket = F.floor(F.col("v") / gran).cast("long")

    naive_rn = {
        r.id: r.rn
        for r in df.select(
            "id", F.row_number().over(Window.orderBy("v", "id")).alias("rn")
        ).collect()
    }
    got_rn = {
        r.id: r.rn
        for r in with_global_row_number(
            df, bucket, [F.col("v"), F.col("id")], out="rn"
        ).select("id", "rn").collect()
    }
    assert got_rn == naive_rn

    naive_cum = {
        r.id: r.cum
        for r in df.select(
            "id",
            F.sum("wt")
            .over(
                Window.orderBy("v", "id").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("cum"),
        ).collect()
    }
    got_cum = {
        r.id: r.cum
        for r in with_global_running_sum(
            df, bucket, [F.col("v"), F.col("id")], F.col("wt"), out="cum"
        ).select("id", "cum").collect()
    }
    assert got_cum == naive_cum


@settings(max_examples=12, deadline=None)
@given(rows=ROWS, kfrac=st.sampled_from(["1", "n", "(n + 1) DIV 2", "(9 * (n + 1) + 9) DIV 10"]))
def test_kth_smallest_matches_sorted_selection(spark, rows, kfrac):
    df = spark.createDataFrame(rows, "id long, v long, wt long")
    n = len(rows)
    k = {"1": 1, "n": n, "(n + 1) DIV 2": (n + 1) // 2,
         "(9 * (n + 1) + 9) DIV 10": (9 * (n + 1) + 9) // 10}[kfrac]
    vs = sorted(v for _, v, _ in rows)
    got = kth_smallest(df.select("v"), "v", kfrac).collect()
    if k > n:
        assert got == []
    else:
        assert len(got) == 1 and (got[0].v, got[0].n) == (vs[k - 1], n)
