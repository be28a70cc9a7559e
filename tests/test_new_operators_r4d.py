"""Round-4d operators: deterministic HLL, EWMA, target encoding, triangle
census, multi-touch attribution, feature hashing, prefix-filtered similarity.

Semantics pinned on tiny inline fixtures; the differential check vs DuckDB
runs via tools/verify_local.py and the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from pagila_etl_airflow_assignment_spark.llm import dedup, text
from pagila_etl_airflow_assignment_spark.operators import features, graph, hll, temporal


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _ts(day: int, hour: int = 0):
    return dt.datetime(2024, 1, day, hour)


# --- HLL ----------------------------------------------------------------------


def test_hll_registers_bounded_and_estimate_near_truth(spark):
    # n >> m: the RAW estimator's operating range (no small-range correction
    # by design -- ln() is not cross-engine stable; see module docstring)
    ev = _events(
        spark,
        [(i, _ts(1 + i % 5), i, "click", 1.0) for i in range(2000)],
    )
    row = hll.hll_distinct_users(ev).collect()[0]
    assert row.true_distinct == 2000
    assert 1 <= row.n_buckets_set <= 64
    assert 1 <= row.max_rank <= 53
    # 13% std error at m=64; accept ~3 sigma
    assert abs(row.hll_estimate - 2000) / 2000 < 0.45


def test_hll_registers_merge_by_max(spark):
    # the register relation from the union equals the cell-wise max of the
    # halves' registers -- the mergeability property the sketch exists for
    a = _events(spark, [(i, _ts(1), i, "click", 1.0) for i in range(50)])
    b = _events(spark, [(100 + i, _ts(2), 50 + i, "click", 1.0) for i in range(50)])
    est_union = hll.hll_distinct_users(a.union(b)).collect()[0]
    # recompute registers per half and fold
    import pyspark.sql.functions as F2

    def regs(df):
        hexed = df.select("event_type", F2.md5(F2.col("user_id").cast("string")).alias("kh"))
        return (
            hexed.select(
                "event_type",
                hll._bucket(F2.col("kh")).alias("bucket"),
                hll._rank(F2.col("kh")).alias("r"),
            )
            .groupBy("event_type", "bucket")
            .agg(F2.max("r").alias("m"))
        )
    merged = (
        regs(a).union(regs(b))
        .groupBy("event_type", "bucket")
        .agg(F2.max("m").alias("m"))
    )
    direct = regs(a.union(b))
    assert sorted(merged.collect()) == sorted(direct.collect())


# --- EWMA ---------------------------------------------------------------------


def test_ewma_exact_small_frame(spark):
    # user 1: values 1.00 then 3.00 -> second row ewma = (1*1 + 3*2)/3 = 2.3333..
    ev = _events(
        spark,
        [(1, _ts(1), 1, "click", 1.0), (2, _ts(2), 1, "click", 3.0)],
    )
    rows = {r.event_id: r.ewma_value for r in features.ewma_user_value(ev).collect()}
    assert rows[1] == 1.0
    assert abs(rows[2] - (1 * 100 + 3 * 200) / 3 / 100.0) < 1e-12


def test_ewma_skips_null_values(spark):
    ev = _events(
        spark,
        [(1, _ts(1), 1, "click", 2.0), (2, _ts(2), 1, "click", None),
         (3, _ts(3), 1, "click", 4.0)],
    )
    rows = {r.event_id: r.ewma_value for r in features.ewma_user_value(ev).collect()}
    assert set(rows) == {1, 3}
    assert abs(rows[3] - (2 * 100 + 4 * 200) / 3 / 100.0) < 1e-12


# --- target encoding ----------------------------------------------------------


def test_target_encoding_leaves_own_row_out(spark):
    ev = _events(
        spark,
        [(1, _ts(1), 1, "a", 1.0), (2, _ts(2), 2, "a", 3.0),
         (3, _ts(3), 3, "b", 9.0)],
    )
    rows = {r.event_id: r.loo_mean_value for r in features.target_encode_loo(ev).collect()}
    assert rows[1] == 3.0  # mean of the OTHER 'a' row
    assert rows[2] == 1.0
    assert rows[3] is None  # singleton category


# --- triangle census ----------------------------------------------------------


def test_triangle_census_counts_one_triangle(spark):
    # orders repeated twice so every edge meets min_support=2; parts 1-2-3
    # form a triangle, part 4 dangles off part 1
    rows = []
    for rep in range(2):
        rows += [(10 + rep, p) for p in (1, 2, 3)]
        rows += [(20 + rep, p) for p in (1, 4)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = graph.triangle_count(li).collect()[0]
    assert out.n_edges == 4  # (1,2) (1,3) (2,3) (1,4)
    assert out.n_triangles == 1
    # standard wedges Σ C(deg,2): degrees 1→3, 2→2, 3→2, 4→1 → 3+1+1+0 = 5
    assert out.n_wedges == 5
    assert out.clustering_coeff == 3.0 * out.n_triangles / out.n_wedges
    assert 0.0 <= out.clustering_coeff <= 1.0


# --- attribution --------------------------------------------------------------


def test_linear_attribution_splits_credit_equally(spark):
    ev = _events(
        spark,
        [
            (1, _ts(1, 1), 1, "click", 0.0),
            (2, _ts(1, 2), 1, "click", 0.0),
            (3, _ts(1, 3), 1, "purchase", 10.0),
            (4, _ts(1, 5), 2, "click", 0.0),  # no purchase for user 2
        ],
    )
    rows = {r.click_hour: r for r in temporal.linear_attribution(ev).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].attributed_purchases == 0.5
    assert rows[1].attributed_value == 5.0
    assert rows[2].attributed_purchases == 0.5


def test_linear_attribution_lookback_excludes_old_clicks(spark):
    ev = _events(
        spark,
        [
            (1, _ts(1), 1, "click", 0.0),  # 9 days before -> outside 3-day window
            (2, _ts(10), 1, "purchase", 8.0),
        ],
    )
    assert temporal.linear_attribution(ev).count() == 0


# --- feature hashing ----------------------------------------------------------


def test_feature_hashing_fixed_width_and_repeat_counts(spark):
    docs = spark.createDataFrame(
        [(1, "foo foo bar"), (2, "foo")], "doc_id long, text string"
    )
    out = {
        r.doc_id: [int(v) for v in r.features.split(",")]
        for r in text.feature_hash_vectors(docs).collect()
    }
    assert len(out[1]) == text.FEATHASH_DIM and len(out[2]) == text.FEATHASH_DIM
    # doc1 has twice doc2's 'foo' contribution in the same bucket
    diffs = [a - 2 * b for a, b in zip(out[1], out[2])]
    assert sum(1 for d in diffs if d != 0) == 1  # exactly the 'bar' bucket remains
    assert sum(abs(v) for v in out[2]) == 1


# --- prefix-filtered similarity join ------------------------------------------


def test_prefix_filter_matches_bruteforce_on_fixture(spark):
    from conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(120)
    fast = dedup.prefix_filter_pairs(docs).collect()
    slow = (
        dedup.ngram_jaccard_pairs(docs, threshold=dedup.PREFIX_THRESHOLD, max_df=None)
        .collect()
    )
    assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))
