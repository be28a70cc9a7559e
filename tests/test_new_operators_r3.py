"""Unit/property tests for the round-3 operators: snapshot diff, grouping
sets, monthly rollup, sequence packing, embedding centroid outliers, quality
quantile filter. (Differential oracle coverage lives in the registry; these
pin semantics the oracle can't see — classifications on nulls, plan shapes,
internal invariants.)"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pagila_etl_airflow_assignment_spark.llm.embeddings import centroid_outliers
from pagila_etl_airflow_assignment_spark.llm.packing import pack_chunks
from pagila_etl_airflow_assignment_spark.llm.text import quality_quantile_filter
from pagila_etl_airflow_assignment_spark.operators.cdc import snapshot_diff
from pagila_etl_airflow_assignment_spark.operators.warehouse import (
    grouping_sets_revenue,
)
from pagila_etl_airflow_assignment_spark.plans.weekly_summary import (
    monthly_rollup,
    weekly_rental_summary,
)
from pagila_etl_airflow_assignment_spark.sources.parquet import load_table
from pagila_etl_airflow_assignment_spark.sources.rental import load_rental

from conftest import SF_SMALL


def test_snapshot_diff_classifies_and_handles_nulls(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, None), (3, 30.0, "C"), (4, None, "D")],
        "k int, price double, status string",
    )
    new = spark.createDataFrame(
        [(2, 20.0, None), (3, 31.0, "C"), (4, None, "D"), (5, 50.0, "E")],
        "k int, price double, status string",
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(
            old, new, key=["k"], compare_cols=["price", "status"]
        ).collect()
    }
    # 2 (null status both sides) and 4 (null price both sides) are UNCHANGED
    # under null-safe comparison and must not appear
    assert got == {1: "delete", 3: "update", 5: "insert"}


def test_snapshot_diff_carries_old_and_new_values(spark):
    old = spark.createDataFrame([(1, 10.0)], "k int, v double")
    new = spark.createDataFrame([(1, 11.0)], "k int, v double")
    row = snapshot_diff(old, new, ["k"], ["v"]).collect()[0]
    assert (row.old_v, row.new_v) == (10.0, 11.0)


def test_grouping_sets_gid_levels(spark):
    out = grouping_sets_revenue(load_table(spark, SF_SMALL, "orders"))
    gids = {r.gid for r in out.select("gid").distinct().collect()}
    # (priority,yr)=0, (priority)=1 [yr aggregated], (yr)=2 [priority aggregated]
    assert gids == {0, 1, 2}
    # no grand-total row: gid 3 is not in the requested sets
    per_year = out.where(F.col("gid") == 2)
    assert per_year.where(F.col("priority") != "ALL").count() == 0


def test_monthly_rollup_is_consistent_with_weekly(spark):
    weekly = weekly_rental_summary(load_rental(spark, SF_SMALL)).cache()
    monthly = monthly_rollup(weekly).collect()
    wk = weekly.collect()
    assert sum(m.newly_rented for m in monthly) == sum(
        w.newly_rented_during_week for w in wk
    )
    by_month = {}
    for w in wk:
        by_month.setdefault(w.week_beginning.replace(day=1), []).append(w)
    for m in monthly:
        last_week = max(by_month[m.month_start], key=lambda w: w.week_beginning)
        assert m.outstanding_at_month_end == last_week.outstanding_rentals_at_week_end
    weekly.unpersist()


def test_pack_chunks_invariants(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    packed = pack_chunks(docs, size=64, capacity=256, shards=4).collect()
    assert len(packed) > 0
    for r in packed:
        assert 0 <= r.offset_in_pack < 256
        assert r.pack_id == r.start_offset // 256
        assert 1 <= r.n_tokens <= 64
        assert r.shard == r.doc_id % 4
    # offsets are gapless per (lang, shard): consecutive chunks abut exactly
    by_group: dict = {}
    for r in sorted(packed, key=lambda r: (r.lang, r.shard, r.doc_id, r.chunk_id)):
        key = (r.lang, r.shard)
        expected = by_group.get(key, 0)
        assert r.start_offset == expected
        by_group[key] = expected + r.n_tokens


def test_centroid_outliers_matches_numpy(spark):
    np = pytest.importorskip("numpy")
    emb = load_table(spark, SF_SMALL, "embeddings")
    got = centroid_outliers(emb, top_k=3).collect()
    rows = emb.collect()
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r.label, []).append((r.vec_id, np.array(r.embedding, dtype="float64")))
    for label, vecs in by_label.items():
        c = np.mean([v for _, v in vecs], axis=0)
        dists = sorted(
            ((round(float(np.sqrt(((v - c) ** 2).sum())), 6), -vid, vid) for vid, v in vecs),
            reverse=True,
        )[:3]
        want = [vid for _, _, vid in dists]
        have = [r.vec_id for r in got if r.label == label]
        assert have == want, f"label {label}: {have} != {want}"


def test_centroid_join_is_broadcast(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    plan = centroid_outliers(emb)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_quality_quantile_keeps_top_fraction_per_lang(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    kept = quality_quantile_filter(docs, keep_frac=0.5)
    totals = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    kept_counts = {r.lang: r["count"] for r in kept.groupBy("lang").count().collect()}
    for lang, total in totals.items():
        k = kept_counts.get(lang, 0)
        # percent_rank <= 0.5 with unique ranks keeps ceil((n-1)/2)+1-ish rows
        assert abs(k - total / 2) <= 1.5, f"{lang}: kept {k} of {total}"
    # fluency ordering: every kept doc's pct_rank is within the cut
    assert kept.where(F.col("pct_rank") > 0.5).count() == 0
