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


def test_funnel_order_constraint(spark):
    import datetime as dt

    t = lambda m: (dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m))
    rows = [
        # user 1: proper view -> click -> purchase
        (1, t(0), 1, "view", 1.0, "{}"),
        (2, t(5), 1, "click", 1.0, "{}"),
        (3, t(9), 1, "purchase", 1.0, "{}"),
        # user 2: click BEFORE any view — must not count as stage 2
        (4, t(0), 2, "click", 1.0, "{}"),
        (5, t(5), 2, "view", 1.0, "{}"),
        (6, t(9), 2, "purchase", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from pagila_etl_airflow_assignment_spark.operators.analytics import (
        funnel_user_stages,
    )

    got = {r.user_id: r for r in funnel_user_stages(events).collect()}
    assert got[1].click_ts == t(5) and got[1].purchase_ts == t(9)
    # user 2 never clicks after viewing -> stages 2 and 3 are null even
    # though a purchase exists after the view
    assert got[2].view_ts == t(5)
    assert got[2].click_ts is None and got[2].purchase_ts is None


def test_cohort_retention_offset_zero_covers_all_users(spark):
    from pagila_etl_airflow_assignment_spark.operators.analytics import (
        cohort_retention,
    )

    events = load_table(spark, SF_SMALL, "events")
    tri = cohort_retention(events).collect()
    assert all(r.week_offset >= 0 for r in tri)
    n_users = events.select("user_id").distinct().count()
    # every user is active in their own cohort week by definition
    assert sum(r.n_active for r in tri if r.week_offset == 0) == n_users


def test_salted_skew_join_matches_unsalted(spark):
    from pagila_etl_airflow_assignment_spark.operators.warehouse import (
        salted_skew_join_revenue,
    )

    li = load_table(spark, SF_SMALL, "lineitem")
    od = load_table(spark, SF_SMALL, "orders")
    salted = {
        r.o_orderpriority: (r.revenue, r.n_items)
        for r in salted_skew_join_revenue(li, od, salt_buckets=4).collect()
    }
    plain = (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .collect()
    )
    assert salted == {r.o_orderpriority: (r.revenue, r.n_items) for r in plain}


def _mk_events(spark, rows):
    import datetime as dt

    t = lambda m: (dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m))
    return spark.createDataFrame(
        [(i, t(m), u, et, v, "{}") for i, (m, u, et, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ), t


def test_pit_lookup_boundary_and_no_future_state(spark):
    from pagila_etl_airflow_assignment_spark.operators.features import (
        pit_state_lookup,
    )

    events, t = _mk_events(
        spark,
        [
            (0, 1, "view", 1.0),      # id 0: state view from t0
            (5, 1, "click", 1.0),     # id 1: state click from t5
            (5, 1, "purchase", 9.0),  # id 2: label AT the state change
            (2, 2, "purchase", 9.0),  # id 3: label BEFORE any state
            (4, 2, "signup", 1.0),    # id 4: future state, must not leak back
        ],
    )
    got = {r.label_id: r.state_at_label for r in pit_state_lookup(events).collect()}
    # boundary: label at exactly valid_from sees the NEW state
    assert got[2] == "click"
    # no state existed yet -> null, never the later signup
    assert got[3] is None


def test_leakage_free_features_exclude_current_and_later(spark):
    from pagila_etl_airflow_assignment_spark.operators.features import (
        leakage_free_click_features,
    )

    events, t = _mk_events(
        spark,
        [
            (0, 1, "click", 2.0),
            (5, 1, "purchase", 9.0),  # id 1: sees exactly one prior click
            (6, 1, "click", 3.0),     # later click must not count for id 1
            (9, 1, "purchase", 9.0),  # id 3: sees both clicks
            (0, 2, "purchase", 9.0),  # id 4: zero priors -> 0, not null
        ],
    )
    got = {
        r.label_id: (r.prior_clicks, r.prior_click_value)
        for r in leakage_free_click_features(events).collect()
    }
    assert got[1] == (1, 2.0)
    assert got[3] == (2, 5.0)
    assert got[4] == (0, 0.0)


def test_kmeans_step_centroid_count_and_membership(spark):
    from pagila_etl_airflow_assignment_spark.llm.embeddings import kmeans_step

    out = kmeans_step(load_table(spark, SF_SMALL, "embeddings"), k=4).collect()
    dims = {}
    members = {}
    for r in out:
        dims[r.centroid_id] = dims.get(r.centroid_id, 0) + 1
        members.setdefault(r.centroid_id, set()).add(r.n_members)
    assert len(dims) <= 4 and all(d == 64 for d in dims.values())
    # n_members constant across a centroid's positions
    assert all(len(m) == 1 for m in members.values())
    n_vecs = load_table(spark, SF_SMALL, "embeddings").count()
    assert sum(next(iter(m)) for m in members.values()) == n_vecs


def test_cdc_apply_inverts_diff(spark):
    """apply_changes(old, snapshot_diff(old, new)) must reproduce new exactly
    (the CDC mirror-replication contract)."""
    from pagila_etl_airflow_assignment_spark.operators import cdc

    orders = load_table(spark, SF_SMALL, "orders")
    old = cdc.orders_old_snapshot(orders)
    new = cdc.orders_new_snapshot(orders)
    diff = cdc.snapshot_diff(
        old, new, key=["o_orderkey"], compare_cols=["o_totalprice", "o_orderstatus"]
    )
    rebuilt = cdc.apply_changes(
        old, diff, key=["o_orderkey"], compare_cols=["o_totalprice", "o_orderstatus"]
    )
    got = sorted(tuple(r) for r in rebuilt.collect())
    want = sorted(tuple(r) for r in new.collect())
    assert got == want and len(got) > 0


def test_gap_fill_forward_fill_semantics(spark):
    from pagila_etl_airflow_assignment_spark.operators.features import (
        gap_fill_ffill,
    )

    events, t = _mk_events(
        spark,
        [
            (10, 1, "click", 2.0),    # 00:10
            (70, 1, "click", 5.0),    # 01:10
            (200, 1, "view", 7.0),    # 03:20
        ],
    )
    rows = {r.grid_ts: r.last_value for r in gap_fill_ffill(events).collect()}
    import datetime as dt

    # grid = 01:00, 02:00, 03:00 (hour-aligned inside [00:10, 03:20])
    assert rows[dt.datetime(2024, 1, 1, 1)] == 2.0   # before 01:10 event
    assert rows[dt.datetime(2024, 1, 1, 2)] == 5.0   # forward-filled
    assert rows[dt.datetime(2024, 1, 1, 3)] == 5.0   # still filled from 01:10
    assert len(rows) == 3


def test_cdc_roundtrip_property_random_snapshots(spark):
    """Property: for ANY pair of keyed snapshots (random keys, values, nulls),
    apply_changes(old, snapshot_diff(old, new)) == new."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pagila_etl_airflow_assignment_spark.operators import cdc

    row = st.tuples(
        st.integers(0, 15),
        st.one_of(st.none(), st.floats(0, 100, allow_nan=False)),
        st.one_of(st.none(), st.sampled_from(["A", "B", "C"])),
    )
    # unique keys per snapshot (snapshots are keyed tables by contract)
    snap = st.lists(row, max_size=12, unique_by=lambda r: r[0])

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(old_rows=snap, new_rows=snap)
    def check(old_rows, new_rows):
        schema = "k int, price double, status string"
        old = spark.createDataFrame(old_rows, schema) if old_rows else spark.createDataFrame([], schema)
        new = spark.createDataFrame(new_rows, schema) if new_rows else spark.createDataFrame([], schema)
        diff = cdc.snapshot_diff(old, new, ["k"], ["price", "status"])
        rebuilt = cdc.apply_changes(old, diff, ["k"], ["price", "status"])
        assert sorted(map(tuple, rebuilt.collect())) == sorted(
            map(tuple, new.collect())
        )

    check()


def test_curate_cli_runs_end_to_end(spark, tmp_path):
    """Dual-entry parity for the curation surface: the CLI writes kept docs +
    per-doc decisions and kept == decisions.keep rows."""
    from pagila_etl_airflow_assignment_spark.jobs.curate import main

    out = str(tmp_path / "curated")
    assert main(["--source", SF_SMALL, "--out", out], stop_session=False) == 0
    kept = spark.read.parquet(f"{out}/kept")
    dec = spark.read.parquet(f"{out}/decisions")
    assert kept.count() == dec.where(F.col("keep")).count() > 0
    assert set(dec.columns) == {"doc_id", "keep", "reject_reason"}


def test_pandas_udf_norms_match_jvm_fold(spark):
    """The Arrow pandas_udf path and the JVM aggregate fold must agree to
    6dp on every vector — the Python boundary changes cost, never values."""
    from pagila_etl_airflow_assignment_spark.llm.dedup import _l2norm
    from pagila_etl_airflow_assignment_spark.llm.vectorized import vector_norms

    emb = load_table(spark, SF_SMALL, "embeddings")
    py = {r.vec_id: r.norm for r in vector_norms(emb).collect()}
    jvm = {
        r.vec_id: r.norm
        for r in emb.select(
            "vec_id", F.round(_l2norm(F.col("embedding")), 6).alias("norm")
        ).collect()
    }
    assert py == jvm and len(py) > 0
