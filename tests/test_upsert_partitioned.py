"""Partitioned MERGE upsert: the round-1 ADVICE data-loss regression.

A partitioned parquet table has no top-level *.parquet files; detection must
recurse or an upsert treats the target as absent and replaces the whole table
with just the updates. Dynamic-partition overwrite must also leave CLEAN
partitions' files physically untouched (that is the 100 TB scaling claim).
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pagila_etl_airflow_assignment_spark.incremental.upsert import (
    merge_upsert,
    read_parquet_table,
)


@pytest.fixture()
def tdir():
    with tempfile.TemporaryDirectory(prefix="upsert-part-") as d:
        yield f"{d}/target"


def _rows(spark, data):
    return spark.createDataFrame(data, "k int, part string, v string")


def _files(path):
    return {
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    }


def test_read_detects_partitioned_layout(spark, tdir):
    _rows(spark, [(1, "a", "x")]).write.partitionBy("part").parquet(tdir)
    got = read_parquet_table(spark, tdir)
    assert got is not None and got.count() == 1


def test_partitioned_upsert_preserves_untouched_partitions(spark, tdir):
    base = _rows(spark, [(1, "a", "old-a"), (2, "b", "old-b"), (3, "c", "old-c")])
    merge_upsert(spark, tdir, base, key=["k"], partition_by=["part"])
    # update partition 'a' only; 'b' and 'c' must survive (round-1 bug: they
    # were silently dropped because the target read back as None)
    upd = _rows(spark, [(1, "a", "new-a"), (4, "a", "extra-a")])
    n = merge_upsert(spark, tdir, upd, key=["k"], partition_by=["part"])
    assert n == 4
    got = {
        (r["k"], r["part"], r["v"])
        for r in read_parquet_table(spark, tdir).collect()
    }
    assert got == {
        (1, "a", "new-a"),
        (4, "a", "extra-a"),
        (2, "b", "old-b"),
        (3, "c", "old-c"),
    }


def test_dynamic_overwrite_leaves_clean_partition_files_alone(spark, tdir):
    base = _rows(spark, [(1, "a", "old-a"), (2, "b", "old-b")])
    merge_upsert(spark, tdir, base, key=["k"], partition_by=["part"])
    clean_before = _files(f"{tdir}/part=b")
    dirty_before = _files(f"{tdir}/part=a")
    merge_upsert(
        spark, tdir, _rows(spark, [(1, "a", "new-a")]), key=["k"], partition_by=["part"]
    )
    assert _files(f"{tdir}/part=b") == clean_before  # physically untouched
    assert _files(f"{tdir}/part=a") != dirty_before  # actually rewritten


def test_unpartitioned_fallback_unchanged(spark, tdir):
    base = _rows(spark, [(1, "a", "old"), (2, "b", "keep")])
    merge_upsert(spark, tdir, base, key=["k"])
    merge_upsert(spark, tdir, _rows(spark, [(1, "a", "new")]), key=["k"])
    got = {(r["k"], r["v"]) for r in read_parquet_table(spark, tdir).collect()}
    assert got == {(1, "new"), (2, "keep")}
