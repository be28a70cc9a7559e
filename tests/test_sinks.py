"""Lake-maintenance sinks: compaction reduces file count losslessly;
clustered writes produce narrow per-file value ranges (verified against the
actual parquet footer stats via pyarrow — the stats row-group pruning uses)."""

from __future__ import annotations

import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pagila_etl_airflow_assignment_spark.sinks import (
    clustered_write,
    compact_table,
    table_file_stats,
)
from pagila_etl_airflow_assignment_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tdir():
    with tempfile.TemporaryDirectory(prefix="sinks-") as d:
        yield d


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    """Per-file (min, max) of ``col`` from parquet footer statistics."""
    import os

    ranges = []
    for root, _, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            ranges.append((lo, hi))
    return ranges


def test_compaction_reduces_files_losslessly(spark, tdir):
    path = f"{tdir}/frag"
    orders = load_table(spark, SF, "orders")
    orders.repartition(40).write.parquet(path)  # fragment: 40 small files
    before_rows = spark.read.parquet(path).count()
    n_before, n_after = compact_table(spark, path, target_file_bytes=10**9)
    assert n_before == 40 and n_after == 1
    assert spark.read.parquet(path).count() == before_rows


def test_clustered_write_gives_narrow_file_ranges(spark, tdir):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    span = hi - lo

    random_path = f"{tdir}/random"
    orders.orderBy(F.md5(F.col("o_orderkey").cast("string"))).repartition(
        8
    ).write.parquet(random_path)
    clustered_path = f"{tdir}/clustered"
    clustered_write(orders, clustered_path, ["o_orderkey"], n_files=8)

    rand = _file_ranges(random_path, "o_orderkey")
    clus = _file_ranges(clustered_path, "o_orderkey")
    # random layout: every file spans ~the whole key range
    assert all((h - l) > 0.8 * span for l, h in rand)
    # clustered layout: files cover narrow, near-disjoint slices
    assert all((h - l) < 0.3 * span for l, h in clus)
    covered = sorted(clus)
    assert all(a[1] <= b[0] for a, b in zip(covered, covered[1:]))  # disjoint

    # and the data round-trips identically
    a = sorted(r["o_orderkey"] for r in spark.read.parquet(clustered_path).collect())
    b = sorted(r["o_orderkey"] for r in orders.collect())
    assert a == b


def test_cobucketed_join_has_no_exchange(spark, tdir):
    """Both sides bucketed on the join key with equal bucket counts: the
    executed fact-fact join plan must contain ZERO Exchange nodes — the
    write-time shuffle replaces every query-time shuffle."""
    import re

    from pagila_etl_airflow_assignment_spark.sinks import (
        cobucketed_join,
        write_bucketed,
    )

    lineitem = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(
        lineitem, "li_b", f"{tdir}/li_b", ["l_orderkey"], 8, ["l_orderkey"]
    )
    write_bucketed(
        orders, "ord_b", f"{tdir}/ord_b", ["o_orderkey"], 8, ["o_orderkey"]
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(
            spark,
            "li_b",
            "ord_b",
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString().split(
            "== Initial Plan =="
        )[0]
        assert not re.search(r"Exchange", plan), plan
        # and the co-located join returns exactly the plain join's rows
        want = lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_zorder_write_tightens_both_dimensions(spark, tmp_path):
    """Z-order layout: per-row-group bounding boxes must be tight on BOTH
    dimensions, where a single-column sort leaves the second dimension
    spanning ~the full range (no skipping possible). Measured from real
    parquet footer min/max — the same stats engines prune with."""
    import glob

    import pyarrow.parquet as pq

    from pagila_etl_airflow_assignment_spark.sinks.zorder import zordered_write
    from pagila_etl_airflow_assignment_spark.sources.parquet import load_table

    events = load_table(spark, SF, "events").select(
        "event_id", "user_id", "value"
    ).where(F.col("value").isNotNull())

    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "single")
    zordered_write(events, zpath, "user_id", "value", n_files=8)
    (
        events.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(spath)
    )

    def mean_coverage(path, col, full_span):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        spans.append(
                            (c.statistics.max - c.statistics.min) / full_span
                        )
        assert spans
        return sum(spans) / len(spans)

    lohi = events.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    u_span = float(lohi[1] - lohi[0])
    v_span = float(lohi[3] - lohi[2])

    z_u = mean_coverage(zpath, "user_id", u_span)
    z_v = mean_coverage(zpath, "value", v_span)
    s_u = mean_coverage(spath, "user_id", u_span)
    s_v = mean_coverage(spath, "value", v_span)

    # single-column sort: first dim tight, second dim ~full range
    assert s_u < 0.35 and s_v > 0.7
    # z-order: BOTH dims materially narrower than the single-sort's
    # unsorted dimension
    assert z_u < 0.6 and z_v < 0.6, (z_u, z_v, s_u, s_v)

    # and the data itself round-trips unchanged
    back = spark.read.parquet(zpath)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, events.collect())
    )


def test_zorder_quantile_normalization_handles_skew(spark, tmp_path):
    """Under heavy value skew + one extreme outlier, min/max normalization
    collapses ~all rows into a few curve cells (every file's footer box covers
    the whole populated range), while quantile normalization spreads rows by
    RANK — so the bulk of the files get tight bounding boxes over the dense
    region. Measured from real parquet footer stats."""
    import glob

    import pyarrow.parquet as pq_mod

    from pagila_etl_airflow_assignment_spark.sinks.zorder import zordered_write

    # skewed: 4000 rows dense in [0, 400), one outlier at 1e9 stretching the
    # min/max range so linear scaling maps the dense mass to bucket 0
    rows = [(i, float(i % 400), float(i % 97)) for i in range(4000)]
    rows.append((4000, 1e9, 1.0))
    df = spark.createDataFrame(rows, "id long, a double, b double")

    qpath = str(tmp_path / "zq")
    mpath = str(tmp_path / "zm")
    zordered_write(df, qpath, "a", "b", n_files=8, method="quantile")
    zordered_write(df, mpath, "a", "b", n_files=8, method="minmax")

    def dense_spans(path):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq_mod.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    if c.path_in_schema == "a" and c.statistics is not None:
                        if c.statistics.max < 1e8:  # files without the outlier
                            spans.append(c.statistics.max - c.statistics.min)
        return spans

    q_spans = dense_spans(qpath)
    m_spans = dense_spans(mpath)
    assert len(q_spans) >= 4, "quantile layout must produce several dense files"
    # quantile: most dense files cover a narrow slice of the 0-400 range
    assert sorted(q_spans)[len(q_spans) // 2] < 250, q_spans
    # minmax collapses the dense mass into one curve cell: the dense files
    # that exist all span ~the full dense range
    assert all(s > 300 for s in m_spans) or len(m_spans) <= 1, m_spans

    back = spark.read.parquet(qpath)
    assert back.count() == 4001


def test_zorder_quantile_roundtrip_and_minmax_unchanged(spark, tmp_path):
    """The deterministic min/max footer-stat contract (existing test) is
    untouched by the flag; quantile path round-trips data losslessly."""
    from pagila_etl_airflow_assignment_spark.sinks.zorder import zordered_write

    events = (
        load_table(spark, SF, "events")
        .select("event_id", "user_id", "value")
        .where(F.col("value").isNotNull())
    )
    zpath = str(tmp_path / "zq2")
    zordered_write(events, zpath, "user_id", "value", n_files=4, method="quantile")
    back = spark.read.parquet(zpath)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, events.collect()))
