"""Error bounds for the approximate-sketch aggregations (rows-only queries:
sketch values are engine-specific, so correctness is a bounded-error property
against the exact forms, not a value-hash oracle)."""

from __future__ import annotations

from pagila_etl_airflow_assignment_spark.registry import queries

from conftest import SF_SMALL


def test_approx_sketches_bounded_error(spark):
    approx = {
        r["event_type"]: r
        for r in queries()["events_approx_sketches"](spark, SF_SMALL).collect()
    }
    exact = {
        r["event_type"]: r
        for r in queries()["events_value_percentiles"](spark, SF_SMALL).collect()
    }
    from pagila_etl_airflow_assignment_spark.sources.parquet import load_table
    from pyspark.sql import functions as F

    exact_users = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        # HLL++ at rsd=0.02: allow 3 sigma
        rel = abs(a["approx_users"] - exact_users[et]) / exact_users[et]
        assert rel < 0.06, (et, a["approx_users"], exact_users[et])
        # approx_percentile with accuracy=10000 on ~thousands of rows is
        # near-exact; compare against the interpolated exact within the
        # spread of adjacent values (1% of the value range is generous)
        for col, exact_col in (("approx_p50", "p50"), ("approx_p90", "p90")):
            e = exact[et][exact_col]
            assert abs(a[col] - e) <= max(0.05 * abs(e), 1e-6) or abs(
                a[col] - e
            ) < 50, (et, col, a[col], e)
