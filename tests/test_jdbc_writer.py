"""SQL-generation-level tests for the JDBC writer twin and the Delta seam
(neither Postgres nor Delta is installable here; the statement TEXT is the
testable surface — column quoting must match the reference's
etl_script_incremental_pandas.py:250-259 exactly)."""

from __future__ import annotations

from pagila_etl_airflow_assignment_spark.incremental.upsert import (
    delta_available,
    merge_condition,
)
from pagila_etl_airflow_assignment_spark.sources.jdbc import (
    SUMMARY_COLUMNS,
    quote_ident,
    upsert_statement,
)


def test_quote_ident_matches_reference_style():
    # camel-case columns are quoted, snake_case bare (Postgres folds unquoted
    # identifiers to lowercase, so the reference MUST quote these two)
    assert quote_ident("OutstandingRentals") == '"OutstandingRentals"'
    assert quote_ident("ReturnedRentals") == '"ReturnedRentals"'
    assert quote_ident("week_beginning") == "week_beginning"
    assert quote_ident("newly_rented_during_week") == "newly_rented_during_week"


def test_upsert_statement_matches_reference_shape():
    sql = upsert_statement()
    assert sql.startswith("INSERT INTO weekly_rental_summary (")
    # insert column list: all five + audit, camel-case quoted
    assert (
        'week_beginning, "OutstandingRentals", "ReturnedRentals", '
        "newly_rented_during_week, net_change_in_outstanding, last_updated" in sql
    )
    assert "VALUES (%s, %s, %s, %s, %s, CURRENT_TIMESTAMP)" in sql
    assert "ON CONFLICT (week_beginning) DO UPDATE SET" in sql
    assert '"OutstandingRentals" = EXCLUDED."OutstandingRentals"' in sql
    assert '"ReturnedRentals" = EXCLUDED."ReturnedRentals"' in sql
    assert "newly_rented_during_week = EXCLUDED.newly_rented_during_week" in sql
    assert "last_updated = CURRENT_TIMESTAMP" in sql
    # the conflict key is never updated
    assert "week_beginning = EXCLUDED" not in sql


def test_upsert_statement_parameter_count():
    sql = upsert_statement()
    assert sql.count("%s") == len(SUMMARY_COLUMNS)


def test_merge_condition():
    assert merge_condition(["week_beginning"]) == "t.week_beginning = u.week_beginning"
    assert (
        merge_condition(["a", "b"], target="tgt", source="src")
        == "tgt.a = src.a AND tgt.b = src.b"
    )


def test_delta_not_available_in_container():
    # the seam must feature-detect cleanly (fallback path is what tests cover)
    assert delta_available() is False
