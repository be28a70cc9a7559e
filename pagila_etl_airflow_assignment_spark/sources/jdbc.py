"""JDBC source: the production-path reader for the Pagila `rental` table.

The reference reads Postgres directly over psycopg2
(etl_script_incremental_pandas.py:33-34,120-125); the Spark equivalent is the
JDBC DataSource with predicate pushdown, so the watermark delta filter executes
in the database and only changed rows cross the wire (SURVEY.md A-1, O-1).

Untestable in this container (no Postgres, no JDBC driver jar) — kept thin and
import-safe; the fixture path (`sources.rental`) is the tested twin.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession


def read_rental_delta(
    spark: SparkSession,
    jdbc_url: str,
    watermark_lo: dt.datetime,
    watermark_hi: dt.datetime,
    table: str = "rental",
    user: str | None = None,
    password: str | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """Half-open delta read, pushed down to the database.

    The dbtable subquery projects exactly the four engine columns (B-1) and
    embeds the half-open range predicate (B-2) so Postgres prunes before
    shipping. ``partitionColumn=rental_id`` splits the read across
    ``num_partitions`` parallel connections — the knob that matters when the
    delta is large.
    """
    subquery = (
        f"(SELECT rental_id, rental_date, return_date, last_update "
        f"FROM {table} "
        f"WHERE last_update > '{watermark_lo.isoformat(sep=' ')}' "
        f"AND last_update <= '{watermark_hi.isoformat(sep=' ')}') AS delta"
    )
    reader = (
        spark.read.format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", subquery)
        .option("pushDownPredicate", "true")
        .option("numPartitions", str(num_partitions))
    )
    if user:
        reader = reader.option("user", user)
    if password:
        reader = reader.option("password", password)
    return reader.load()


# --- writer twin ---------------------------------------------------------------
#
# The reference writes the summary into a SECOND Postgres with a per-week
# INSERT ... ON CONFLICT DO UPDATE whose camel-case columns are quoted
# (etl_script_incremental_pandas.py:250-259). The Spark-side twin is
# per-partition batched execute of the same statement text — Spark's own JDBC
# writer has no upsert mode, so the executors run the statement directly.

# Columns in the reference summary table, in its insert order. The camel-case
# names REQUIRE quoting in Postgres (unquoted identifiers fold to lowercase).
SUMMARY_TABLE = "weekly_rental_summary"
SUMMARY_KEY = "week_beginning"
SUMMARY_COLUMNS = (
    "week_beginning",
    "OutstandingRentals",
    "ReturnedRentals",
    "newly_rented_during_week",
    "net_change_in_outstanding",
)


def quote_ident(name: str) -> str:
    """Quote an identifier iff it needs it (mixed case), matching the
    reference's style: `"OutstandingRentals"` quoted, snake_case bare."""
    return f'"{name}"' if name != name.lower() else name


def upsert_statement(
    table: str = SUMMARY_TABLE,
    columns: tuple[str, ...] = SUMMARY_COLUMNS,
    conflict_key: str = SUMMARY_KEY,
    audit_col: str | None = "last_updated",
) -> str:
    """The reference's upsert statement (etl_script_incremental_pandas.py:
    250-259), parameterized: insert all columns (+ CURRENT_TIMESTAMP audit),
    update every non-key column from EXCLUDED on conflict."""
    q = [quote_ident(c) for c in columns]
    ins_cols = ", ".join(q + ([audit_col] if audit_col else []))
    ins_vals = ", ".join(["%s"] * len(columns) + (["CURRENT_TIMESTAMP"] if audit_col else []))
    sets = ",\n    ".join(
        f"{quote_ident(c)} = EXCLUDED.{quote_ident(c)}"
        for c in columns
        if c != conflict_key
    )
    if audit_col:
        sets += f",\n    {audit_col} = CURRENT_TIMESTAMP"
    return (
        f"INSERT INTO {table} ({ins_cols})\n"
        f"VALUES ({ins_vals})\n"
        f"ON CONFLICT ({quote_ident(conflict_key)}) DO UPDATE SET\n    {sets}"
    )


def write_upsert(
    df: DataFrame,
    dsn: str,
    table: str = SUMMARY_TABLE,
    columns: tuple[str, ...] = SUMMARY_COLUMNS,
    conflict_key: str = SUMMARY_KEY,
    batch_size: int = 500,
) -> None:
    """Distributed upsert: each partition opens one connection and executes
    the ON CONFLICT statement in batches — one transaction per partition, so
    a failed partition retries idempotently (the statement is a MERGE).

    Untestable here (no Postgres / psycopg2); the statement TEXT is the
    tested surface (tests/test_jdbc_writer.py), and `incremental.upsert` is
    the lake-side twin.
    """
    stmt = upsert_statement(table, columns, conflict_key)
    cols = list(columns)

    def run_partition(rows) -> None:
        try:
            import psycopg2  # type: ignore[import-not-found]
        except ImportError as e:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "write_upsert needs psycopg2 on the executors; install it or "
                "use incremental.upsert.merge_upsert for lake targets"
            ) from e
        batch = []
        with psycopg2.connect(dsn) as conn, conn.cursor() as cur:
            for row in rows:
                batch.append(tuple(row[c] for c in cols))
                if len(batch) >= batch_size:
                    cur.executemany(stmt, batch)
                    batch.clear()
            if batch:
                cur.executemany(stmt, batch)

    df.select(*cols).foreachPartition(run_partition)
