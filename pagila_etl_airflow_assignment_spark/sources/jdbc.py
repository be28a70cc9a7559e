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
