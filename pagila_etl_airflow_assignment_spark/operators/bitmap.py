"""Bitmap-index set operations: audience overlap without COUNT(DISTINCT) joins.

The warehouse-internals technique behind fast audience/overlap queries
(roaring-bitmap indexes in Druid/ClickHouse/Pinot): materialize each group's
member set as packed integer bitmap words, then set algebra (AND/OR + popcount)
replaces distinct-counting joins. The bitmap relation is keyed on
(group, word_index) — |members|/63 rows per group instead of |members| — and
every downstream intersection is an equi-join on word_index with bitwise
aggregation, never a row-per-member shuffle.

Words are 63-bit (bit index = member % 63): DuckDB's ``<<`` overflow-checks a
shift into the int64 sign bit, so the sign bit is simply never used — both
engines then agree bit-for-bit on every word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_BITS = 63


def user_bitmaps(events: DataFrame) -> DataFrame:
    """(event_type, word, bits): each event type's distinct-user set packed
    into 63-bit bitmap words. One distinct + one (type, word)-keyed bit_or
    aggregate, both map-side combined."""
    return (
        events.select(
            "event_type",
            (F.col("user_id") % WORD_BITS).cast("int").alias("b"),
            F.expr(f"user_id DIV {WORD_BITS}").alias("word"),
        )
        .select(
            "event_type",
            "word",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))").alias("w"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("w").alias("bits"))
    )


def bitmap_intersections(events: DataFrame) -> DataFrame:
    """Pairwise audience overlap between event types via bitmap AND +
    popcount: (type_a, type_b, users_a, users_b, users_both,
    jaccard_milli). The join is word_index-keyed between two relations of
    ~|users|/63 rows per type — the set algebra never touches row-per-user
    data, which is exactly why warehouses index audiences this way.

    All counts are exact (bit_count over the packed words); jaccard is
    exact integer half-up milli."""
    bm = user_bitmaps(events)
    per_type = bm.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("n_users")
    )
    a = bm.select(
        F.col("event_type").alias("type_a"), "word", F.col("bits").alias("ba")
    )
    b = bm.select(
        F.col("event_type").alias("type_b"), "word", F.col("bits").alias("bb")
    )
    inter = (
        a.join(b, "word")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.bit_count(F.col("ba").bitwiseAND(F.col("bb"))))
            .cast("long")
            .alias("users_both")
        )
    )
    na = per_type.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("users_a")
    )
    nb = per_type.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("users_b")
    )
    return (
        inter.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            "users_a",
            "users_b",
            "users_both",
            F.expr(
                "CAST((2000 * users_both"
                " + (users_a + users_b - users_both))"
                " DIV (2 * (users_a + users_b - users_both)) AS BIGINT)"
            ).alias("jaccard_milli"),
        )
        .orderBy("type_a", "type_b")
    )


BITMAP_INTERSECTIONS_SQL = f"""
    WITH bm AS (
        SELECT event_type,
               user_id // {WORD_BITS} AS word,
               bit_or(CAST(1 AS BIGINT) << CAST(user_id % {WORD_BITS} AS INT))
                   AS bits
        FROM events
        GROUP BY event_type, user_id // {WORD_BITS}
    ),
    per_type AS (
        SELECT event_type, CAST(SUM(bit_count(bits)) AS BIGINT) AS n_users
        FROM bm GROUP BY event_type
    ),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(SUM(bit_count(a.bits & b.bits)) AS BIGINT) AS users_both
        FROM bm a JOIN bm b
          ON a.word = b.word AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT i.type_a, i.type_b,
           na.n_users AS users_a, nb.n_users AS users_b, i.users_both,
           CAST((2000 * i.users_both
                 + (na.n_users + nb.n_users - i.users_both))
                // (2 * (na.n_users + nb.n_users - i.users_both)) AS BIGINT)
               AS jaccard_milli
    FROM inter i
    JOIN per_type na ON na.event_type = i.type_a
    JOIN per_type nb ON nb.event_type = i.type_b
    ORDER BY type_a, type_b
"""
