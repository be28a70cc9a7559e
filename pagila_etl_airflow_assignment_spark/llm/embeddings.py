"""Embedding-column analytics: per-label centroids and distance-to-centroid
outlier detection over the `embeddings` table (`array<float>` columns).

The quality-audit step of an embedding pipeline (and the E-step of IVF/k-means
training): compute each label's mean vector, then score every vector by its
Euclidean distance to its own centroid; the farthest are mislabeled/garbage
candidates.

Scale design — NO vector ever passes through Python and NO driver-side
centroid state:

- `posexplode` flattens vectors to (label, pos, x) rows; centroid = one hash
  aggregate keyed (label, pos). Output is |labels| x dim rows — tiny — so the
  centroid table is BROADCAST back to the exploded fact for the distance sum.
  Two shuffles total ((label,pos) agg, then (vec_id) re-agg), both map-side
  partial-agg'd; 100 TB of vectors stream through without materializing any
  per-label array in one place.
- The alternative — `F.aggregate` over zipped arrays against a collected
  centroid map — puts centroids on the driver; this formulation keeps the
  whole computation declarative and cluster-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OUTLIER_TOP_K = 5


def label_centroids_long(embeddings: DataFrame) -> DataFrame:
    """Per-label mean vector in LONG form: (label, pos, c). pos is 1-based to
    match SQL generate_subscripts."""
    exploded = embeddings.select(
        "label", F.posexplode("embedding").alias("pos0", "x")
    )
    return (
        exploded.groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(F.avg("x").alias("c"))
    )


def centroid_outliers(
    embeddings: DataFrame, top_k: int = OUTLIER_TOP_K
) -> DataFrame:
    """Top-k vectors per label by Euclidean distance to the label centroid."""
    exploded = embeddings.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "x")
    ).withColumn("pos", F.col("pos0") + 1)
    cents = label_centroids_long(embeddings)
    dists = (
        exploded.join(F.broadcast(cents), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sqrt(F.sum(F.pow(F.col("x") - F.col("c"), F.lit(2)))), 6
            ).alias("dist")
        )
    )
    w = Window.partitionBy("label").orderBy(
        F.col("dist").desc(), F.col("vec_id").asc()
    )
    return (
        dists.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= top_k)
        .orderBy("label", "rnk")
    )


def centroid_outliers_sql(top_k: int = OUTLIER_TOP_K) -> str:
    return f"""
    WITH exploded AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings
    ),
    cents AS (
        SELECT label, pos, AVG(x) AS c
        FROM exploded GROUP BY label, pos
    ),
    dists AS (
        SELECT e.vec_id, e.label,
               round(sqrt(SUM(power(e.x - c.c, 2))), 6) AS dist
        FROM exploded e JOIN cents c ON e.label = c.label AND e.pos = c.pos
        GROUP BY e.vec_id, e.label
    )
    SELECT vec_id, label, dist,
           CAST(rnk AS INT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY label ORDER BY dist DESC, vec_id ASC
        ) AS rnk
        FROM dists
    )
    WHERE rnk <= {top_k}
    ORDER BY label, rnk
    """
