"""Corpus novelty: what fraction of each document's shingles appear for the
first time in THAT document (scanning the corpus in doc_id order)?

The standard corpus-growth diagnostic for training-data curation (how much new
n-gram mass each source/batch contributes; a near-zero-novelty document is a
near-duplicate even when no single prior document matches it — the complement
of the pairwise dedup family in llm/dedup.py).

Scale shape: ONE exchange on the shingle key — first occurrence is a
whole-partition MIN window over (shingle), not a groupBy+self-join (which
would shuffle the exploded gram relation twice) — then one doc_id-keyed
aggregate back to document grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .shingles import DEFAULT_N, shingles, shingles_sql


def shingle_novelty(docs: DataFrame, n: int = DEFAULT_N) -> DataFrame:
    """(doc_id, n_shingles, n_novel, novelty_ratio): distinct-shingle count,
    how many occur in no earlier doc (by doc_id), and the ratio. Documents
    shorter than ``n`` words have no shingles and no row."""
    sh = shingles(docs, n)
    w = Window.partitionBy("shingle")
    return (
        sh.withColumn("first_doc", F.min("doc_id").over(w))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_shingles"), 6).alias("novelty_ratio"),
        )
        .orderBy("doc_id")
    )


def shingle_novelty_sql(n: int = DEFAULT_N) -> str:
    return f"""
        WITH sh AS ({shingles_sql(n)})
        SELECT doc_id,
               COUNT(*) AS n_shingles,
               COUNT(*) FILTER (first_doc = doc_id) AS n_novel,
               round(COUNT(*) FILTER (first_doc = doc_id) / COUNT(*), 6)
                   AS novelty_ratio
        FROM (
            SELECT doc_id, shingle,
                   MIN(doc_id) OVER (PARTITION BY shingle) AS first_doc
            FROM sh
        )
        GROUP BY doc_id
        ORDER BY doc_id
    """
