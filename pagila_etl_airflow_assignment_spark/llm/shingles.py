"""Word n-gram shingling, dual-dialect.

The exploded (doc_id, shingle) relation is the inverted index every set-based
dedup builds on. Shingling itself is a narrow transformation (no shuffle);
downstream joins shuffle on the shingle key. At 100 TB the standard skew
mitigation is dropping ultra-frequent shingles (document-frequency cap) before
the self-join — exposed via ``max_df``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import WS_RE, _norm, _norm_sql

DEFAULT_N = 3


def shingles(docs: DataFrame, n: int = DEFAULT_N) -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle).

    The word array is materialized as a column BEFORE the gram lambda: an
    inlined split expression would be re-evaluated per element_at per gram
    (no common-subexpression elimination inside higher-order-function
    lambdas), which measured 13x slower at sf0.1.

    Per-doc distinctness is `array_distinct` BEFORE the explode — narrow,
    per-document — not `.distinct()` after, which would shuffle the full
    exploded gram relation (and be re-executed on each side of a self-join).
    """
    w = F.col("__words")
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array())
    return (
        docs.select("doc_id", F.split(_norm(F.col("text")), WS_RE).alias("__words"))
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def shingles_sql(n: int = DEFAULT_N, docs_rel: str = "documents") -> str:
    """DuckDB twin of ``shingles`` (list comprehension over the word list)."""
    parts = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""
        SELECT DISTINCT doc_id, shingle
        FROM (
            SELECT doc_id,
                   unnest([{parts} FOR i IN generate_series(1, len(w) - {n - 1})])
                     AS shingle
            FROM (
                SELECT doc_id,
                       string_split_regex({_norm_sql('text')}, '{WS_RE}') AS w
                FROM {docs_rel}
            )
            WHERE len(w) >= {n}
        )
    """


def grams(docs: DataFrame, n: int = DEFAULT_N) -> DataFrame:
    """All word n-grams per doc WITH multiplicity: (doc_id, gram).

    Same narrow explode as ``shingles`` but without the per-doc
    ``array_distinct`` — repetition statistics and vocabulary counts need the
    multiplicities that set-based dedup deliberately discards."""
    w = F.col("__words")
    g = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array())
    return (
        docs.select("doc_id", F.split(_norm(F.col("text")), WS_RE).alias("__words"))
        .select("doc_id", F.explode(g).alias("gram"))
    )


def grams_sql(n: int = DEFAULT_N, docs_rel: str = "documents") -> str:
    """DuckDB twin of ``grams`` (keeps duplicates — no DISTINCT)."""
    parts = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""
        SELECT doc_id,
               unnest([{parts} FOR i IN generate_series(1, len(w) - {n - 1})])
                 AS gram
        FROM (
            SELECT doc_id,
                   string_split_regex({_norm_sql('text')}, '{WS_RE}') AS w
            FROM {docs_rel}
        )
        WHERE len(w) >= {n}
    """


def with_df_cap(sh: DataFrame, max_df: int) -> DataFrame:
    """Drop shingles appearing in more than ``max_df`` docs (skew guard).

    Shape: broadcast LEFT ANTI against the HOT set only. The hot set is tiny
    by construction (few shingles exceed any sane cap even at 100 TB — they
    are the stop-phrases), so this is a broadcast anti join over the exploded
    relation, not an inner join against the full df-count table."""
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_df)
        .select("shingle")
    )
    return sh.join(F.broadcast(hot), "shingle", "left_anti")


def df_cap_filter_sql(sh_rel: str, max_df: int) -> str:
    """DuckDB twin of ``with_df_cap`` as a WHERE-clause predicate."""
    return (
        f"shingle NOT IN (SELECT shingle FROM {sh_rel} "
        f"GROUP BY shingle HAVING COUNT(*) > {max_df})"
    )
