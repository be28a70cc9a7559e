"""Adversarial-skew boundary tests for the dedup cap semantics (round 7).

The 100 TB story of the dedup family rests on two knobs (llm/dedup.py):

* ``max_df``     — drops shingles whose posting list exceeds the cap
                   (n-gram Jaccard, substring spans);
* ``max_bucket`` — drops LSH buckets holding more docs than the cap
                   (MinHash LSH, SimHash banding).

These tests pin the EXACT boundary semantics with synthetic mega-groups AT
the cap: a group of size == cap is kept (the filter is strictly ``>``), a
group of size cap+1 is dropped — and dropping is a documented recall trade,
identical in Spark and the DuckDB oracle, never an error.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagila_etl_airflow_assignment_spark.llm import dedup
from pagila_etl_airflow_assignment_spark.llm.shingles import shingles, with_df_cap

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _docs(spark, texts):
    rows = [(i + 1, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _pairs(df):
    return sorted((r.doc_a, r.doc_b) for r in df.collect())


# --- with_df_cap: the primitive itself ---------------------------------------------


def test_df_cap_keeps_at_cap_drops_above(spark):
    """df == cap kept; df == cap+1 dropped (filter is strictly >)."""
    texts = ["omega sigma tau"] * 3 + ["alpha beta gamma"] * 4
    sh = shingles(_docs(spark, texts), n=3).select("doc_id", "shingle")
    capped = with_df_cap(sh, max_df=3)
    kept = {r.shingle for r in capped.select("shingle").distinct().collect()}
    assert "omega sigma tau" in kept  # df=3 == cap: kept
    assert "alpha beta gamma" not in kept  # df=4 > cap: dropped


# --- ngram_jaccard_pairs under a hot stop-phrase -------------------------------------


@pytest.fixture(scope="module")
def jaccard_corpus(spark):
    """6 words per doc (4 trigrams each).

    docs 1-4:  share ONLY the stop-phrase trigrams (df=4);
    docs 5-6:  identical (every trigram df=2);
    docs 7-9:  share 'omega sigma tau rho' (2 trigrams at df=3 == cap).
    """
    texts = [
        f"the quick brown fox u{i} v{i}" for i in range(1, 5)
    ] + [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon zeta",
    ] + [
        f"omega sigma tau rho w{i} x{i}" for i in range(1, 4)
    ]
    return _docs(spark, texts)


def test_jaccard_max_df_boundary_fires_and_preserves_at_cap(spark, jaccard_corpus):
    capped = dedup.ngram_jaccard_pairs(jaccard_corpus, n=3, threshold=0.1, max_df=3)
    got = _pairs(capped)
    # stop-phrase-only pairs (1..4 x 1..4) are GONE: their entire overlap was
    # the df=4 trigrams, which the cap removed from the similarity universe
    assert all(not (a <= 4 and b <= 4) for a, b in got), got
    # the identical pair survives with capped-universe jaccard 1.0
    assert (5, 6) in got
    # the df==3 boundary trigrams still count: all three (7,8,9) pairs present
    assert {(7, 8), (7, 9), (8, 9)} <= set(got)
    j56 = capped.where((F.col("doc_a") == 5) & (F.col("doc_b") == 6)).first().jaccard
    assert j56 == 1.0


def test_jaccard_uncapped_finds_stop_phrase_pairs(spark, jaccard_corpus):
    """Control: with the cap off, the stop-phrase pairs DO appear — proving
    the capped run's omission is the cap firing, not a pipeline bug.
    jaccard(1..4 pairs) = 3 shared / (4+4-3) = 0.6."""
    got = _pairs(dedup.ngram_jaccard_pairs(jaccard_corpus, n=3, threshold=0.1, max_df=None))
    assert {(1, 2), (1, 3), (2, 4), (3, 4)} <= set(got)


def test_jaccard_capped_semantics_match_duckdb_oracle(spark, jaccard_corpus):
    """The capped-Jaccard semantics are engine-independent: DuckDB running
    ngram_jaccard_pairs_sql at the SAME cap produces the same pairs+values."""
    duckdb = pytest.importorskip("duckdb")
    pdf = jaccard_corpus.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = dedup.ngram_jaccard_pairs_sql(n=3, threshold=0.1, max_df=3)
    ora = con.execute(sql).df()
    spark_rows = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(
            jaccard_corpus, n=3, threshold=0.1, max_df=3
        ).collect()
    )
    ora_rows = sorted(
        (int(a), int(b), float(j))
        for a, b, j in zip(ora["doc_a"], ora["doc_b"], ora["jaccard"])
    )
    assert spark_rows == ora_rows


# --- minhash_lsh_pairs under a degenerate mega-bucket --------------------------------


@pytest.fixture(scope="module")
def lsh_corpus(spark):
    """docs 1-4 identical (every band bucket size 4 > cap=3);
    docs 5-6 identical (bucket size 2);
    docs 7-9 identical (bucket size 3 == cap)."""
    texts = (
        ["lorem ipsum dolor sit amet consectetur adipiscing elit sed do"] * 4
        + ["vivamus fermentum semper porta nunc diam velit adipiscing ut tristique"] * 2
        + ["maecenas faucibus mollis interdum sed posuere consectetur est at lobortis"] * 3
    )
    return _docs(spark, texts)


def test_lsh_max_bucket_boundary_fires_and_preserves_at_cap(spark, lsh_corpus):
    got = _pairs(dedup.minhash_lsh_pairs(lsh_corpus, verify_threshold=0.5, max_bucket=3))
    # the size-4 mega-bucket was dropped: NO pairs among docs 1..4 even though
    # they are exact duplicates — the documented recall trade of the cap
    assert all(not (a <= 4 and b <= 4) for a, b in got), got
    # size-2 bucket: found
    assert (5, 6) in got
    # size-3 bucket == cap: kept, all three pairs found
    assert {(7, 8), (7, 9), (8, 9)} <= set(got)


def test_lsh_uncapped_finds_mega_bucket_pairs(spark, lsh_corpus):
    """Control: default cap (10k) leaves the size-4 bucket intact."""
    got = _pairs(dedup.minhash_lsh_pairs(lsh_corpus, verify_threshold=0.5))
    assert {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)} <= set(got)


def test_lsh_capped_semantics_match_duckdb_oracle(spark, lsh_corpus):
    duckdb = pytest.importorskip("duckdb")
    pdf = lsh_corpus.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    sql = dedup.minhash_lsh_pairs_sql(verify_threshold=0.5, max_bucket=3)
    ora = sorted(
        (int(a), int(b)) for a, b in con.execute(sql).df()[["doc_a", "doc_b"]].values
    )
    got = _pairs(dedup.minhash_lsh_pairs(lsh_corpus, verify_threshold=0.5, max_bucket=3))
    assert got == ora


# --- common_substring_spans under a hot repeated passage ------------------------------


def test_substring_spans_max_df_boundary(spark):
    """A long passage shared by 4 docs: max_df=3 drops ALL its fingerprints
    (posting length 4 > 3) so no spans are reported; max_df=4 keeps them and
    every doc pair reports the shared span."""
    passage = (
        "children of the corn walked slowly through the tall grass whispering "
        "ancient names while thunder gathered over the distant broken silos"
    )
    texts = [f"intro {i} section. {passage} ending marker {i}" for i in range(1, 5)]
    docs = _docs(spark, texts)
    capped = dedup.common_substring_spans(docs, max_df=3)
    assert capped.count() == 0
    at_cap = dedup.common_substring_spans(docs, max_df=4)
    pairs = {(r.doc_a, r.doc_b) for r in at_cap.collect()}
    assert {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)} <= pairs
