"""Skew guards for the candidate-generation self-joins (VERDICT r1 #4).

At 100 TB one ultra-frequent shingle (a stop-phrase) or one degenerate LSH
bucket makes the inverted-index self-join quadratic in its posting length.
``max_df`` / ``max_bucket`` drop those hot keys via a broadcast anti join.
These tests pin (a) the cap actually bounds candidate counts under injected
skew, and (b) the default caps are a no-op on the real fixtures (so the
oracle-checked results are unchanged).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagila_etl_airflow_assignment_spark.llm import dedup
from pagila_etl_airflow_assignment_spark.llm.shingles import shingles, with_df_cap
from pagila_etl_airflow_assignment_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"

STOP = "the quick brown fox jumps"  # one shared 5-word stop-phrase


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # 40 docs: each has unique content but ALL share the stop-phrase, so every
    # shingle inside STOP has df=40 while content shingles have df=1.
    rows = [(i, f"{STOP} unique{i} alpha{i} beta{i} gamma{i} delta{i}") for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_df_cap_drops_only_hot_shingles(skewed_docs):
    sh = shingles(skewed_docs, n=3)
    capped = with_df_cap(sh, max_df=5)
    dfc = capped.groupBy("shingle").count()
    assert dfc.agg(F.max("count")).first()[0] <= 5
    # per-doc unique shingles survive
    assert capped.where(F.col("shingle").contains("unique")).count() > 0


def test_ngram_jaccard_cap_bounds_candidates(skewed_docs):
    # uncapped: the stop-phrase's 3 shared shingles connect all 40 docs ->
    # 40*39/2 = 780 candidate pairs flow through the join
    uncapped = dedup.ngram_jaccard_pairs(skewed_docs, threshold=0.0, max_df=None)
    capped = dedup.ngram_jaccard_pairs(skewed_docs, threshold=0.0, max_df=5)
    assert uncapped.count() == 780
    # capped: shared shingles are gone; docs share nothing else -> no pairs
    assert capped.count() == 0


def test_default_caps_are_noop_on_fixtures(spark):
    docs = load_table(spark, SF, "documents")
    with_cap = dedup.ngram_jaccard_pairs(docs).collect()
    without = dedup.ngram_jaccard_pairs(docs, max_df=None).collect()
    assert sorted(map(tuple, with_cap)) == sorted(map(tuple, without))


def test_minhash_bucket_cap_bounds_candidates(spark):
    # identical docs all collide into the same bucket in every band
    rows = [(i, "same text everywhere for every doc") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.minhash_lsh_pairs(docs, max_bucket=None)
    capped = dedup.minhash_lsh_pairs(docs, max_bucket=10)
    assert uncapped.count() == 30 * 29 / 2
    assert capped.count() == 0


def test_simhash_bucket_cap_bounds_candidates(spark):
    rows = [(i, "same text everywhere for every doc") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.simhash_near_pairs(docs, max_bucket=None)
    capped = dedup.simhash_near_pairs(docs, max_bucket=10)
    assert uncapped.count() == 30 * 29 / 2
    assert capped.count() == 0


# --- cap boundary + adversarial-skew properties (VERDICT r4 #8) ---------------
#
# The 100 TB story depends on the EXACT cap semantics: a bucket holding
# max_bucket docs survives (<=), one more drops it (>), and dropping a hot
# bucket only ever REMOVES candidate pairs (monotonicity). Pin all three at
# the boundary, under hypothesis-varied mega-group sizes.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

CAP = 4


def _mega_docs(spark, g: int, n_distinct: int = 5):
    """g identical docs (ids 0..g-1) + n_distinct clearly-different docs."""
    rows = [(i, "same mega group text shared by all duplicate docs") for i in range(g)]
    rows += [
        (100 + j, f"totally different content{j} verse{j} chapter{j} line{j} word{j}")
        for j in range(n_distinct)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(g=st.integers(min_value=1, max_value=CAP + 3))
def test_lsh_cap_boundary_and_monotonicity(spark, g):
    docs = _mega_docs(spark, g)
    capped = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs, max_bucket=CAP).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs, max_bucket=None).collect()
    }
    # monotonicity: the cap only removes pairs, never invents them
    assert capped <= uncapped
    mega = {(a, b) for a in range(g) for b in range(g) if a < b}
    if g <= CAP:
        # boundary inclusive: a bucket holding exactly CAP docs SURVIVES
        assert mega <= capped
    else:
        # identical docs share every band bucket, so each of their buckets
        # holds >= g > CAP members and the whole group drops
        assert not (mega & capped)
    # the cap touches ONLY the mega group: non-mega pairs are identical
    assert capped - mega == uncapped - mega


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    dup_mask=st.lists(st.booleans(), min_size=1, max_size=8),
    m=st.sampled_from([64, 128, 256]),
)
def test_bloom_prefilter_exact_under_tiny_filters(spark, dup_mask, m):
    """The Bloom pre-filter must return EXACTLY the exact anti-join's result
    at ANY filter size: tiny m forces false positives (everything becomes a
    candidate) but never a false negative, and every positive is re-verified
    against the real corpus. This pins the 'Bloom is a bandwidth knob, not a
    correctness knob' contract under adversarial saturation."""
    split = 1000
    corpus = [(i, f"corpus document number{i} body{i} tail{i}") for i in range(6)]
    batch = [
        (split + j, corpus[j % 6][1] if is_dup
         else f"fresh batch document number{j} body{j} tail{j}")
        for j, is_dup in enumerate(dup_mask)
    ]
    docs = spark.createDataFrame(corpus + batch, "doc_id long, text string")
    got = sorted(
        r.doc_id
        for r in dedup.incremental_new_docs_bloom(docs, split_id=split, m=m).collect()
    )
    expect = sorted(
        split + j for j, is_dup in enumerate(dup_mask) if not is_dup
    )
    assert got == expect
