"""Property tests for the training-pipeline ops added in round 2:
cluster resolution, deterministic splits, stratified sampling, PII scrub."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pagila_etl_airflow_assignment_spark.llm import dedup, sampling, text
from pagila_etl_airflow_assignment_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_clusters_are_transitive(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    # chain 0-1, 1-2 plus isolated pair 4-5; doc 3 is a singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dedup_clusters(docs, pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4}


def test_clusters_deep_chain_converges(spark):
    n = 12  # diameter 11 — forces multiple propagation rounds
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(n)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = dedup.dedup_clusters(docs, pairs).collect()
    assert all(r["cluster_id"] == 0 for r in got)


def test_split_assign_is_stable_and_complete(spark):
    docs = load_table(spark, SF, "documents")
    full = {r["doc_id"]: r["split"] for r in sampling.split_assign(docs).collect()}
    assert set(full.values()) == {"train", "val", "test"}
    # ~80/10/10 (hash noise tolerated)
    n = len(full)
    frac_train = sum(1 for s in full.values() if s == "train") / n
    assert 0.7 < frac_train < 0.9
    # content-stability: a subset of the corpus gets identical assignments
    sub = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(docs.where(F.col("doc_id") % 2 == 0)).collect()
    }
    assert all(full[k] == v for k, v in sub.items())


def test_stratified_sample_quota_exact(spark):
    docs = load_table(spark, SF, "documents")
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    got = sampling.stratified_sample(docs, fraction_pct=10).collect()
    per_stratum: dict[str, int] = {}
    for r in got:
        per_stratum[r["source"]] = per_stratum.get(r["source"], 0) + 1
    for src, n in totals.items():
        assert per_stratum.get(src, 0) == (n * 10 + 99) // 100  # ceil(10%)


def test_mixture_sample_hits_exact_mixture(spark):
    """Fixture sources are uniform 25-per-source: with 50/30/20 targets the
    binding domain is src0 (T = 25*100//50 = 50) -> quotas 25/15/10."""
    docs = load_table(spark, SF, "documents")
    got = sampling.mixture_weighted_sample(docs).collect()
    per = {}
    for r in got:
        per[r["source"]] = per.get(r["source"], 0) + 1
    assert per == {"src0": 25, "src1": 15, "src2": 10}


def test_mixture_sample_binding_constraint(spark):
    """A domain smaller than its share must bind the total: with src0 capped
    to 5 docs at weight 50, T = 10 -> quotas 5/3/2."""
    docs = load_table(spark, SF, "documents")
    capped = docs.where(
        (F.col("source") != "src0") | (F.col("doc_id") < 100)
    )
    n_src0 = capped.where(F.col("source") == "src0").count()
    assert 0 < n_src0 < 25
    got = sampling.mixture_weighted_sample(capped).collect()
    per = {}
    for r in got:
        per[r["source"]] = per.get(r["source"], 0) + 1
    t = n_src0 * 100 // 50
    assert per == {
        "src0": min(n_src0, 50 * t // 100),
        "src1": 30 * t // 100,
        "src2": 20 * t // 100,
    }


def test_mixture_sample_is_stable_subset(spark):
    """Shrinking a NON-binding domain must not move the selected rows of
    other domains (md5 order is content-stable)."""
    docs = load_table(spark, SF, "documents")
    full = {
        (r["source"], r["doc_id"])
        for r in sampling.mixture_weighted_sample(docs).collect()
    }
    # drop half of src1's UNSELECTED rows -> src1 keeps its quota as long as
    # enough rows remain; src0/src2 selections must be identical
    selected_src1 = {d for s, d in full if s == "src1"}
    pruned = docs.where(
        (F.col("source") != "src1")
        | F.col("doc_id").isin([int(d) for d in selected_src1])
    )
    got = {
        (r["source"], r["doc_id"])
        for r in sampling.mixture_weighted_sample(pruned).collect()
    }
    assert got == full


def test_pii_scrub_removes_all_matches(spark):
    docs = load_table(spark, SF, "documents")
    got = text.pii_scrub(docs)
    # injected PII is counted...
    assert got.where((F.col("doc_id") % 3 == 0) & (F.col("n_emails") == 0)).count() == 0
    assert got.where((F.col("doc_id") % 4 == 0) & (F.col("n_phones") == 0)).count() == 0
    # ...and nothing matching survives in the clean text
    email = re.compile(text.EMAIL_RE)
    phone = re.compile(text.PHONE_RE)
    for r in got.collect():
        assert not email.search(r["clean_text"])
        assert not phone.search(r["clean_text"])
        if r["doc_id"] % 3 == 0:
            assert "<EMAIL>" in r["clean_text"]
        if r["doc_id"] % 4 == 0:
            assert "<PHONE>" in r["clean_text"]
