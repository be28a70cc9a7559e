"""Round-5 operators: hard-negative mining, SemDeDup semantic dedup, DSIR
importance weights, per-dimension embedding stats, LSH banding calibration.

Semantics pinned on tiny inline fixtures; the differential check vs DuckDB
runs via tools/verify_local.py and the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import math

from pagila_etl_airflow_assignment_spark.llm import dedup, sampling, similarity
from pagila_etl_airflow_assignment_spark.llm import embeddings as emb


def _vecs(spark, rows, dim=4):
    padded = [(i, (v + [0.0] * dim)[:dim], lab) for i, v, lab in rows]
    return spark.createDataFrame(
        padded, "vec_id long, embedding array<float>, label int"
    )


# --- hard negatives -------------------------------------------------------------


def test_hard_negatives_excludes_same_label(spark):
    vecs = _vecs(
        spark,
        [
            (1, [1.0, 0.0], 0),          # query
            (2, [1.0, 0.01], 0),         # same label, nearly identical — excluded
            (3, [0.9, 0.1], 1),          # different label, close — the hard negative
            (4, [-1.0, 0.0], 1),         # different label, far
        ],
    )
    out = similarity.hard_negatives_topk(vecs, [1], k=2).collect()
    assert [r.vec_id for r in out] == [3, 4]
    assert all(r.q_label == 0 and r.neg_label == 1 for r in out)
    assert out[0].cosine > out[1].cosine


# --- SemDeDup -------------------------------------------------------------------


def test_semantic_dedup_prunes_near_duplicates(spark):
    # two exact duplicates + one orthogonal vector; 2 centroids
    vecs = _vecs(
        spark,
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 0),   # exact semantic dup of 1
            (3, [0.0, 1.0], 1),
        ],
    )
    out = {r.vec_id: r for r in emb.semantic_dedup(vecs, n_centroids=2, tau=0.99).collect()}
    assert len(out) == 3
    dup_pair = [out[1], out[2]]
    # exactly one of the two identical vectors is pruned, the other kept
    assert sorted(r.kept for r in dup_pair) == [False, True]
    assert out[3].kept  # orthogonal vector survives any tau


def test_semantic_dedup_keeps_all_below_threshold(spark):
    vecs = _vecs(
        spark,
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0), (3, [0.0, 0.0, 1.0], 1)],
        dim=3,
    )
    out = emb.semantic_dedup(vecs, n_centroids=1, tau=0.5).collect()
    assert all(r.kept for r in out)  # mutually orthogonal: nothing prunes
    assert {r.centroid_id for r in out} == {out[0].centroid_id}  # one cluster


# --- DSIR importance ------------------------------------------------------------


def test_dsir_scores_target_like_docs_higher(spark):
    # target (en) vocabulary is {alpha beta gamma}; raw docs: one written in
    # the target vocabulary, one in a disjoint vocabulary
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta gamma", "en", "s"),
            (2, "alpha beta gamma beta gamma alpha", "en", "s"),
            (10, "alpha beta gamma", "de", "s"),
            (11, "zzz qqq xxx", "de", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {r.doc_id: r for r in sampling.importance_weights_dsir(docs).collect()}
    assert set(out) == {10, 11}  # only raw (non-target) docs scored
    assert out[10].n_tokens == 3 and out[11].n_tokens == 3
    # target-like doc scores strictly higher
    assert out[10].logratio_micro > out[11].logratio_micro
    # target-vocabulary doc has positive log-ratio, disjoint-vocab negative
    assert out[10].logratio_micro > 0 > out[11].logratio_micro


# --- per-dimension stats --------------------------------------------------------


def test_dimension_stats_exact_micro_units(spark):
    vecs = _vecs(
        spark,
        [(1, [1.0, 2.0], 0), (2, [3.0, 2.0], 0), (3, [5.0, 2.0], 0)],
        dim=2,
    )
    out = {r.pos: r for r in emb.dimension_stats(vecs).collect()}
    assert out[1].n == 3 and out[2].n == 3
    assert out[1].mean_micro == 3_000_000  # mean(1,3,5) = 3
    # var(1,3,5) = 8/3 in micro^2 units
    assert out[1].var_micro2 == round(8 / 3 * 1e12)
    assert out[2].mean_micro == 2_000_000 and out[2].var_micro2 == 0


# --- LSH calibration ------------------------------------------------------------


def test_lsh_calibration_identical_docs_hit_all_bands(spark):
    docs = spark.createDataFrame(
        [
            (1, "the same exact document text here"),
            (2, "the same exact document text here"),
            (3, "completely different words in this one"),
        ],
        "doc_id long, text string",
    )
    rows = dedup.lsh_band_calibration(docs).collect()
    # identical docs collide on every band with exact Jaccard 1.0
    full = [r for r in rows if r.bands_hit == dedup.LSH_BANDS]
    assert len(full) == 1
    assert full[0].n_pairs == 1
    assert full[0].mean_jaccard_milli == 1000
    assert full[0].min_jaccard_milli == 1000 == full[0].max_jaccard_milli
    assert full[0].est_jaccard_milli == 1000
    # the disjoint doc never becomes a candidate against the pair
    assert sum(r.n_pairs for r in rows) == 1


def test_lsh_calibration_estimate_is_monotone_grid(spark):
    # grid sanity on the real fixture slice: est_jaccard_milli rises with
    # bands_hit and mean exact jaccard is weakly monotone in the estimate
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(
        dedup.lsh_band_calibration(docs).collect(), key=lambda r: r.bands_hit
    )
    ests = [r.est_jaccard_milli for r in rows]
    assert ests == sorted(ests)
    for r in rows:
        assert 0 <= r.min_jaccard_milli <= r.mean_jaccard_milli <= r.max_jaccard_milli <= 1000
