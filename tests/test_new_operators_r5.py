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


# --- changepoint ------------------------------------------------------------------

import datetime as dt

from pagila_etl_airflow_assignment_spark.operators import distributions, stats


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_changepoint_finds_level_shift(spark):
    # 3 days at 10.0 then 3 days at 50.0 -> split after day 3
    rows = []
    for d in range(1, 7):
        v = 10.0 if d <= 3 else 50.0
        rows += [(d * 10 + i, dt.datetime(2024, 1, d), 1, "a", v) for i in range(4)]
    out = distributions.changepoint_detection(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.split_day == dt.date(2024, 1, 3)
    assert r.mean_before == 10.0 and r.mean_after == 50.0
    assert r.delta == 40.0


def test_changepoint_tie_prefers_earliest_day(spark):
    # constant series: every split has delta 0 -> earliest day wins the tie
    rows = [(d, dt.datetime(2024, 1, d), 1, "a", 5.0) for d in range(1, 5)]
    r = distributions.changepoint_detection(_events(spark, rows)).collect()[0]
    assert r.delta == 0.0 and r.split_day == dt.date(2024, 1, 1)


# --- bot regularity ---------------------------------------------------------------


def test_bot_regularity_flags_clockwork_user(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=60 * i), 1, "ping", 0.0) for i in range(25)
    ]  # metronome: 60 s gaps exactly
    human = [
        (100 + i, base + dt.timedelta(seconds=s), 2, "click", 0.0)
        for i, s in enumerate([0, 7, 200, 205, 1000, 1001, 5000])
    ]
    out = {r.user_id: r for r in stats.bot_regularity_scores(_events(spark, rows + human)).collect()}
    assert out[1].n_gaps == 24
    assert out[1].mean_gap_s == 60 and out[1].cv_milli == 0
    assert out[1].is_bot
    assert not out[2].is_bot  # bursty and below min_events


def test_bot_regularity_zero_gap_sum_guard(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base, 3, "x", 0.0) for i in range(5)]  # identical timestamps
    r = stats.bot_regularity_scores(_events(spark, rows)).collect()[0]
    assert r.cv_milli is None and not r.is_bot


# --- matryoshka quality -----------------------------------------------------------


def test_matryoshka_energy_and_error_bounds(spark):
    import math

    vecs = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 5 - 2) for j in range(64)], 0) for i in range(10)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r.width: r for r in emb.matryoshka_quality(vecs).collect()}
    assert set(rows) == {8, 16, 32}
    for r in rows.values():
        assert r.n_pairs == 5
        assert 0 <= r.mean_abs_err_milli <= r.max_abs_err_milli <= 2000
        assert 0 <= r.mean_energy_milli <= 1000
    # wider truncation retains at least as much energy on average
    assert rows[8].mean_energy_milli <= rows[16].mean_energy_milli <= rows[32].mean_energy_milli


# --- 2-D skyline ------------------------------------------------------------------

from pagila_etl_airflow_assignment_spark.operators import behavior, warehouse
from pagila_etl_airflow_assignment_spark.llm import corpus_stats, text


def test_skyline_keeps_only_undominated(spark):
    part = spark.createDataFrame(
        [
            (1, "a", 10.0, 5),   # frontier (cheapest)
            (2, "b", 20.0, 9),   # frontier (bigger than anything cheaper)
            (3, "c", 20.0, 4),   # dominated by 1 (pricier, smaller)
            (4, "d", 30.0, 9),   # dominated by 2 (pricier, same size)
            (5, "e", 40.0, 12),  # frontier
        ],
        "p_partkey long, p_name string, p_retailprice double, p_size int",
    )
    out = warehouse.part_skyline(part).collect()
    assert [r.p_partkey for r in out] == [1, 2, 5]
    # frontier sizes strictly increase along rising price
    sizes = [r.p_size for r in out]
    assert sizes == sorted(sizes) and len(set(sizes)) == len(sizes)


# --- DAU/MAU ----------------------------------------------------------------------


def test_stickiness_bounds_and_window(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 3 users active day 1; 1 user active day 30 (outside 28-day window of day 1)
    for u in (1, 2, 3):
        rows.append((eid, base, u, "x", 0.0)); eid += 1
    rows.append((eid, base + dt.timedelta(days=29), 9, "x", 0.0))
    out = {r.day: r for r in behavior.dau_mau_stickiness(_events(spark, rows)).collect()}
    d1, d30 = dt.date(2024, 1, 1), dt.date(2024, 1, 30)
    assert out[d1].dau == 3 and out[d1].mau == 3
    assert out[d1].stickiness_milli == 1000  # everyone monthly was there today
    # day-1 users fell out of the trailing-28d window by day 30
    assert out[d30].dau == 1 and out[d30].mau == 1


# --- code detection ---------------------------------------------------------------


def test_code_detection_separates_code_from_prose(spark):
    docs = spark.createDataFrame(
        [
            (1, "def foo(x): return x + 1; import os"),
            (2, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.code_detection_scores(docs).collect()}
    assert out[1].looks_like_code and out[1].keyword_hits >= 2
    assert not out[2].looks_like_code
    assert out[2].symbol_milli == 0 and out[2].digit_milli == 0


# --- LM-score mix -----------------------------------------------------------------


def test_lm_score_mix_quartiles_partition_docs(spark):
    docs = spark.createDataFrame(
        [
            (i, "common words common words" if i % 2 else "rare%d token%d" % (i, i),
             "en", "srcA" if i < 10 else "srcB")
            for i in range(20)
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = corpus_stats.lm_score_mix(docs).collect()
    assert sum(r.n_docs for r in rows) == 20
    assert {r.quartile for r in rows} <= {1, 2, 3, 4}
    # mean score rises with the quartile within each source
    for src in ("srcA", "srcB"):
        ms = [r.mean_score_micro for r in sorted(
            (r for r in rows if r.source == src), key=lambda r: r.quartile)]
        assert ms == sorted(ms)


# --- Lloyd k-means (3 iterations) ---------------------------------------------------


def test_kmeans_lloyd_converges_to_true_centroids(spark):
    # two tight clusters around orthogonal axes; k=2 must land one centroid
    # in each and the micro-unit means must be exact integer averages
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0], 0))          # cluster A
        rows.append((100 + i, [0.0, 0.0, 1.0, 0.01 * i], 1))    # cluster B
    vecs = _vecs(spark, rows, dim=4)
    out = emb.kmeans_lloyd(vecs, k=2, iters=3).collect()
    assert len(out) == 2 * 4
    by_c = {}
    for r in out:
        by_c.setdefault(r.centroid_id, {})[r.pos] = r.c_micro
    # each centroid dominates one axis (pos 1 for A, pos 3 for B)
    axes = sorted(max(d, key=d.get) for d in by_c.values())
    assert axes == [1, 3]
    # micro means are exact: cluster A pos1 = mean of six 1.0 = 1_000_000
    dom = {max(d, key=d.get): d for d in by_c.values()}
    assert dom[1][1] == 1_000_000 and dom[3][3] == 1_000_000


# --- personalized pagerank ----------------------------------------------------------

from pagila_etl_airflow_assignment_spark.operators import graph


def test_personalized_pagerank_concentrates_near_source(spark):
    # star around part 1 (max degree) + a far pair (4,5); walks restart at 1
    rows = []
    for rep in range(2):  # repeat so co-purchase edges form
        rows += [(10 + rep, 1), (10 + rep, 2), (20 + rep, 1), (20 + rep, 3)]
        rows += [(30 + rep, 4), (30 + rep, 5)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {r.p_partkey: r.ppr for r in graph.personalized_pagerank(li, k=10).collect()}
    assert out[1] == max(out.values())      # source holds the most mass
    assert 4 not in out and 5 not in out    # disconnected pair gets none


# --- gopher rules ---------------------------------------------------------------------


def test_gopher_rules_flags_compose(spark):
    good = "the and of " + " ".join(f"alpha{i} beta gamma delta" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, good),                              # passes everything
            (2, "too short"),                        # fails word count
            (3, "# # # " * 40 + good),               # fails symbol ratio
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.gopher_rules(docs).collect()}
    assert out[1].gopher_keep
    assert not out[2].pass_word_count and not out[2].gopher_keep
    assert not out[3].pass_symbol_ratio and not out[3].gopher_keep
    assert out[3].pass_word_count  # the symbol rule, not length, kills it


# --- temperature mixture ----------------------------------------------------------------


def test_temperature_mixture_flattens_shares(spark):
    # 160 docs in srcBig, 10 in srcSmall: raw shares 94%/6%; sqrt shares
    # ~78%/22% — the small source's share must rise under T=2
    docs = spark.createDataFrame(
        [(i, "txt", "en", "srcBig") for i in range(160)]
        + [(1000 + i, "txt", "en", "srcSmall") for i in range(10)],
        "doc_id long, text string, lang string, source string",
    )
    out = sampling.temperature_mixture_sample(docs, total=50).collect()
    by_src = {}
    for r in out:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    assert by_src["srcSmall"] >= 9   # ~10/50 = 20% >> raw 6%
    assert by_src["srcBig"] > by_src["srcSmall"]
    # quota never exceeds the stratum population
    assert by_src["srcSmall"] <= 10


# --- IVF recall curve --------------------------------------------------------------


def test_ivf_recall_curve_monotone_in_nprobe(spark):
    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = [r.vec_id for r in vecs.limit(3).collect()]
    rows = sorted(
        similarity.ivf_recall_curve(vecs, qids).collect(), key=lambda r: r.nprobe
    )
    assert [r.nprobe for r in rows] == [1, 2, 4]
    recalls = [r.recall_milli for r in rows]
    assert recalls == sorted(recalls)  # more lists probed -> recall never drops
    assert all(r.n_true == rows[0].n_true for r in rows)
    assert 0 <= recalls[0] and recalls[-1] <= 1000


# --- k-core -------------------------------------------------------------------------


def test_kcore_peels_periphery(spark):
    # clique of 4 parts (every pair co-purchased) + a pendant part 9 hanging
    # off part 1: k=3 core keeps the clique, peels the pendant
    rows = []
    for rep in range(2):
        rows += [(10 + rep, p) for p in (1, 2, 3, 4)]   # clique basket
        rows += [(20 + rep, p) for p in (1, 9)]          # pendant
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {r.p_partkey: r for r in graph.kcore_membership(li, k=3).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert all(r.residual_degree == 3 for r in out.values())


# --- containment --------------------------------------------------------------------


def test_containment_catches_doc_in_doc_jaccard_misses(spark):
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"filler{i} words{i} here{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "совсем other unrelated text entirely")],
        "doc_id long, text string",
    )
    out = dedup.ngram_containment_pairs(docs, threshold_milli=800).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(1, 2)]
    r = out[0]
    assert r.containment_milli == 1000  # the small doc is fully contained
    # symmetric Jaccard on the same pair stays low — this is the point
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect()
    jpair = [x for x in jac if (x.doc_a, x.doc_b) == (1, 2)]
    assert jpair and jpair[0].jaccard < 0.2


# --- boilerplate filter ---------------------------------------------------------


def test_boilerplate_filter_flags_shared_segments(spark):
    from pagila_etl_airflow_assignment_spark.llm import text as text_mod

    header = "a b c d e f g h"  # one full 8-token segment, shared by 3 docs
    docs = spark.createDataFrame(
        [
            (1, header + " t1a t1b t1c t1d t1e t1f t1g t1h"),
            (2, header + " t2a t2b t2c t2d t2e t2f t2g t2h"),
            (3, header + " t3a t3b t3c t3d t3e t3f t3g t3h"),
            (4, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12 u13 u14 u15 u16"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text_mod.boilerplate_filter(docs, min_df=3).collect()}
    for d in (1, 2, 3):
        r = out[d]
        assert (r.n_segments, r.n_boiler_segments, r.kept_tokens) == (2, 1, 8)
        assert r.boiler_share_milli == 500
    r4 = out[4]
    assert (r4.n_boiler_segments, r4.kept_tokens, r4.boiler_share_milli) == (0, 16, 0)


# --- distinct-n diversity -------------------------------------------------------


def test_ngram_diversity_collapses_on_repetition(spark):
    from pagila_etl_airflow_assignment_spark.llm import corpus_stats as cs

    docs = spark.createDataFrame(
        [(1, "x x x x", "rep"), (2, "p q r s", "fresh")],
        "doc_id long, text string, source string",
    )
    out = {(r.source, r.n): r for r in cs.ngram_diversity(docs).collect()}
    assert out[("rep", 1)].total_ngrams == 4
    assert out[("rep", 1)].distinct_ngrams == 1
    assert out[("rep", 1)].diversity_milli == 250
    assert out[("rep", 2)].diversity_milli == 333  # (2000*1+3)//6
    assert out[("rep", 3)].diversity_milli == 500
    for n in (1, 2, 3):
        assert out[("fresh", n)].diversity_milli == 1000


# --- k-center coreset -----------------------------------------------------------


def test_kcenter_picks_farthest_first(spark):
    # 1-D points at 0, 1, 10, 30: greedy k-center from the min-id seed must
    # select 0 -> 30 -> 10 -> 1 with exactly-integer micro^2 radii
    vecs = _vecs(
        spark,
        [(1, [0.0], 0), (2, [1.0], 0), (3, [10.0], 0), (4, [30.0], 0)],
    )
    out = emb.kcenter_coreset(vecs, rounds=4).collect()
    assert [(r.sel_round, r.vec_id) for r in out] == [(1, 1), (2, 4), (3, 3), (4, 2)]
    assert [r.min_d2 for r in out] == [0, 900 * 10**12, 100 * 10**12, 10**12]


# --- linear classifier score ----------------------------------------------------


def test_classifier_score_matches_hand_hash(spark):
    import hashlib

    from pagila_etl_airflow_assignment_spark.llm import text as text_mod

    def w(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 2001

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "alpha beta")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in text_mod.classifier_scores(docs).collect()}
    assert out[1].logit_milli == w("alpha") - 1000
    ws = w("alpha") + w("beta")
    assert out[2].logit_milli == (2 * ws + 2) // 4 - 1000
    assert out[1].clf_keep == (out[1].logit_milli > 0)


# --- k-anonymity ----------------------------------------------------------------


def test_k_anonymity_generalization_levels(spark):
    from pagila_etl_airflow_assignment_spark.llm import text as text_mod

    rows = (
        [(i, "t", "en", "a") for i in range(6)]       # safe at full grain
        + [(10 + i, "t", "en", "b") for i in range(2)]  # safe only at lang grain
        + [(20 + i, "t", "xx", "c") for i in range(2)]  # unsafe everywhere
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {(r.lang, r.source): r for r in text_mod.k_anonymity(docs, k=5).collect()}
    assert out[("en", "a")].anonymity_level == 0
    assert out[("en", "a")].released_source == "a"
    assert out[("en", "b")].anonymity_level == 1
    assert out[("en", "b")].released_source == "*"
    assert out[("xx", "c")].anonymity_level == 2
    assert out[("xx", "c")].released_source == "*"


# --- first-occurrence span dedup ------------------------------------------------


def test_first_occurrence_keeps_earliest_copy(spark):
    from pagila_etl_airflow_assignment_spark.llm import text as text_mod

    seg_a = "a1 a2 a3 a4 a5 a6 a7 a8"
    seg_b = "b1 b2 b3 b4 b5 b6 b7 b8"
    seg_c = "c1 c2 c3 c4 c5 c6 c7 c8"
    docs = spark.createDataFrame(
        [(1, seg_a + " " + seg_b), (2, seg_a + " " + seg_c)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text_mod.first_occurrence_dedup(docs).collect()}
    assert (out[1].n_kept, out[1].retained_milli) == (2, 1000)  # owns both
    assert (out[2].n_kept, out[2].retained_milli) == (1, 500)   # seg_a deduped
    assert out[2].kept_tokens == 8


# --- BPE merge step -------------------------------------------------------------


def test_bpe_merge_step_weighted_pairs(spark):
    from pagila_etl_airflow_assignment_spark.llm import corpus_stats as cs

    docs = spark.createDataFrame(
        [(1, "ab ab ab cd cd x")], "doc_id long, text string"
    )
    out = cs.bpe_merge_step(docs).collect()
    assert (out[0].pair, out[0].n_occurrences) == ("a b", 3)
    assert (out[1].pair, out[1].n_occurrences) == ("c d", 2)
    assert len(out) == 2  # 'x' is single-char, contributes no pair


# --- label propagation ----------------------------------------------------------


def test_lpa_converges_on_clique_oscillates_on_pair(spark):
    # triangle {1,2,3} (each pair co-bought twice, passing min_support=2)
    # converges to community 1; isolated pair {7,8} is bipartite, where
    # synchronous LPA deterministically 2-cycles — after 3 rounds the labels
    # are swapped (the fixed round count pins this)
    rows = []
    for rep in range(2):
        rows += [(10 + rep, p) for p in (1, 2, 3)]
        rows += [(20 + rep, p) for p in (7, 8)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {r.p_partkey: r.community for r in graph.label_propagation(li).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert (out[7], out[8]) == (8, 7)


# --- filter agreement -----------------------------------------------------------


def test_filter_agreement_kappa_matches_python(spark):
    from pagila_etl_airflow_assignment_spark.llm import text as text_mod
    from pagila_etl_airflow_assignment_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    r = text_mod.filter_agreement(docs).collect()[0]
    a, b, c, d, n = r.both_keep, r.gopher_only, r.clf_only, r.both_drop, r.n_docs
    assert a + b + c + d == n
    assert r.agreement_milli == (2000 * (a + d) + n) // (2 * n)
    pe = (a + b) * (a + c) + (c + d) * (b + d)
    num, den = n * (a + d) - pe, n * n - pe
    if den > 0:
        sign = -1 if num < 0 else 1
        assert r.kappa_milli == sign * ((2000 * abs(num) + den) // (2 * den))


# --- cumulative unique users ----------------------------------------------------


def test_cumulative_unique_users_counts_first_seen(spark):
    from pagila_etl_airflow_assignment_spark.operators import analytics

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 100),
            (2, "2024-01-01 11:00:00", 101),
            (3, "2024-01-02 09:00:00", 100),   # returning, not new
            (4, "2024-01-02 10:00:00", 102),
        ],
        "event_id long, ts string, user_id long",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id")
    out = analytics.cumulative_unique_users(ev).collect()
    assert [(str(r.day), r.new_users, r.cumulative_users) for r in out] == [
        ("2024-01-01", 2, 2),
        ("2024-01-02", 1, 3),
    ]


# --- multimodal payload dedup ---------------------------------------------------


def test_payload_dedup_counts_bit_identical_copies(spark):
    from pagila_etl_airflow_assignment_spark.llm import multimodal

    docs = spark.createDataFrame(
        [(0, "same bytes", 10), (3, "same bytes", 10), (6, "other", 5), (1, "audio doc", 9)],
        "doc_id long, text string, n_chars long",
    )
    media = multimodal.media_from_documents(docs)
    out = {r.kind: r for r in multimodal.payload_dedup_stats(media).collect()}
    img = out["image"]  # doc_ids 0,3,6 -> two identical + one distinct
    assert (img.n_payloads, img.n_unique, img.n_dup_groups, img.n_redundant) == (3, 2, 1, 1)
    assert img.dup_share_milli == 333
    assert out["audio"].n_redundant == 0


# --- skew profile ---------------------------------------------------------------


def test_skew_profile_finds_hot_key(spark):
    from pagila_etl_airflow_assignment_spark.operators import profile

    df = spark.createDataFrame(
        [(7,)] * 90 + [(10 + i,) for i in range(10)], "k long"
    )
    r = profile.key_skew_profile([("t.k", df)]).collect()[0]
    assert (r.n_rows, r.n_keys, r.max_count, r.hottest_key) == (100, 11, 90, 7)
    assert r.max_share_milli == 900
    assert r.topk_share_milli == 990  # hot key + 9 singletons


# --- encoding advisor -----------------------------------------------------------


def test_encoding_advisor_rules(spark):
    from pagila_etl_airflow_assignment_spark.operators import profile

    df = spark.createDataFrame(
        [(i, i % 3, "flagA" if i % 2 else "flagB") for i in range(2000)],
        "uid long, small long, flag string",
    )
    out = {r.col_name: r for r in profile.encoding_advisor(df, ["uid", "small", "flag"]).collect()}
    assert out["uid"].encoding == "PLAIN" and out["uid"].n_distinct == 2000
    assert out["small"].encoding == "DICT" and out["small"].n_distinct == 3
    assert out["flag"].encoding == "DICT"
    assert out["flag"].avg_width_centi == 500  # 'flagA'/'flagB' are 5 chars


# --- z-order layout -------------------------------------------------------------


def test_zorder_buckets_bound_both_dimensions(spark):
    from pagila_etl_airflow_assignment_spark.operators import layout

    orders = spark.createDataFrame(
        [(i, i % 1000, f"1995-0{1 + i % 9}-15") for i in range(4000)],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).selectExpr("o_orderkey", "o_custkey", "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate")
    out = layout.zorder_layout_quality(orders).collect()
    assert sum(r.n_rows for r in out) == 4000
    # z-bucketing must bound BOTH dims strictly below the full domain on
    # average — the whole point vs a one-dimensional sort
    avg_cust = sum(r.cust_width_milli for r in out) / len(out)
    avg_day = sum(r.day_width_milli for r in out) / len(out)
    assert avg_cust < 600 and avg_day < 600
    assert all(0 <= r.cust_width_milli <= 1000 for r in out)


# --- bitmap intersections -------------------------------------------------------


def test_bitmap_intersections_exact_overlap(spark):
    from pagila_etl_airflow_assignment_spark.operators import bitmap

    rows = [(i, "click", 100 + i) for i in range(10)]          # users 100..109
    rows += [(50 + i, "view", 105 + i) for i in range(10)]     # users 105..114
    rows += [(99, "click", 100)]                               # dup event, same user
    ev = spark.createDataFrame(rows, "event_id long, event_type string, user_id long")
    r = bitmap.bitmap_intersections(ev).collect()[0]
    assert (r.type_a, r.type_b) == ("click", "view")
    assert (r.users_a, r.users_b, r.users_both) == (10, 10, 5)
    assert r.jaccard_milli == 333  # 5 / 15


# --- DoReMi step ----------------------------------------------------------------


def test_doremi_weights_normalize_and_rank_by_score(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i}a w{i}b", f"src{i % 3}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    out = sampling.doremi_step(docs).collect()
    assert abs(sum(r.weight_micro for r in out) - 1_000_000) <= len(out)
    by_score = sorted(out, key=lambda r: (-r.score_milli, r.source))
    by_weight = sorted(out, key=lambda r: (-r.weight_micro, r.source))
    assert [r.source for r in by_score] == [r.source for r in by_weight]
    assert sum(r.excess_milli for r in out) <= len(out)  # centred around avg


# --- Markov accuracy eval -------------------------------------------------------


def test_markov_accuracy_learns_deterministic_chain(spark):
    from pagila_etl_airflow_assignment_spark.operators import sequences

    # user 1 repeats a->b->a->b... across the whole span: the model learns
    # the swap in the first half and scores 100% on the second half
    rows = [
        (i, f"2024-01-01 {i:02d}:00:00", 1, "a" if i % 2 == 0 else "b")
        for i in range(20)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type")
    r = sequences.markov_accuracy(ev).collect()[0]
    assert r.n_train + r.n_test == 19
    assert r.accuracy_milli == 1000
    assert r.baseline_milli < 1000  # majority class is right only half the time


# --- MMR re-rank ----------------------------------------------------------------


def test_mmr_prefers_diverse_over_redundant(spark):
    # query q=[1,0]; c1=[0.9,0.1] and c3=[0.9,-0.1] are equally relevant on
    # opposite sides, c2=[0.9,0.11] is a near-duplicate of c1 with slightly
    # higher plain-cosine rank than nothing-else: top-k would emit (c1, c2);
    # MMR's redundancy penalty flips round 2 to the diverse c3
    vecs = _vecs(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [0.9, 0.11], 0),
            (3, [0.9, -0.1], 0),
        ],
    )
    out = similarity.mmr_rerank(vecs, 0, pool=3, k=2).collect()
    assert [(r.sel_round, r.vec_id) for r in out] == [(1, 1), (2, 3)]


# --- backfill planner -----------------------------------------------------------


def test_backfill_plan_chunks_cover_gap(spark):
    from pagila_etl_airflow_assignment_spark.incremental import backfill

    # 20-day span 01-01..01-21 (datediff=20) -> watermark at day 6 (01-07);
    # gap of 14 days -> two 7-day chunks
    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-21 00:00:00")],
        "event_id long, ts string",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts")
    out = backfill.backfill_plan(ev).collect()
    assert [(r.run_id, str(r.start_day), str(r.end_day), r.n_days) for r in out] == [
        (1, "2024-01-08", "2024-01-14", 7),
        (2, "2024-01-15", "2024-01-21", 7),
    ]


def test_backfill_plan_trailing_partial_chunk(spark):
    from pagila_etl_airflow_assignment_spark.incremental import backfill

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-11 00:00:00")],
        "event_id long, ts string",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts")
    out = backfill.backfill_plan(ev).collect()
    # span 10 days -> wm day 3 (01-04); gap 01-05..01-11 = 7 days: one chunk
    assert len(out) == 1 and out[0].n_days == 7
    assert str(out[0].end_day) == "2024-01-11"


# --- cluster silhouette ---------------------------------------------------------


def test_silhouette_separates_clean_clusters(spark):
    # two tight, well-separated clusters: margins strongly positive, no
    # vector closer to the foreign centroid
    vecs = _vecs(
        spark,
        [
            (1, [1.0, 0.0], 0),
            (2, [0.99, 0.05], 0),
            (3, [0.0, 1.0], 1),
            (4, [0.05, 0.99], 1),
            (5, [0.5, 0.52], 1),  # straddler: nearer its own centroid still
        ],
    )
    out = {r.label: r for r in emb.cluster_silhouette(vecs).collect()}
    assert out[0].n_negative == 0 and out[0].mean_margin_micro > 200_000
    assert out[1].n_vecs == 3
    assert out[1].n_negative == 0


# --- stopword discovery ---------------------------------------------------------


def test_stopword_discovery_per_lang_threshold(spark):
    from pagila_etl_airflow_assignment_spark.llm import corpus_stats as cs

    docs = spark.createDataFrame(
        [
            (1, "the cat", "en"), (2, "the dog", "en"), (3, "the bird", "en"),
            (4, "rare word", "en"),
            (5, "le chat", "fr"), (6, "le chien", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {(r.lang, r.term): r for r in cs.stopword_discovery(docs).collect()}
    assert ("en", "the") in out and out[("en", "the")].df_milli == 750
    assert ("fr", "le") in out and out[("fr", "le")].df_milli == 1000
    assert ("en", "cat") not in out  # df 1/4 = 250 < 600
    assert ("en", "le") not in out   # per-language lexicons


# --- PCA power iteration --------------------------------------------------------


def test_pca_finds_dominant_direction(spark):
    # data stretched along (1,1)/sqrt(2): the top component must align with
    # it (equal weight on both coords, same sign)
    import itertools

    pts = [(i, [float(c), float(c) + 0.01 * (i % 3 - 1)], 0)
           for i, c in enumerate(itertools.chain(range(-5, 0), range(1, 6)))]
    vecs = _vecs(spark, pts, dim=2)
    out = {r.pos: r.vm for r in emb.pca_power_iteration(vecs).collect()}
    assert set(out) == {1, 2}
    assert out[1] * out[2] > 0                      # same sign
    ratio = abs(out[1]) / abs(out[2])
    assert 0.9 < ratio < 1.1                        # near-equal loadings
    n = (out[1] ** 2 + out[2] ** 2) ** 0.5
    assert abs(n - 1_000_000) < 2_000               # unit micro norm


# --- day-of-week ANOVA ----------------------------------------------------------


def test_dow_anova_detects_group_shift(spark):
    from pagila_etl_airflow_assignment_spark.operators import stats

    rows = []
    eid = 0
    for day, base in (("2024-01-01", 10.0), ("2024-01-02", 10.0), ("2024-01-03", 50.0)):
        for j in range(20):
            rows.append((eid, f"{day} 0{j % 10}:00:00", base + (j % 5) * 0.5))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts string, value double") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    r = stats.dow_anova(ev).collect()[0]
    assert (r.k_groups, r.n_events) == (3, 60)
    assert r.f_stat > 100           # the shifted Wednesday dominates
    assert r.ss_between > r.ss_within


# --- BM25 -----------------------------------------------------------------------


def test_bm25_ranks_matching_docs_with_length_norm(spark):
    from pagila_etl_airflow_assignment_spark.llm import corpus_stats as cs

    # 'hot' is the only non-stopword frequent term ('the' appears in 100% of
    # docs -> stopword-filtered out of the query); the short doc mentioning
    # it must outrank the long one (length normalization), non-matching docs
    # don't appear
    docs = spark.createDataFrame(
        [
            (1, "the hot term"),
            (2, "the hot term " + " ".join(f"pad{i}" for i in range(40))),
            (3, "the unrelated text entirely"),
            (4, "the hot hot hot doc"),
            (5, "the filler alpha beta"),
            (6, "the filler gamma delta"),
        ],
        "doc_id long, text string",
    )
    out = cs.bm25_topk(docs, n_query_terms=1).collect()
    ids = [r.doc_id for r in out]
    assert set(ids) == {1, 2, 4}
    scores = {r.doc_id: r.bm25_micro for r in out}
    assert scores[4] > scores[1] > scores[2]  # tf saturation + length norm


# --- Kaplan-Meier ---------------------------------------------------------------


def test_kaplan_meier_steps_down_on_conversions(spark):
    from pagila_etl_airflow_assignment_spark.operators import analytics

    rows = []
    # 4 users sign up on day 0; users 1,2 convert day 1, user 3 converts day
    # 3, user 4 never converts (censored)
    for u in (1, 2, 3, 4):
        rows.append((u * 10, "2024-01-01 00:00:00", u, "signup", 0.0))
    rows += [
        (101, "2024-01-02 00:00:00", 1, "purchase", 1.0),
        (102, "2024-01-02 00:00:00", 2, "purchase", 1.0),
        (103, "2024-01-04 00:00:00", 3, "purchase", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type", "value")
    km = {r.day: r for r in analytics.kaplan_meier(ev).collect()}
    assert km[0].km_survival == 1.0
    assert km[1].km_survival == 0.5          # 2 of 4 convert
    assert km[2].km_survival == 0.5
    assert km[3].km_survival == 0.25         # 1 of remaining 2
    assert km[14].km_survival == 0.25        # censored user never converts


# --- price-volume-mix -----------------------------------------------------------


def test_pvm_effects_reconcile_exactly(spark):
    from pagila_etl_airflow_assignment_spark.operators import warehouse

    rows = [
        # Jan: part 1 sells 10 @ 2.00 (ext 20.00); part 2 sells 5 @ 4.00
        (1, 1, 10.0, 20.0, "2024-01-15 00:00:00"),
        (2, 2, 5.0, 20.0, "2024-01-20 00:00:00"),
        # Feb: part 1 sells 20 @ 3.00 (price AND volume up); part 2 dropped;
        # part 3 new with 7.00
        (3, 1, 20.0, 60.0, "2024-02-10 00:00:00"),
        (4, 3, 1.0, 7.0, "2024-02-11 00:00:00"),
    ]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double, l_extendedprice double, l_shipdate string"
    ).selectExpr("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
                 "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate")
    r = warehouse.price_volume_mix(li).collect()[0]
    assert str(r.month) == "2024-02-01"
    assert (r.rev_cents, r.prev_cents, r.delta_cents) == (6700, 4000, 2700)
    # part1: price (3-2)*20 = +2000c, volume (20-10)*2 = +2000c
    assert r.price_effect_cents == 2000
    assert r.volume_effect_cents == 2000
    assert (r.mix_in_cents, r.mix_out_cents) == (700, -2000)
    assert r.residual_cents == 0  # the bridge reconciles exactly


# --- forecast backtest ----------------------------------------------------------


def test_forecast_backtest_perfect_naive_on_constant_series(spark):
    from pagila_etl_airflow_assignment_spark.operators import analytics

    rows = [(d * 10 + j, f"2024-01-{d + 1:02d} 0{j}:00:00", 5.0)
            for d in range(10) for j in range(4)]
    ev = spark.createDataFrame(rows, "event_id long, ts string, value double") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    out = {r.method: r for r in analytics.forecast_backtest(ev).collect()}
    assert out["naive"].mae_cents == 0 and out["naive"].bias_cents == 0
    assert out["naive"].n_days == 9
    assert out["seasonal_naive"].n_days == 3  # only days 8..10 have a lag-7


# --- assortativity --------------------------------------------------------------


def test_assortativity_negative_on_star_graph(spark):
    from pagila_etl_airflow_assignment_spark.operators import graph as g

    # star: hub 1 co-purchased with 4 leaves (each pair twice for support):
    # every edge links degree-4 to degree-1 -> strongly negative r
    rows = []
    for rep in range(2):
        for leaf in (2, 3, 4, 5):
            rows += [(100 * leaf + rep, 1), (100 * leaf + rep, leaf)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    r = g.degree_assortativity(li).collect()[0]
    assert r.n_edges == 8
    assert r.assortativity == -1.0


# --- l-diversity ----------------------------------------------------------------


def test_l_diversity_flags_homogeneous_group(spark):
    from pagila_etl_airflow_assignment_spark.llm import text as text_mod

    rows = (
        [(i, "t", "en", "a", 50) for i in range(5)]             # all 'short'
        + [(10, "t", "en", "b", 50), (11, "t", "en", "b", 150),
           (12, "t", "en", "b", 250)]                            # 3 classes
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {(r.lang, r.source): r for r in text_mod.l_diversity(docs).collect()}
    assert out[("en", "a")].n_sensitive_values == 1
    assert not out[("en", "a")].l_diverse       # big but homogeneous: leaks
    assert out[("en", "b")].l_diverse


# --- power analysis -------------------------------------------------------------


def test_power_analysis_matches_closed_form(spark):
    import math

    from pagila_etl_airflow_assignment_spark.operators import stats

    vals = [10.0, 12.0, 8.0, 11.0, 9.0, 10.0] * 5
    rows = [(i, "2024-01-01 00:00:00", "buy", v) for i, v in enumerate(vals)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "event_type", "value")
    r = stats.power_analysis(ev).collect()[0]
    cents = [v * 100 for v in vals]
    m = sum(cents) / len(cents)
    var = sum((c - m) ** 2 for c in cents) / (len(cents) - 1)
    z = (1_959_964 + 841_621) / 1e6
    expect = math.ceil(2 * var * z * z / ((m * 0.05) ** 2))
    assert r.n_per_arm == expect
    assert r.mean_value == 10.0


# --- peak detection -------------------------------------------------------------


def test_daily_peaks_requires_prominence_both_sides(spark):
    from pagila_etl_airflow_assignment_spark.operators import analytics

    series = {1: 100.0, 2: 100.0, 3: 130.0, 4: 100.0, 5: 115.0, 6: 100.0}
    rows = [(d, f"2024-01-0{d} 00:00:00", v) for d, v in series.items()]
    ev = spark.createDataFrame(rows, "event_id long, ts string, value double") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    out = {str(r.day): r.is_peak for r in analytics.daily_peaks(ev).collect()}
    assert out["2024-01-03"] is True    # 130 >= 1.2 * 100 both sides
    assert out["2024-01-05"] is False   # 115 < 1.2 * 100
    assert out["2024-01-01"] is False   # boundary: no prev neighbor


# --- dedup pipeline funnel ------------------------------------------------------


def test_funnel_attributes_removals_per_stage(spark):
    near = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, near),
            (2, near),                      # exact duplicate of 1 (normalized)
            (3, near + " iota"),            # near-dup of 1 (high jaccard)
            (4, "совсем unrelated short"),  # unique, fails the quality gate
        ],
        "doc_id long, text string",
    )
    out = {r.stage: r for r in dedup.dedup_pipeline_funnel(docs).collect()}
    assert out[1].docs_remaining == 4
    assert (out[2].docs_remaining, out[2].removed) == (3, 1)   # doc 2 out
    assert (out[3].docs_remaining, out[3].removed) == (2, 1)   # doc 3 out
    assert out[4].docs_remaining == 0  # all remaining fail gopher min-words
    assert sum(r.removed for r in out.values()) == 4


# --- budget apportionment -------------------------------------------------------


def test_apportionment_sums_exactly_with_largest_remainder(spark):
    from pagila_etl_airflow_assignment_spark.operators import warehouse

    orders = spark.createDataFrame(
        [(1, 1, 10.0), (2, 2, 10.0), (3, 3, 10.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "c_custkey long, c_nationkey long"
    )
    nation = spark.createDataFrame(
        [(10, "A"), (20, "B"), (30, "C")], "n_nationkey long, n_name string"
    )
    out = warehouse.budget_apportionment(orders, customer, nation, budget_cents=100).collect()
    allocs = {r.n_name: r.alloc_cents for r in out}
    # 100/3: base 33 each, remainder cent goes to the smallest nation key
    assert sum(allocs.values()) == 100
    assert allocs == {"A": 34, "B": 33, "C": 33}


# --- Markov stationary ----------------------------------------------------------


def test_markov_stationary_on_two_state_chain(spark):
    from pagila_etl_airflow_assignment_spark.operators import sequences

    # a -> b always, b -> a always: stationary = 50/50 and uniform init is
    # already stationary; exact micro halves survive all 5 iterations
    rows = [(i, f"2024-01-01 {i:02d}:00:00", 1, "a" if i % 2 == 0 else "b")
            for i in range(10)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type")
    out = {r.event_type: r.pi_micro for r in sequences.markov_stationary(ev).collect()}
    assert out == {"a": 500_000, "b": 500_000}


# --- reorder points -------------------------------------------------------------


def test_reorder_point_formula(spark):
    import math

    from pagila_etl_airflow_assignment_spark.operators import warehouse

    # part 1 sells 10/day on 3 consecutive days (sigma 0): ROP = 70 exactly;
    # part 2 sells 5 then 15 (mu over the span, sigma sqrt(50))
    rows = [
        (1, 1, 10.0, "2024-01-01"), (2, 1, 10.0, "2024-01-02"), (3, 1, 10.0, "2024-01-03"),
        (4, 2, 5.0, "2024-01-01"), (5, 2, 15.0, "2024-01-03"),
    ]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity double, l_shipdate string"
    ).selectExpr("l_orderkey", "l_partkey", "l_quantity",
                 "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate")
    out = {r.p_partkey: r for r in warehouse.reorder_points(li).collect()}
    assert out[1].reorder_point_units == 70
    z, L = 1.644854, 7
    expect = math.ceil(20 / 3 * L + z * math.sqrt(50) * math.sqrt(L))
    assert out[2].reorder_point_units == expect
    assert out[2].demand_std == round(math.sqrt(50), 6)


# --- Holt level + trend ---------------------------------------------------------


def test_holt_tracks_linear_ramp(spark):
    from pagila_etl_airflow_assignment_spark.operators import analytics

    # perfectly linear daily series 10, 20, ..., 100: level approaches the
    # last value and the trend estimate is positive
    rows = [(d, f"2024-01-{d + 1:02d} 00:00:00", float((d + 1) * 10))
            for d in range(10)]
    ev = spark.createDataFrame(rows, "event_id long, ts string, value double") \
        .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    r = analytics.holt_level_trend(ev).collect()[0]
    assert r.n_days == 10
    assert r.trend_cents > 0
    assert 5000 < r.level_cents < 10000      # between mid and last (cents)
    assert r.forecast_next_cents == r.level_cents + r.trend_cents
    # pin one hand-computed step chain: y=[1000,2000] -> l=1300, t=60
    ev2 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10.0), (2, "2024-01-02 00:00:00", 20.0)],
        "event_id long, ts string, value double",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    r2 = analytics.holt_level_trend(ev2).collect()[0]
    assert (r2.level_cents, r2.trend_cents) == (1300, 60)


# --- ABC-XYZ matrix -------------------------------------------------------------


def test_abc_xyz_classes(spark):
    from pagila_etl_airflow_assignment_spark.operators import warehouse

    rows = []
    # revenue shares 40/30/15/10/5 across parts 1..5 -> cum 40,70 (A), 85,
    # 95 (B), 100 (C); part 1 has constant daily qty (X), part 5 erratic
    shares = {1: 400.0, 2: 300.0, 3: 150.0, 4: 100.0, 5: 50.0}
    for d in range(1, 11):
        for pk, price in shares.items():
            qty = 10.0 if pk != 5 else (1.0 if d % 2 else 20.0)
            rows.append((d * 10 + pk, pk, qty, price, 0.0, f"2024-01-{d:02d}"))
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_quantity double,"
        " l_extendedprice double, l_discount double, l_shipdate string",
    ).selectExpr("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount", "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate")
    out = {(r.abc, r.xyz): r for r in warehouse.abc_xyz_matrix(li).collect()}
    assert out[("A", "X")].n_parts == 2      # parts 1, 2: stable + cum<=80%
    assert out[("B", "X")].n_parts == 2      # parts 3, 4
    assert ("C", "Z") in out or ("C", "Y") in out  # erratic tail part 5
    assert sum(r.n_parts for r in out.values()) == 5
