"""Unit tests for llm.corpus_stats on hand-computed fixtures: Gopher
repetition signals, vocabulary top-k with deterministic tie-break, and
benchmark decontamination (the sf0.01 oracle parity is covered by the
driver-contract check; these pin the semantics on crafted inputs)."""

from __future__ import annotations

import pytest

from pagila_etl_airflow_assignment_spark.llm import corpus_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_signals_hand_computed(spark):
    docs = _docs(
        spark,
        [
            # words: a a a b -> top word 3/4; 2-grams {a a: 2, a b: 1} -> dup 1/3;
            # 3-grams {a a a, a a b} all distinct -> dup 0
            (1, "a a a b"),
            # too short for any 3-gram: g3 stats must coalesce to 0.0
            (2, "x y"),
        ],
    )
    got = {r.doc_id: r for r in corpus_stats.repetition_signals(docs).collect()}
    assert got[1].n_words == 4
    assert got[1].top_word_frac == 0.75
    assert got[1].dup_2gram_frac == pytest.approx(1 / 3, abs=1e-6)
    assert got[1].dup_3gram_frac == 0.0
    assert got[2].n_words == 2
    assert got[2].top_word_frac == 0.5
    assert got[2].dup_2gram_frac == 0.0
    assert got[2].dup_3gram_frac == 0.0


def test_vocab_top_ngrams_counts_and_tiebreak(spark):
    docs = _docs(spark, [(1, "b a b"), (2, "a b")])
    rows = corpus_stats.vocab_top_ngrams(docs, k=2).collect()
    uni = sorted((r.term, r.cnt, r.rank) for r in rows if r.n == 1)
    bi = sorted((r.term, r.cnt, r.rank) for r in rows if r.n == 2)
    # unigrams: b appears 3x (rank 1), a 2x (rank 2)
    assert uni == [("a", 2, 2), ("b", 3, 1)]
    # bigrams WITH multiplicity: "a b" twice (doc1 pos2, doc2), "b a" once
    assert bi == [("a b", 2, 1), ("b a", 1, 2)]


def test_vocab_top_ngrams_tie_breaks_by_term(spark):
    docs = _docs(spark, [(1, "d c d c")])
    uni = {
        r.term: r.rank
        for r in corpus_stats.vocab_top_ngrams(docs, k=5).collect()
        if r.n == 1
    }
    # c and d both occur twice; term-asc tie-break must be deterministic
    assert uni == {"c": 1, "d": 2}


def test_vocab_top_ngrams_respects_k(spark):
    docs = _docs(spark, [(1, "a b c d e f g h")])
    rows = corpus_stats.vocab_top_ngrams(docs, k=3).collect()
    assert sum(1 for r in rows if r.n == 1) == 3
    assert sum(1 for r in rows if r.n == 2) == 3


def test_tfidf_hand_computed(spark):
    import math

    # 3 docs; "rare" appears only in doc 1, "common" in all three
    docs = _docs(spark, [(1, "common rare"), (2, "common"), (3, "common")])
    got = {(r.doc_id, r.term): r for r in corpus_stats.tfidf_topk(docs, k=5).collect()}
    assert got[(1, "rare")].tfidf == pytest.approx(math.log(3 / 1), abs=1e-6)
    assert got[(1, "common")].tfidf == pytest.approx(math.log(3 / 3), abs=1e-6)  # 0
    # rank within doc 1: rare (ln 3) before common (0)
    assert got[(1, "rare")].rank == 1
    assert got[(1, "common")].rank == 2
    assert got[(1, "rare")].tf == 1 and got[(1, "rare")].df == 1


def test_tfidf_weights_by_term_frequency(spark):
    import math

    docs = _docs(spark, [(1, "x x y"), (2, "y")])
    got = {(r.doc_id, r.term): r.tfidf for r in corpus_stats.tfidf_topk(docs).collect()}
    # tf=2 doubles the idf weight: x has df=1, tf=2 -> 2*ln(2)
    assert got[(1, "x")] == pytest.approx(2 * math.log(2), abs=1e-6)


def test_unigram_logprob_hand_computed(spark):
    import math

    # corpus: a a a b -> p(a)=3/4, p(b)=1/4
    docs = _docs(spark, [(1, "a a"), (2, "a b")])
    got = {r.doc_id: r for r in corpus_stats.unigram_logprob(docs).collect()}
    assert got[1].n_words == 2
    assert got[1].avg_neg_logprob == pytest.approx(-math.log(3 / 4), abs=1e-6)
    assert got[2].avg_neg_logprob == pytest.approx(
        (-math.log(3 / 4) - math.log(1 / 4)) / 2, abs=1e-6
    )


def test_curation_every_reject_branch_fires(spark):
    from pagila_etl_airflow_assignment_spark.llm import curation

    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over a lazy dog and runs away"),  # keep
            (2, "the quick brown fox jumps over a lazy dog and runs away"),  # dup of 1
            (3, "hi"),  # too short -> quality
            (4, "der die das und ist nicht ein eine zu mit sich auf"),  # German -> lang
            (5, "the spam the spam the spam the spam the spam the spam"),  # repetition
        ],
    )
    got = {r.doc_id: (r.keep, r.reject_reason) for r in
           curation.curation_decisions(docs).collect()}
    assert got[1] == (True, None)
    assert got[2] == (False, "exact_dup")
    assert got[3] == (False, "quality")
    assert got[4] == (False, "lang")
    assert got[5] == (False, "repetition")


def test_curation_filter_order_first_reason_wins(spark):
    """A doc failing several filters reports the FIRST (structural) one:
    a duplicate of a repetitive doc is 'exact_dup', not 'repetition'."""
    from pagila_etl_airflow_assignment_spark.llm import curation

    rep = "the spam the spam the spam the spam the spam the spam"
    docs = _docs(spark, [(1, rep), (2, rep)])
    got = {r.doc_id: r.reject_reason for r in
           curation.curation_decisions(docs).collect()}
    assert got[1] == "repetition"  # canonical copy falls through to repetition
    assert got[2] == "exact_dup"


def test_benchmark_overlap_flags_only_sharing_docs(spark):
    shared = "one two three four five"
    docs = _docs(
        spark,
        [
            (7, f"{shared} six"),  # bench (doc_id % 10 == 7)
            (17, shared),  # bench, single 5-gram
            (1, f"zzz {shared}"),  # shares the 5-gram with both bench docs
            (2, "nothing in common here at all"),
        ],
    )
    got = sorted(
        (r.doc_id, r.bench_doc_id, r.overlap_ngrams)
        for r in corpus_stats.benchmark_overlap(docs).collect()
    )
    assert got == [(1, 7, 1), (1, 17, 1)]


def test_benchmark_overlap_max_df_cap_drops_hot_shingle(spark):
    """A shingle above the posting-list cap must not produce pairs (skew
    guard): with max_df=2 a 5-gram shared by 3 corpus docs is dropped."""
    shared = "one two three four five"
    docs = _docs(
        spark,
        [(7, shared)] + [(i, f"{shared} tail{i}") for i in (1, 2, 3)],
    )
    with_cap = corpus_stats.benchmark_overlap(docs, max_df=2).collect()
    without = corpus_stats.benchmark_overlap(docs, max_df=100).collect()
    assert with_cap == []
    assert len(without) == 3
