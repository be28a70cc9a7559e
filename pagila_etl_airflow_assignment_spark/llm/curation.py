"""End-to-end corpus curation: the composed keep/reject decision.

Every individual signal in this package (fingerprints, quality scores,
language ID, repetition statistics) exists so a pipeline can DECIDE which
documents enter the training set. This module is that decision as one
DataFrame plan: per document, a boolean ``keep`` and the first failing
filter as ``reject_reason`` — the artifact a curation run actually ships,
and the lineage a data audit asks for ("why was doc X dropped?").

Filter order follows pipeline convention (cheap/structural before
statistical): exact-duplicate (non-canonical copies), quality gates,
language targeting, Gopher repetition limits. The thresholds are calibrated
to the synthetic fixtures (fixture docs are clean and unique, so the dup and
quality branches pass everything — unit tests exercise them with crafted
inputs); production values are Rae et al. 2021 Table A1's.

Scale shape: every component aggregates or projects keyed by doc_id (or by
term/fingerprint relations that are aggregates of aggregates), and the final
assembly is doc_id-equi-joins of per-doc single rows — co-partitioned after
the first shuffle, no data-sized fan-out anywhere. Composing the components
into ONE plan also lets Catalyst share the common `documents` scan across
branches rather than running four separate jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import corpus_stats, dedup, sampling, text

TARGET_LANGS = ("en",)
MAX_TOP_WORD_FRAC = 0.15
MAX_DUP_2GRAM_FRAC = 0.08


def curation_decisions(
    docs: DataFrame,
    target_langs: tuple[str, ...] = TARGET_LANGS,
    max_top_word_frac: float = MAX_TOP_WORD_FRAC,
    max_dup_2gram_frac: float = MAX_DUP_2GRAM_FRAC,
) -> DataFrame:
    """(doc_id, keep, reject_reason): first failing filter per document,
    NULL reason for kept documents."""
    fp = text.fingerprints(docs).select("doc_id", "fingerprint")
    canon = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("canonical_id"))
    dup = fp.join(canon, "fingerprint").select(
        "doc_id", (F.col("doc_id") != F.col("canonical_id")).alias("is_dup")
    )
    quality = text.quality_scores(docs).select(
        "doc_id", F.col("keep").alias("q_keep")
    )
    lang = text.lang_id(docs).select("doc_id", "pred_lang")
    rep = corpus_stats.repetition_signals(docs).select(
        "doc_id", "top_word_frac", "dup_2gram_frac"
    )
    reason = (
        F.when(F.col("is_dup"), F.lit("exact_dup"))
        .when(~F.col("q_keep"), F.lit("quality"))
        .when(~F.col("pred_lang").isin(*target_langs), F.lit("lang"))
        .when(
            (F.col("top_word_frac") > max_top_word_frac)
            | (F.col("dup_2gram_frac") > max_dup_2gram_frac),
            F.lit("repetition"),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        docs.select("doc_id")
        .join(dup, "doc_id")
        .join(quality, "doc_id")
        .join(lang, "doc_id")
        .join(rep, "doc_id")
        .select("doc_id", reason.alias("reject_reason"))
        .select("doc_id", F.col("reject_reason").isNull().alias("keep"), "reject_reason")
    )


def curation_decisions_sql(
    target_langs: tuple[str, ...] = TARGET_LANGS,
    max_top_word_frac: float = MAX_TOP_WORD_FRAC,
    max_dup_2gram_frac: float = MAX_DUP_2GRAM_FRAC,
    docs_rel: str = "documents",
) -> str:
    langs = ", ".join(f"'{l}'" for l in target_langs)
    reason = f"""CASE
               WHEN dup.is_dup THEN 'exact_dup'
               WHEN NOT q.keep THEN 'quality'
               WHEN lang.pred_lang NOT IN ({langs}) THEN 'lang'
               WHEN rep.top_word_frac > {max_top_word_frac}
                 OR rep.dup_2gram_frac > {max_dup_2gram_frac} THEN 'repetition'
               ELSE NULL END"""
    return f"""
        WITH fp AS ({text.FINGERPRINTS_SQL}),
             canon AS (SELECT fingerprint, MIN(doc_id) AS canonical_id
                       FROM fp GROUP BY fingerprint),
             dup AS (SELECT doc_id, doc_id <> canonical_id AS is_dup
                     FROM fp JOIN canon USING (fingerprint)),
             q AS ({text.QUALITY_SCORES_SQL}),
             lang AS ({text.LANG_ID_SQL}),
             rep AS ({corpus_stats.repetition_signals_sql(docs_rel)})
        SELECT d.doc_id,
               ({reason}) IS NULL AS keep,
               {reason} AS reject_reason
        FROM {docs_rel} d
        JOIN dup USING (doc_id)
        JOIN q USING (doc_id)
        JOIN lang USING (doc_id)
        JOIN rep USING (doc_id)
    """

# --- per-source curation scorecard ---------------------------------------------


def source_scorecard(docs: DataFrame) -> DataFrame:
    """Domain-level curation scorecard: per source, the keep rate, exact-dup
    rate and dominant language — (source, n_docs, n_kept, keep_milli,
    n_exact_dup, top_lang, top_lang_milli).

    The CCNet/RefinedWeb "domain filtering" step: individual documents are
    scored elsewhere, but the SHIP/DROP decision at crawl scale is made per
    source/domain, because a domain whose documents are mostly duplicates or
    mostly rejected is cheaper to drop wholesale than to filter row by row.
    All rates are integer mills so no float crosses the engine boundary.

    Scale shape: the expensive inputs (curation decisions, language ID) are
    the existing per-doc plans; this adds one source-keyed aggregate and a
    rank-1 window over the (source, lang) count relation — both bounded by
    |sources| x |langs|, never data-sized.
    """
    decisions = curation_decisions(docs).select("doc_id", "keep", "reject_reason")
    lang = text.lang_id(docs).select("doc_id", "pred_lang")
    base = (
        docs.select("doc_id", "source")
        .join(decisions, "doc_id")
        .join(lang, "doc_id")
    )
    per_source = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        # NULL reject_reason (kept docs) must count as 0, not poison the
        # sum: an all-kept source would otherwise emit NULL
        F.sum(
            F.when(F.col("reject_reason") == "exact_dup", 1).otherwise(0)
        ).cast("long").alias("n_exact_dup"),
    )
    lang_counts = base.groupBy("source", "pred_lang").agg(
        F.count("*").alias("lang_cnt")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("lang_cnt").desc(), F.col("pred_lang").asc()
    )
    top_lang = (
        lang_counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("source", F.col("pred_lang").alias("top_lang"), "lang_cnt")
    )
    return (
        per_source.join(top_lang, "source")
        .select(
            "source",
            "n_docs",
            "n_kept",
            F.expr("n_kept * 1000 div n_docs").cast("long").alias("keep_milli"),
            "n_exact_dup",
            "top_lang",
            F.expr("lang_cnt * 1000 div n_docs").cast("long").alias("top_lang_milli"),
        )
        .orderBy("source")
    )


def source_scorecard_sql(docs_rel: str = "documents") -> str:
    return f"""
        WITH decisions AS ({curation_decisions_sql(docs_rel=docs_rel)}),
             lang AS ({text.LANG_ID_SQL}),
             base AS (
                 SELECT d.doc_id, d.source, dec.keep, dec.reject_reason,
                        lang.pred_lang
                 FROM {docs_rel} d
                 JOIN decisions dec USING (doc_id)
                 JOIN lang USING (doc_id)
             ),
             per_source AS (
                 SELECT source,
                        CAST(COUNT(*) AS BIGINT) AS n_docs,
                        CAST(SUM(CAST(keep AS INT)) AS BIGINT) AS n_kept,
                        CAST(SUM(CASE WHEN reject_reason = 'exact_dup'
                                      THEN 1 ELSE 0 END) AS BIGINT)
                            AS n_exact_dup
                 FROM base GROUP BY source
             ),
             lang_counts AS (
                 SELECT source, pred_lang, COUNT(*) AS lang_cnt,
                        ROW_NUMBER() OVER (
                            PARTITION BY source
                            ORDER BY COUNT(*) DESC, pred_lang ASC
                        ) AS rk
                 FROM base GROUP BY source, pred_lang
             )
        SELECT p.source, n_docs, n_kept,
               n_kept * 1000 // n_docs AS keep_milli,
               n_exact_dup,
               l.pred_lang AS top_lang,
               l.lang_cnt * 1000 // n_docs AS top_lang_milli
        FROM per_source p
        JOIN lang_counts l ON p.source = l.source AND l.rk = 1
        ORDER BY p.source
    """


# --- train/test split leakage audit ----------------------------------------------


def split_leakage_audit(docs: DataFrame) -> DataFrame:
    """Near-duplicate pairs crossing the train/val/test boundary:
    (split_lo, split_hi, n_pairs, is_leak).

    THE eval-integrity audit: a held-out document with a near-duplicate in
    train is contamination — the model has effectively seen the answer. The
    near-dup relation is the MinHash-LSH verified pair set (the production
    dedup path, not all-pairs); splits are the content-stable md5 buckets of
    ``sampling.split_assign``, so the audit is deterministic end to end.
    ``is_leak`` marks cross-split rows; same-split rows are the baseline the
    leak counts are read against.

    Scale shape: adds two doc_id-keyed equi-joins and one tiny (≤ |splits|²)
    aggregate on top of the LSH pair pipeline, which carries its own
    hot-bucket caps. Nothing here is data-sized beyond the pair relation.
    """
    pairs = dedup.minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    splits = sampling.split_assign(docs).select("doc_id", "split")
    labeled = (
        pairs.join(
            splits.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
                "split", "split_a"
            ),
            "doc_a",
        )
        .join(
            splits.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "split", "split_b"
            ),
            "doc_b",
        )
        .select(
            F.least("split_a", "split_b").alias("split_lo"),
            F.greatest("split_a", "split_b").alias("split_hi"),
        )
    )
    return (
        labeled.groupBy("split_lo", "split_hi")
        .agg(F.count("*").alias("n_pairs"))
        .select(
            "split_lo",
            "split_hi",
            "n_pairs",
            (F.col("split_lo") != F.col("split_hi")).alias("is_leak"),
        )
        .orderBy("split_lo", "split_hi")
    )


def split_leakage_audit_sql(docs_rel: str = "documents") -> str:
    return f"""
        WITH pairs AS ({dedup.minhash_lsh_pairs_sql()}),
             splits AS ({sampling.split_assign_sql(rel=docs_rel)}),
             labeled AS (
                 SELECT LEAST(sa.split, sb.split) AS split_lo,
                        GREATEST(sa.split, sb.split) AS split_hi
                 FROM pairs p
                 JOIN splits sa ON p.doc_a = sa.doc_id
                 JOIN splits sb ON p.doc_b = sb.doc_id
             )
        SELECT split_lo, split_hi,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               split_lo <> split_hi AS is_leak
        FROM labeled
        GROUP BY split_lo, split_hi
        ORDER BY split_lo, split_hi
    """
