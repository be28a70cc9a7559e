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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import corpus_stats, text

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
