"""CLI entry point for the corpus-curation pipeline:

    python -m pagila_etl_airflow_assignment_spark.jobs.curate \
        --source /root/testdata/sf0.001 --out /tmp/curated [--show]

Runs the composed curation decision (dedup -> quality -> lang -> repetition
lineage, llm/curation.py) over the documents table, writes kept documents to
``--out/kept`` and the full per-document decision (keep flag + first failing
filter) to ``--out/decisions`` — the second dual-entry job beside
jobs/weekly_summary.py, so the training-data surface is runnable without any
orchestration.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F

from ..llm.curation import curation_decisions
from ..session import build_session
from ..sources.parquet import load_table


def main(argv: list[str] | None = None, stop_session: bool = True) -> int:
    p = argparse.ArgumentParser(description="Corpus curation pipeline (Spark)")
    p.add_argument("--source", required=True, help="fixture dir containing documents.parquet")
    p.add_argument("--out", required=True, help="output dir (kept/ + decisions/)")
    p.add_argument("--show", action="store_true", help="show decision counts")
    args = p.parse_args(argv)

    from pyspark.sql import Observation

    spark = build_session(app_name="curation-job")
    docs = load_table(spark, args.source, "documents")
    decisions = curation_decisions(docs)
    # observe(): pipeline telemetry from the SAME pass as the write — the
    # in/kept counts ride the write job as accumulator-style metrics instead
    # of two extra count() jobs re-running the curation plan afterwards.
    obs = Observation("curation_metrics")
    (
        decisions.observe(
            obs,
            F.count(F.lit(1)).alias("n_in"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
        .write.mode("overwrite")
        .parquet(f"{args.out}/decisions")
    )
    metrics = obs.get
    # semi-join against the WRITTEN decisions so the curation plan is not
    # recomputed for the kept-documents write
    kept = docs.join(
        spark.read.parquet(f"{args.out}/decisions")
        .where(F.col("keep"))
        .select("doc_id"),
        "doc_id",
        "left_semi",
    )
    kept.write.mode("overwrite").parquet(f"{args.out}/kept")
    print(
        f"curated: {metrics['n_kept']}/{metrics['n_in']} documents kept -> {args.out}/kept"
    )
    if args.show:
        spark.read.parquet(f"{args.out}/decisions").groupBy(
            "keep", "reject_reason"
        ).count().orderBy("keep", "reject_reason").show(truncate=False)
    if stop_session:  # embedding callers (tests, notebooks) keep their session
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
