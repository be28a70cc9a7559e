"""End-to-end training-corpus preparation: the composed pipeline a pretraining
data team actually ships, as one CLI job over the `documents` table:

    python -m pagila_etl_airflow_assignment_spark.jobs.prepare_corpus \
        --source /root/testdata/sf0.001 --out /tmp/corpus [--show]

Stages (each an already-oracle-verified operator; this job is the composition):
  1. exact dedup          — keep one representative per content fingerprint
                            (llm.dedup.dedup_exact keep set, semi join);
  2. curation             — quality/lang/repetition/decontamination decision
                            (llm.curation.curation_decisions), keep=True only;
  3. split assignment     — content-stable md5 buckets -> train/val/test
                            (llm.sampling.split_assign); no row ever migrates
                            across splits on re-runs or appends;
  4. sequence packing     — fixed-capacity token packs per (lang, shard)
                            (llm.packing.pack_chunks), packed separately per
                            split so no pack straddles a split boundary.

Outputs: ``out/packed/split=<name>/`` parquet (partitioned by split) and a
single ``out/metrics.json`` with per-stage counts collected via observe()
on the SAME passes that do the work (no extra count jobs re-running the
pipeline).

Scale shape: stages 1-3 are doc_id/fingerprint-keyed (one shuffle each);
packing shards its running sum by (lang, shard). The composition introduces
NO new shuffle beyond its components — the split column is a narrow
projection and the partitioned write reuses packing's output partitioning.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import Observation
from pyspark.sql import functions as F

from ..llm.curation import curation_decisions
from ..llm.dedup import dedup_exact
from ..llm.packing import pack_chunks
from ..llm.sampling import split_assign
from ..session import build_session
from ..sources.parquet import load_table


def prepare_corpus(spark, source: str, out: str) -> dict:
    """Run the full preparation pipeline; returns the metrics dict."""
    docs = load_table(spark, source, "documents")

    keep_ids = dedup_exact(docs).select(F.col("keep_doc_id").alias("doc_id"))
    deduped = docs.join(keep_ids, "doc_id", "left_semi")

    decisions = curation_decisions(deduped)
    curated = deduped.join(
        decisions.where(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )

    splits = split_assign(curated).select("doc_id", "split")
    curated_split = curated.join(splits, "doc_id")

    obs = Observation("prepare_corpus_metrics")
    packed = pack_chunks(curated_split.drop("split")).join(
        splits.withColumnRenamed("doc_id", "doc_id"), "doc_id"
    )
    # observe() forbids DISTINCT aggregates; the chunk count rides the write,
    # exact distincts come from a cheap scan of the WRITTEN output (not a
    # pipeline recompute)
    (
        packed.observe(obs, F.count(F.lit(1)).alias("n_chunks"))
        .repartition("split")
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(f"{out}/packed")
    )
    written = spark.read.parquet(f"{out}/packed")
    pack_metrics = {
        "n_chunks": obs.get["n_chunks"],
        "n_docs_packed": written.select("doc_id").distinct().count(),
        "n_packs": written.select("split", "lang", "shard", "pack_id")
        .distinct()
        .count(),
    }

    # the cheap scalar stage counts (tiny aggregates over keyed relations)
    metrics = {
        "n_input_docs": docs.count(),
        "n_after_exact_dedup": deduped.count(),
        "n_after_curation": curated.count(),
        "split_counts": {
            r.split: r.n for r in splits.groupBy("split").agg(F.count("*").alias("n")).collect()
        },
        **{k: int(v) for k, v in pack_metrics.items()},
    }
    with open(f"{out}/metrics.json", "w") as fh:
        json.dump(metrics, fh, indent=1)
    return metrics


def main(argv: list[str] | None = None, stop_session: bool = True) -> int:
    p = argparse.ArgumentParser(description="Training-corpus preparation (Spark)")
    p.add_argument("--source", required=True, help="fixture dir with documents.parquet")
    p.add_argument("--out", required=True, help="output dir (packed/ + metrics.json)")
    p.add_argument("--show", action="store_true", help="print the metrics")
    args = p.parse_args(argv)

    import os

    os.makedirs(args.out, exist_ok=True)
    spark = build_session(app_name="prepare-corpus")
    metrics = prepare_corpus(spark, args.source, args.out)
    print(
        f"prepared: {metrics['n_after_curation']}/{metrics['n_input_docs']} docs "
        f"-> {metrics['n_packs']} packs ({metrics['n_chunks']} chunks) -> {args.out}/packed"
    )
    if args.show:
        print(json.dumps(metrics, indent=1))
    if stop_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    main()
