"""Headline benchmark: runs the engine's flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced with a cheap count()-style action so timing covers the full
plan execution, not DataFrame construction.

Warm-up protocol (round 7): every query is executed SPARK_GRAFT_BENCH_REPS
times (default 2) and the reported timing is the MIN across reps — the first
execution pays one-off costs (codegen compilation, Arrow/pandas worker spin-up,
parquet footer reads, machine contention spikes) that say nothing about the
plan. Four of round 6's >1.5x apparent regressions were exactly this class of
noise (re-measured warm back to their r5 medians). All reps are recorded in
BENCH_DETAIL.json under "queries_reps" for auditability.

The stdout JSON line must stay SHORT: the round driver captures only the tail
few KB of stdout, and round 3's ~3.4 KB line (81 per-query timings) got its head
truncated, leaving BENCH_r03.json unparseable. So stdout carries the totals plus
the 20 slowest per-query timings only; the full per-query map is written to
BENCH_DETAIL.json next to this file.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pagila_etl_airflow_assignment_spark.session import (
    build_session,
    release_session_state as _release_session_state,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Bench set (round 10): the FULL registry, so every registered query carries a
# recorded per-round floor — the round-9 judge flagged 87 silently-unpriced
# queries under the old fixed-HEADLINE + prefix scheme (a regression in any of
# them would not show in any BENCH artifact). Exclusions must be explicit AND
# justified here; there are currently none — the full registry runs clean at
# sf0.1 (the round-9 519-query bare sweep plus per-addition verification).
#
# Inter-query hygiene lives in session.release_session_state (round 11: one
# shared implementation for bench.py and tools/opt_probe.py, extended to also
# GC the JVM so the ContextCleaner drops broadcast blocks and shuffle files
# between queries — the round-10 residual in-bench-vs-isolated divergence).
# It runs BETWEEN queries, never inside a timed rep; nothing is cached,
# precomputed or reused across queries.
EXCLUDED: dict[str, str] = {}


def main() -> None:
    from pagila_etl_airflow_assignment_spark.registry import queries

    spark = build_session(app_name="engine-bench")
    qmap = queries()
    names = [n for n in qmap if n not in EXCLUDED]

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    # warm the JVM + parquet footer cache once with the cheapest plan
    qmap[names[0]](spark, SF_DIR).limit(1).collect()

    t_total0 = time.perf_counter()
    for name in names:
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = qmap[name](spark, SF_DIR)
            n = df.count()
            runs.append(round(time.perf_counter() - t0, 3))
        all_reps[name] = runs
        timings[name] = min(runs)
        print(f"# {name}: {timings[name]}s min of {runs} ({n} rows)", file=sys.stderr)
        _release_session_state(spark)
    wall = round(time.perf_counter() - t_total0, 3)
    # headline total = sum of per-query minima (the warm, plan-attributable
    # cost), comparable across rounds regardless of the reps setting
    total = round(sum(timings.values()), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_reps": all_reps,
        "reps": reps,
        "wall_sec": wall,
        "queries_run": len(names),
        "sf": sf_val,
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)
    # Compact stdout line (driver-parsed; must fit a small tail buffer): totals
    # plus the 20 slowest per-query timings — the r3 artifact lost its head at
    # ~3.4 KB and the full headline map is back above 2 KB, so stdout stays
    # bounded regardless of registry growth. Full map: BENCH_DETAIL.json.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:20])
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "queries_run": len(names),
                "reps": reps,
                "sf": sf_val,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
