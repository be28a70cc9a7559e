"""Generate QUERIES.md: one row per registered query — survey rows, oracle
status, and the first docstring line — straight from the live registry so the
catalog can't drift from the code.

Usage: python tools/gen_query_catalog.py > QUERIES.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pagila_etl_airflow_assignment_spark import registry


def main() -> None:
    registry._load_all()
    print("# Query catalog (generated — tools/gen_query_catalog.py)")
    print()
    print(
        f"{len(registry._REGISTRY)} registered queries; every one with an"
        " `oracle` runs against DuckDB in the driver's correctness gate and"
        " `tools/verify_local.py`."
    )
    print()
    print("| query | survey rows | oracle | what it does |")
    print("|---|---|---|---|")
    for name in sorted(registry._REGISTRY):
        e = registry._REGISTRY[name]
        doc = (e.fn.__doc__ or "").strip().splitlines()
        desc = doc[0].rstrip() if doc else ""
        rows = ", ".join(e.survey_rows) or "—"
        oracle = "DuckDB" if e.oracle else "rows-only"
        print(f"| `{name}` | {rows} | {oracle} | {desc} |")


if __name__ == "__main__":
    main()
