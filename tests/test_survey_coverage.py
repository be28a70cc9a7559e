"""Every SURVEY.md §2/§4 inventory row must be claimed by a registered query
(survey_rows) or an explicit module mapping (registry.MODULE_COVERAGE)."""

from __future__ import annotations

import re
from pathlib import Path

from pagila_etl_airflow_assignment_spark import registry


def test_every_survey_row_is_covered():
    registry._load_all()
    covered = set(registry.MODULE_COVERAGE)
    for entry in registry._REGISTRY.values():
        covered.update(entry.survey_rows)
    text = Path(__file__).resolve().parent.parent.joinpath("SURVEY.md").read_text()
    rows = set(re.findall(r"^\| ([A-L]-\d+) \|", text, re.M))
    rows |= set(re.findall(r"^\| (O-\d+) \|", text, re.M))
    assert rows, "SURVEY.md inventory rows not found"
    missing = sorted(rows - covered)
    assert not missing, f"SURVEY rows with no query or module claim: {missing}"


def test_extension_rows_reference_real_queries():
    registry._load_all()
    unknown = sorted(set(registry.EXTENSION_SURVEY_ROWS) - set(registry._REGISTRY))
    assert not unknown, f"EXTENSION_SURVEY_ROWS names not registered: {unknown}"


def test_every_query_name_is_unique_and_callable():
    qs = registry.queries()
    assert len(qs) >= 30
    for name, fn in qs.items():
        assert callable(fn), name


def test_query_catalog_is_fresh():
    """QUERIES.md is generated (tools/gen_query_catalog.py); its headline
    count and row set must match the live registry, so a round cannot close
    with a stale catalog."""
    qs = registry.queries()
    text = Path(__file__).resolve().parent.parent.joinpath("QUERIES.md").read_text()
    m = re.search(r"^(\d+) registered queries", text, re.M)
    assert m, "QUERIES.md missing the generated count line"
    assert int(m.group(1)) == len(qs), (
        f"QUERIES.md says {m.group(1)} queries but registry has {len(qs)}; "
        "re-run: python tools/gen_query_catalog.py > QUERIES.md"
    )
    catalog_names = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, re.M))
    assert catalog_names == set(qs), (
        "QUERIES.md rows diverge from the registry; re-run "
        "tools/gen_query_catalog.py"
    )


def test_duplicate_registration_raises():
    """A duplicate register() name must fail at decoration time — silent
    dict overwrite shadowed two operators before this guard existed."""
    import pytest as _pytest

    from pagila_etl_airflow_assignment_spark import registry

    registry.queries()  # force _load_all
    with _pytest.raises(ValueError, match="duplicate query registration"):
        registry.register("dedup_exact")(lambda spark, sf: None)
