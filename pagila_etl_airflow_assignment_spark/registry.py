"""Query registry: the driver-facing catalog of every implemented operator.

Each entry pairs a PySpark pipeline ``(spark, sf_dir) -> DataFrame`` with (where
SQL-expressible) an ANSI-SQL oracle string DuckDB runs on the same parquet
fixtures. ``__spark_entry__.py`` re-exports this. Keys are stable names mapping
onto SURVEY.md §2 inventory rows (prefix = inventory row id).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryEntry:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    survey_rows: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QueryEntry] = {}


def register(name: str, oracle: str | None = None, survey_rows: tuple[str, ...] = ()):
    def deco(fn):
        _REGISTRY[name] = QueryEntry(fn=fn, oracle=oracle, survey_rows=survey_rows)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {k: v.fn for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {k: v.oracle for k, v in _REGISTRY.items() if v.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (import side effects)."""
    global _LOADED
    if _LOADED:
        return
    from . import queries as _q  # noqa: F401
    from .llm import queries as _lq  # noqa: F401
    from .streaming import queries as _sq  # noqa: F401

    _LOADED = True
