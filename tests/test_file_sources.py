"""CSV / JSON-lines sources: schema enforcement + corrupt-row quarantine."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from pagila_etl_airflow_assignment_spark.sources.files import (
    read_csv,
    read_jsonl,
    split_quarantine,
)

SCHEMA = StructType(
    [
        StructField("id", IntegerType(), True),
        StructField("name", StringType(), True),
    ]
)


@pytest.fixture()
def tdir():
    with tempfile.TemporaryDirectory(prefix="files-") as d:
        yield d


def test_csv_roundtrip_and_quarantine(spark, tdir):
    p = f"{tdir}/in.csv"
    with open(p, "w") as f:
        f.write("id,name\n1,alice\nnot-an-int,bob\n3,carol\n")
    df = read_csv(spark, p, SCHEMA)
    clean, bad = split_quarantine(df)
    assert {(r["id"], r["name"]) for r in clean.collect()} == {
        (1, "alice"),
        (3, "carol"),
    }
    assert bad.count() == 1
    assert "not-an-int" in bad.first()["_corrupt_record"]


def test_jsonl_roundtrip_and_quarantine(spark, tdir):
    p = f"{tdir}/in.jsonl"
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "alice"}\n')
        f.write("this is not json\n")
        f.write('{"id": 3, "name": "carol"}\n')
    df = read_jsonl(spark, p, SCHEMA)
    clean, bad = split_quarantine(df)
    assert {(r["id"], r["name"]) for r in clean.collect()} == {
        (1, "alice"),
        (3, "carol"),
    }
    assert bad.count() == 1
