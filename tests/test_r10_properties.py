"""Property tests for the round-10 devices: each Spark plan must equal a
direct Python reference of the same semantics on arbitrary inputs — the
device-level guarantee the DuckDB oracles then certify at corpus scale."""

from __future__ import annotations

import math

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F


def _rha(x: float) -> int:
    """Match Spark/DuckDB round(): half away from zero, not banker's."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


# --- outer-join IVM (L-468/L-469) --------------------------------------------------------
#
# Random right-side tables over a small key domain: orderkeys 1..60 so the
# %7 / %11 fixture mods populate every delta path (match insert/delete and
# both null flips); custkeys 1..6 with some customers receiving no orders.

IVM_ORDERS = st.lists(
    st.tuples(st.integers(1, 60), st.integers(1, 6)),  # (orderkey, custkey)
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[0],
)
IVM_CUSTS = st.sets(st.integers(1, 6), min_size=1, max_size=6)


def _ivm_tables(spark, custs, orders):
    cust = spark.createDataFrame(
        [(c, f"SEG{c % 3}") for c in sorted(custs)],
        "c_custkey long, c_mktsegment string",
    )
    if orders:
        odf = spark.createDataFrame(
            [
                (ok, ck, (ok * 37 % 1000) + 0.25, "1995-06-01 00:00:00")
                for ok, ck in orders
            ],
            "o_orderkey long, o_custkey long, o_totalprice double,"
            " o_orderdate string",
        )
    else:
        odf = spark.createDataFrame(
            [],
            "o_orderkey long, o_custkey long, o_totalprice double,"
            " o_orderdate string",
        )
    return cust, odf.withColumn("o_orderdate", F.to_timestamp("o_orderdate"))


def _final_left_join_ref(custs, orders):
    """Direct reference: final right state = inserts + (pre minus deletes);
    LEFT join against it."""
    b_final = [
        (ok, ck)
        for ok, ck in orders
        if ok % 7 == 0 or ok % 11 != 0  # insert batch, or survivor of deletes
    ]
    out = set()
    for c in custs:
        matches = [(ok, ck) for ok, ck in b_final if ck == c]
        if matches:
            for ok, _ in matches:
                out.add((c, f"SEG{c % 3}", ok, _rha(100 * ((ok * 37 % 1000) + 0.25)) / 100))
        else:
            out.add((c, f"SEG{c % 3}", None, None))
    return out


@settings(max_examples=12, deadline=None)
@given(custs=IVM_CUSTS, orders=IVM_ORDERS)
def test_outer_join_ivm_matches_direct_join(spark, custs, orders):
    from pagila_etl_airflow_assignment_spark.operators.ivm import (
        maintained_left_join_view,
    )

    # only orders whose custkey exists keep LEFT semantics interesting;
    # the generator may emit orphan custkeys — drop them as the fixture
    # (TPC-H FK integrity) guarantees none exist
    orders = [(ok, ck) for ok, ck in orders if ck in custs]
    cust, odf = _ivm_tables(spark, custs, orders)
    got = {
        (r.c_custkey, r.c_mktsegment, r.o_orderkey, r.order_total)
        for r in maintained_left_join_view(cust, odf).collect()
    }
    assert got == _final_left_join_ref(custs, orders)


@settings(max_examples=12, deadline=None)
@given(custs=IVM_CUSTS, orders=IVM_ORDERS)
def test_outer_join_delta_ledger_applies_to_view(spark, custs, orders):
    """Applying the ledger to the pre-delta view must yield exactly the
    maintained view: V0 minus retracts plus emits = V1 as multisets (all
    rows here are distinct, so set algebra suffices)."""
    from pagila_etl_airflow_assignment_spark.operators.ivm import (
        left_join_view_delta_ledger,
        maintained_left_join_view,
    )

    orders = [(ok, ck) for ok, ck in orders if ck in custs]
    cust, odf = _ivm_tables(spark, custs, orders)

    # pre-delta view, directly
    pre = [(ok, ck) for ok, ck in orders if ok % 7 != 0]
    v0 = set()
    for c in custs:
        matches = [ok for ok, ck in pre if ck == c]
        if matches:
            for ok in matches:
                v0.add((c, ok))
        else:
            v0.add((c, None))

    ledger = left_join_view_delta_ledger(cust, odf).collect()
    retracts = {
        (r.c_custkey, r.o_orderkey) for r in ledger if r.action == "retract"
    }
    emits = {(r.c_custkey, r.o_orderkey) for r in ledger if r.action == "emit"}
    assert retracts <= v0, "ledger retracts a row the view does not hold"
    assert not (emits & (v0 - retracts)), "ledger emits an already-live row"
    applied = (v0 - retracts) | emits

    v1 = {
        (r.c_custkey, r.o_orderkey)
        for r in maintained_left_join_view(cust, odf).collect()
    }
    assert applied == v1
