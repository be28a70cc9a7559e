"""Vectorized (Arrow scalar) pandas_udf demonstration: embedding L2 norms.

The engine's rule is JVM-first — every production path uses built-in
expressions (`_l2norm` in dedup.py is an aggregate fold). This module is the
sanctioned pattern for when Python IS unavoidable (a numpy/torch scoring
model, a tokenizer): a `@pandas_udf` scalar function receives Arrow-backed
pandas Series in column batches — no per-row Python, no pickle per value —
and `vector_norms` is registered with an oracle plus a parity test against
the JVM expression, so the boundary cost is paid knowingly and the semantics
are pinned.

Scale: Arrow batch transfer amortizes the Python boundary to ~free per row;
the udf is still outside whole-stage codegen, so the JVM fold remains the
default for anything this simple. Batch size rides
`spark.sql.execution.arrow.maxRecordsPerBatch`.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _l2_norm_vec():
    # built lazily — @pandas_udf parses its DDL return type against the
    # active SparkContext, and this module is imported at registry load
    # (before any session exists in test collection)
    @pandas_udf("double")
    def udf(embs: pd.Series) -> pd.Series:
        import numpy as np

        # one vectorized numpy reduction per Arrow batch
        return embs.map(
            lambda v: float(np.sqrt(np.sum(np.asarray(v, dtype="float64") ** 2)))
        )

    return udf


def vector_norms(embeddings: DataFrame) -> DataFrame:
    """(vec_id, label, norm) via the Arrow-batched pandas_udf."""
    return embeddings.select(
        "vec_id",
        "label",
        F.round(_l2_norm_vec()("embedding"), 6).alias("norm"),
    ).orderBy("vec_id")


VECTOR_NORMS_SQL = """
    SELECT vec_id, label,
           round(sqrt(list_inner_product(embedding::DOUBLE[],
                                         embedding::DOUBLE[])), 6) AS norm
    FROM embeddings
    ORDER BY vec_id
"""
