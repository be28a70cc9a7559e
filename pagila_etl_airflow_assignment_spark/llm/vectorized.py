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

        # ONE numpy reduction per Arrow batch: stack the fixed-dim vectors
        # into a 2-D matrix and reduce along axis 1 — no per-row Python
        if not len(embs):
            return pd.Series([], dtype="float64")
        mat = np.stack(embs.to_numpy()).astype("float64", copy=False)
        return pd.Series(np.sqrt((mat * mat).sum(axis=1)), index=embs.index)

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


# --- grouped-aggregate pandas_udf (Arrow UDAF) --------------------------------


def _median_agg():
    # lazy for the same DDL-parse reason as _l2_norm_vec
    @pandas_udf("double")
    def udf(values: pd.Series) -> float:
        import numpy as np

        # materialize the group as one float64 ndarray (no object-dtype
        # pandas reduction) before the numpy median
        v = values.dropna().to_numpy(dtype="float64")
        return float(np.median(v)) if v.size else None

    return udf


def median_value_by_type(events: DataFrame) -> DataFrame:
    """Per-event-type median via a GROUPED_AGG pandas_udf — the Arrow UDAF
    extension point (each group's column arrives as one pandas Series; the
    return is a scalar). Completes the sanctioned Python-boundary taxonomy:
    scalar pandas_udf (vector_norms), grouped-agg (this), mapInPandas
    (multimodal), applyInPandasWithState / transformWithStateInPandas
    (streaming).

    A median IS expressible JVM-side (percentile), which is exactly why it's
    the demo: the oracle pins the Python path to the built-in's semantics,
    so when a real non-SQL aggregate (a sklearn scorer, a calibration fit)
    replaces the body, the harness shape is already proven. Scale caveat
    (why built-ins stay the default): a grouped-agg UDF materializes each
    whole group in one worker's memory — fine for bounded groups
    (|event types| here), wrong for data-sized ones; percentile_approx is
    the mergeable at-scale form."""
    return (
        events.groupBy("event_type")
        .agg(F.round(_median_agg()(F.col("value")), 6).alias("median_value"))
        .orderBy("event_type")
    )


MEDIAN_VALUE_BY_TYPE_SQL = """
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS median_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
"""
