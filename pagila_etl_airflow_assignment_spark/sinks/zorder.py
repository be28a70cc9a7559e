"""Z-order (Morton-curve) clustered writes: multi-dimensional data skipping
on plain parquet.

`clustered_write` (maintenance.py) range-sorts on ONE leading column — row
groups then have tight min/max on that column but span the full range of
every other. Interleaving the bits of TWO dimensions' normalized ranks into
one sort key gives every row group a tight bounding box in BOTH dimensions,
so predicates on either column (or both) prune row groups — the layout trick
behind Delta/Databricks OPTIMIZE ZORDER, built here from plain expressions.

Scale shape: normalization uses a 1-row global min/max aggregate (broadcast
scalar, no window over the data), the z-value is pure JVM bit arithmetic,
and the write is `repartitionByRange(z)` + in-partition sort — one range
shuffle, the same cost as a single-column clustered write.

Two normalizations (``method=``):
- ``"minmax"`` (default): 1-row global min/max aggregate. Deterministic and
  cheap, but under value skew most rows collapse into a few curve cells —
  one outlier stretches the range so row-group boxes stay wide where the
  data actually lives.
- ``"quantile"``: `approx_percentile` rank buckets — equal-POPULATION cells,
  so skewed columns still spread evenly along the curve (what Delta's
  OPTIMIZE ZORDER does with range_partition_id). The boundary array is a
  broadcast scalar; per-row bucketing is an array fold over 2^bits - 1
  boundaries, so this path uses coarser QUANTILE_BITS (256 cells/dim —
  row-group pruning needs files-per-dimension resolution, not 65k cells).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits per dimension -> 32-bit interleaved key for 2 dims


def _normalize_to_bits(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map col into [0, 2^bits) by min/max normalization (constant-range
    guard: a constant column maps to 0)."""
    span = (hi.cast("double") - lo.cast("double"))
    frac = F.when(span > 0, (col.cast("double") - lo) / span).otherwise(F.lit(0.0))
    scaled = F.floor(frac * ((1 << bits) - 1)).cast("long")
    return F.greatest(F.lit(0), F.least(scaled, F.lit((1 << bits) - 1)))


def _interleave(a: Column, b: Column, bits: int) -> Column:
    """Morton interleave: bit i of `a` -> bit 2i+1, bit i of `b` -> bit 2i."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        parts.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return reduce(lambda x, y: x.bitwiseOR(y), parts)


QUANTILE_BITS = 8  # 256 equal-population cells per dimension
_PCTL_ACCURACY = 10_000


def _quantile_boundaries(col: str, bits: int) -> Column:
    """Interior approx-percentile boundaries (2^bits - 1 of them) for ``col``."""
    n = (1 << bits) - 1
    qs = F.array(*[F.lit((i + 1) / (n + 1)) for i in range(n)])
    return F.percentile_approx(F.col(col).cast("double"), qs, F.lit(_PCTL_ACCURACY))


def _bucket_by_boundaries(col: Column, boundaries: Column) -> Column:
    """Rank bucket of ``col``: how many boundaries are <= it (0..2^bits-1).
    An array fold over the broadcast boundary array — pure JVM, no shuffle."""
    return F.aggregate(
        boundaries,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.when(col.cast("double") >= b, 1).otherwise(0),
    )


def with_zorder_key(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int | None = None,
    method: str = "minmax",
) -> DataFrame:
    """Attach `__z`: the Morton key of the two columns' normalized ranks.
    The 1-row bounds/boundary aggregate joins back as a broadcast scalar.

    ``method="minmax"``: linear [min, max] scaling (deterministic; skew-weak).
    ``method="quantile"``: approx-percentile rank buckets (skew-robust)."""
    if method == "quantile":
        bits = QUANTILE_BITS if bits is None else bits
        bounds = df.agg(
            _quantile_boundaries(col_a, bits).alias("__a_q"),
            _quantile_boundaries(col_b, bits).alias("__b_q"),
        )
        j = df.crossJoin(F.broadcast(bounds))
        a = _bucket_by_boundaries(F.col(col_a), F.col("__a_q"))
        b = _bucket_by_boundaries(F.col(col_b), F.col("__b_q"))
        return j.withColumn("__z", _interleave(a, b, bits)).drop("__a_q", "__b_q")
    if method != "minmax":
        raise ValueError(f"unknown zorder normalization {method!r}")
    bits = Z_BITS if bits is None else bits
    bounds = df.agg(
        F.min(col_a).alias("__a_lo"),
        F.max(col_a).alias("__a_hi"),
        F.min(col_b).alias("__b_lo"),
        F.max(col_b).alias("__b_hi"),
    )
    j = df.crossJoin(F.broadcast(bounds))
    a = _normalize_to_bits(F.col(col_a), F.col("__a_lo"), F.col("__a_hi"), bits)
    b = _normalize_to_bits(F.col(col_b), F.col("__b_lo"), F.col("__b_hi"), bits)
    return j.withColumn("__z", _interleave(a, b, bits)).drop(
        "__a_lo", "__a_hi", "__b_lo", "__b_hi"
    )


def zordered_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int | None = None,
    method: str = "minmax",
) -> None:
    """Write `df` z-order-clustered on (col_a, col_b): range partition by the
    Morton key, sort within partitions, drop the key from the stored data."""
    (
        with_zorder_key(df, col_a, col_b, bits, method=method)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
