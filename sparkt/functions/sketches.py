"""Sketch / approximate aggregation operators.

At 100 TB, exact count-distinct over a high-cardinality key is a
full shuffle of every distinct value; the sketch form is a constant
few KB per group and — critically — MERGEABLE: per-partition /
per-day sketches union without re-reading history (Spark's
datasketches-backed ``hll_sketch_agg`` / ``hll_union_agg``). Same
story for quantiles (``percentile_approx``) and heavy hitters
(``count_min_sketch``).

All of these are deterministic for a fixed input dataset (the
sketches are hash-based, not sampled), so correctness gates can pin
"approx within ε of exact" as a stable boolean.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_distinct(col: str | Column, lg_k: int = 12) -> Column:
    """HyperLogLog distinct-count estimate (datasketches HLL_4;
    relative error ≈ 1.04/√2^lg_k ≈ 1.6% at lg_k=12)."""
    return F.hll_sketch_estimate(F.hll_sketch_agg(col, F.lit(lg_k)))


def hll_sketch(col: str | Column, lg_k: int = 12) -> Column:
    """The mergeable sketch itself (binary) — persist per
    partition/day, roll up later with ``hll_merge``."""
    return F.hll_sketch_agg(col, F.lit(lg_k))


def hll_merge(sketch_col: str | Column) -> Column:
    """Union previously materialized sketches (rollup path: daily
    sketches → monthly distinct counts with no raw-data re-scan)."""
    return F.hll_sketch_estimate(F.hll_union_agg(sketch_col))


def approx_quantile(col: str | Column, prob: float, accuracy: int = 10000) -> Column:
    """Greenwald-Khanna approximate quantile (error ≤ 1/accuracy of
    rank) — single-pass, mergeable, no sort."""
    return F.percentile_approx(col, prob, accuracy)


def approx_distinct_rollup(
    df: DataFrame,
    keys: list[str] | str,
    value_col: str,
    rollup_keys: list[str] | str | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Two-level sketch rollup: sketch per fine key, merge to coarse
    key — the plan shape for 'daily uniques AND monthly uniques from
    one scan'. Returns the coarse-level estimates."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if rollup_keys is None:
        rollup_keys = keys[:-1]
    rollup_keys = (
        [rollup_keys] if isinstance(rollup_keys, str) else list(rollup_keys)
    )
    fine = df.groupBy(*keys).agg(hll_sketch(value_col).alias("__sk"))
    if not rollup_keys:
        return fine.agg(hll_merge("__sk").alias("approx_distinct"))
    return fine.groupBy(*rollup_keys).agg(
        hll_merge("__sk").alias("approx_distinct")
    )
