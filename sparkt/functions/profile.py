"""Data profiling: per-column corpus statistics in one scan.

The "know your data" step every large-scale pipeline runs before
training (and the stats half of a dbt-style catalog: the reference
feeds warehouse column stats into ``docs generate``'s catalog.json —
``/root/reference/core/dbt/task/docs/generate.py`` consumes per-column
metadata the same shape this emits).

Scale design: ONE aggregate pass over the table computing every
column's null count, distinct count and min/max simultaneously; the
result is a single wide row exploded into long format on the driver
side of the plan (constant-size). The only scale knob is distinct
counting: exact ``count(distinct)`` makes Catalyst expand each input
row once per profiled column (k× shuffle volume) — fine for gate-scale
verification, wrong at 100 TB, where ``approx=True`` switches to
HyperLogLog++ (``approx_count_distinct``), a single non-expanded pass
with mergeable sketches. The oracle gate runs exact; the approx path
is pinned by pytest within HLL error bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in one aggregate
    pass. Returns long format, one row per column:

      ``column, n_rows, n_nulls, n_distinct, min_value, max_value``

    min/max are computed on the NATIVE type (numeric min, not
    lexicographic) and cast to string afterwards so the output schema
    is uniform across column types. ``approx=True`` is the 100 TB
    path: HLL++ distinct counts (±~2.3%), no per-column row expansion.
    """
    cols = list(columns) if columns else list(df.columns)
    nd = (
        (lambda c: F.approx_count_distinct(c)) if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls__{c}"),
            nd(c).alias(f"__nd__{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min__{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max__{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nulls__{c}").alias("n_nulls"),
            F.col(f"__nd__{c}").alias("n_distinct"),
            F.col(f"__min__{c}").alias("min_value"),
            F.col(f"__max__{c}").alias("max_value"),
        )
        for c in cols
    ])
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
