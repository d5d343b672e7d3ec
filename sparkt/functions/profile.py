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


def profile_values(
    df: DataFrame,
    columns: list[str] | None = None,
    top_k: int = 3,
) -> DataFrame:
    """Per-column frequent-value profile — the value-distribution half
    of :func:`profile_table` (what a catalog's "common values" panel
    and a skew-aware planner both want): the ``top_k`` most frequent
    values of each profiled column with exact counts, long format
    ``column, value, n_rows, rank`` (values cast to string for a
    uniform schema; NULLs profiled as a real group).

    Scale shape: ONE unpivot projection (k columns → (column, value)
    pairs via an inline array — a stack, not k scans), one
    map-side-combined count shuffle, then the established two-phase
    top-N cap per column (≤ top_k survivors per 64-way hash sub-bucket
    before the per-column rank — no task sorts a full value
    distribution). Deterministic tie-break (count desc, value asc,
    NULL last).
    """
    from pyspark.sql import Window

    cols = list(columns) if columns else list(df.columns)
    pairs = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col(c).cast("string").alias("value"),
        )
        for c in cols
    ])
    counts = (
        df.select(F.explode(pairs).alias("p"))
        .select("p.*")
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    sub = F.pmod(F.xxhash64("column", "value"), F.lit(64))
    order = [F.desc("n_rows"), F.asc_nulls_last("value")]
    w1 = Window.partitionBy("column", sub).orderBy(*order)
    w2 = Window.partitionBy("column").orderBy(*order)
    return (
        counts.withColumn("__rk1", F.row_number().over(w1))
        .filter(F.col("__rk1") <= top_k)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= top_k)
        .select("column", "value", "n_rows", "rank")
    )
