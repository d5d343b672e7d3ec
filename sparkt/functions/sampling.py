"""Deterministic hash-based sampling and train/val/test splitting.

Training-data pipelines need samples and splits that are (a) stable
across reruns and cluster sizes, (b) stratifiable, and (c) cheap.
``rand()``-based sampling fails (a): a retried task re-draws. Keying
on md5(id) gives a uniform, reproducible assignment that any engine
(and the DuckDB oracle) computes identically.

Scale shape: both operators are pure narrow projections/filters over
the scan — no shuffle, no Python, survives any scale-up unchanged.
Reference surface: dbt has no sampler; this extends the pipeline
operator set (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# first hex nibble of md5("<salt>:<id>") → 16 uniform buckets
_TRAIN_NIBBLES = list("0123456789ab")  # 12/16 = 75%
_VAL_NIBBLES = list("cd")  # 2/16 = 12.5%
# remaining "ef" → test


def hash_bucket(id_col: Column, salt: str = "sample") -> Column:
    """First hex nibble of the salted md5 — a uniform 16-way bucket.
    Changing the salt draws an independent assignment."""
    return F.substring(F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))), 1, 1)


def hash_sample(
    df: DataFrame, id_col: str, keep_nibbles: int = 3, salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ~keep_nibbles/16 fraction of rows (first
    hex nibble of the salted md5 below the cutoff)."""
    cutoff = "0123456789abcdef"[:keep_nibbles]
    return df.filter(hash_bucket(F.col(id_col), salt).isin(list(cutoff)))


def train_val_test_split(
    df: DataFrame, id_col: str, salt: str = "split"
) -> DataFrame:
    """Add a ``split`` column with a 75/12.5/12.5 train/val/test
    assignment, stable under reruns, re-partitioning, and engine
    choice."""
    b = hash_bucket(F.col(id_col), salt)
    return df.withColumn(
        "split",
        F.when(b.isin(_TRAIN_NIBBLES), "train")
        .when(b.isin(_VAL_NIBBLES), "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    salt: str = "strata",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the class-rebalancing
    step of a training-data pipeline (e.g. keep 10% of English, all of
    low-resource languages).

    A row survives iff the first 8 hex digits of its salted md5 fall
    below ``fraction × 2³²`` for its stratum — exact, engine-portable
    (md5 is bit-identical everywhere), stable under reruns and
    repartitioning, and embarrassingly parallel: pure filter, NO
    shuffle, no per-group state (contrast ``df.sampleBy``, whose
    Bernoulli draw depends on partition layout and seed plumbing).
    """
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    cutoff = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        val = F.lit(int(frac * (1 << 32)))
        cutoff = F.when(cond, val) if cutoff is None else cutoff.when(cond, val)
    default = F.lit(int(default_fraction * (1 << 32)))
    cutoff = default if cutoff is None else cutoff.otherwise(default)
    return df.filter(h32 < cutoff)
