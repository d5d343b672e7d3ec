"""Parquet source loading, including nanosecond-timestamp repair.

Spark cannot read parquet TIMESTAMP(NANOS) columns natively
(PARQUET_TYPE_ILLEGAL); with
``spark.sql.legacy.parquet.nanosAsLong=true`` they surface as BIGINT
nanoseconds. This module detects ns columns from the parquet footer
(pyarrow, driver-side metadata only — no data read) and rebuilds a
proper ``timestamp`` column via integer division (``DIV 1000`` —
float division would lose precision above 2^53 ns). Truncation to
microseconds matches DuckDB's µs timestamp semantics, so engine and
oracle agree.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession


@lru_cache(maxsize=512)
def ns_timestamp_columns(path: str) -> tuple[str, ...]:
    """Column names with timestamp[ns] physical type (parquet footer)."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        inner = [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
        if not inner:
            return ()
        path = inner[0]
    schema = pq.read_schema(path)
    return tuple(
        f.name for f in schema if str(f.type).startswith("timestamp[ns")
    )


def ns_fix_exprs(columns: list[str], ns_cols: tuple[str, ...]) -> list[str]:
    return [
        f"timestamp_micros(CAST({c} DIV 1000 AS BIGINT)) AS {c}"
        if c in ns_cols
        else c
        for c in columns
    ]


# Runtime-settable confs the engine depends on for *correctness* (not
# just speed). A driver-provided session built without our defaults
# (plain ``SparkSession.builder.getOrCreate()``) would otherwise run
# with partitionOverwriteMode=STATIC, where ``INSERT OVERWRITE`` on a
# partitioned table silently replaces the WHOLE table instead of only
# the partitions present in the source — a data-loss mode.
_RUNTIME_CONF = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_runtime_conf(spark: SparkSession) -> None:
    """Apply the engine's correctness-critical runtime-settable confs to
    a possibly-foreign session (driver-provided sessions lack them)."""
    for key, val in _RUNTIME_CONF.items():
        try:
            spark.conf.set(key, val)
        except Exception:  # noqa: BLE001 — conf may be pinned
            pass


def ensure_nanos_conf(spark: SparkSession) -> None:
    """nanosAsLong is runtime-settable, so set it defensively before any
    parquet read that may contain TIMESTAMP(NANOS)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 — conf may be pinned; reads will tell
        pass


def load_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet; ns-timestamp columns come back as real timestamps."""
    ensure_nanos_conf(spark)
    df = spark.read.parquet(path)
    ns_cols = ns_timestamp_columns(path)
    if not ns_cols:
        return df
    return df.selectExpr(*ns_fix_exprs(df.columns, ns_cols))


def spread(df: DataFrame) -> DataFrame:
    """Repartition a too-narrow input across all cores before CPU-bound
    per-row work (tokenize/shingle/hash/vector HOFs).

    A small parquet file scans as 1-2 partitions, serializing expensive
    expression work onto one core; at 100 TB the scan already has
    thousands of splits and this is a no-op (the repartition only fires
    when the input has fewer partitions than the cluster has slots, so
    it never adds a shuffle at scale)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [
        load_parquet(spark, os.path.join(sf_dir, f"{n}.parquet")) for n in names
    ]
