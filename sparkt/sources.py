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


def ensure_nanos_conf(spark: SparkSession) -> None:
    """The driver may hand us a session built without our defaults;
    nanosAsLong is runtime-settable, so set it defensively before any
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


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [
        load_parquet(spark, os.path.join(sf_dir, f"{n}.parquet")) for n in names
    ]
