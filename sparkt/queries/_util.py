"""Shared gate-query helpers: parquet loading plus input-proportional
shuffle sizing.

The driver's correctness sweep runs every gate on a default-conf
session (200 shuffle partitions). Gate inputs are megabytes, where a
200-task shuffle stage is pure scheduling overhead — measured round 4:
t5_repetition 11.3s → 1.8s, d5_ngram_jaccard (sf0.1) 6.9s → 1.7s, from
nothing but sizing the shuffle to the input. ``tune_shuffle`` sizes
``spark.sql.shuffle.partitions`` the way a production job would:
one reduce partition per ~16 MB of compressed parquet input (≈64 MB
in-memory), floored at the cluster's core count (CPU-heavy stages —
md5 shingling, vector math — need every core even when the data is
small; measured r4: d5 at sf0.1 median 5.2 s with 8 reduce partitions
vs 1.4 s with 32) and capped at 4× the core count so reducers stay
busy without drowning the scheduler. The same formula at 100 TB yields
input-proportional partition counts bounded by cluster size — the
static complement of AQE's post-shuffle coalescing (which can only
merge, not create, partitions).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_BYTES_PER_PARTITION = 16 << 20  # compressed parquet ≈ 4× smaller in memory

_dir_bytes_cache: dict[str, int] = {}


def _dir_bytes(sf_dir: str) -> int:
    if sf_dir not in _dir_bytes_cache:
        total = 0
        for root, _dirs, names in os.walk(sf_dir):
            for n in names:
                try:
                    total += os.path.getsize(os.path.join(root, n))
                except OSError:
                    pass
        _dir_bytes_cache[sf_dir] = total
    return _dir_bytes_cache[sf_dir]


def tune_shuffle(spark: SparkSession, sf_dir: str) -> None:
    """Set ``spark.sql.shuffle.partitions`` proportional to the input
    volume under ``sf_dir``. Idempotent per (session, dir); applies at
    execution time (Spark reads the conf when a shuffle stage is
    planned, so setting it inside a lazily-evaluated gate callable is
    effective)."""
    cores = spark.sparkContext.defaultParallelism
    n = max(cores, min(_dir_bytes(sf_dir) // _BYTES_PER_PARTITION, cores * 4))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, tuning the session's shuffle width to
    the scale factor first (every gate query loads through here)."""
    from sparkt.sources import load_parquet

    tune_shuffle(spark, sf_dir)
    return load_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))
