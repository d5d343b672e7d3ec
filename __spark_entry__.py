"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship star-join rollup at sf0.001; ``queries``
exposes every implemented operator from SURVEY.md §2 (relational
surface, LLM-pipeline operators, and engine-materialization flows);
``oracle_sql`` gives the DuckDB-equivalent SQL for each (omitted only
for the approximate LSH ANN operator, which has no exact SQL oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sparkt.queries import relational

    return relational.q5_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sparkt.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from sparkt.queries import ORACLES

    return dict(ORACLES)
