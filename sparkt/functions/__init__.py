"""LLM-data-pipeline operator library (BASELINE.json extension surface):
text analysis, deduplication, similarity search, multimodal columns.

Everything here is built from JVM-side ``pyspark.sql.functions``
(whole-stage codegen; zero row-at-a-time Python) except the multimodal
decode plumbing, which is Arrow-batched ``mapInPandas`` by necessity.
All hashing uses md5 hex strings so results are reproducible across
engines (the DuckDB oracle computes the identical values).
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_scalars(df: DataFrame, scalars: DataFrame) -> DataFrame:
    """Attach every column of a 1-row scalar table (corpus totals:
    N docs, avgdl, token count, ...) to ``df`` as constant columns —
    WITHOUT a driver collect and WITHOUT any join: the scalar table is
    packed into one struct and referenced through a true scalar
    subquery (``DataFrame.scalar``), which Spark executes exactly once
    (every additional field reference plans as ``ReusedSubquery``) and
    inlines into the consuming projection. This beats the classic
    ``crossJoin(broadcast(one_row))`` idiom, which plans as a
    BroadcastNestedLoopJoin — runtime-equivalent for 1 row but
    indistinguishable in a plan audit from an accidental all-pairs
    join (plan_lint forbids BNLJ outside the documented brute-force
    allowlist)."""
    packed = scalars.select(
        F.struct(*scalars.columns).alias("__scalars")
    ).scalar()
    out = df
    for name in scalars.columns:
        out = out.withColumn(name, packed.getField(name))
    return out
