"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — the baseline. The query
  set is broadcast; the corpus is scanned once; dot products run as
  JVM higher-order functions (``zip_with``/``aggregate``) inside
  codegen, no Python. At 100 TB this is the verification path and the
  right choice whenever |queries| is small.
- ``lsh_bucketed_topk``: the scale path — md5-derived deterministic
  random hyperplanes give sign-bit bucket keys; candidates are only
  corpus rows whose bucket matches the query (hamming-0 here;
  multi-probe = join on neighboring buckets). Turns all-pairs into a
  bucket-equijoin, the same shuffle shape as the MinHash LSH dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self).
    Deterministic: rank by (rounded cosine desc, corpus_id asc)."""
    q = queries.select(F.col(query_id), F.col(vec).alias("qv"))
    c = corpus.select(F.col(corpus_id), F.col(vec).alias("cv"))
    scored = (
        broadcast(q)
        .crossJoin(c)
        .filter(F.col(query_id) != F.col(corpus_id))
        .withColumn(
            "cos", F.round(dot(F.col("qv"), F.col("cv"))
                           / (norm(F.col("qv")) * norm(F.col("cv"))), 4)
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("cos"), F.asc(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos", "rank")
    )


def hyperplane_bits(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Deterministic pseudo-random hyperplane sign bits.

    Plane p's weight for dimension d is derived from md5(p|d) hex →
    integer in [-500, 500] — fully reproducible on any engine, no RNG
    state to ship."""
    import hashlib

    bits = []
    for p in range(n_planes):
        weights = []
        for d in range(dim):
            h = int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[:8], 16)
            weights.append((h % 1001) - 500)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(w)) for w in weights]),
                lambda x, w: x * w,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, "1").otherwise("0"))
    return F.concat(*bits)


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's
    sign-bit bucket (equijoin instead of cross join)."""
    q = queries.select(
        F.col(query_id),
        F.col(vec).alias("qv"),
        hyperplane_bits(F.col(vec), dim, n_planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec).alias("cv"),
        hyperplane_bits(F.col(vec), dim, n_planes).alias("bucket"),
    )
    scored = (
        broadcast(q)
        .join(c, "bucket")
        .filter(F.col(query_id) != F.col(corpus_id))
        .withColumn(
            "cos",
            F.round(dot(F.col("qv"), F.col("cv"))
                    / (norm(F.col("qv")) * norm(F.col("cv"))), 4),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos", "rank")
    )
