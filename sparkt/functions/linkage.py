"""Blocked fuzzy (edit-distance) join — record linkage / entity
resolution for data cleaning and training-data curation (public
design: standard blocking + pairwise comparison, Fellegi-Sunter-style
pipelines; the blocking trick is what every production linkage system
uses to avoid O(n²)).

Scale shape: candidate pairs come ONLY from an equijoin on the
blocking key(s) — never a cross join — so the shuffle is keyed and
prunable; a length-band predicate (|len(a)−len(b)| ≤ d, a lower bound
on edit distance) and Spark's thresholded ``levenshtein`` early-exit
keep the per-pair cost bounded; an optional block-frequency cap stops
a degenerate mega-block (the linkage analogue of the stop-shingle cap
in ``dedup.ngram_jaccard``) from going quadratic.

Reference surface: dbt has no linkage operators; this extends the
pipeline operator set (BASELINE.json north star) alongside
dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    max_distance: int = 2,
    self_pairs: bool = False,
    max_block_freq: int | None = None,
) -> DataFrame:
    """Pairs (id_a, id_b, text_a, text_b, distance) with
    ``levenshtein(text_a, text_b) <= max_distance``, compared only
    within equal blocking keys. ``self_pairs=True`` (left is right)
    keeps each unordered pair once via ``id_a < id_b``.

    ``max_block_freq`` drops blocks whose RIGHT-side population
    exceeds the cap — a skew guard: at 100 TB one junk block (empty
    name, 'unknown', ...) would otherwise dominate the join. Dropped
    blocks mean dropped candidate pairs; choose the cap from block
    statistics, and log what was dropped in pipelines that care.
    """
    if not block_cols:
        raise ValueError(
            "fuzzy_join requires at least one blocking column — an "
            "unblocked fuzzy join is an all-pairs cross join at scale"
        )
    l = left.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("text_a"),
        *block_cols,
    )
    r = right.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
        *block_cols,
    )
    if max_block_freq is not None:
        sizes = r.groupBy(*block_cols).agg(
            F.count("*").alias("__block_n")
        ).filter(F.col("__block_n") <= max_block_freq).drop("__block_n")
        r = r.join(broadcast(sizes), block_cols, "left_semi")
    pairs = l.join(r, on=list(block_cols))
    if self_pairs:
        pairs = pairs.filter(F.col("id_a") < F.col("id_b"))
    # |len(a)-len(b)| lower-bounds edit distance: cheap pre-filter
    # inside codegen before the DP kicks in; the thresholded
    # levenshtein early-exits at max_distance (returns -1 beyond)
    pairs = pairs.filter(
        F.abs(F.length("text_a") - F.length("text_b")) <= max_distance
    )
    dist = F.levenshtein("text_a", "text_b", max_distance)
    return (
        pairs.withColumn("distance", dist)
        .filter(F.col("distance") >= 0)
        .select("id_a", "id_b", "text_a", "text_b", "distance")
    )
