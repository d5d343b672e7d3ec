"""As-of and range joins — operators Spark lacks natively, built as
compositions of existing DataFrame ops (the strategy SURVEY.md
prescribes for reference-absent operators).

As-of join (scale design): instead of a per-key sort-merge UDF, tag and
union both sides, then carry the most recent right-side row forward
with ``last(..., ignorenulls=True)`` over a (key, time) window —
one shuffle on the key, linear in rows, no pair blowup, AQE-skew safe.
This is the standard big-data formulation of point-in-time joins
(feature stores, trade/quote matching).

Range join: inequality-band join expressed so the planner can use the
band predicate; at scale add a coarse time-bucket equi-key to turn it
into an equijoin + residual filter (bucketing included here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (direction='backward'; 'forward' gives the
    earliest right row with ``right_ts >= left_ts``), per ``on`` key.

    Returns all left columns plus ``right_cols`` (NULL when no match).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    l_tag = left.withColumn("__evt_ts", F.col(left_ts).cast("timestamp")) \
        .withColumn("__is_left", F.lit(1))
    # the right row is carried as ONE struct: carrying columns
    # independently would let a NULL field fall back to an OLDER right
    # row, mixing columns from different rows and hiding real NULLs
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).cast("timestamp").alias("__evt_ts"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r_row"),
    ).withColumn("__is_left", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort before left rows at equal timestamps so an
        # exactly-simultaneous right row matches (<= semantics)
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__evt_ts").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    elif direction == "forward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("__evt_ts").desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        raise ValueError(f"bad direction {direction!r}")

    carried = unioned.select(
        "*",
        F.last("__r_row", ignorenulls=True).over(w).alias("__match"),
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *[c for c in left.columns],
        *[F.col("__match")[c].alias(c) for c in right_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Join rows whose timestamps fall within
    ``[left_ts + lower, left_ts + upper]`` per key.

    With ``bucket_seconds``, both sides get coarse time-bucket keys and
    the band predicate becomes a residual filter on an equijoin
    (left rows are exploded into the covering buckets) — the shape that
    scales past a broadcast-band join."""
    lo = F.expr(f"INTERVAL {lower_seconds} SECONDS")
    hi = F.expr(f"INTERVAL {upper_seconds} SECONDS")
    l = left.alias("l")
    r = right.alias("r")
    band = (
        (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") + lo)
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + hi)
    )
    if bucket_seconds is None:
        return l.join(r, (F.col(f"l.{on}") == F.col(f"r.{on}")) & band)

    l_b = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                ((F.unix_timestamp(left_ts) + lower_seconds)
                 / bucket_seconds).cast("long"),
                ((F.unix_timestamp(left_ts) + upper_seconds)
                 / bucket_seconds).cast("long"),
            )
        ),
    ).alias("l")
    r_b = right.withColumn(
        "__bucket", (F.unix_timestamp(right_ts) / bucket_seconds).cast("long")
    ).alias("r")
    return l_b.join(
        r_b,
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col("l.__bucket") == F.col("r.__bucket"))
        & band,
    ).drop("__bucket")
