"""Feature engineering over event streams: point-in-time trailing
windows and exponential time decay.

The batch feature-store shape (public design: the trailing-window /
time-decayed counters of Feathr/Feast-style feature pipelines, and the
exponential-decay relevance weighting of Ebadi et al.'s decay counters):
for every entity, aggregate its event history AS OF a reference time —
counts and value sums over trailing windows plus a half-life-decayed
activity score that smoothly forgets old events instead of cliff-edging
at a window boundary.

Scale design: ONE map-side-combined groupBy on the entity key — every
window is a conditional aggregate over the same scan, never one scan
per window. The reference time defaults to ``max(ts)`` attached as a
scalar subquery (``join_scalars``) so the whole thing stays a single
Catalyst plan with no driver collect. Floats follow the q1 contract:
trailing sums round at 2dp, decay scores at 4dp; exact integer counts
carry the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkt.functions import join_scalars

#: ln 2 as a shared literal so engine and oracle compute bit-identical
#: decay exponents (F.log(2.0) would fold to the same value, but a
#: spelled-out constant keeps the SQL side trivially identical)
LN2 = 0.6931471805599453


def decay_features(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str | None = None,
    windows_days: tuple[int, ...] = (1, 7, 30),
    half_life_days: float = 7.0,
) -> DataFrame:
    """Per-entity trailing-window counts + exponentially-decayed
    activity score, as of the table's ``max(ts)``.

    Returns one row per key:
      ``<key>, n_{d}d`` for each window (exact integers),
      ``v_{d}d`` value sums (2dp) when ``value_col`` is given, and
      ``decay`` = ``round(sum(0.5 ^ (age / half_life)), 4)`` — a
      smooth recency-weighted event count (an event ``half_life`` ago
      contributes 0.5, two half-lives ago 0.25, ...).

    All windows aggregate in ONE pass: conditional aggregates over a
    single scan + a single map-side-combined shuffle on the key. At
    100 TB the only sized object is the per-key output table.
    """
    ref = events.agg(F.max(ts_col).alias("__ref"))
    base = join_scalars(events, ref)
    age_s = F.col("__ref").cast("double") - F.col(ts_col).cast("double")
    aggs = []
    for d in windows_days:
        in_win = F.col(ts_col) >= F.col("__ref") - F.expr(
            f"INTERVAL {int(d)} DAY"
        )
        aggs.append(
            F.sum(in_win.cast("long")).alias(f"n_{d}d")
        )
        if value_col:
            aggs.append(
                F.round(
                    F.sum(F.when(in_win, F.col(value_col)).otherwise(0.0)),
                    2,
                ).alias(f"v_{d}d")
            )
    aggs.append(
        F.round(
            F.sum(F.exp(-F.lit(LN2) * age_s
                        / F.lit(half_life_days * 86400.0))),
            4,
        ).alias("decay")
    )
    return base.groupBy(key_col).agg(*aggs)
