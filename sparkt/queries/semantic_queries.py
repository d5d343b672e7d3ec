"""Semantic-layer gate queries: cumulative and conversion metrics
compiled to Spark SQL by ``sparkt.semantic`` and checked against
hand-written DuckDB oracles over the same events table.

Reference surface: ``core/dbt/artifacts/resources/v1/metric.py:32-113``
(cumulative_type_params, ConversionTypeParams). The measure uses
``floor(value*100)`` cents so every aggregate is exact integer math —
float window-accumulation order can't break oracle parity.
"""

from __future__ import annotations

import os

from sparkt.semantic import SemanticLayer
from sparkt.sources import load_parquet

_SM_SPEC = {
    "name": "sm_events",
    "model": "__sparkt_sem_events",
    "defaults": {"agg_time_dimension": "ds"},
    "dimensions": [
        {"name": "ds", "type": "time", "expr": "ts"},
        {"name": "event_type"},
    ],
    "measures": [
        {"name": "n_events", "agg": "count", "expr": "event_id"},
        {
            "name": "cents",
            "agg": "sum",
            "expr": "cast(floor(value * 100) as bigint)",
        },
        {
            "name": "signups",
            "agg": "count",
            "expr": "case when event_type = 'signup' then 1 end",
        },
        {
            "name": "purchases",
            "agg": "count",
            "expr": "case when event_type = 'purchase' then 1 end",
        },
    ],
}

_METRIC_SPECS = [
    {
        "name": "daily_cents",
        "type": "simple",
        "type_params": {"measure": "cents"},
    },
    {
        "name": "cents_per_event",
        "type": "ratio",
        "type_params": {"numerator": "cents",
                        "denominator": "n_events"},
    },
    {
        "name": "cents_per_event_x10",
        "type": "derived",
        "type_params": {
            "expr": "cents_per_event * 10",
            "metrics": [{"name": "cents_per_event"}],
        },
    },
    {
        "name": "cum_cents",
        "type": "cumulative",
        "type_params": {"measure": "cents"},
    },
    {
        "name": "cents_7d",
        "type": "cumulative",
        "type_params": {
            "measure": "cents",
            "cumulative_type_params": {"window": "7 days"},
        },
    },
    {
        "name": "signup_to_purchase",
        "type": "conversion",
        "type_params": {
            "conversion_type_params": {
                "base_measure": "signups",
                "conversion_measure": "purchases",
                "entity": "user_id",
                "window": "7 days",
                "calculation": "conversion_rate",
            }
        },
    },
]


def _layer() -> SemanticLayer:
    layer = SemanticLayer()
    layer.add_semantic_model(_SM_SPEC)
    for spec in _METRIC_SPECS:
        layer.add_metric(spec)
    return layer


def _events_view(spark, sf_dir) -> None:
    from sparkt.queries._util import tune_shuffle

    tune_shuffle(spark, sf_dir)
    load_parquet(
        spark, os.path.join(sf_dir, "events.parquet")
    ).createOrReplaceTempView("__sparkt_sem_events")


# ----------------------------------------------------------------- sm1
def sm1_cumulative_metric(spark, sf_dir):
    """Cumulative metrics: unbounded running total and trailing 7-day
    window per event_type at day grain, alongside the simple daily
    metric (two-level grouped→window SQL; one groupBy shuffle + one
    window shuffle over grain rows, never raw events)."""
    _events_view(spark, sf_dir)
    sql = _layer().compile_query(
        ["daily_cents", "cum_cents", "cents_7d"],
        ["metric_time__day", "event_type"],
    )
    return spark.sql(sql)


SM1_SQL = """
WITH g AS (
  SELECT date_trunc('day', ts) AS metric_time_day, event_type,
         sum(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events
  GROUP BY 1, 2)
SELECT metric_time_day, event_type,
       CAST(cents AS BIGINT) AS daily_cents,
       CAST(sum(cents) OVER (PARTITION BY event_type
            ORDER BY metric_time_day
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
       CAST(sum(cents) OVER (PARTITION BY event_type
            ORDER BY metric_time_day
            RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cents_7d
FROM g
ORDER BY metric_time_day, event_type
"""


# ----------------------------------------------------------------- sm2
def sm2_conversion_metric(spark, sf_dir):
    """Conversion metric: share of signup events followed by a purchase
    by the same user within 7 days — compiled to the as-of-forward
    union + window-min carry (one shuffle on user_id, no pair blowup)."""
    _events_view(spark, sf_dir)
    sql = _layer().compile_query(["signup_to_purchase"], [])
    return spark.sql(sql)


SM2_SQL = """
WITH b AS (
  SELECT user_id AS ent, ts, 1 AS is_base FROM events
  WHERE event_type = 'signup'),
c AS (
  SELECT user_id AS ent, ts, 0 AS is_base FROM events
  WHERE event_type = 'purchase'),
u AS (SELECT * FROM b UNION ALL SELECT * FROM c),
m AS (
  SELECT ent, ts, is_base,
         min(CASE WHEN is_base = 0 THEN ts END) OVER (
             PARTITION BY ent ORDER BY ts ASC, is_base DESC
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_conv
  FROM u)
SELECT round(CAST(sum(CASE WHEN next_conv IS NOT NULL
                           AND next_conv <= ts + INTERVAL 7 DAY
                      THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
       AS signup_to_purchase
FROM m WHERE is_base = 1
"""


# ----------------------------------------------------------------- sm3
def sm3_ratio_derived_metric(spark, sf_dir):
    """Ratio + derived metrics (the remaining two of the reference's
    five metric types — metric.py RatioTypeParams/derived expr): cents
    per event at (day, event_type) grain, and a derived expression
    over the ratio metric. Both compile to one grouped aggregate —
    one shuffle, arithmetic in the projection. Floats follow the q1
    contract (round 6)."""
    _events_view(spark, sf_dir)
    sql = _layer().compile_query(
        ["cents_per_event", "cents_per_event_x10"],
        ["metric_time__day", "event_type"],
    )
    df = spark.sql(sql)
    from pyspark.sql import functions as F

    return df.select(
        "metric_time_day", "event_type",
        F.round("cents_per_event", 6).alias("cents_per_event"),
        F.round("cents_per_event_x10", 6).alias("cents_per_event_x10"),
    ).orderBy("metric_time_day", "event_type")


SM3_SQL = """
WITH g AS (
  SELECT date_trunc('day', ts) AS metric_time_day, event_type,
         sum(CAST(floor(value * 100) AS BIGINT)) AS cents,
         count(event_id) AS n_events
  FROM events
  GROUP BY 1, 2)
SELECT metric_time_day, event_type,
       round(CAST(cents AS DOUBLE) / n_events, 6) AS cents_per_event,
       round(CAST(cents AS DOUBLE) / n_events * 10, 6)
         AS cents_per_event_x10
FROM g
ORDER BY metric_time_day, event_type
"""


QUERIES = {
    "sm1_cumulative_metric": sm1_cumulative_metric,
    "sm2_conversion_metric": sm2_conversion_metric,
    "sm3_ratio_derived_metric": sm3_ratio_derived_metric,
}

ORACLES = {
    "sm1_cumulative_metric": SM1_SQL,
    "sm2_conversion_metric": SM2_SQL,
    "sm3_ratio_derived_metric": SM3_SQL,
}
