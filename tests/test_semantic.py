"""Semantic layer: simple/ratio/derived metrics compile to Spark SQL
(reference parses+validates only, SURVEY.md §2.6)."""

from __future__ import annotations

import pytest

FILES = {
    "dbt_project.yml": "name: sem\nmodel-paths: [models]\nseed-paths: [seeds]\n",
    "seeds/sales.csv": (
        "id,region,amount,is_big\n"
        "1,east,100,true\n2,east,300,false\n3,west,50,true\n4,west,150,false\n"
    ),
    "models/fct_sales.sql": (
        "{{ config(materialized='table') }}\nselect * from {{ ref('sales') }}"
    ),
    "models/semantic.yml": """
version: 2
semantic_models:
  - name: sales_sm
    model: ref('fct_sales')
    dimensions:
      - {name: region, expr: region}
    measures:
      - {name: revenue, agg: sum, expr: amount}
      - {name: n_sales, agg: count, expr: "*"}
      - {name: max_sale, agg: max, expr: amount}
      - {name: n_big, agg: sum_boolean, expr: is_big}
metrics:
  - {name: total_revenue, type: simple, measure: revenue}
  - {name: sale_count, type: simple, measure: n_sales}
  - {name: avg_sale_value, type: ratio, numerator: revenue, denominator: n_sales}
  - {name: revenue_k, type: derived, expr: "total_revenue / 1000.0"}
  - {name: big_sales, type: simple, measure: n_big}
  - {name: conversions, type: conversion}
""",
}


def test_metrics_compile_and_run(make_project, spark):
    runner = make_project(FILES, schema="t_sem")
    assert runner.seed().ok
    assert runner.run().ok

    row = runner.query_metrics(["total_revenue", "sale_count",
                                "avg_sale_value", "revenue_k", "big_sales"]).first()
    assert row["total_revenue"] == 600
    assert row["sale_count"] == 4
    assert row["avg_sale_value"] == 150.0
    assert float(row["revenue_k"]) == 0.6  # Spark parses 1000.0 as decimal
    assert row["big_sales"] == 2

    by_region = {
        r["region"]: r
        for r in runner.query_metrics(
            ["total_revenue", "sale_count"], dimensions=["region"]
        ).collect()
    }
    assert by_region["east"]["total_revenue"] == 400
    assert by_region["west"]["sale_count"] == 2


def test_malformed_conversion_raises(make_project, spark):
    # 'conversions' has no conversion_type_params -> clear error
    from sparkt.exceptions import CompilationError

    runner = make_project(FILES, schema="t_sem2")
    with pytest.raises(CompilationError):
        runner.query_metrics(["conversions"])


def test_unknown_metric_type_raises(make_project, spark):
    files = dict(FILES)
    files["models/semantic.yml"] = FILES["models/semantic.yml"].replace(
        "type: conversion", "type: exotic"
    )
    runner = make_project(files, schema="t_sem2b")
    with pytest.raises(NotImplementedError):
        runner.query_metrics(["conversions"])


CUMUL_FILES = {
    "dbt_project.yml": "name: semc\nmodel-paths: [models]\nseed-paths: [seeds]\n",
    "seeds/daily.csv": (
        "ds,region,amount\n"
        "2024-01-01,east,10\n2024-01-02,east,20\n2024-01-03,east,30\n"
        "2024-01-05,east,40\n2024-01-01,west,5\n2024-01-04,west,15\n"
    ),
    "models/fct_daily.sql": (
        "{{ config(materialized='table') }}\n"
        "select cast(ds as timestamp) as ds, region, amount "
        "from {{ ref('daily') }}"
    ),
    "models/semantic.yml": """
version: 2
semantic_models:
  - name: daily_sm
    model: ref('fct_daily')
    defaults: {agg_time_dimension: ds}
    dimensions:
      - {name: ds, type: time, expr: ds}
      - {name: region, expr: region}
    measures:
      - {name: amount_sum, agg: sum, expr: amount}
metrics:
  - {name: daily_amount, type: simple, type_params: {measure: amount_sum}}
  - {name: running_amount, type: cumulative, type_params: {measure: amount_sum}}
  - name: amount_2d
    type: cumulative
    type_params:
      measure: amount_sum
      cumulative_type_params: {window: "2 days"}
""",
}


def test_cumulative_metrics(make_project, spark):
    runner = make_project(CUMUL_FILES, schema="t_semc")
    assert runner.seed().ok
    assert runner.run().ok
    rows = runner.query_metrics(
        ["daily_amount", "running_amount", "amount_2d"],
        dimensions=["metric_time__day", "region"],
    ).collect()
    east = {str(r["metric_time_day"])[:10]: r for r in rows
            if r["region"] == "east"}
    # running total accumulates across all days
    assert east["2024-01-03"]["running_amount"] == 60
    assert east["2024-01-05"]["running_amount"] == 100
    # trailing 2-day window: Jan 5 sees only Jan 3 (>= Jan 3) and Jan 5
    assert east["2024-01-05"]["amount_2d"] == 70
    assert east["2024-01-02"]["daily_amount"] == 20
    west = {str(r["metric_time_day"])[:10]: r for r in rows
            if r["region"] == "west"}
    assert west["2024-01-04"]["running_amount"] == 20


CONV_FILES = {
    "dbt_project.yml": "name: semv\nmodel-paths: [models]\nseed-paths: [seeds]\n",
    "seeds/evs.csv": (
        "user_id,ts,kind\n"
        "1,2024-01-01 10:00:00,visit\n"
        "1,2024-01-02 09:00:00,buy\n"      # converts (within 7d)
        "2,2024-01-01 10:00:00,visit\n"    # no buy
        "3,2024-01-01 10:00:00,visit\n"
        "3,2024-01-20 10:00:00,buy\n"      # buy outside window
        "4,2024-01-05 08:00:00,visit\n"
        "4,2024-01-05 08:00:00,buy\n"      # same-instant conversion counts
    ),
    "models/fct_evs.sql": (
        "{{ config(materialized='table') }}\n"
        "select user_id, cast(ts as timestamp) as ts, kind "
        "from {{ ref('evs') }}"
    ),
    "models/semantic.yml": """
version: 2
semantic_models:
  - name: evs_sm
    model: ref('fct_evs')
    defaults: {agg_time_dimension: ts}
    dimensions:
      - {name: ts, type: time, expr: ts}
    measures:
      - {name: visits, agg: count, expr: "case when kind = 'visit' then 1 end"}
      - {name: buys, agg: count, expr: "case when kind = 'buy' then 1 end"}
metrics:
  - name: visit_to_buy
    type: conversion
    type_params:
      conversion_type_params:
        base_measure: visits
        conversion_measure: buys
        entity: user_id
        window: "7 days"
  - name: n_conversions
    type: conversion
    type_params:
      conversion_type_params:
        base_measure: visits
        conversion_measure: buys
        entity: user_id
        window: "7 days"
        calculation: conversions
""",
}


def test_conversion_metrics(make_project, spark):
    runner = make_project(CONV_FILES, schema="t_semv")
    assert runner.seed().ok
    assert runner.run().ok
    # 4 visits; users 1 and 4 convert within 7 days
    rate = runner.query_metrics(["visit_to_buy"]).first()["visit_to_buy"]
    assert rate == 0.5
    n = runner.query_metrics(["n_conversions"]).first()["n_conversions"]
    assert n == 2


def test_saved_query(make_project, spark):
    files = dict(FILES)
    files["models/saved.yml"] = """
version: 2
saved_queries:
  - name: revenue_by_region
    query_params:
      metrics: [total_revenue]
      group_by: [region]
    exports:
      - name: revenue_by_region_tbl
        config: {export_as: table}
"""
    runner = make_project(files, schema="t_sq")
    assert runner.seed().ok
    assert runner.run().ok
    df = runner.run_saved_query("revenue_by_region")
    assert {r["region"]: r["total_revenue"] for r in df.collect()} == {
        "east": 400, "west": 200}
    assert spark.table("t_sq.revenue_by_region_tbl").count() == 2


def test_semantic_review_fixes(make_project, spark):
    """Review-finding regressions: metric_time works on SIMPLE metrics;
    ratio metrics honor filter; derived cycles and
    derived-of-cumulative raise instead of compiling wrong SQL."""
    import pytest

    from sparkt.exceptions import CompilationError
    from sparkt.semantic import SemanticLayer

    layer = SemanticLayer()
    layer.add_semantic_model({
        "name": "sm_ev",
        "model": "evt",
        "defaults": {"agg_time_dimension": "ts"},
        "dimensions": [
            {"name": "ts", "type": "time"},
            {"name": "event_type", "type": "categorical"},
        ],
        "measures": [
            {"name": "total_value", "agg": "sum", "expr": "value"},
            {"name": "n_events", "agg": "count", "expr": "1"},
        ],
    })
    layer.add_metric({
        "name": "daily_value", "type": "simple",
        "type_params": {"measure": "total_value"},
    })
    layer.add_metric({
        "name": "click_rate", "type": "ratio",
        "filter": "{{ dimension('event_type') }} = 'click'",
        "type_params": {"numerator": "total_value",
                        "denominator": "n_events"},
    })
    layer.add_metric({
        "name": "cum_value", "type": "cumulative",
        "type_params": {"measure": "total_value"},
    })
    layer.add_metric({
        "name": "bad_derived", "type": "derived",
        "type_params": {"expr": "cum_value / 2"},
    })
    layer.add_metric({
        "name": "loop_a", "type": "derived",
        "type_params": {"expr": "loop_b + 1"},
    })
    layer.add_metric({
        "name": "loop_b", "type": "derived",
        "type_params": {"expr": "loop_a + 1"},
    })

    # simple metric at a time grain — the most common semantic query
    sql = layer.compile_query(["daily_value"], ["metric_time__day"])
    assert "date_trunc('day'" in sql and "group by" in sql

    # ratio filter lands in BOTH sides as a filtered aggregate
    sql = layer.compile_query(["click_rate"], [])
    assert sql.lower().count("case when event_type = 'click'") == 2

    with pytest.raises(CompilationError, match="cumulative"):
        layer.compile_query(["bad_derived"], [])
    with pytest.raises(CompilationError, match="cycle"):
        layer.compile_query(["loop_a"], [])


def test_cumulative_min_max_reaggregate_correctly(make_project, spark):
    """The outer time window re-aggregates with the MEASURE'S agg
    (r12 review: sum() was hardcoded — a running min over per-day
    minima 10, 5 returned 15 instead of 5)."""
    files = dict(CUMUL_FILES)
    files["models/semantic.yml"] = """
version: 2
semantic_models:
  - name: daily_sm
    model: ref('fct_daily')
    defaults: {agg_time_dimension: ds}
    dimensions:
      - {name: ds, type: time, expr: ds}
      - {name: region, expr: region}
    measures:
      - {name: amount_min, agg: min, expr: amount}
      - {name: amount_max, agg: max, expr: amount}
metrics:
  - {name: running_min, type: cumulative, type_params: {measure: amount_min}}
  - {name: running_max, type: cumulative, type_params: {measure: amount_max}}
"""
    runner = make_project(files, schema="t_semmm")
    assert runner.seed().ok and runner.run().ok
    rows = runner.query_metrics(
        ["running_min", "running_max"],
        dimensions=["metric_time__day", "region"],
    ).collect()
    east = {str(r["metric_time_day"])[:10]: r for r in rows
            if r["region"] == "east"}
    # east amounts: 10, 20, 30, 40 over 4 days
    assert east["2024-01-03"]["running_min"] == 10  # was 60 under sum
    assert east["2024-01-03"]["running_max"] == 30
    assert east["2024-01-05"]["running_min"] == 10
    assert east["2024-01-05"]["running_max"] == 40


def test_derived_cross_model_raises(make_project, spark):
    """A derived metric mixing semantic models is a typed error
    (r12 review: it silently compiled against whichever model's
    metric name was longest)."""
    from sparkt.exceptions import CompilationError

    files = dict(FILES)
    files["models/fct_other.sql"] = (
        "{{ config(materialized='table') }}\n"
        "select 1 as clicks"
    )
    files["models/semantic2.yml"] = """
version: 2
semantic_models:
  - name: other_sm
    model: ref('fct_other')
    measures:
      - {name: click_count, agg: sum, expr: clicks}
metrics:
  - {name: total_clicks, type: simple, measure: click_count}
  - {name: bad_mix, type: derived, expr: "total_revenue + total_clicks"}
"""
    runner = make_project(files, schema="t_semx")
    assert runner.seed().ok and runner.run().ok
    with pytest.raises(CompilationError, match="mixes"):
        runner.query_metrics(["bad_mix"])
    with pytest.raises(CompilationError, match="at least one metric"):
        runner.query_metrics([])


def test_unknown_grain_suffix_is_not_date_trunced():
    """r15 review: '__suffix' splits as a time grain only for KNOWN
    grains — a MetricFlow-style entity path ('customer__region') must
    raise unknown-dimension, not compile date_trunc('region', ...)."""
    import pytest

    from sparkt.exceptions import CompilationError
    from sparkt.semantic import SemanticLayer

    layer = SemanticLayer()
    layer.add_semantic_model({
        "name": "sm", "model": "t",
        "dimensions": [{"name": "ds", "type": "time"},
                       {"name": "region"}],
        "measures": [{"name": "n", "agg": "count", "expr": "1"}],
    })
    layer.add_metric({"name": "m", "type": "simple",
                      "type_params": {"measure": "n"}})
    # known grain still splits
    sql = layer.compile_query(["m"], ["ds__month"])
    assert "date_trunc('month', ds)" in sql
    with pytest.raises(CompilationError, match="customer__region"):
        layer.compile_query(["m"], ["customer__region"])
