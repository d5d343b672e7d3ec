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


def test_unsupported_metric_type_raises(make_project, spark):
    runner = make_project(FILES, schema="t_sem2")
    with pytest.raises(NotImplementedError):
        runner.query_metrics(["conversions"])


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
