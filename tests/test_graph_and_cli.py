"""Graph operators: selection algebra, build test-edges, skip
propagation, hooks, python models, run-operation, source freshness,
ephemeral chains (reference: core/dbt/graph/, task/build.py,
task/runnable.py:319-340)."""

from __future__ import annotations

import networkx as nx

FILES = {
    "dbt_project.yml": """
name: graph
model-paths: [models]
seed-paths: [seeds]
on-run-start: ["create database if not exists hookmark"]
""",
    "seeds/raw.csv": "id,v\n1,10\n2,20\n3,30\n",
    "models/stage.sql": (
        "{{ config(tags=['staging'], materialized='ephemeral') }}\n"
        "select * from {{ ref('raw') }}"
    ),
    "models/mid.sql": (
        "{{ config(tags=['staging']) }}\nselect * from {{ ref('stage') }}"
    ),
    "models/mart.sql": (
        "{{ config(materialized='table', tags=['mart'], "
        "pre_hook='create database if not exists prehook_mark') }}\n"
        "select sum(v) as total from {{ ref('mid') }}"
    ),
    "models/broken.sql": "select broken_column from {{ ref('mid') }}",
    "models/downstream_of_broken.sql": "select * from {{ ref('broken') }}",
}


def test_selection_algebra(make_project):
    runner = make_project(FILES, schema="t_graph")
    from sparkt.graph.linker import link_graph
    from sparkt.graph.selector import select_nodes

    g = link_graph(runner.manifest)
    names = lambda s: {uid.split(".")[-1] for uid in s}  # noqa: E731

    assert names(select_nodes(g, runner.manifest, "mart")) == {"mart"}
    assert names(select_nodes(g, runner.manifest, "+mart")) == {
        "mart", "mid", "stage", "raw"}
    assert names(select_nodes(g, runner.manifest, "stage+")) == {
        "stage", "mid", "mart", "broken", "downstream_of_broken"}
    assert names(select_nodes(g, runner.manifest, "stage+1")) == {"stage", "mid"}
    assert names(select_nodes(g, runner.manifest, "tag:staging")) == {
        "stage", "mid"}
    assert names(select_nodes(g, runner.manifest, "tag:mart +mid")) == {
        "mart", "mid", "stage", "raw"}  # union
    assert names(select_nodes(g, runner.manifest, "tag:staging,mid+")) == {
        "mid"}  # intersection
    assert names(
        select_nodes(g, runner.manifest, "resource_type:seed")
    ) == {"raw"}
    assert names(
        select_nodes(g, runner.manifest, "+mart", exclude="tag:staging")
    ) == {"mart", "raw"}


def test_skip_propagation_and_hooks(make_project, spark):
    runner = make_project(FILES, schema="t_graph2")
    assert runner.seed().ok
    res = runner.run()
    by_name = {r.unique_id.split(".")[-1]: r for r in res.results}
    assert by_name["mart"].status == "success"
    assert by_name["broken"].status == "error"
    assert by_name["downstream_of_broken"].status == "skipped"
    # hooks ran
    assert spark.catalog.databaseExists("hookmark")
    assert spark.catalog.databaseExists("prehook_mark")
    # ephemeral spliced, not materialized
    assert not spark.catalog.tableExists("t_graph2.stage")
    assert spark.table("t_graph2.mart").first()["total"] == 60


def test_build_adds_test_edges(make_project, spark):
    files = dict(FILES)
    del files["models/broken.sql"]
    del files["models/downstream_of_broken.sql"]
    files["models/schema.yml"] = """
version: 2
models:
  - name: mid
    columns:
      - name: id
        data_tests: [unique]
"""
    runner = make_project(files, schema="t_build")
    from sparkt.graph.linker import link_graph

    g = link_graph(runner.manifest, add_test_edges=True)
    test_uid = next(u for u in g.nodes if u.startswith("test."))
    mart_uid = "model.graph.mart"
    assert nx.has_path(g, test_uid, mart_uid)
    res = runner.build()
    assert res.ok, [r.message for r in res.results]
    statuses = {r.unique_id.split(".")[0] for r in res.results}
    assert statuses == {"model", "seed", "test"}


def test_python_model(make_project, spark):
    files = {
        "dbt_project.yml": "name: pym\nmodel-paths: [models]\nseed-paths: [seeds]\n",
        "seeds/nums.csv": "id,v\n1,1\n2,2\n3,3\n",
        "models/doubled.py": '''
import pyspark.sql.functions as F

def model(dbt, session):
    dbt.config(materialized="table")
    df = dbt.ref("nums")
    return df.withColumn("doubled", F.col("v") * 2)
''',
        "models/uses_py.sql": "select sum(doubled) as s from {{ ref('doubled') }}",
    }
    runner = make_project(files, schema="t_pym")
    assert runner.seed().ok
    res = runner.run()
    assert res.ok, [r.message for r in res.results]
    assert spark.table("t_pym.doubled").count() == 3
    assert spark.table("t_pym.uses_py").first()["s"] == 12


def test_run_operation_and_macros(make_project, spark):
    files = {
        "dbt_project.yml": "name: ops\nmacro-paths: [macros]\n",
        "macros/make_audit.sql": """
{% macro make_audit(name) %}
  {% do run_query("create database if not exists audit_" ~ name) %}
  {{ return("made audit_" ~ name) }}
{% endmacro %}
""",
    }
    runner = make_project(files, schema="t_ops")
    out = runner.run_operation("make_audit", {"name": "zone1"})
    assert out == "made audit_zone1"
    assert spark.catalog.databaseExists("audit_zone1")


def test_source_freshness(make_project):
    files = {
        "dbt_project.yml": "name: fresh\nmodel-paths: [models]\n",
        "models/sources.yml": """
version: 2
sources:
  - name: tpch
    schema: tpch_fresh
    tables:
      - name: events
        external: {location: /root/testdata/sf0.001/events.parquet}
        loaded_at_field: ts
        freshness:
          warn_after: {count: 1, period: hour}
          error_after: {count: 100000, period: day}
""",
    }
    runner = make_project(files, schema="t_fresh")
    rows = runner.source_freshness()
    assert len(rows) == 1
    assert rows[0]["status"] == "warn"  # 2024 data: stale > 1h, < 100000d


def test_custom_materialization(make_project, spark):
    from sparkt.materializations import register

    @register("limited_table")
    def materialize_limited(ctx, node):
        ctx.compiler.compile_node(node)
        ctx.adapter.create_table_as(
            node.relation,
            select_sql=f"select * from ({node.compiled_code}) lim limit 2",
        )
        return "LIMITED TABLE"

    files = {
        "dbt_project.yml": "name: custom\nmodel-paths: [models]\nseed-paths: [seeds]\n",
        "seeds/raw.csv": "id\n1\n2\n3\n4\n",
        "models/limited.sql": (
            "{{ config(materialized='limited_table') }}\n"
            "select * from {{ ref('raw') }}"
        ),
    }
    runner = make_project(files, schema="t_custom")
    assert runner.seed().ok
    assert runner.run().ok
    assert spark.table("t_custom.limited").count() == 2
