"""Plugin / external-nodes hook (sparkt/plugins.py; reference
core/dbt/plugins/manager.py:163 + parser/manifest.py:795)."""

from __future__ import annotations

import shutil

import pytest


def _fresh_table(spark, schema, table, select):
    """DROP + CTAS robust to orphaned warehouse dirs left by other
    sessions (LOCATION_ALREADY_EXISTS)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {schema}")
    spark.sql(f"DROP TABLE IF EXISTS {schema}.{table}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(f"{wh.removeprefix('file:')}/{schema}.db/{table}",
                  ignore_errors=True)
    spark.sql(f"CREATE TABLE {schema}.{table} AS {select}")


@pytest.fixture(autouse=True)
def _clean_registry():
    from sparkt import plugins

    plugins.clear_plugins()
    yield
    plugins.clear_plugins()


FILES = {
    "dbt_project.yml": "name: plg\nmodel-paths: [models]\n",
    "models/consumer.sql": (
        "{{ config(materialized='table') }}\n"
        "select id, v * 2 as v2 from {{ ref('upstream_metrics') }}"
    ),
}


def test_plugin_contributes_external_node(make_project, spark):
    """A registered plugin injects an external model that a local model
    refs; the external relation resolves verbatim (no naming macros)
    and is never executed by the runner."""
    from sparkt.plugins import ModelNodeArgs, PluginNodes, SparktPlugin, register_plugin

    # the "other project's" already-built relation
    _fresh_table(spark, "ext_side", "metrics_tbl", "SELECT 1 AS id, 10.0 AS v")

    @register_plugin
    class LoomLike(SparktPlugin):
        def get_nodes(self):
            out = PluginNodes()
            out.add_model(ModelNodeArgs(
                name="upstream_metrics",
                package_name="other_proj",
                identifier="metrics_tbl",
                schema="ext_side",
            ))
            return out

    runner = make_project(FILES, schema="t_plugin")
    uid = "model.other_proj.upstream_metrics"
    assert uid in runner.manifest.nodes
    assert runner.compiler.relation_for(
        runner.manifest.nodes[uid]).render() == "ext_side.metrics_tbl"

    res = runner.run()
    assert res.ok, [r.message for r in res.results]
    # only the local model executed; the external node never runs
    assert [r.unique_id for r in res.results] == ["model.plg.consumer"]
    assert spark.table("t_plugin.consumer").first()["v2"] == 20.0
    # DAG edge recorded
    assert uid in runner.manifest.nodes["model.plg.consumer"].depends_on


def test_external_nodes_reinjected_on_cached_parse(make_project, spark):
    """Plugin nodes are not file-backed: a warm (cached) parse still
    reflects the CURRENT plugin set (reference parser/manifest.py:453
    re-runs inject_external_nodes on reused parses)."""
    from sparkt.plugins import ModelNodeArgs, PluginNodes, SparktPlugin, register_plugin
    from sparkt.runner import Runner

    _fresh_table(spark, "ext_side2", "m", "SELECT 1 AS id, 5.0 AS v")

    files = dict(FILES)
    files["models/consumer.sql"] = (
        "{{ config(materialized='table') }}\n"
        "select id from {{ ref('standalone') }}"
    )
    files["models/standalone.sql"] = "select 1 as id"
    runner = make_project(files, schema="t_plugin_cache")
    assert runner.run().ok
    base_nodes = set(runner.manifest.nodes)

    @register_plugin
    class LatePlugin(SparktPlugin):
        def get_nodes(self):
            out = PluginNodes()
            out.add_model(ModelNodeArgs(
                name="late_ext", package_name="other_proj",
                identifier="m", schema="ext_side2",
            ))
            return out

    # second Runner hits the parse cache, but the plugin node appears
    runner2 = Runner(runner.project.project_root, spark=spark,
                     project_overrides={"schema": "t_plugin_cache"})
    assert "model.other_proj.late_ext" in runner2.manifest.nodes
    assert base_nodes <= set(runner2.manifest.nodes)

    # and disappears again once the plugin is gone
    from sparkt import plugins

    plugins.clear_plugins()
    runner3 = Runner(runner.project.project_root, spark=spark,
                     project_overrides={"schema": "t_plugin_cache"})
    assert "model.other_proj.late_ext" not in runner3.manifest.nodes
