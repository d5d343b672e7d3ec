"""Graph operators: selection algebra, build test-edges, skip
propagation, hooks, python models, run-operation, source freshness,
ephemeral chains (reference: core/dbt/graph/, task/build.py,
task/runnable.py:319-340)."""

from __future__ import annotations

import networkx as nx
import pytest

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


def test_source_freshness_from_metadata(make_project, tmp_path):
    """No loaded_at_field -> file-mtime metadata path (reference
    calculate_freshness_from_metadata, task/freshness.py:107-145)."""
    import os
    import shutil

    # a parquet file we control the mtime of
    loc = str(tmp_path / "meta_src.parquet")
    shutil.copyfile("/root/testdata/sf0.001/region.parquet", loc)
    old = __import__("time").time() - 7200  # 2h ago
    os.utime(loc, (old, old))
    files = {
        "dbt_project.yml": "name: freshm\nmodel-paths: [models]\n",
        "models/sources.yml": f"""
version: 2
sources:
  - name: meta
    schema: meta_fresh
    tables:
      - name: recent
        external: {{location: {loc}}}
        freshness:
          warn_after: {{count: 1, period: hour}}
          error_after: {{count: 1, period: day}}
      - name: fresh_enough
        external: {{location: {loc}}}
        freshness:
          warn_after: {{count: 1, period: day}}
""",
    }
    runner = make_project(files, schema="t_freshm")
    rows = {r["unique_id"]: r for r in runner.source_freshness()}
    r1 = rows["source.meta.recent"]
    assert 7000 < r1["max_loaded_at_age_s"] < 8000
    assert r1["status"] == "warn"  # 2h old: > 1h warn, < 1d error
    assert rows["source.meta.fresh_enough"]["status"] == "pass"


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


def test_selector_method_parity(make_project):
    """Reference selector methods (core/dbt/graph/selector_methods.py:
    45-67): group, access, package, file, test_name, exposure, metric,
    semantic_model, saved_query, unit_test, version."""
    files = {
        "dbt_project.yml": "name: selp\nmodel-paths: [models]\nseed-paths: [seeds]\n",
        "seeds/base.csv": "id,amount\n1,5\n2,7\n",
        "models/orders_sel.sql": (
            "{{ config(group='finance', access='public') }}\n"
            "select id, amount from {{ ref('base') }}"
        ),
        "models/private_sel.sql": (
            "{{ config(access='private') }}\nselect 1 as id"
        ),
        "models/schema.yml": """
version: 2
models:
  - name: orders_sel
    columns:
      - name: id
        data_tests: [unique, not_null]
unit_tests:
  - name: ut_orders_sel
    model: orders_sel
    given:
      - input: ref('base')
        rows: [{id: 1, amount: 2}]
    expect:
      rows: [{id: 1, amount: 2}]
exposures:
  - name: finance_dash
    type: dashboard
    depends_on: ["ref('orders_sel')"]
semantic_models:
  - name: sm_orders
    model: ref('orders_sel')
    measures:
      - {name: total_amount, agg: sum, expr: amount}
metrics:
  - name: m_total
    type: simple
    type_params: {measure: total_amount}
saved_queries:
  - name: sq_total
    query_params: {metrics: [m_total]}
""",
    }
    runner = make_project(files, schema="t_selp")
    from sparkt.graph.linker import link_graph
    from sparkt.graph.selector import select_nodes

    m = runner.manifest
    g = link_graph(m)
    names = lambda s: {uid.split(".", 2)[-1] for uid in s}  # noqa: E731
    # indirect="empty" pins METHOD matching alone; eager-mode expansion
    # (attached tests riding along) is pinned by
    # test_indirect_selection.py
    _sel = select_nodes
    select_nodes = lambda g, m, s: _sel(g, m, s, indirect="empty")  # noqa: E731

    assert names(select_nodes(g, m, "group:finance")) == {"orders_sel"}
    assert names(select_nodes(g, m, "access:public")) == {"orders_sel"}
    assert names(select_nodes(g, m, "access:private")) == {"private_sel"}
    assert "orders_sel" in names(select_nodes(g, m, "package:selp"))
    assert names(select_nodes(g, m, "file:orders_sel.sql")) == {"orders_sel"}
    assert names(select_nodes(g, m, "file:orders_sel")) == {"orders_sel"}
    got = names(select_nodes(g, m, "test_name:unique"))
    assert got and all("unique" in n for n in got)
    assert names(select_nodes(g, m, "exposure:finance_dash")) == {"finance_dash"}
    assert names(select_nodes(g, m, "metric:m_total")) == {"m_total"}
    assert names(select_nodes(g, m, "semantic_model:sm_orders")) == {"sm_orders"}
    assert names(select_nodes(g, m, "saved_query:sq_total")) == {"sq_total"}
    assert names(select_nodes(g, m, "unit_test:ut_orders_sel")) == {"ut_orders_sel"}
    # graph edges: +metric pulls the semantic model and its model
    up = names(select_nodes(g, m, "+metric:m_total"))
    assert {"m_total", "sm_orders", "orders_sel"} <= up
    # +saved_query reaches through metric to the model
    up = names(select_nodes(g, m, "+saved_query:sq_total"))
    assert {"sq_total", "m_total", "sm_orders", "orders_sel"} <= up


def test_state_modified_subselectors(make_project, tmp_path):
    """state:modified.body vs .configs vs .macros vs .relation vs
    .contract discrimination (selector_methods.py:609-787)."""
    import os
    import shutil

    files = {
        "dbt_project.yml": "name: ms\nmodel-paths: [models]\nmacro-paths: [macros]\n",
        "macros/helper.sql": "{% macro double_it(c) %}({{ c }} * 2){% endmacro %}",
        "models/uses_macro.sql": "select {{ double_it('1') }} as v",
        "models/plain_body.sql": "select 1 as a",
        "models/plain_config.sql": "select 2 as b",
        "models/plain_alias.sql": "select 3 as c",
        "models/contracted.sql": "select 4 as d",
        "models/schema.yml": """
version: 2
models:
  - name: contracted
    columns:
      - {name: d, data_type: int}
""",
    }
    runner = make_project(files, schema="t_ms")
    runner.compile()  # writes target/manifest.json
    state_dir = str(tmp_path / "state")
    shutil.copytree(runner.project.target_dir, state_dir)

    # mutate: body (in-file), config + alias (via dbt_project.yml so the
    # BODY stays identical — the discriminator must tell them apart),
    # macro, contract
    root = runner.project.project_root
    with open(os.path.join(root, "models/plain_body.sql"), "w") as f:
        f.write("select 10 as a")
    with open(os.path.join(root, "dbt_project.yml"), "w") as f:
        f.write(
            "name: ms\nmodel-paths: [models]\nmacro-paths: [macros]\n"
            "models:\n"
            "  plain_config: {+materialized: table}\n"
            "  plain_alias: {+alias: aliased_c}\n"
        )
    with open(os.path.join(root, "macros/helper.sql"), "w") as f:
        f.write("{% macro double_it(c) %}({{ c }} * 2 + 0){% endmacro %}")
    with open(os.path.join(root, "models/schema.yml"), "w") as f:
        f.write("""
version: 2
models:
  - name: contracted
    columns:
      - {name: d, data_type: bigint}
""")

    from sparkt.runner import Runner
    from sparkt.graph.linker import link_graph
    from sparkt.graph.selector import select_nodes
    from sparkt.state import StateManifest

    r2 = Runner(root, spark=runner.spark,
                project_overrides={"schema": "t_ms"})
    st = StateManifest(state_dir)
    m = r2.manifest
    g = link_graph(m)
    names = lambda s: {uid.split(".", 2)[-1] for uid in s}  # noqa: E731

    assert names(select_nodes(g, m, "state:modified.body", state=st)) == {
        "plain_body"}
    got_cfg = names(select_nodes(g, m, "state:modified.configs", state=st))
    assert "plain_config" in got_cfg and "plain_body" not in got_cfg
    assert names(select_nodes(g, m, "state:modified.macros", state=st)) == {
        "uses_macro"}
    got_rel = names(select_nodes(g, m, "state:modified.relation", state=st))
    assert "plain_alias" in got_rel and "plain_body" not in got_rel
    assert names(select_nodes(g, m, "state:modified.contract", state=st)) == {
        "contracted"}
    # umbrella = union of all
    got_all = names(select_nodes(g, m, "state:modified", state=st))
    assert {"plain_body", "plain_config", "plain_alias",
            "uses_macro", "contracted"} <= got_all


def test_empty_flag_builds_schema_only(make_project, spark):
    """--empty (reference cli/params.py:87): refs/sources compile to
    zero-row subqueries; tables materialize with full schema, 0 rows.
    A subsequent normal run repopulates."""
    files = {
        "dbt_project.yml": "name: emptyflag\nmodel-paths: [models]\n",
        "models/sources.yml": """
version: 2
sources:
  - name: tpch
    tables:
      - name: orders
        external: {location: /root/testdata/sf0.001/orders.parquet}
""",
        "models/base.sql": (
            "{{ config(materialized='table') }}\n"
            "select o_orderkey, o_totalprice from {{ source('tpch', 'orders') }}"
        ),
        "models/agg.sql": (
            "{{ config(materialized='table') }}\n"
            "select count(*) as n, sum(o_totalprice) as total "
            "from {{ ref('base') }}"
        ),
    }
    runner = make_project(files, schema="t_emptyflag")
    res = runner.run(empty=True)
    assert res.ok, [r.message for r in res.results]
    assert spark.table("t_emptyflag.base").count() == 0
    assert [f.name for f in spark.table("t_emptyflag.base").schema.fields] == [
        "o_orderkey", "o_totalprice",
    ]
    # agg over an empty input still yields its aggregate row
    assert spark.table("t_emptyflag.agg").columns == ["n", "total"]
    res2 = runner.run()
    assert res2.ok
    assert spark.table("t_emptyflag.base").count() == 1500


def test_partial_parse_cache_invalidates_on_node_schema_change(tmp_path):
    """A partial-parse pickle written by an older engine version (whose
    ParsedNode lacked fields added since) must be discarded, not
    unpickled into stale objects (reference gates partial_parse.msgpack
    on dbt_version, parser/manifest.py:330-362)."""
    import os
    import pickle

    from sparkt.parsing.parser import ManifestLoader
    from sparkt.project import load_project

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "models"), exist_ok=True)
    with open(os.path.join(root, "dbt_project.yml"), "w") as f:
        f.write("name: cachetest\nmodel-paths: [models]\n")
    with open(os.path.join(root, "models", "m.sql"), "w") as f:
        f.write("select 1 as id")
    loader = ManifestLoader(load_project(root))
    loader.load(partial=True)  # writes the cache
    cache = os.path.join(root, "target", "partial_parse.pickle")
    with open(cache, "rb") as f:
        stored = pickle.load(f)
    assert "node_schema" in stored
    # simulate an old-engine pickle: schema string from fewer fields
    stored["node_schema"] = "old,fields,only"
    with open(cache, "wb") as f:
        pickle.dump(stored, f)
    loader2 = ManifestLoader(load_project(root))
    manifest = loader2.load(partial=True)  # must reparse, not reuse
    assert "model.cachetest.m" in manifest.nodes
    with open(cache, "rb") as f:
        refreshed = pickle.load(f)
    assert refreshed["node_schema"] != "old,fields,only"


def test_analysis_compile_only(make_project, spark):
    """Analyses compile to target/compiled but never execute
    (reference core/dbt/parser/analysis.py; run skips them, compile
    renders them)."""
    import os

    files = {
        "dbt_project.yml": "name: an\nmodel-paths: [models]\nanalysis-paths: [analyses]\n",
        "models/base.sql": "select 1 as id",
        "analyses/revenue_probe.sql": (
            "select count(*) as n from {{ ref('base') }}"
        ),
    }
    runner = make_project(files, schema="t_analysis")
    assert "analysis.an.revenue_probe" in runner.manifest.nodes
    res = runner.run()
    assert res.ok
    # never executed: no relation created, not in run results
    assert not any("revenue_probe" in r.unique_id for r in res.results)
    assert not spark.catalog.tableExists("t_analysis.revenue_probe")
    # compile renders it with the ref resolved
    runner.compile()
    compiled = os.path.join(
        runner.project.target_dir, "compiled", "revenue_probe.sql"
    )
    assert os.path.exists(compiled)
    with open(compiled) as f:
        sql = f.read()
    assert "t_analysis" in sql and "{{" not in sql


def test_ref_index_invalidates_on_same_count_mutation():
    """Delete-one-add-another keeps len(nodes) constant; the ref index
    must still invalidate (ADVICE r4: count-keyed cache served deleted
    nodes). Manifest.nodes is a generation-tracked dict."""
    from sparkt.manifest import Manifest, ParsedNode

    m = Manifest()
    a = ParsedNode(unique_id="model.p.a", name="a", package_name="p",
                   resource_type="model")
    m.nodes[a.unique_id] = a
    assert m.ref_lookup("a") is a
    del m.nodes[a.unique_id]
    b = ParsedNode(unique_id="model.p.b", name="b", package_name="p",
                   resource_type="model")
    m.nodes[b.unique_id] = b
    assert m.ref_lookup("a") is None
    assert m.ref_lookup("b") is b


def test_source_freshness_select(make_project):
    """dbt source freshness --select source:... checks only the
    selected sources (reference task/freshness.py selection)."""
    files = {
        "dbt_project.yml": "name: fresh\nmodel-paths: [models]\n",
        "models/sources.yml": """
version: 2
sources:
  - name: tpch
    schema: tpch_fsel
    tables:
      - name: events
        external: {location: /root/testdata/sf0.001/events.parquet}
        loaded_at_field: ts
        freshness:
          warn_after: {count: 1, period: hour}
      - name: orders
        external: {location: /root/testdata/sf0.001/orders.parquet}
        loaded_at_field: o_orderdate
        freshness:
          warn_after: {count: 1, period: hour}
""",
    }
    runner = make_project(files, schema="t_fsel")
    assert len(runner.source_freshness()) == 2
    rows = runner.source_freshness(select="source:tpch.events")
    assert len(rows) == 1 and "events" in rows[0]["unique_id"]


def test_compile_inline(make_project, spark):
    """dbt compile --inline renders jinja-SQL against the project
    context without executing it (reference cli/main.py:314)."""
    files = {
        "dbt_project.yml": "name: ci\nmodel-paths: [models]\n",
        "models/m.sql": "select 1 as id",
    }
    runner = make_project(files, schema="t_cinline")
    sql = runner.compile_inline(
        "select * from {{ ref('m') }} where id > {{ var('min_id', 0) }}"
    )
    assert "t_cinline" in sql and "{{" not in sql and "where id > 0" in sql
    # inline node does not leak into the manifest
    assert "sql_operation.ci.inline_query" not in runner.manifest.nodes


def test_duplicate_resource_names_raise(tmp_path):
    """Two files compiling to the same unique_id must be a parse error
    (reference tests/functional/duplicates) — silent last-wins would
    make ref() resolution depend on walk order."""
    import os

    import pytest

    from sparkt.exceptions import ParsingError
    from sparkt.parsing.parser import ManifestLoader
    from sparkt.project import load_project

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "models", "sub"), exist_ok=True)
    with open(os.path.join(root, "dbt_project.yml"), "w") as f:
        f.write("name: dup\nmodel-paths: [models]\n")
    with open(os.path.join(root, "models", "m.sql"), "w") as f:
        f.write("select 1 as id")
    with open(os.path.join(root, "models", "sub", "m.sql"), "w") as f:
        f.write("select 2 as id")
    with pytest.raises(ParsingError, match="two models with the name 'm'"):
        ManifestLoader(load_project(root)).load(partial=False)


def test_run_started_at_timezones(make_project, spark):
    """run_started_at is tz-aware UTC and converts via modules.pytz
    (reference tests/functional/timezones; Saskatchewan has no DST so
    the UTC offset is a constant -6)."""
    files = {
        "dbt_project.yml": "name: tz\nmodel-paths: [models]\n",
        "models/tzs.sql": (
            "{{ config(materialized='table') }}\n"
            "select '{{ run_started_at.astimezone(modules.pytz.timezone("
            "\"Canada/Saskatchewan\")) }}' as rsa_sask, "
            "'{{ run_started_at }}' as rsa_utc"
        ),
    }
    runner = make_project(files, schema="t_tz")
    assert runner.run().ok
    row = spark.table("t_tz.tzs").first()
    assert row["rsa_utc"].endswith("+00:00")
    assert row["rsa_sask"].endswith("-06:00")
    # same instant, different rendering
    from datetime import datetime

    utc = datetime.fromisoformat(row["rsa_utc"])
    sask = datetime.fromisoformat(row["rsa_sask"])
    assert utc == sask


def test_selected_resources_context_var(make_project, spark):
    """`selected_resources` lists the invocation's selected unique_ids
    in hooks/macros (reference tests/functional/selected_resources)."""
    files = {
        "dbt_project.yml": """
name: sr
model-paths: [models]
macro-paths: [macros]
on-run-start: "{{ assert_selected() }}"
""",
        "macros/assert_selected.sql": """
{% macro assert_selected() %}
  {% if execute %}
    {% set expected = var('expected_selected') %}
    {% if (selected_resources | sort) != (expected | sort) %}
      {{ exceptions.raise_compiler_error(
          'FAIL: ' ~ selected_resources ~ ' != ' ~ expected) }}
    {% endif %}
  {% endif %}
{% endmacro %}
""",
        "models/model1.sql": "select 1 as id",
        "models/model2.sql": "select * from {{ ref('model1') }}",
    }
    runner = make_project(
        files, schema="t_selres",
        # full run selects both models
    )
    runner.cli_vars["expected_selected"] = [
        "model.sr.model1", "model.sr.model2"]
    # rebuild compiler vars view
    from sparkt.runner import Runner

    r1 = Runner(runner.project.project_root, spark=spark,
                cli_vars={"expected_selected":
                          ["model.sr.model1", "model.sr.model2"]},
                project_overrides={"schema": "t_selres"})
    assert r1.run().ok

    r2 = Runner(runner.project.project_root, spark=spark,
                cli_vars={"expected_selected": ["model.sr.model1"]},
                project_overrides={"schema": "t_selres"})
    assert r2.run(select="model1").ok
    # and a wrong expectation actually fails (the hook checks for real)
    r3 = Runner(runner.project.project_root, spark=spark,
                cli_vars={"expected_selected": ["model.sr.model1"]},
                project_overrides={"schema": "t_selres"})
    import pytest

    from sparkt.exceptions import CompilationError

    with pytest.raises(CompilationError, match="FAIL"):
        r3.run()


def test_static_parse_fast_path(make_project, spark):
    """Models with no jinja delimiters skip both the parse-phase AST
    walk/render and the compile-time template render (reference
    experimental parser, core/dbt/parser/models.py:255-299): counted in
    loader.static_parsed, built correctly, and jinja models are
    untouched."""
    files = {
        "dbt_project.yml": "name: sp\nmodel-paths: [models]\nseed-paths: [seeds]\n",
        "seeds/raw.csv": "id,v\n1,10\n2,20\n",
        "models/pure.sql": "select 1 as x, 'static' as tag",
        "models/jinja.sql": (
            "{{ config(materialized='table') }}\n"
            "select count(*) as n from {{ ref('raw') }}"
        ),
    }
    runner = make_project(files, schema="t_static")
    assert runner.loader.static_parsed == 1
    # jinja.sql is ONLY ref/source/config with constant args, so the
    # stable static parser covers it without a parse-phase render
    assert runner.loader.static_extracted == 1
    pure = runner.manifest.nodes["model.sp.pure"]
    assert pure.refs == [] and pure.config.get("materialized") is None
    jj = runner.manifest.nodes["model.sp.jinja"]
    assert jj.refs == ["raw"]
    assert jj.config.get("materialized") == "table"
    assert runner.seed().ok
    assert runner.run().ok
    assert spark.table("t_static.pure").first()["x"] == 1
    assert spark.table("t_static.jinja").first()["n"] == 2
    # compile pass-through: compiled == raw for the static model
    assert pure.compiled_code.strip() == files["models/pure.sql"].strip()


def test_static_extractor_completeness_gate(make_project, spark):
    """The stable static parser only claims a model when EVERY jinja
    construct is a constant-arg ref/source/config (dbt-extractor
    contract, reference core/dbt/parser/models.py:378-398); anything
    dynamic — control flow, var(), macro calls, non-const args —
    falls back to the parse-phase render, and both paths extract the
    same refs/config."""
    files = {
        "dbt_project.yml": (
            "name: sx\nmodel-paths: [models]\nseed-paths: [seeds]\n"
            "vars:\n  mat: table\n"
        ),
        "seeds/raw.csv": "id,v\n1,10\n2,20\n",
        # static-complete: multiple calls, list/dict config values
        "models/stat.sql": (
            "{{ config(materialized='table', tags=['a','b'],"
            " meta={'k': 1}) }}\n"
            "select * from {{ ref('raw') }}"
        ),
        # static-complete NESTED shapes: list-in-dict (grants) and
        # dict-in-list (constraints) — the round-7 regression silently
        # extracted these as None when the render was skipped
        "models/nested.sql": (
            "{{ config(materialized='table',"
            " grants={'select': ['reporter', 'bi_role']},"
            " meta={'owners': ['a', 'b'], 'depth': {'k': [1, 2]}},"
            " constraints=[{'type': 'primary_key',"
            " 'columns': ['id']}]) }}\n"
            "select * from {{ ref('raw') }}"
        ),
        # dynamic config value -> must fall back and still resolve
        "models/dynvar.sql": (
            "{{ config(materialized=var('mat')) }}\n"
            "select * from {{ ref('raw') }}"
        ),
        # control flow -> fallback
        "models/ctrl.sql": (
            "select * from {{ ref('raw') }}\n"
            "{% if true %}where id > 0{% endif %}"
        ),
    }
    runner = make_project(files, schema="t_staticx")
    assert runner.loader.static_extracted == 2  # stat.sql + nested.sql
    man = runner.manifest.nodes
    stat = man["model.sx.stat"]
    assert stat.refs == ["raw"]
    assert stat.config["materialized"] == "table"
    assert stat.config["tags"] == ["a", "b"]
    assert stat.config["meta"] == {"k": 1}
    nested = man["model.sx.nested"]
    assert nested.refs == ["raw"]
    assert nested.config["grants"] == {"select": ["reporter", "bi_role"]}
    assert nested.config["meta"] == {
        "owners": ["a", "b"],
        "depth": {"k": [1, 2]},
    }
    assert nested.config["constraints"] == [
        {"type": "primary_key", "columns": ["id"]}
    ]
    # the fallback render still captures the dynamic config/refs
    dyn = man["model.sx.dynvar"]
    assert dyn.config["materialized"] == "table"
    assert dyn.refs == ["raw"]
    assert man["model.sx.ctrl"].refs == ["raw"]
    assert runner.seed().ok and runner.run().ok
    assert spark.table("t_staticx.stat").count() == 2
    assert spark.table("t_staticx.ctrl").count() == 2


# --------------------------------------------------------------------
# static parser vs the reference's own fixture corpus (VERDICT r8 #6)
# --------------------------------------------------------------------

# real config(...) headers ported verbatim from the reference's
# functional-test fixtures; (name, template, static_expected,
# expected_config, render_vars)
_REF_CORPUS = [
    # tests/functional/experimental_parser/test_all_experimental_parser.py
    # basic__model_a_sql — the reference's OWN static-parser pin:
    # repeated config() calls append tags and last-win scalars
    (
        "exp_parser_basic",
        "{{ config(tags='hello', x=False) }}\n"
        "{{ config(tags='world', x=True) }}\n"
        "select * from {{ ref('model_b') }}\n"
        "cross join {{ source('my_src', 'my_tbl') }}\n"
        "where false\n",
        True,
        {"tags": ["hello", "world"], "x": True},
        None,
    ),
    # tests/functional/incremental_schema_tests/fixtures.py:61-69 —
    # multi-line header; body has {% set %}/{% if is_incremental() %}
    # so the whole template must FALL BACK, but both paths agree
    (
        "incremental_sync_all",
        "{{\n    config(\n        materialized='incremental',\n"
        "        unique_key='id',\n"
        "        on_schema_change='sync_all_columns'\n\n    )\n}}\n"
        "WITH source_data AS (SELECT * FROM {{ ref('model_a') }} )\n"
        "{% set string_type = 'varchar(10)' %}\n"
        "{% if is_incremental() %}\n"
        "SELECT id, cast(field1 as {{string_type}}) as field1\n"
        "FROM source_data WHERE id NOT IN (SELECT id from {{ this }})\n"
        "{% else %}\n"
        "SELECT id, cast(field1 as {{string_type}}) as field1\n"
        "FROM source_data where id <= 3\n"
        "{% endif %}\n",
        False,
        {"materialized": "incremental", "unique_key": "id",
         "on_schema_change": "sync_all_columns"},
        None,
    ),
    # tests/functional/incremental_schema_tests/fixtures.py:115-118
    (
        "multiline_table",
        "{{\n    config(materialized='table')\n}}\n"
        "select * from {{ ref('model_a') }}\n",
        True,
        {"materialized": "table"},
        None,
    ),
    # tests/functional/docs fixture shape (node_color)
    (
        "docs_node_color",
        "{{ config(materialized='view', docs={\"show\": True, "
        "\"node_color\": \"red\"}) }}\nselect 1 as id\n",
        True,
        {"materialized": "view",
         "docs": {"show": True, "node_color": "red"}},
        None,
    ),
    ("enabled_false",
     "{{ config(enabled=false) }}\nselect 1 as id\n",
     True, {"enabled": False}, None),
    # tests/functional/schema_tests severity-threshold header
    ("warn_error_if",
     "{{ config(warn_if = '>0', error_if =\"> 10\") }}\n"
     "select 1 as id\n",
     True, {"warn_if": ">0", "error_if": "> 10"}, None),
    ("custom_schema",
     "{{ config(schema='custom') }}\nselect 1 as id\n",
     True, {"schema": "custom"}, None),
    ("alias_override",
     "{{ config(alias='override_alias') }}\nselect 1 as id\n",
     True, {"alias": "override_alias"}, None),
    # tests/functional/store_test_failures_tests fixture shape
    ("store_failures_as",
     "{{ config(store_failures_as=\"ephemeral\", "
     "store_failures=False) }}\nselect 1 as id\n",
     True,
     {"store_failures_as": "ephemeral", "store_failures": False},
     None),
    # snapshot-style check strategy header
    ("check_cols",
     "{{ config(strategy='check', check_cols=['color']) }}\n"
     "select 1 as id\n",
     True, {"strategy": "check", "check_cols": ["color"]}, None),
    # tests/functional/context_methods shape: var() forces fallback
    ("var_materialized",
     "{{ config(materialized=var('materialized')) }}\n"
     "select 1 as id\n",
     False, {"materialized": "view"}, {"materialized": "view"}),
    ("tag_list",
     "{{ config(tags = ['data_test_tag']) }}\nselect 1 as id\n",
     True, {"tags": ["data_test_tag"]}, None),
    # tests/functional/list fixture model2 (meta with list values)
    ("meta_owners",
     "{{ config(meta={\"owners\": [\"team1\", \"team2\"]})}} "
     "select 1 as fun",
     True, {"meta": {"owners": ["team1", "team2"]}}, None),
    # grants dict-key-append: a '+select' key EXTENDS the role list
    ("grants_key_append",
     "{{ config(grants={'select': ['a']}) }}\n"
     "{{ config(grants={'+select': ['b']}) }}\nselect 1 as id\n",
     True, {"grants": {"select": ["a", "b"]}}, None),
    ("enabled_in_table",
     "{{ config(materialized='table', enabled=False) }}\n"
     "select 1 as id\n",
     True, {"materialized": "table", "enabled": False}, None),
    # tests/functional/relation_names fixture shape: config takes ONE
    # POSITIONAL DICT — outside the dbt-extractor surface (kwargs
    # only), so the static path must fall back and the render collects
    ("dict_positional_config",
     "select 1 as id\n"
     "{{\n  config({\n    \"unique_key\": \"col_A\",\n"
     "    \"materialized\": \"incremental\"\n    })\n}}\n",
     False,
     {"unique_key": "col_A", "materialized": "incremental"}, None),
    # tests/functional/column_quoting fixture shape: a {% set %}
    # variable as a config VALUE — control flow forces fallback and
    # the render resolves the quoted column name
    ("set_var_config_value",
     "{% set col_a = '\"col_A\"' %}\n"
     "{{\n  config(\n    materialized = 'incremental',\n"
     "    unique_key = col_a,\n  )\n}}\n"
     "select {{ col_a }} from {{ ref('seed') }}\n",
     False,
     {"materialized": "incremental", "unique_key": '"col_A"'}, None),
    # tests/functional/adapter/hooks/fixtures.py shape: jinja INSIDE
    # the hook string literal is NOT re-parsed at config time — the
    # static path must capture the raw string, braces and all
    # (hooks have APPEND merge behavior, so a scalar hook LISTIFIES —
    # the reference's parsed config carries pre-hook as a list)
    ("hook_embedded_jinja",
     '{{ config(pre_hook="insert into {{ this }} values (1)") }}\n'
     "select 1 as id\n",
     True,
     {"pre_hook": ["insert into {{ this }} values (1)"]}, None),
    # docs-generate fixtures: persist_docs nested dict
    ("persist_docs_dict",
     "{{ config(materialized='table', "
     "persist_docs={\"relation\": True, \"columns\": True}) }}\n"
     "select 1 as id\n",
     True,
     {"materialized": "table",
      "persist_docs": {"relation": True, "columns": True}}, None),
    # dbt 1.9 microbatch header (ints + strings mixed)
    ("microbatch_full",
     "{{ config(materialized='incremental', "
     "incremental_strategy='microbatch', event_time='ts', "
     "batch_size='day', lookback=3, begin='2024-01-01') }}\n"
     "select 1 as id, now() as ts\n",
     True,
     {"materialized": "incremental",
      "incremental_strategy": "microbatch", "event_time": "ts",
      "batch_size": "day", "lookback": 3, "begin": "2024-01-01"},
     None),
    # contracts fixtures: contract config is a nested dict
    ("contract_enforced",
     "{{ config(materialized='table', "
     "contract={'enforced': True}) }}\nselect 1 as id\n",
     True,
     {"materialized": "table", "contract": {"enforced": True}}, None),
    # context_methods shape: env_var() in a config VALUE is outside
    # the dbt-extractor const surface -> fallback; render resolves
    # the default
    ("env_var_default_schema",
     "{{ config(schema=env_var('SPARKT_NO_SUCH_VAR', 'fallback_s')) }}"
     "\nselect 1 as id\n",
     False, {"schema": "fallback_s"}, None),
]


@pytest.mark.parametrize(
    "name,src,static_expected,expected_cfg,render_vars",
    _REF_CORPUS, ids=[c[0] for c in _REF_CORPUS],
)
def test_static_extractor_matches_render_on_reference_corpus(
    name, src, static_expected, expected_cfg, render_vars
):
    """Corpus-driven equality gate (VERDICT r8 ask #6): for real
    config() headers taken from the reference's own functional
    fixtures, the static AST extraction must either (a) claim the
    template complete AND equal the full parse-phase render's
    collected config, or (b) fall back — and in both cases the value
    the parser would land on equals the reference-expected config.
    The r7 bug class (guard and extractor disagreeing about
    extraction depth) is exactly what this catches."""
    import jinja2

    from sparkt.parsing import context as ctx_mod

    env = ctx_mod.build_environment()
    refs, sources, static_cfg, complete = ctx_mod.extract_statically(
        env, src
    )
    assert complete is static_expected

    pctx, collector, r_refs, r_srcs = ctx_mod.parse_context(
        {}, render_vars or {}
    )
    env.from_string(src).render(**pctx)
    rendered_cfg = collector.collected

    if complete:
        # the static claim must be PROVABLY equal to what the render
        # would have collected — this is the skip-the-render contract
        assert static_cfg == rendered_cfg
        assert refs == r_refs
        assert sources == r_srcs
    # the value the parser lands on (static, backfilled by the render
    # on fallback — parser._parse_sql_node) matches the reference
    landed = dict(static_cfg)
    landed.update(rendered_cfg)
    assert landed == expected_cfg
    assert rendered_cfg == expected_cfg


def test_config_tags_append_through_cascade(make_project):
    """dbt MergeBehavior end-to-end (r9): project-tree +tags, an
    in-file config(tags=...) and a REPEATED config call all APPEND
    (never clobber), scalars listify, and tag: selection sees the
    union; meta dict-merges key-wise across the same cascade."""
    files = {
        "dbt_project.yml": (
            "name: tg\nmodel-paths: [models]\n"
            "models:\n  tg:\n    +tags: project_tag\n"
            "    +meta: {tier: bronze, owner: data}\n"
            "    marts:\n      +tags: [marts_tag]\n"
        ),
        "models/marts/m.sql": (
            "{{ config(tags='file_tag', meta={'owner': 'bi'}) }}\n"
            "{{ config(tags=['late_tag']) }}\n"
            "select 1 as id\n"
        ),
    }
    runner = make_project(files, schema="t_tagmerge")
    node = runner.manifest.nodes["model.tg.m"]
    assert node.tags == [
        "project_tag", "marts_tag", "file_tag", "late_tag"
    ]
    # meta: dict-merge — file key wins, project-only keys survive
    assert node.config["meta"] == {"tier": "bronze", "owner": "bi"}
    from sparkt.graph.linker import link_graph
    from sparkt.graph.selector import select_nodes

    g = link_graph(runner.manifest)
    for t in ("project_tag", "marts_tag", "file_tag", "late_tag"):
        assert select_nodes(g, runner.manifest, f"tag:{t}") == {
            "model.tg.m"
        }


def test_on_run_end_hook_failure_still_writes_artifacts(
    make_project, spark
):
    """A failing on-run-end hook no longer discards the completed
    run's results (r12 runner review #4): run_results.json is
    written with every node result plus an error entry for the hook,
    so a later retry reads the REAL previous run."""
    import json
    import os

    files = {
        "dbt_project.yml": (
            "name: hookfail\nmodel-paths: [models]\n"
            "on-run-end: ['select definitely_not_a_column from nowhere']\n"
        ),
        "models/ok_model.sql": "select 1 as id",
    }
    runner = make_project(files, schema="t_hookfail")
    res = runner.run()
    rr_path = os.path.join(
        runner.project.target_dir, "run_results.json"
    )
    assert os.path.exists(rr_path)
    rr = json.load(open(rr_path))
    by_uid = {r["unique_id"]: r["status"] for r in rr["results"]}
    assert by_uid["model.hookfail.ok_model"] == "success"
    hook_entries = [u for u in by_uid if "on_run_end" in u]
    assert hook_entries and by_uid[hook_entries[0]] == "error"
    assert not res.ok


def test_hook_numbering_skips_empty_renders(make_project, spark):
    """A hook whose Jinja renders to whitespace consumes NO index:
    the LogHookStartLine indexes are CONTIGUOUS 1..k over the hooks
    that actually run (r12 runner review #9); total counts the
    declared hooks. Hooks render sequentially right before
    execution, so later hooks' render-time run_query sees earlier
    hooks' effects."""
    import json
    import os

    files = {
        "dbt_project.yml": "name: hooknum\nmodel-paths: [models]\n",
        "models/hm.sql": (
            "{{ config(pre_hook=["
            "'{% if false %}select 1{% endif %}', "
            "'select 2']) }}\n"
            "select 1 as id"
        ),
    }
    runner = make_project(files, schema="t_hooknum")
    assert runner.run().ok
    log = os.path.join(runner.project.project_root, "logs", "dbt.log")
    starts = [
        json.loads(line)
        for line in open(log)
        if '"LogHookStartLine"' in line
    ]
    pairs = {
        (e["data"]["index"], e["data"]["total"]) for e in starts
    }
    assert pairs == {(1, 2)}, pairs  # contiguous from 1; no index=2 hole


def test_defer_state_does_not_leak_across_invocations(
    make_project, spark, tmp_path
):
    """defer is per-invocation (r12 runner review #2): a plain run()
    or inline compile after run(defer=True) must not still resolve
    refs against the stale state manifest."""
    import os
    import shutil

    files = {
        "dbt_project.yml": "name: dfl\nmodel-paths: [models]\n",
        "models/base.sql": "select 1 as id",
        "models/top.sql": "select * from {{ ref('base') }}",
    }
    runner = make_project(files, schema="t_dfl")
    assert runner.run().ok
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    shutil.copy(
        os.path.join(runner.project.target_dir, "manifest.json"),
        state_dir,
    )
    assert runner.run(select="top", defer=True, state=state_dir).ok
    # plain invocation afterwards: deferral cleared
    assert runner.run().ok
    assert runner.compiler.defer_state is None
    assert runner.compiler.favor_state is False


def test_ephemeral_cte_injection_after_leading_comment(
    make_project, spark
):
    """An ephemeral-ref'ing model whose compiled SQL begins with a
    comment before its own WITH still injects the CTE into the ONE
    WITH clause (r12 review: the regex missed the comment-shadowed
    WITH and emitted a double-WITH parse error)."""
    files = {
        "dbt_project.yml": "name: cte\nmodel-paths: [models]\n",
        "models/eph.sql": (
            "{{ config(materialized='ephemeral') }}\nselect 1 as id"
        ),
        "models/uses.sql": (
            "-- leading note\n"
            "with base as (select * from {{ ref('eph') }})\n"
            "select * from base"
        ),
        "models/uses_block.sql": (
            "/* block\n   comment */\n"
            "with base as (select * from {{ ref('eph') }})\n"
            "select * from base"
        ),
    }
    runner = make_project(files, schema="t_cte")
    res = runner.run()
    assert res.ok, [str(r.message) for r in res.results]
    assert spark.table("t_cte.uses").count() == 1
    assert spark.table("t_cte.uses_block").count() == 1


def test_hooks_render_sequentially(make_project, spark):
    """A later hook's RENDER-TIME run_query sees the earlier hook's
    effects (second-opinion review #8: an eager render-all pass
    rendered hook 2 before hook 1 executed)."""
    files = {
        "dbt_project.yml": "name: hseq\nmodel-paths: [models]\n",
        "models/hm.sql": (
            "{{ config(post_hook=["
            "'create table t_hseq.audit as select 41 as n', "
            "\"{% set r = run_query('select n from t_hseq.audit') %}"
            "create table t_hseq.log as select "
            "{{ r.rows[0][0] + 1 }} as v\"]) }}\n"
            "select 1 as id"
        ),
    }
    runner = make_project(files, schema="t_hseq")
    # idempotence across repeated test runs: the hook-created tables
    # are plain managed tables in the SESSION warehouse (outside the
    # engine's swap); leftover files from a prior pytest process make
    # the bare CREATE fail with LOCATION_ALREADY_EXISTS
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("audit", "log"):
        spark.sql(f"DROP TABLE IF EXISTS t_hseq.{t}")
        shutil.rmtree(f"{wh}/t_hseq.db/{t}", ignore_errors=True)
    res = runner.run()
    assert res.ok, [str(r.message) for r in res.results]
    assert spark.table("t_hseq.log").first()["v"] == 42
