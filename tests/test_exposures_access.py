"""Exposures as DAG leaves + group/access enforcement on ref
(reference: nodes.py:1282, providers.py:516-543)."""

from __future__ import annotations


def test_exposures_in_graph(make_project):
    files = {
        "dbt_project.yml": "name: exp\nmodel-paths: [models]\nseed-paths: [seeds]\n",
        "seeds/raw.csv": "id\n1\n",
        "models/m.sql": "select * from {{ ref('raw') }}",
        "models/schema.yml": """
version: 2
exposures:
  - name: weekly_dashboard
    type: dashboard
    owner: {name: data team}
    depends_on: ["ref('m')"]
groups:
  - name: finance
    owner: {name: fin}
""",
    }
    runner = make_project(files, schema="t_exp")
    uid = "exposure.exp.weekly_dashboard"
    assert uid in runner.manifest.nodes
    assert runner.manifest.nodes[uid].depends_on == ["model.exp.m"]
    assert "finance" in runner.manifest.groups
    # selection: +exposure pulls its ancestors
    from sparkt.graph.linker import link_graph
    from sparkt.graph.selector import select_nodes

    g = link_graph(runner.manifest)
    sel = select_nodes(g, runner.manifest, "+weekly_dashboard")
    assert {u.split(".")[-1] for u in sel} == {"weekly_dashboard", "m", "raw"}


def test_private_access_enforced(make_project, spark):
    files = {
        "dbt_project.yml": "name: acc\nmodel-paths: [models]\nseed-paths: [seeds]\n",
        "seeds/raw.csv": "id\n1\n",
        "models/internal.sql": (
            "{{ config(access='private', group='core') }}\n"
            "select * from {{ ref('raw') }}"
        ),
        "models/same_group.sql": (
            "{{ config(group='core') }}\nselect * from {{ ref('internal') }}"
        ),
        "models/outsider.sql": (
            "{{ config(group='other') }}\nselect * from {{ ref('internal') }}"
        ),
    }
    runner = make_project(files, schema="t_acc")
    assert runner.seed().ok
    res = runner.run()
    by_name = {r.unique_id.split(".")[-1]: r for r in res.results}
    assert by_name["internal"].status == "success"
    assert by_name["same_group"].status == "success"
    assert by_name["outsider"].status == "error"
    assert "private" in by_name["outsider"].message


def test_model_versions(make_project, spark):
    """Versioned models (nodes.py:426): ref() resolves latest,
    ref(v=N) pins, version: selector sees them."""
    files = {
        "dbt_project.yml": "name: vers\nmodel-paths: [models]\n",
        "models/api_v1.sql": "select 1 as id, 'old' as shape",
        "models/api_v2.sql": "select 1 as id, 'new' as shape, 2 as extra",
        "models/schema.yml": """
version: 2
models:
  - name: api
    latest_version: 2
    versions:
      - v: 1
      - v: 2
""",
        "models/consumer_latest.sql": "select shape from {{ ref('api') }}",
        "models/consumer_pinned.sql": "select shape from {{ ref('api', v=1) }}",
    }
    runner = make_project(files, schema="t_vers")
    res = runner.run()
    assert res.ok, [r.message for r in res.results]
    assert spark.table("t_vers.consumer_latest").first()["shape"] == "new"
    assert spark.table("t_vers.consumer_pinned").first()["shape"] == "old"
    # version: selector
    from sparkt.graph.linker import link_graph
    from sparkt.graph.selector import select_nodes

    g = link_graph(runner.manifest)
    names = lambda s: {u.split(".")[-1] for u in s}  # noqa: E731
    assert names(select_nodes(g, runner.manifest, "version:latest")) == {"api_v2"}
    assert names(select_nodes(g, runner.manifest, "version:old")) == {"api_v1"}
    assert names(select_nodes(g, runner.manifest, "version:1")) == {"api_v1"}


def test_grants_recorded(make_project, spark):
    """grants config standardizes and persists through the adapter
    (in-memory catalog can't GRANT — documented divergence, not a
    silent drop)."""
    files = {
        "dbt_project.yml": "name: gr\nmodel-paths: [models]\n",
        "models/granted.sql": (
            "{{ config(materialized='table', "
            "grants={'select': ['reporter', 'bi_role'], 'insert': 'loader'}) }}\n"
            "select 1 as id"
        ),
    }
    runner = make_project(files, schema="t_gr")
    assert runner.run().ok
    from sparkt.relation import Relation

    got = runner.adapter.get_grants(
        Relation(schema="t_gr", identifier="granted")
    )
    assert got == {"select": ["reporter", "bi_role"], "insert": ["loader"]}
