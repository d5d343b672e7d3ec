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
