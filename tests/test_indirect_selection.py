"""Indirect test selection modes (reference
core/dbt/graph/selector.py:216-305 expand_selection /
incorporate_indirect_nodes; tests/functional/indirect_selection/).

Fixture shape: child_model refs parent_model; a relationships test on
child_model depends on BOTH models; each model also carries a
single-parent not_null test; child_model has a unit test (unit tests
are indirectly selectable too, can_select_indirectly ibid:22-34).
"""

from __future__ import annotations

FILES = {
    "dbt_project.yml": "name: ind\nmodel-paths: [models]\n",
    "models/parent_model.sql": "select 1 as id, 'p' as tag",
    "models/child_model.sql": (
        "select id, 'c' as tag from {{ ref('parent_model') }}"
    ),
    "models/schema.yml": """
version: 2
models:
  - name: parent_model
    columns:
      - name: id
        data_tests:
          - not_null
  - name: child_model
    columns:
      - name: id
        data_tests:
          - not_null
          - relationships:
              to: ref('parent_model')
              field: id
unit_tests:
  - name: ut_child
    model: child_model
    given:
      - input: ref('parent_model')
        rows:
          - {id: 7}
    expect:
      rows:
        - {id: 7, tag: c}
""",
}


def _test_names(res):
    return {r.unique_id.split(".")[-1] for r in res.results}


def _setup(make_project, schema):
    runner = make_project(FILES, schema=schema)
    assert runner.run().ok
    return runner


def test_eager_any_parent(make_project, spark):
    # EAGER: child_model alone pulls in the relationships test even
    # though its other parent (parent_model) is unselected
    runner = _setup(make_project, "t_ind_eager")
    names = _test_names(runner.test(select="child_model"))
    assert "not_null_child_model_id" in names
    assert any(n.startswith("relationships_") for n in names)
    assert "ut_child" in names  # unit test rides along
    assert "not_null_parent_model_id" not in names


def test_cautious_requires_all_parents(make_project, spark):
    runner = _setup(make_project, "t_ind_cautious")
    names = _test_names(
        runner.test(select="child_model", indirect_selection="cautious")
    )
    assert "not_null_child_model_id" in names
    assert not any(n.startswith("relationships_") for n in names)
    # both parents selected -> relationships test qualifies (via the
    # post-union incorporate step: each union part selects one parent)
    names = _test_names(runner.test(
        select="child_model parent_model", indirect_selection="cautious"
    ))
    assert any(n.startswith("relationships_") for n in names)


def test_buildable_parents_of_selected(make_project, spark):
    # BUILDABLE: parent_model is an ancestor of child_model, so the
    # relationships test qualifies from child_model alone
    runner = _setup(make_project, "t_ind_build")
    names = _test_names(
        runner.test(select="child_model", indirect_selection="buildable")
    )
    assert any(n.startswith("relationships_") for n in names)
    # but parent_model alone does not reach it (child not an ancestor)
    names = _test_names(
        runner.test(select="parent_model", indirect_selection="buildable")
    )
    assert not any(n.startswith("relationships_") for n in names)
    assert "not_null_parent_model_id" in names


def test_empty_no_expansion(make_project, spark):
    runner = _setup(make_project, "t_ind_empty")
    res = runner.test(select="child_model", indirect_selection="empty")
    assert _test_names(res) == set()
    # build with empty mode still runs the model itself
    res = runner.build(select="child_model", indirect_selection="empty")
    assert _test_names(res) == {"child_model"}


def test_excluded_model_drags_tests_out(make_project, spark):
    runner = _setup(make_project, "t_ind_excl")
    names = _test_names(runner.test(exclude="child_model"))
    assert "not_null_parent_model_id" in names
    assert "not_null_child_model_id" not in names
    assert not any(n.startswith("relationships_") for n in names)


def test_project_flags_tier(make_project, spark):
    files = dict(FILES)
    files["dbt_project.yml"] = (
        "name: ind\nmodel-paths: [models]\n"
        "flags:\n  indirect_selection: cautious\n"
    )
    runner = make_project(files, schema="t_ind_flags")
    assert runner.run().ok
    names = _test_names(runner.test(select="child_model"))
    assert not any(n.startswith("relationships_") for n in names)
    # explicit argument overrides the project tier
    names = _test_names(
        runner.test(select="child_model", indirect_selection="eager")
    )
    assert any(n.startswith("relationships_") for n in names)


def test_yaml_selector_indirect_key(make_project, spark):
    """selectors.yml criteria support a per-criteria
    indirect_selection key (reference selector_spec: 'indirect
    selection: ... in a yaml selector')."""
    files = dict(FILES)
    files["selectors.yml"] = """
selectors:
  - name: cautious_child
    definition:
      method: fqn
      value: child_model
      indirect_selection: cautious
  - name: eager_child
    definition:
      method: fqn
      value: child_model
"""
    runner = make_project(files, schema="t_ind_yaml")
    assert runner.run().ok
    names = _test_names(runner.test(selector="cautious_child"))
    assert "not_null_child_model_id" in names
    assert not any(n.startswith("relationships_") for n in names)
    names = _test_names(runner.test(selector="eager_child"))
    assert any(n.startswith("relationships_") for n in names)


def test_selector_respects_invocation_indirect_mode(make_project, spark):
    """--indirect-selection applies to --selector / default-selector
    paths too (review finding: was silently ignored); the per-criteria
    yaml key still wins over the invocation mode."""
    files = dict(FILES)
    files["selectors.yml"] = """
selectors:
  - name: child_sel
    definition: child_model
"""
    runner = make_project(files, schema="t_ind_selinv")
    assert runner.run().ok
    names = _test_names(runner.test(selector="child_sel"))
    assert any(n.startswith("relationships_") for n in names)  # eager
    names = _test_names(
        runner.test(selector="child_sel", indirect_selection="cautious")
    )
    assert not any(n.startswith("relationships_") for n in names)
    assert "not_null_child_model_id" in names


def test_yaml_union_cross_part_indirect(make_project, spark):
    """selectors.yml union parts accumulate indirect candidates
    BEFORE incorporation, exactly like the CLI's space-union (r12
    runner review #3): union [child_model, parent_model] under
    cautious selects the relationships test depending on both."""
    from sparkt.graph.selector import select_from_definition

    from sparkt.graph.linker import link_graph

    runner = _setup(make_project, "t_ind_yamlu")
    manifest = runner.manifest
    graph = link_graph(manifest, add_test_edges=False)
    definition = {"union": [
        {"method": "fqn", "value": "child_model"},
        {"method": "fqn", "value": "parent_model"},
    ]}
    got = select_from_definition(
        graph, manifest, definition, indirect="cautious"
    )
    rel = [u for u in got if "relationships_" in u]
    assert rel, sorted(got)
    # single part still excludes it under cautious
    one = select_from_definition(
        graph, manifest, {"method": "fqn", "value": "child_model"},
        indirect="cautious",
    )
    assert not [u for u in one if "relationships_" in u]


def test_result_selector_reads_run_results(make_project, spark, tmp_path):
    """result:<status> reads the state dir's run_results.json
    (reference ResultSelectorMethod; r12 runner review #1 — the
    method was dead code and always selected nothing)."""
    import json
    import os

    from sparkt.graph.selector import select_nodes
    from sparkt.state import StateManifest

    runner = _setup(make_project, "t_ind_res")
    target = os.path.join(runner.project.project_root, "target")
    # craft a state dir: current manifest + a run_results marking
    # child_model errored
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    import shutil

    shutil.copy(os.path.join(target, "manifest.json"), state_dir)
    with open(os.path.join(state_dir, "run_results.json"), "w") as f:
        json.dump({"results": [
            {"unique_id": "model.ind.child_model", "status": "error"},
            {"unique_id": "model.ind.parent_model", "status": "success"},
        ]}, f)
    from sparkt.graph.linker import link_graph

    state = StateManifest(state_dir)
    got = select_nodes(link_graph(runner.manifest), runner.manifest,
                       "result:error", state=state)
    # child_model selected (plus its eager-mode attached tests);
    # the success-status parent is not
    assert "model.ind.child_model" in got
    assert "model.ind.parent_model" not in got


def test_selector_version_numeric_and_config_loose(make_project, spark):
    """version: orders numerically (version 10 > 9 — str() compare
    inverted it) and config.<key> matches bools loosely + globs (r12
    runner review #5/#6)."""
    import pytest as _pytest

    from sparkt.exceptions import SelectorError
    from sparkt.graph.selector import select_nodes

    from sparkt.graph.linker import link_graph

    runner = _setup(make_project, "t_ind_ver")
    manifest = runner.manifest
    graph = link_graph(manifest)
    child = manifest.nodes["model.ind.child_model"]
    child.config["version"] = 10
    child.config["latest_version"] = 9
    child.config["full_refresh"] = True
    try:
        got = select_nodes(graph, manifest, "version:prerelease")
        assert "model.ind.child_model" in got
        assert not select_nodes(graph, manifest, "version:old") & {
            "model.ind.child_model"
        }
        got = select_nodes(graph, manifest, "config.full_refresh:true")
        assert "model.ind.child_model" in got
        child.config["custom_key"] = "abcdef"
        got = select_nodes(graph, manifest, "config.custom_key:ab*")
        assert "model.ind.child_model" in got  # glob matches
        with _pytest.raises(SelectorError):
            select_nodes(graph, manifest, "++child_model")
    finally:
        for k in ("version", "latest_version", "full_refresh",
                  "custom_key"):
            child.config.pop(k, None)
