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
