"""File-level partial parsing (sparkt/partial.py; reference
``core/dbt/parser/partial.py``): a changed project re-parses exactly
the changed files, serving every unchanged file's parse output from
the per-file cache. No SparkSession needed — parser-only tests."""

from __future__ import annotations

import os

from sparkt.parsing.parser import ManifestLoader
from sparkt.project import load_project


def _write(root: str, rel: str, content: str) -> None:
    path = os.path.join(root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def _make_project(root: str, n_models: int = 100) -> None:
    _write(root, "dbt_project.yml", "name: pp\nmodel-paths: [models]\n")
    _write(root, "models/m_0.sql",
           "{{ config(materialized='view') }}\nselect 1 as id")
    for i in range(1, n_models):
        _write(root, f"models/m_{i}.sql",
               "{{ config(materialized='view') }}\n"
               f"select id from {{{{ ref('m_{i - 1}') }}}}")
    _write(root, "models/schema.yml",
           "version: 2\nmodels:\n  - name: m_0\n"
           "    description: first model\n")


def test_one_file_edit_reparses_exactly_one_file(tmp_path):
    root = str(tmp_path)
    _make_project(root, 100)

    cold = ManifestLoader(load_project(root))
    cold.load()
    assert cold.files_reparsed == 101  # 100 models + 1 yml

    # edit ONE model: only that file's parse runs; everything else is
    # served from the per-file cache (the whole-manifest fast path
    # misses because a hash changed)
    _write(root, "models/m_50.sql",
           "{{ config(materialized='table') }}\n"
           "select id, 2 as v from {{ ref('m_49') }}")
    warm = ManifestLoader(load_project(root))
    manifest = warm.load()
    assert warm.files_reparsed == 1
    node = manifest.nodes["model.pp.m_50"]
    assert node.config["materialized"] == "table"
    assert "2 as v" in node.raw_code
    # ref resolution re-ran over cached nodes
    assert node.depends_on == ["model.pp.m_49"]
    assert manifest.nodes["model.pp.m_51"].depends_on == [
        "model.pp.m_50"
    ]
    # cached nodes still carry their yml patches
    assert manifest.nodes["model.pp.m_0"].description == "first model"

    # untouched project afterwards: whole-manifest fast path, 0 parses
    warm2 = ManifestLoader(load_project(root))
    warm2.load()
    assert warm2.files_reparsed == 0


def test_yml_edit_reparses_only_the_yml(tmp_path):
    root = str(tmp_path)
    _make_project(root, 20)
    ManifestLoader(load_project(root)).load()

    _write(root, "models/schema.yml",
           "version: 2\nmodels:\n  - name: m_0\n"
           "    description: edited description\n")
    warm = ManifestLoader(load_project(root))
    manifest = warm.load()
    assert warm.files_reparsed == 1
    assert manifest.nodes["model.pp.m_0"].description == (
        "edited description"
    )


def test_macro_change_invalidates_file_cache(tmp_path):
    """Macros are a global parse input: a macro edit discards the
    per-file cache entirely (the reference's partial.py schedules a
    full re-parse for macro changes too)."""
    root = str(tmp_path)
    _make_project(root, 20)
    _write(root, "dbt_project.yml",
           "name: pp\nmodel-paths: [models]\nmacro-paths: [macros]\n")
    _write(root, "macros/my_macro.sql",
           "{% macro my_macro() %}1{% endmacro %}")
    ManifestLoader(load_project(root)).load()

    _write(root, "macros/my_macro.sql",
           "{% macro my_macro() %}2{% endmacro %}")
    warm = ManifestLoader(load_project(root))
    warm.load()
    assert warm.files_reparsed == 21  # every model + the yml


def test_project_vars_change_invalidates_file_cache(tmp_path):
    root = str(tmp_path)
    _make_project(root, 10)
    ManifestLoader(load_project(root)).load()

    warm = ManifestLoader(load_project(root), cli_vars={"x": 1})
    warm.load()
    assert warm.files_reparsed == 11


def test_deleted_file_drops_node_and_added_file_parses(tmp_path):
    root = str(tmp_path)
    _make_project(root, 10)
    ManifestLoader(load_project(root)).load()

    os.remove(os.path.join(root, "models/m_9.sql"))
    _write(root, "models/m_new.sql", "select id from {{ ref('m_8') }}")
    warm = ManifestLoader(load_project(root))
    manifest = warm.load()
    assert warm.files_reparsed == 1
    assert "model.pp.m_9" not in manifest.nodes
    assert manifest.nodes["model.pp.m_new"].depends_on == [
        "model.pp.m_8"
    ]


def test_cache_snapshot_is_pre_patch(tmp_path):
    """Nodes are cached BEFORE yml patches mutate them: removing the
    yml patch must not leave a stale description on a cached node."""
    root = str(tmp_path)
    _make_project(root, 5)
    ManifestLoader(load_project(root)).load()

    _write(root, "models/schema.yml", "version: 2\n")
    manifest = ManifestLoader(load_project(root)).load()
    assert manifest.nodes["model.pp.m_0"].description == ""


def test_package_custom_paths_edit_invalidates_cache(tmp_path):
    """A package declaring NON-default path lists (model-paths:
    [custom]) must have its files hashed with the package's OWN paths,
    not the root project's — otherwise edits there never change the
    hash map and both cache tiers serve stale parses (ADVICE r7)."""
    root = str(tmp_path / "app")
    pkg = str(tmp_path / "pkg")
    _write(pkg, "dbt_project.yml",
           "name: cpk\nmodel-paths: [custom_models]\n")
    _write(pkg, "custom_models/pmod.sql", "select 1 as v")
    _write(root, "dbt_project.yml", "name: pp\nmodel-paths: [models]\n")
    _write(root, "packages.yml", f"packages:\n  - local: {pkg}\n")
    _write(root, "models/uses.sql",
           "select v from {{ ref('cpk', 'pmod') }}")

    cold = ManifestLoader(load_project(root))
    m1 = cold.load()
    assert m1.nodes["model.cpk.pmod"].raw_code.strip() == "select 1 as v"

    # edit the package model in its custom path: the warm load must
    # see the change (whole-manifest cache miss + file re-parse)
    _write(pkg, "custom_models/pmod.sql", "select 2 as v")
    warm = ManifestLoader(load_project(root))
    m2 = warm.load()
    assert m2.nodes["model.cpk.pmod"].raw_code.strip() == "select 2 as v"
