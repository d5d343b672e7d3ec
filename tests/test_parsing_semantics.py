"""Parse-semantics regressions from the r12 parsing-path review:
env-var cache invalidation, the config precedence ladder, python
dbt.config() literal types, version-pinned refs, duplicate guards."""

from __future__ import annotations

import os

import pytest

from sparkt.exceptions import ParsingError
from sparkt.parsing.parser import ManifestLoader
from sparkt.runner import Runner


def test_env_var_change_invalidates_parse_cache(make_project, spark):
    """A changed env var re-parses even with no file edits (review
    #1): the cached schema must not stick to the old TENANT."""
    files = {
        "dbt_project.yml": "name: envc\nmodel-paths: [models]\n",
        "models/m.sql": (
            "{{ config(schema=env_var('SPARKT_TEST_TENANT', 'a')) }}\n"
            "select 1 as id"
        ),
    }
    os.environ["SPARKT_TEST_TENANT"] = "a"
    try:
        runner = make_project(files, schema="t_envc")
        assert runner.run().ok
        os.environ["SPARKT_TEST_TENANT"] = "b"
        r2 = Runner(runner.project.project_root, spark=spark,
                    project_overrides={"schema": "t_envc"})
        node = r2.manifest.nodes["model.envc.m"]
        assert node.config.get("schema") == "b", node.config
    finally:
        os.environ.pop("SPARKT_TEST_TENANT", None)


def test_config_precedence_ladder(make_project, spark):
    """dbt precedence: project tree < schema-yml < in-file config()
    (review #2 — yml lost to the project tree). Tags append across
    every rung."""
    files = {
        "dbt_project.yml": (
            "name: prec\nmodel-paths: [models]\n"
            "models:\n  prec:\n    +materialized: table\n"
            "    +tags: [proj_tag]\n"
        ),
        # no in-file config: yml must beat the project tree
        "models/yml_wins.sql": "select 1 as id",
        # in-file config: beats yml
        "models/file_wins.sql": (
            "{{ config(materialized='table') }}\nselect 1 as id"
        ),
        "models/schema.yml": """
version: 2
models:
  - name: yml_wins
    config:
      materialized: view
      tags: [yml_tag]
  - name: file_wins
    config:
      materialized: view
""",
    }
    runner = make_project(files, schema="t_prec")
    n1 = runner.manifest.nodes["model.prec.yml_wins"]
    assert n1.config["materialized"] == "view"
    assert set(n1.tags) >= {"proj_tag", "yml_tag"}
    n2 = runner.manifest.nodes["model.prec.file_wins"]
    assert n2.config["materialized"] == "table"


def test_python_config_literal_types(make_project, spark):
    """dbt.config() keeps literal types (review #3): enabled=False
    disables; lists parse."""
    files = {
        "dbt_project.yml": "name: pyl\nmodel-paths: [models]\n",
        "models/off.py": (
            "def model(dbt, session):\n"
            "    dbt.config(materialized='table', enabled=False)\n"
            "    return session.sql('select 1 as id')\n"
        ),
        "models/parts.py": (
            "def model(dbt, session):\n"
            "    dbt.config(materialized='table',\n"
            "               partition_by=['a', 'b'])\n"
            "    return session.sql(\"select 1 as a, 2 as b, 3 as c\")\n"
        ),
    }
    runner = make_project(files, schema="t_pyl")
    off = runner.manifest.nodes["model.pyl.off"]
    assert off.config["enabled"] is False
    parts = runner.manifest.nodes["model.pyl.parts"]
    assert parts.config["partition_by"] == ["a", "b"]
    res = runner.run()
    assert res.ok
    assert not any("off" == r.unique_id.split(".")[-1] for r in res.results)


def test_root_macro_overrides_package_macro(make_project, spark, tmp_path):
    """An unqualified macro resolves root-project-over-packages
    (review #4)."""
    pkg = tmp_path / "pkg"
    (pkg / "macros").mkdir(parents=True)
    (pkg / "dbt_project.yml").write_text(
        "name: dep\nmacro-paths: [macros]\n"
    )
    (pkg / "macros" / "greet.sql").write_text(
        "{% macro greet() %}pkg{% endmacro %}"
    )
    files = {
        "dbt_project.yml": (
            "name: rmac\nmodel-paths: [models]\nmacro-paths: [macros]\n"
        ),
        "packages.yml": f"packages:\n  - local: {pkg}\n",
        "macros/greet.sql": "{% macro greet() %}root{% endmacro %}",
        "models/who.sql": "select '{{ greet() }}' as who",
    }
    runner = make_project(files, schema="t_rmac")
    assert runner.run().ok
    assert spark.table("t_rmac.who").first()["who"] == "root"


def test_ref_version_pin_creates_edge_to_pinned_version(
    make_project, spark
):
    """ref('m', v=1) depends on v1, not latest (review #5)."""
    files = {
        "dbt_project.yml": "name: vpin\nmodel-paths: [models]\n",
        "models/m_v1.sql": "select 1 as id",
        "models/m_v2.sql": "select 2 as id",
        "models/uses_v1.sql": "select * from {{ ref('m', v=1) }}",
        "models/schema.yml": """
version: 2
models:
  - name: m
    latest_version: 2
    versions:
      - v: 1
      - v: 2
""",
    }
    runner = make_project(files, schema="t_vpin")
    n = runner.manifest.nodes["model.vpin.uses_v1"]
    assert "model.vpin.m_v1" in n.depends_on
    assert "model.vpin.m_v2" not in n.depends_on
    assert runner.run().ok
    assert spark.table("t_vpin.uses_v1").first()["id"] == 1


def test_versioned_fallback_collision_raises(make_project, spark):
    """Two versions binding the same fallback file is a parse error
    (review #7), not a silent overwrite."""
    files = {
        "dbt_project.yml": "name: vcol\nmodel-paths: [models]\n",
        "models/m.sql": "select 1 as id",
        "models/schema.yml": """
version: 2
models:
  - name: m
    versions:
      - v: 1
      - v: 2
""",
    }
    with pytest.raises(ParsingError, match="both bind"):
        make_project(files, schema="t_vcol")


def test_duplicate_source_across_packages_raises(
    make_project, spark, tmp_path
):
    """The same source.table declared by two packages is a parse
    error (review #6), not walk-order-dependent last-wins."""
    pkg = tmp_path / "srcpkg"
    (pkg / "models").mkdir(parents=True)
    (pkg / "dbt_project.yml").write_text(
        "name: srcdep\nmodel-paths: [models]\n"
    )
    (pkg / "models" / "sources.yml").write_text(
        "version: 2\nsources:\n  - name: raw\n    tables:\n"
        "      - name: events\n"
    )
    files = {
        "dbt_project.yml": "name: sdup\nmodel-paths: [models]\n",
        "packages.yml": f"packages:\n  - local: {pkg}\n",
        "models/sources.yml": (
            "version: 2\nsources:\n  - name: raw\n    tables:\n"
            "      - name: events\n"
        ),
    }
    with pytest.raises(ParsingError, match="duplicate source"):
        make_project(files, schema="t_sdup")


def test_env_snapshot_survives_partial_reparse(make_project, spark):
    """The env snapshot carries through a partial reparse of an
    UNRELATED file (second-opinion review #1): run 2 edits only
    model b (model a served from cache, its env_var never re-read);
    run 3 with a changed env var must STILL invalidate."""
    files = {
        "dbt_project.yml": "name: envp\nmodel-paths: [models]\n",
        "models/a.sql": (
            "{{ config(schema=env_var('SPARKT_TEST_TENANT2', 'a')) }}\n"
            "select 1 as id"
        ),
        "models/b.sql": "select 2 as id",
    }
    os.environ["SPARKT_TEST_TENANT2"] = "a"
    try:
        runner = make_project(files, schema="t_envp")
        assert runner.run().ok
        # run 2: touch only b.sql — a.sql comes from the per-file cache
        with open(os.path.join(runner.project.project_root,
                               "models", "b.sql"), "w") as f:
            f.write("select 3 as id")
        r2 = Runner(runner.project.project_root, spark=spark,
                    project_overrides={"schema": "t_envp"})
        assert r2.manifest.nodes["model.envp.a"].config["schema"] == "a"
        # run 3: env change must invalidate even though no file changed
        os.environ["SPARKT_TEST_TENANT2"] = "b"
        r3 = Runner(runner.project.project_root, spark=spark,
                    project_overrides={"schema": "t_envp"})
        assert r3.manifest.nodes["model.envp.a"].config["schema"] == "b"
    finally:
        os.environ.pop("SPARKT_TEST_TENANT2", None)
