"""Local package dependencies (reference: core/dbt/deps, local
packages): package macros join the namespace, package models join the
DAG under their own package name, two-arg ref() disambiguates."""

from __future__ import annotations

import os

from tests.conftest import write_files


def test_local_package(make_project, spark, tmp_path):
    pkg_root = str(tmp_path / "shared_pkg")
    write_files(pkg_root, {
        "dbt_project.yml": "name: shared_pkg\nmodel-paths: [models]\nmacro-paths: [macros]\n",
        "macros/cents.sql": (
            "{% macro to_dollars(col) %}round({{ col }} / 100.0, 2){% endmacro %}"
        ),
        "models/pkg_base.sql": "select 1 as id, 250 as cents",
    })
    files = {
        "dbt_project.yml": "name: app\nmodel-paths: [models]\n",
        "packages.yml": f"packages:\n  - local: {pkg_root}\n",
        "models/uses_pkg.sql": (
            "select id, {{ to_dollars('cents') }} as dollars "
            "from {{ ref('shared_pkg', 'pkg_base') }}"
        ),
    }
    runner = make_project(files, schema="t_pkg")
    assert "model.shared_pkg.pkg_base" in runner.manifest.nodes
    assert "model.app.uses_pkg" in runner.manifest.nodes
    res = runner.run()
    assert res.ok, [r.message for r in res.results]
    row = spark.table("t_pkg.uses_pkg").first()
    assert row["dollars"] == 2.5
    # package model resolved as dependency
    assert runner.manifest.nodes["model.app.uses_pkg"].depends_on == [
        "model.shared_pkg.pkg_base"
    ]
