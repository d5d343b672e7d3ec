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


def test_package_yaml_sources_tests_snapshots(make_project, spark, tmp_path):
    """Package schema YAML (sources, generic tests) and snapshot blocks
    must load — not just package models/seeds/macros."""
    pkg_root = str(tmp_path / "yaml_pkg")
    write_files(pkg_root, {
        "dbt_project.yml": (
            "name: yaml_pkg\nmodel-paths: [models]\nsnapshot-paths: [snapshots]\n"
        ),
        "models/sources.yml": (
            "version: 2\n"
            "sources:\n"
            "  - name: pkg_src\n"
            "    schema: pkg_src\n"
            "    tables:\n"
            "      - name: orders\n"
            "        external: {location: /root/testdata/sf0.001/orders.parquet}\n"
            "models:\n"
            "  - name: pkg_model\n"
            "    columns:\n"
            "      - name: okey\n"
            "        data_tests: [not_null]\n"
        ),
        "models/pkg_model.sql": (
            "select o_orderkey as okey from {{ source('pkg_src', 'orders') }}"
        ),
        "snapshots/pkg_snap.sql": (
            "{% snapshot pkg_snap %}\n"
            "{{ config(target_schema='t_pkgy_snap', unique_key='okey', "
            "strategy='check', check_cols=['okey']) }}\n"
            "select okey from {{ ref('yaml_pkg', 'pkg_model') }}\n"
            "{% endsnapshot %}"
        ),
    })
    files = {
        "dbt_project.yml": "name: app2\nmodel-paths: [models]\n",
        "packages.yml": f"packages:\n  - local: {pkg_root}\n",
        "models/app_top.sql": "select okey from {{ ref('yaml_pkg', 'pkg_model') }}",
    }
    runner = make_project(files, schema="t_pkgy")
    m = runner.manifest
    assert "source.pkg_src.orders" in m.sources
    assert "snapshot.yaml_pkg.pkg_snap" in m.nodes
    test_uids = [u for u in m.nodes if u.startswith("test.yaml_pkg.not_null_pkg_model")]
    assert test_uids, sorted(u for u in m.nodes if u.startswith("test."))
    assert runner.run().ok
    assert runner.test().ok
    assert runner.snapshot().ok


def _mini_pkg_files(name):
    return {
        "dbt_project.yml": f"name: {name}\nmodel-paths: [models]\n",
        "models/tar_model.sql": "select 42 as answer",
    }


def test_tarball_package(make_project, spark, tmp_path):
    import tarfile

    pkg_root = str(tmp_path / "tar_pkg")
    write_files(pkg_root, _mini_pkg_files("tar_pkg"))
    tb = str(tmp_path / "tar_pkg.tar.gz")
    with tarfile.open(tb, "w:gz") as tf:
        tf.add(pkg_root, arcname="tar_pkg")
    files = {
        "dbt_project.yml": "name: tapp\nmodel-paths: [models]\n",
        "packages.yml": f"packages:\n  - tarball: {tb}\n",
        "models/top.sql": "select answer from {{ ref('tar_pkg', 'tar_model') }}",
    }
    runner = make_project(files, schema="t_tar")
    assert "model.tar_pkg.tar_model" in runner.manifest.nodes
    assert runner.run().ok
    assert spark.table("t_tar.top").first()["answer"] == 42


def test_git_package_local_repo(make_project, spark, tmp_path):
    import subprocess

    pkg_root = str(tmp_path / "git_pkg")
    write_files(pkg_root, _mini_pkg_files("git_pkg"))
    env = {"GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t",
           "PATH": os.environ["PATH"], "HOME": os.environ.get("HOME", "/root")}
    for cmd in (["git", "init", "-q", "-b", "main"],
                ["git", "add", "-A"],
                ["git", "commit", "-q", "-m", "pkg"],
                ["git", "tag", "v1.0"]):
        subprocess.run(cmd, cwd=pkg_root, check=True, env=env)
    files = {
        "dbt_project.yml": "name: gapp\nmodel-paths: [models]\n",
        "packages.yml": (
            f"packages:\n  - git: file://{pkg_root}\n    revision: v1.0\n"
        ),
        "models/gtop.sql": "select answer from {{ ref('git_pkg', 'tar_model') }}",
    }
    runner = make_project(files, schema="t_git")
    assert "model.git_pkg.tar_model" in runner.manifest.nodes
    assert runner.run().ok
    assert spark.table("t_git.gtop").first()["answer"] == 42


def test_hub_package_raises(make_project, tmp_path):
    import pytest

    from sparkt.exceptions import ParsingError

    files = {
        "dbt_project.yml": "name: happ\nmodel-paths: [models]\n",
        "packages.yml": (
            "packages:\n  - package: dbt-labs/dbt_utils\n    version: 1.0.0\n"
        ),
        "models/x.sql": "select 1 as a",
    }
    with pytest.raises(ParsingError):
        make_project(files, schema="t_hub")


# ----------------------------------------------------------- hub registry
def _mk_registry(tmp_path):
    """Hub-API-shaped local registry fixture: acme/math_utils in three
    versions (1.0.0 / 1.2.0 / 2.0.0, distinguishable by macro output);
    1.2.0 depends on acme/base_pkg >=0.1.0 through its own
    packages.yml (nested hub dep)."""
    import json
    import tarfile

    reg = tmp_path / "registry"
    (reg / "api" / "v1" / "acme").mkdir(parents=True)
    (reg / "tarballs").mkdir()

    def pkg_tar(name, version, files):
        root = tmp_path / f"src_{name}_{version.replace('.', '_')}"
        write_files(str(root), files)
        tb = reg / "tarballs" / f"{name}-{version}.tar.gz"
        with tarfile.open(tb, "w:gz") as tf:
            tf.add(str(root), arcname=name)
        return f"tarballs/{name}-{version}.tar.gz"

    versions = {}
    for v in ("1.0.0", "1.2.0", "2.0.0"):
        files = {
            "dbt_project.yml": "name: math_utils\nmacro-paths: [macros]\n",
            "macros/mult.sql": (
                "{% macro mult(col) %}" + f"({{{{ col }}}} * {v[0]}0)"
                + "{% endmacro %}"
            ),
        }
        if v == "1.2.0":
            files["packages.yml"] = (
                "packages:\n  - package: acme/base_pkg\n"
                "    version: \">=0.1.0\"\n"
            )
        versions[v] = {"downloads": {"tarball": pkg_tar("math_utils", v, files)}}
    with open(reg / "api" / "v1" / "acme" / "math_utils.json", "w") as f:
        json.dump({"name": "acme/math_utils", "versions": versions}, f)

    base_tb = pkg_tar("base_pkg", "0.2.0", {
        "dbt_project.yml": "name: base_pkg\nmodel-paths: [models]\n",
        "models/base_answer.sql": "select 7 as n",
    })
    with open(reg / "api" / "v1" / "acme" / "base_pkg.json", "w") as f:
        json.dump({"name": "acme/base_pkg", "versions": {
            "0.1.0": {"downloads": {"tarball": base_tb}},
            "0.2.0": {"downloads": {"tarball": base_tb}},
        }}, f)
    return str(reg)


def test_hub_registry_semver_and_lock(make_project, spark, tmp_path, monkeypatch):
    """Hub pin resolution (reference core/dbt/deps/registry.py:30 +
    task/deps.py): range picks highest installable (1.2.0, not 2.0.0),
    nested hub dep installs, package-lock.yml round-trips."""
    import os as _os

    import yaml

    monkeypatch.setenv("DBT_PACKAGE_HUB_URL", _mk_registry(tmp_path))
    files = {
        "dbt_project.yml": "name: hubapp\nmodel-paths: [models]\n",
        "packages.yml": (
            "packages:\n  - package: acme/math_utils\n"
            "    version: [\">=1.0.0\", \"<2.0.0\"]\n"
        ),
        "models/m.sql": (
            "select {{ mult('n') }} as out_v "
            "from {{ ref('base_pkg', 'base_answer') }}"
        ),
    }
    runner = make_project(files, schema="t_hubreg")
    # nested hub dep joined the manifest
    assert "model.base_pkg.base_answer" in runner.manifest.nodes
    res = runner.run()
    assert res.ok, [r.message for r in res.results]
    # 1.2.0's macro multiplies by 10 → 7 * 10
    assert spark.table("t_hubreg.m").first()["out_v"] == 70

    lock_path = _os.path.join(runner.project.project_root, "package-lock.yml")
    with open(lock_path) as f:
        lock = yaml.safe_load(f)
    assert {"package": "acme/math_utils", "version": "1.2.0"} in lock["packages"]
    assert {"package": "acme/base_pkg", "version": "0.2.0"} in lock["packages"]
    assert lock["sha1_hash"]

    # lock reuse: wipe the registry env — a valid lock + installed
    # packages must not re-resolve
    from sparkt.runner import Runner

    monkeypatch.setenv("DBT_PACKAGE_HUB_URL", str(tmp_path / "nope"))
    runner2 = Runner(
        runner.project.project_root, spark=spark,
        project_overrides={"schema": "t_hubreg"},
    )
    assert "model.base_pkg.base_answer" in runner2.manifest.nodes


def test_hub_semver_resolution_unit():
    from sparkt.deps import parse_specs, resolve_version

    avail = ["0.9.0", "1.0.0", "1.4.0", "1.5.0-b1", "2.0.0"]
    assert resolve_version(parse_specs(">=1.0.0,<2.0.0"), avail) == "1.4.0"
    assert resolve_version(parse_specs(["=2.0.0"]), avail) == "2.0.0"
    # prerelease only installable when a spec names one
    assert resolve_version(parse_specs(">=1.5.0-a1"), avail) == "2.0.0"
    import pytest

    from sparkt.exceptions import ParsingError

    with pytest.raises(ParsingError, match="no version matching"):
        resolve_version(parse_specs([">=3.0.0"]), avail)


def test_source_overrides(make_project, spark, tmp_path):
    """A root-project source with `overrides: <package>` replaces the
    package's same-named source: override tables win by name (here the
    identifier swaps to a different parquet), source-level freshness
    defaults from the override apply, and package-only tables survive
    (reference tests/functional/source_overrides)."""
    pkg_root = str(tmp_path / "src_pkg")
    write_files(pkg_root, {
        "dbt_project.yml": "name: src_pkg\nmodel-paths: [models]\n",
        "models/sources.yml": """
version: 2
sources:
  - name: shared_src
    schema: pkg_schema
    freshness:
      error_after: {count: 1, period: day}
    tables:
      - name: main_tbl
        external: {location: /root/testdata/sf0.001/region.parquet}
      - name: side_tbl
        external: {location: /root/testdata/sf0.001/nation.parquet}
""",
        "models/pkg_model.sql": (
            "select count(*) as n from {{ source('shared_src', 'main_tbl') }}"
        ),
    })
    files = {
        "dbt_project.yml": "name: app\nmodel-paths: [models]\n",
        "packages.yml": f"packages:\n  - local: {pkg_root}\n",
        "models/sources.yml": """
version: 2
sources:
  - name: shared_src
    overrides: src_pkg
    schema: root_schema
    freshness:
      error_after: {count: 99, period: day}
    tables:
      - name: main_tbl
        external: {location: /root/testdata/sf0.001/customer.parquet}
""",
    }
    runner = make_project(files, schema="t_srcovr")
    src = runner.manifest.sources["source.shared_src.main_tbl"]
    # override won: root schema, customer location, override freshness
    assert src.config["schema"] == "root_schema"
    assert "customer.parquet" in src.external_location
    assert src.freshness["error_after"]["count"] == 99
    # package-only table survives with the override's source defaults
    side = runner.manifest.sources["source.shared_src.side_tbl"]
    assert side.config["schema"] == "root_schema"
    assert "nation.parquet" in side.external_location
    # the package model reads through the overridden source
    res = runner.run()
    assert res.ok, [r.message for r in res.results]
    n = spark.table("t_srcovr.pkg_model").first()["n"]
    # customer table at sf0.001 has 1500 rows (region would be 5)
    assert n > 100


def test_root_project_configures_package_models(make_project, spark):
    """Root-over-package config precedence (r9, reference
    core/dbt/config precedence): the ROOT dbt_project.yml's
    ``models: {<package>: {...}}`` tree applies to the dependency's
    models — scalars override the package's own tree, tags append —
    and bare top-level +defaults apply to every package."""
    files = {
        "dbt_project.yml": (
            "name: rootp\nmodel-paths: [models]\nseed-paths: [seeds]\n"
            "packages-install-path: sub\n"
            "models:\n"
            "  +meta: {env: ci}\n"
            "  dep_pkg:\n"
            "    +materialized: table\n"
            "    +tags: [from_root]\n"
        ),
        "packages.yml": "packages:\n  - local: sub/dep_pkg\n",
        "seeds/raw.csv": "id\n1\n2\n",
        "models/own.sql": "select * from {{ ref('raw') }}",
        "sub/dep_pkg/dbt_project.yml": (
            "name: dep_pkg\nmodel-paths: [models]\n"
            "models:\n  dep_pkg:\n    +materialized: view\n"
            "    +tags: [from_pkg]\n"
        ),
        "sub/dep_pkg/models/dep_model.sql": (
            "select * from {{ ref('raw') }}"
        ),
    }
    runner = make_project(files, schema="t_rootpkg")
    dep = runner.manifest.nodes["model.dep_pkg.dep_model"]
    # root's scalar wins over the package's own view default
    assert dep.config["materialized"] == "table"
    # tags append: package tree first, then root tree
    assert dep.tags == ["from_pkg", "from_root"]
    # bare top-level +defaults reach the package too
    assert dep.config["meta"] == {"env": "ci"}
    # the root's own model is untouched by the package subtree
    own = runner.manifest.nodes["model.rootp.own"]
    assert "from_root" not in own.tags
    assert own.config["meta"] == {"env": "ci"}
    assert runner.seed().ok
    res = runner.run()
    assert res.ok, [r.message for r in res.results]
    assert spark.catalog.tableExists("t_rootpkg.dep_model")
