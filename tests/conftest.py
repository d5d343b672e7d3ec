"""Shared pytest fixtures: one SparkSession per test session + a
fixture-project builder (the reference's ``dbt.tests.fixtures.project``
analogue, ``tests/conftest.py:4`` in the reference)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkt.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sparkt-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture()
def project_dir(tmp_path):
    """Create an empty project dir; tests add files via write_files."""
    return str(tmp_path)


def write_files(root: str, files: dict[str, str]) -> None:
    for rel, content in files.items():
        path = os.path.join(root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(content)


@pytest.fixture()
def make_project(project_dir, spark):
    """Returns (runner_factory, project_dir)."""
    from sparkt.runner import Runner

    def factory(files: dict[str, str], schema: str, **kw) -> Runner:
        write_files(project_dir, files)
        return Runner(
            project_dir, spark=spark, project_overrides={"schema": schema}, **kw
        )

    return factory
