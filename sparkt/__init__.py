"""sparkt — a PySpark-native SQL transformation engine.

A from-scratch reimplementation of the capabilities of dbt-core
(reference: /root/reference, v1.9.0a1): projects of Jinja-templated SQL
models, seeds, snapshots, sources, and tests are parsed into a manifest,
linked into a DAG, and executed level-parallel against one in-process
``SparkSession``. The entire warehouse/adapter stack of the reference is
replaced by Spark SQL + a parquet-backed storage layer; Catalyst/AQE
supplies every relational optimization the reference delegates to
warehouses (reference: SURVEY.md §4).
"""

__version__ = "0.1.0"

from sparkt.project import Project, load_project
from sparkt.runner import Runner

__all__ = ["Project", "load_project", "Runner", "__version__"]
