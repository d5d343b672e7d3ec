"""Materialization registry.

The reference resolves materializations as named Jinja macros
(``core/dbt/contracts/graph/manifest.py:923-961``,
``core/dbt/task/run.py:258-296``). Here each is a Python callable over
the Spark adapter — the idiomatic-Spark re-expression — and the
registry keeps the reference's extension point: projects can register
custom materializations (``tests/functional/materializations/
test_custom_materialization.py`` analogue) via ``@register``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from sparkt.adapter import SparkAdapter
from sparkt.compilation import Compiler
from sparkt.manifest import Manifest, ParsedNode
from sparkt.project import Project


@dataclass
class MatContext:
    spark: Any
    adapter: SparkAdapter
    compiler: Compiler
    manifest: Manifest
    project: Project
    full_refresh: bool = False
    extras: dict = field(default_factory=dict)


MATERIALIZATIONS: dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        MATERIALIZATIONS[name] = fn
        return fn

    return deco


def get_materialization(name: str) -> Callable:
    if name not in MATERIALIZATIONS:
        raise KeyError(f"no materialization named '{name}'")
    return MATERIALIZATIONS[name]


def check_contract(ctx: "MatContext", node: ParsedNode) -> None:
    """Contract enforcement hook (sparkt/contracts.py): analysis-only
    schema check, no data read."""
    if (node.config.get("contract") or {}).get("enforced"):
        from sparkt.contracts import enforce_constraints, enforce_contract

        schema = ctx.spark.sql(node.compiled_code).schema
        enforce_contract(node, schema)
        enforce_constraints(node, ctx.spark)


def unique_key_list(node: ParsedNode) -> list[str]:
    uk = node.config.get("unique_key")
    if uk is None:
        return []
    return [uk] if isinstance(uk, str) else list(uk)


# import for side-effect registration
from sparkt.materializations import (  # noqa: E402,F401
    incremental,
    materialized_view,
    seed,
    snapshot,
    table,
    test,
    unit,
    view,
)
