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
        from sparkt.contracts import (
            enforce_constraints,
            enforce_contract_columns,
        )

        # through the ADAPTER, not a bare ctx.spark.sql: replay mode
        # runs with spark = None and a session touch is itself a
        # divergence (the incremental path's DESCRIBE QUERY doctrine;
        # r12 core review #4)
        _, res = ctx.adapter.execute(
            f"DESCRIBE QUERY {node.compiled_code}", fetch=True
        )
        enforce_contract_columns(
            node, {r["col_name"]: r["data_type"] for r in res}
        )
        enforce_constraints(node, ctx.adapter)


def persist_docs(ctx: "MatContext", node: ParsedNode, rel=None,
                 is_view: bool = False) -> None:
    """``persist_docs: {relation: bool, columns: bool}`` — write
    descriptions into the catalog as comments (reference: adapter
    macro ``persist_docs``, exercised by ``tests/functional/docs``;
    warehouse-visible docs are how BI tools surface dbt descriptions).
    Spark: ``COMMENT ON TABLE`` and ``ALTER TABLE ... ALTER COLUMN
    ... COMMENT`` for tables; views only support the table-level
    comment via ``TBLPROPERTIES``."""
    cfg = node.config.get("persist_docs") or {}
    if not cfg:
        return
    rel = rel or node.relation
    from sparkt.adapter import _sql_str

    def q(s: str) -> str:
        # _sql_str handles escapedStringLiterals-aware escaping (the
        # same policy every other generated literal uses)
        return "'" + _sql_str(ctx.spark, s) + "'"

    if cfg.get("relation") and node.description:
        if is_view:
            ctx.adapter.execute(
                f"ALTER VIEW {rel.render()} SET TBLPROPERTIES "
                f"('comment' = {q(node.description)})"
            )
        else:
            ctx.adapter.execute(
                f"COMMENT ON TABLE {rel.render()} IS {q(node.description)}"
            )
    if cfg.get("columns") and not is_view:
        for name, col in (node.columns or {}).items():
            desc = (col or {}).get("description")
            if desc:
                ctx.adapter.execute(
                    f"ALTER TABLE {rel.render()} ALTER COLUMN "
                    f"{bt(name)} COMMENT {q(desc)}"
                )


def bt(name: str) -> str:
    """Backtick-quote an identifier for generated DML (reference:
    column quoting, ``tests/functional/column_quoting`` — merges and
    snapshots must survive reserved-word/special-char column names).
    Delegates to the single shared implementation."""
    from sparkt.relation import quote_identifier

    return quote_identifier(name)


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
