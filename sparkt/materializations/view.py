"""view / ephemeral / analysis materializations.

Reference behavior: ``CREATE OR REPLACE VIEW AS <select>``; default
materialization is view (``artifacts/resources/v1/config.py:81``),
pinned by ``tests/functional/basic/test_simple_reference.py``.
"""

from __future__ import annotations

from sparkt.materializations import (
    MatContext,
    check_contract,
    persist_docs,
    register,
)


@register("view")
def materialize_view(ctx: MatContext, node):
    ctx.compiler.compile_node(node)
    check_contract(ctx, node)
    ctx.adapter.create_view_as(node.relation, node.compiled_code)
    persist_docs(ctx, node, is_view=True)
    return "CREATE VIEW"


@register("ephemeral")
def materialize_ephemeral(ctx: MatContext, node):
    """Never materialized; downstream nodes splice the compiled SQL in
    as a ``__dbt__cte__<name>`` CTE (``compilation.py:302-392``)."""
    ctx.compiler.compile_node(node)
    return "EPHEMERAL (compiled only)"


@register("analysis")
def materialize_analysis(ctx: MatContext, node):
    ctx.compiler.compile_node(node)
    return "ANALYSIS (compiled only)"
