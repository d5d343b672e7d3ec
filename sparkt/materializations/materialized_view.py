"""materialized_view materialization.

Spark has no managed MVs (SURVEY.md §2.1 notes the divergence), so the
reference semantics are emulated: the MV is a table plus its recorded
refresh query; ``on_configuration_change ∈ {apply, continue, fail}``
(``artifacts/resources/v1/config.py:107-109``) is honored by comparing
the stored definition against the compiled one.
"""

from __future__ import annotations

from sparkt.exceptions import ExecutionError
from sparkt.materializations import MatContext, register

_DEFINITIONS: dict[str, str] = {}  # relation -> last applied SQL


@register("materialized_view")
def materialize_mv(ctx: MatContext, node):
    ctx.compiler.compile_node(node)
    rel = node.relation
    key = rel.render()
    policy = node.config.get("on_configuration_change", "apply")
    existing_sql = _DEFINITIONS.get(key)
    if (
        existing_sql is not None
        and existing_sql != node.compiled_code
        and ctx.adapter.relation_exists(rel)
    ):
        if policy == "fail":
            raise ExecutionError(
                f"{node.unique_id}: materialized view definition changed and "
                f"on_configuration_change='fail'"
            )
        if policy == "continue":
            return "MV UNCHANGED (configuration change ignored)"
    ctx.adapter.create_table_as(rel, select_sql=node.compiled_code)
    _DEFINITIONS[key] = node.compiled_code
    return "CREATE MATERIALIZED VIEW (table + recorded refresh query)"
