"""seed materialization: CSV → table.

Reference: ``core/dbt/task/seed.py:16-60``;
``artifacts/resources/v1/seed.py:15-24`` (delimiter, quote_columns,
column_types). Agate's inference is replaced by Spark CSV inference
pinned to agate-like behavior: header on, type inference on, dates
preferred over strings, empty string → NULL (SURVEY.md §7 "Seeds/agate
type inference").
"""

from __future__ import annotations

from sparkt.materializations import MatContext, persist_docs, register


@register("seed")
def materialize_seed(ctx: MatContext, node):
    path = node.config["seed_path"]
    rel = ctx.compiler.relation_for(node)
    node.relation = rel
    # one adapter call (CSV read + cast + CTAS + summary): the summary
    # is serializable, so record/replay bundles serve seeds without a
    # session (sparkt/record.py)
    info = ctx.adapter.create_seed(
        rel, path,
        delimiter=node.config.get("delimiter", ","),
        column_types=node.config.get("column_types") or {},
        # row sample only when a bundle consumes it; True in BOTH
        # record and replay so the recorded call key matches
        sample=bool(
            getattr(ctx.adapter, "is_recording", False)
            or getattr(ctx.adapter, "is_replay", False)
        ),
    )
    persist_docs(ctx, node)
    return f"SEED {info['count']} rows"
