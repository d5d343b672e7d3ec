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
    delimiter = node.config.get("delimiter", ",")
    reader = (
        ctx.spark.read.option("header", True)
        .option("delimiter", delimiter)
        .option("inferSchema", True)
        .option("preferDate", True)
        .option("nullValue", "")
        .option("emptyValue", "")
    )
    df = reader.csv(path)
    for col, dtype in (node.config.get("column_types") or {}).items():
        if col in df.columns:
            df = df.withColumn(col, df[col].cast(dtype))
    rel = ctx.compiler.relation_for(node)
    node.relation = rel
    ctx.adapter.create_table_as(rel, df=df)
    persist_docs(ctx, node)
    return f"SEED {df.count()} rows"
