"""Python model execution.

Reference design: ``def model(dbt, session) -> DataFrame``
(``core/dbt/parser/models.py:32-104``; ADR
``docs/arch/adr-004-python-model-arch.md:27-47``). On this engine the
``session`` IS the engine's SparkSession, so there is no
``submit_python_job`` indirection — dbt's own ADR calls Spark the
native home for this feature.
"""

from __future__ import annotations

from typing import Any

from sparkt.exceptions import ExecutionError


class _DbtConfig:
    def __init__(self, config: dict):
        self._config = config

    def __call__(self, *args, **kwargs):
        return None

    def get(self, key, default=None):
        return self._config.get(key, default)


class _DbtObject:
    def __init__(self, ctx, node):
        self._ctx = ctx
        self._node = node
        self.config = _DbtConfig(node.config)

    def ref(self, *args):
        name = args[-1]
        target = self._ctx.manifest.ref_lookup(name)
        if target is None:
            raise ExecutionError(f"python model: unknown ref '{name}'")
        if target.is_ephemeral:
            sql = target.compiled_code
            if sql is None:
                target = self._ctx.compiler.compile_node(target)
                sql = target.compiled_code
            return self._ctx.spark.sql(sql)
        return self._ctx.spark.table(self._ctx.compiler.relation_for(target).render())

    def source(self, source_name, table_name):
        target = self._ctx.manifest.source_lookup(source_name, table_name)
        if target is None:
            raise ExecutionError(
                f"python model: unknown source '{source_name}.{table_name}'"
            )
        return self._ctx.spark.table(self._ctx.compiler.relation_for(target).render())

    @property
    def this(self):
        return self._ctx.compiler.relation_for(self._node)

    def is_incremental(self):
        return bool(self._ctx.extras.get("is_incremental", False))


def run_python_model(ctx, node) -> Any:
    """Exec the model file, call ``model(dbt, session)``, return its
    DataFrame (pandas results are converted)."""
    namespace: dict[str, Any] = {}
    exec(compile(node.raw_code, node.path or node.name, "exec"), namespace)
    fn = namespace.get("model")
    if fn is None:
        raise ExecutionError(f"{node.unique_id}: no model(dbt, session) function")
    result = fn(_DbtObject(ctx, node), ctx.spark)
    if result is None:
        raise ExecutionError(f"{node.unique_id}: model() returned None")
    try:
        import pandas as pd

        if isinstance(result, pd.DataFrame):
            result = ctx.spark.createDataFrame(result)
    except ImportError:
        pass
    return result
