"""unit test materialization.

Reference: ``core/dbt/task/test.py:176-255`` + fixture→SQL
``core/dbt/parser/unit_tests.py:185-193``; pinned by
``tests/functional/unit_testing/fixtures.py:53-118``. Each ``given``
fixture becomes a temp view shaped like the real upstream relation
(sparse rows: unspecified columns are NULL — FIXTURES.md F3); the model
SQL is re-rendered with refs redirected to the fixtures; actual vs
expected diff is ``exceptAll`` both ways (the daff analogue).

Fixture formats: ``dict`` (rows inline), ``csv`` (rows as CSV text) and
``sql`` (rows is a SQL SELECT evaluated as the fixture relation —
``core/dbt/artifacts/resources/v1/unit_test_definition.py:25-35``).
"""

from __future__ import annotations

import csv as csv_mod
import io
import re

from pyspark.sql import functions as F

from sparkt.exceptions import ExecutionError
from sparkt.materializations import MatContext, register

# one- or two-arg form: ref('model') / ref('package', 'model') —
# the model name is the LAST string either way (r15 review: the
# two-arg form previously failed fixture-input parsing outright)
_REF_RE = re.compile(
    r"ref\(\s*['\"](\w+)['\"]\s*(?:,\s*['\"](\w+)['\"]\s*)?\)"
)
_SRC_RE = re.compile(r"source\(\s*['\"](\w+)['\"]\s*,\s*['\"](\w+)['\"]\s*\)")


def _fixture_sql(fixture: dict) -> str | None:
    """SQL text for ``format: sql`` fixtures, else None."""
    if fixture.get("format") == "sql":
        sql = fixture.get("rows") or fixture.get("sql") or ""
        if not isinstance(sql, str) or not sql.strip():
            raise ExecutionError("sql fixture needs a SQL string in 'rows'")
        return sql
    return None


def _parse_rows(fixture: dict) -> list[dict]:
    fmt = fixture.get("format", "dict")
    rows = fixture.get("rows", [])
    if fmt == "dict":
        return list(rows or [])
    if fmt == "csv":
        text = rows if isinstance(rows, str) else ""
        reader = csv_mod.DictReader(io.StringIO(text.strip()))
        return [dict(r) for r in reader]
    raise ExecutionError(f"unsupported unit-test fixture format '{fmt}'")


def _fixture_df(ctx: MatContext, base_relation: str | None, rows: list[dict]):
    """Build a DataFrame with the upstream relation's schema, sparse
    rows NULL-filled and strings cast to the column type."""
    if base_relation is not None:
        schema = ctx.spark.table(base_relation).schema
        base = ctx.spark.createDataFrame([], schema)
        if not rows:
            return base
        cols = {f.name: f for f in schema.fields}
        literal_rows = []
        for r in rows:
            literal_rows.append({k: v for k, v in r.items() if k in cols})
        # a StructType, not a DDL string: reserved-word or
        # special-character column names (`order`, `select-id`) would
        # fail the DDL parser (r12 core review #10)
        from pyspark.sql.types import StringType, StructField, StructType

        raw = ctx.spark.createDataFrame(
            [tuple(str(r.get(c)) if r.get(c) is not None else None for c in cols)
             for r in literal_rows],
            schema=StructType(
                [StructField(c, StringType()) for c in cols]
            ),
        )
        casted = raw.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        )
        return casted
    # no upstream relation: infer from the rows themselves
    if not rows:
        raise ExecutionError(
            "unit-test fixture has no rows and no existing relation to "
            "take a schema from — give the fixture at least one row, "
            "use a sql-format fixture, or build the model first"
        )
    # column order comes from first appearance across ALL rows, and
    # every row is materialized per-column with r.get: dict rows whose
    # key order differs were silently column-misaligned under the old
    # tuple(r.values()) zip, and sparse rows crashed (r12 core review
    # #3; the base_relation path above always did this correctly)
    cols: list[str] = []
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)
    return ctx.spark.createDataFrame(
        [tuple(r.get(c) for c in cols) for r in rows], schema=cols
    )


@register("unit")
def materialize_unit(ctx: MatContext, node):
    model_node = ctx.manifest.ref_lookup(node.model)
    if model_node is None:
        raise ExecutionError(f"{node.unique_id}: unknown model '{node.model}'")

    unit_overrides = dict(node.overrides or {})
    ref_overrides: dict[str, str] = {}
    for i, fixture in enumerate(node.given):
        input_expr = fixture.get("input", "")
        sql_fixture = _fixture_sql(fixture)
        rows = [] if sql_fixture is not None else _parse_rows(fixture)
        view_name = f"__sparkt_ut_{node.name}_{i}"
        if input_expr.strip() == "this":
            # 'this' fixture (reference unit_tests.py: required when
            # overrides force is_incremental true): {{ this }} resolves
            # to the fixture view, shaped like the model's relation if
            # it exists
            model_rel = ctx.compiler.relation_for(model_node)
            base_rel = (
                model_rel.render()
                if ctx.adapter.relation_exists(model_rel) else None
            )
            if sql_fixture is not None:
                df = ctx.spark.sql(sql_fixture)
            else:
                df = _fixture_df(ctx, base_rel, rows)
            df.createOrReplaceTempView(view_name)
            unit_overrides["__this__"] = view_name
            continue
        m = _REF_RE.search(input_expr)
        base_rel = None
        key = None
        if m:
            key = m.group(2) or m.group(1)
            upstream = ctx.manifest.ref_lookup(key)
            if upstream is not None and ctx.adapter.relation_exists(
                ctx.compiler.relation_for(upstream)
            ):
                base_rel = ctx.compiler.relation_for(upstream).render()
        else:
            sm = _SRC_RE.search(input_expr)
            if sm:
                key = f"source:{sm.group(1)}.{sm.group(2)}"
                src = ctx.manifest.source_lookup(sm.group(1), sm.group(2))
                if src is not None:
                    base_rel = ctx.compiler.relation_for(src).render()
        if key is None:
            raise ExecutionError(
                f"{node.unique_id}: cannot parse fixture input '{input_expr}'"
            )
        if sql_fixture is not None:
            df = ctx.spark.sql(sql_fixture)
        else:
            df = _fixture_df(ctx, base_rel, rows)
        df.createOrReplaceTempView(view_name)
        ref_overrides[key] = view_name

    compiled = ctx.compiler.compile_node(
        model_node.__class__(**{**model_node.__dict__}),
        ref_overrides=ref_overrides,
        is_incremental=bool(
            (unit_overrides.get("macros") or {}).get("is_incremental")
        ),
        unit_overrides=unit_overrides or None,
    )
    actual = ctx.spark.sql(compiled.compiled_code)

    expect_sql = _fixture_sql(node.expect)
    if expect_sql is not None:
        expected_df = ctx.spark.sql(expect_sql)
        expect_cols = expected_df.columns
        actual_proj = actual.select(*expect_cols)
        # align types to the model's output so 1 == 1L etc.
        expected = expected_df.select(
            *[
                F.col(c).cast(dict(actual_proj.dtypes)[c]).alias(c)
                for c in expect_cols
            ]
        )
        return _diff_result(actual_proj, expected)

    expect_rows = _parse_rows(node.expect)
    if expect_rows:
        # first appearance across ALL rows, same as _fixture_df: a
        # sparse expect whose first row lacks a column must still
        # compare that column (r15 review — row-0-only silently
        # excluded it, weakening the test)
        expect_cols = []
        for r in expect_rows:
            for k in r:
                if k not in expect_cols:
                    expect_cols.append(k)
    else:
        expect_cols = actual.columns
    actual_proj = actual.select(*expect_cols)
    from pyspark.sql.types import StringType, StructField, StructType

    expected_raw = ctx.spark.createDataFrame(
        [tuple(str(r.get(c)) if r.get(c) is not None else None for c in expect_cols)
         for r in expect_rows],
        schema=StructType(
            [StructField(c, StringType()) for c in expect_cols]
        ),
    ) if expect_rows else actual_proj.limit(0)
    expected = expected_raw.select(
        *[
            F.col(c).cast(dict(actual_proj.dtypes)[c]).alias(c)
            for c in expect_cols
        ]
    ) if expect_rows else expected_raw

    return _diff_result(actual_proj, expected)


def _diff_result(actual_proj, expected) -> dict:
    """exceptAll both ways (the daff analogue); first 5 rows each way."""
    missing = expected.exceptAll(actual_proj)
    extra = actual_proj.exceptAll(expected)
    n_missing, n_extra = missing.count(), extra.count()
    if n_missing or n_extra:
        detail = []
        if n_missing:
            detail.append(f"missing rows: {[r.asDict() for r in missing.collect()[:5]]}")
        if n_extra:
            detail.append(f"unexpected rows: {[r.asDict() for r in extra.collect()[:5]]}")
        return {"status": "fail", "failures": n_missing + n_extra,
                "message": "; ".join(detail)}
    return {"status": "pass", "failures": 0}
