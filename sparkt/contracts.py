"""Model contracts: schema enforcement before writing.

Reference: ``contract: {enforced: bool}`` config
(``artifacts/resources/v1/config.py:33-36``), column specs with
``data_type`` (``artifacts/resources/v1/components.py:58-65``);
enforcement SQL lives in adapter macros — here it is a direct
``StructType`` comparison (SURVEY.md §1.3), which is strictly stronger:
checked on the analyzed plan before any write happens.
"""

from __future__ import annotations

from sparkt.exceptions import ExecutionError

# warehouse-string → spark simpleString aliases
_TYPE_ALIASES = {
    "integer": "int",
    "long": "bigint",
    "text": "string",
    "varchar": "string",
    "float8": "double",
    "float": "float",
    "numeric": "decimal(10,0)",
    "bool": "boolean",
    "timestamp without time zone": "timestamp_ntz",
    "timestamp_ntz": "timestamp_ntz",
}


def _norm(t: str) -> str:
    t = t.strip().lower()
    return _TYPE_ALIASES.get(t, t)


def enforce_contract(node, df_schema) -> None:
    """Assert the model's analyzed schema matches its declared columns
    (names, order-insensitive; types when declared)."""
    contract = node.config.get("contract") or {}
    if not contract.get("enforced"):
        return
    declared = {
        name: (spec or {}).get("data_type")
        for name, spec in node.columns.items()
    }
    actual = {f.name: f.dataType.simpleString() for f in df_schema.fields}
    problems = []
    for name, dtype in declared.items():
        if name not in actual:
            problems.append(f"missing column '{name}'")
        elif dtype and _norm(str(dtype)) != _norm(actual[name]):
            # allow ntz/ltz equivalence: parquet timestamps surface as ntz
            a, d = _norm(actual[name]), _norm(str(dtype))
            if {a, d} <= {"timestamp", "timestamp_ntz"}:
                continue
            problems.append(
                f"column '{name}': declared {dtype}, actual {actual[name]}"
            )
    for name in actual:
        if name not in declared:
            problems.append(f"undeclared column '{name}' in model output")
    if problems:
        raise ExecutionError(
            f"{node.unique_id}: contract violation — " + "; ".join(problems)
        )
