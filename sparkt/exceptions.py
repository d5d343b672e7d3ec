"""Engine exceptions (reference: dbt_common.exceptions surface)."""

from __future__ import annotations


class SparktError(Exception):
    pass


class CompilationError(SparktError):
    pass


class ParsingError(SparktError):
    pass


class ExecutionError(SparktError):
    pass


class SchemaChangeError(ExecutionError):
    """on_schema_change='fail' tripped (reference:
    tests/functional/incremental_schema_tests)."""


class MacroReturn(BaseException):
    """Raised by the Jinja ``return()`` context function to yield a value
    from a macro (reference: ``core/dbt/context/base.py:344``)."""

    def __init__(self, value):
        self.value = value


class SelectorError(SparktError):
    pass
