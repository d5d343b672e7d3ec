"""Jinja environment + rendering contexts.

Re-implements the reference's two-phase Jinja design
(``core/dbt/context/base.py`` + ``core/dbt/context/providers.py``):

- **parse phase**: ``execute = False``; ``ref``/``source``/``config``
  record dependencies and config without touching the warehouse
  (``providers.py:1090``).
- **runtime phase**: ``execute = True``; ``ref``/``source`` resolve to
  relation names, ``config`` is a getter, ``run_query`` hits Spark.

Additionally, refs/sources/configs are extracted statically from the
Jinja AST so dependencies hiding in untaken branches (e.g. inside
``{% if is_incremental() %}``) are still discovered — the reference
uses a Rust static extractor for the same purpose
(``core/dbt/parser/models.py:255-299``).
"""

from __future__ import annotations

import hashlib
import itertools
import json
import re as _re_mod
import threading
import uuid
from datetime import date, datetime, timedelta, timezone
from typing import Any

import jinja2
import yaml
from jinja2 import nodes as j2nodes

from sparkt.exceptions import CompilationError, MacroReturn, ParsingError

RUN_STARTED_AT = datetime.now(timezone.utc)
INVOCATION_ID = str(uuid.uuid4())

#: env vars read through env_var() (name → raw environ value, None =
#: unset). The parser clears this before a parse and snapshots it into
#: both parse caches' keys — the reference's env_vars tracking for
#: partial-parse invalidation (core/dbt/parser/read_files.py).
ENV_VARS_READ: dict[str, str | None] = {}


class _Modules:
    """``modules`` namespace (``core/dbt/context/base.py:46-95``)."""

    import itertools as itertools  # noqa: PLC0414
    import re as re  # noqa: PLC0414

    try:
        import pytz as pytz  # noqa: PLC0414 — reference surface
    except ImportError:  # pragma: no cover — zoneinfo-compatible shim
        from zoneinfo import ZoneInfo as _ZoneInfo

        class pytz:  # minimal tz lookup (timezones fixture surface)
            @staticmethod
            def timezone(name):
                from zoneinfo import ZoneInfo

                return ZoneInfo(name)

    class datetime:  # namespace, not the class
        date = date
        datetime = datetime
        time = __import__("datetime").time
        timedelta = timedelta
        timezone = timezone


class _Exceptions:
    @staticmethod
    def raise_compiler_error(msg: str, node=None):
        raise CompilationError(msg)

    @staticmethod
    def warn(msg: str):
        print(f"WARNING: {msg}")
        return ""


def _wrap_macro(fn):
    """Allow dbt-style ``{{ return(x) }}`` inside macros
    (``core/dbt/context/base.py:344``)."""

    def inner(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except MacroReturn as e:
            return e.value

    return inner


def has_jinja(raw: str) -> bool:
    """Any jinja delimiter present? The skip-Jinja fast paths (static
    parse, pass-through compile) apply only when none are."""
    return "{{" in raw or "{%" in raw or "{#" in raw


def build_environment() -> jinja2.Environment:
    env = jinja2.Environment(
        extensions=["jinja2.ext.do", "jinja2.ext.loopcontrols"],
        undefined=jinja2.Undefined,
        keep_trailing_newline=True,
    )
    return env


def load_macro_templates(
    env: jinja2.Environment, sources: list[str]
) -> list[jinja2.Template]:
    """Compile macro source files once; binding to a context happens
    per render via :func:`bind_macros`."""
    templates = []
    for src in sources:
        try:
            templates.append(env.from_string(src))
        except jinja2.TemplateSyntaxError as e:
            raise ParsingError(f"macro syntax error: {e}") from e
    return templates


def bind_macros(
    templates: list[jinja2.Template], ctx: dict[str, Any]
) -> dict[str, Any]:
    """Instantiate every macro against ``ctx`` and add it to ``ctx``.

    Jinja macro modules capture their name-resolution dict at module
    creation, so macros must be re-instantiated per render context for
    ``ref``/``run_query``/``this`` inside macro bodies to see the
    node's runtime state — the reference's MacroGenerator does exactly
    this per call (``core/dbt/clients/jinja.py``). ``shared=True``
    makes the module resolve names against the *live* ctx dict, so
    cross-macro calls work regardless of load order (flattened
    namespace with ``spark__``/``default__`` dispatch prefixes,
    ``core/dbt/context/providers.py:114-213``).
    """
    for tmpl in templates:
        module = tmpl.make_module(vars=ctx, shared=True)
        for name in dir(module):
            if name.startswith("_"):
                continue
            obj = getattr(module, name)
            if isinstance(obj, jinja2.runtime.Macro):
                ctx[name] = _wrap_macro(obj)
    return ctx


# --------------------------------------------------------------------------
# static AST extraction (parse phase)
# --------------------------------------------------------------------------

#: call names the static-complete checker accepts (the dbt-extractor
#: contract: reference ``core/dbt/parser/models.py:378`` falls back to
#: full Jinja whenever anything outside this surface appears)
_STATIC_CALLS = frozenset({"ref", "source", "config"})


def _static_const_ok(n) -> bool:
    """True if ``n`` is a constant expression (scalar / list / dict of
    constants) — the only value shapes the static extractor can read."""
    if isinstance(n, j2nodes.Const):
        return True
    if isinstance(n, (j2nodes.Neg, j2nodes.Pos)):
        # negative/positive numeric literals parse as unary nodes
        # (config(threshold=-1); found by the r9 hypothesis property)
        return isinstance(n.node, j2nodes.Const) and isinstance(
            n.node.value, (int, float)
        ) and not isinstance(n.node.value, bool)
    if isinstance(n, j2nodes.List):
        return all(_static_const_ok(i) for i in n.items)
    if isinstance(n, j2nodes.Dict):
        return all(
            isinstance(p.key, j2nodes.Const) and _static_const_ok(p.value)
            for p in n.items
        )
    return False


#: sentinel for "this AST node is not a constant the extractor can read"
_NOT_CONST = object()


def _const_value(n):
    """Recursively read the Python value of a constant AST node.

    Walks EXACTLY the shapes ``_static_const_ok`` accepts (scalar Const,
    List of constants, Dict with Const keys and constant values) and
    returns ``_NOT_CONST`` for anything else — so extraction depth and
    the completeness guard can never disagree (the round-7 regression:
    a nested list-in-dict passed the guard but extracted as ``None``).
    Reference contract: dbt-extractor returns "cannot be extracted" for
    shapes it can't read, never a corrupted value
    (``core/dbt/parser/models.py:378-398``)."""
    if isinstance(n, j2nodes.Const):
        return n.value
    if isinstance(n, (j2nodes.Neg, j2nodes.Pos)):
        if isinstance(n.node, j2nodes.Const) and isinstance(
            n.node.value, (int, float)
        ) and not isinstance(n.node.value, bool):
            return -n.node.value if isinstance(n, j2nodes.Neg) else (
                +n.node.value
            )
        return _NOT_CONST
    if isinstance(n, j2nodes.List):
        out = []
        for i in n.items:
            v = _const_value(i)
            if v is _NOT_CONST:
                return _NOT_CONST
            out.append(v)
        return out
    if isinstance(n, j2nodes.Dict):
        out = {}
        for p in n.items:
            if not isinstance(p.key, j2nodes.Const):
                return _NOT_CONST
            v = _const_value(p.value)
            if v is _NOT_CONST:
                return _NOT_CONST
            out[p.key.value] = v
        return out
    return _NOT_CONST


def _static_node_ok(n) -> bool:
    """True if the AST node is fully covered by static extraction:
    literal text, or a bare ``{{ ref/source/config(...) }}`` output
    whose arguments are all constants. Anything else (control flow,
    filters, macros, ``var()``, attribute access, dynamic args) means
    the render can observe things the AST walk cannot."""
    if isinstance(n, j2nodes.Template):
        return all(_static_node_ok(c) for c in n.body)
    if isinstance(n, j2nodes.Output):
        return all(_static_node_ok(c) for c in n.nodes)
    if isinstance(n, j2nodes.TemplateData):
        return True
    if isinstance(n, j2nodes.Call):
        name = getattr(n.node, "name", None)
        if name not in _STATIC_CALLS:
            return False
        if n.dyn_args is not None or n.dyn_kwargs is not None:
            return False
        if name == "config":
            return not n.args and all(
                _static_const_ok(kw.value) for kw in n.kwargs
            )
        # ref()/source(): positional constant strings only
        return (
            not n.kwargs
            and bool(n.args)
            and all(isinstance(a, j2nodes.Const) for a in n.args)
        )
    return False


def extract_statically(env: jinja2.Environment, source: str):
    """Walk the Jinja AST for ref()/source()/config() calls.

    Returns ``(refs, sources, config, complete)``. ``complete=True``
    means the template consists ONLY of literal SQL plus those calls
    with constant arguments, so the extraction is provably equal to
    what a parse-phase render would collect and the caller may skip the
    render entirely — the reference's stable static parser
    (``core/dbt/parser/models.py:378-398``, dbt-extractor contract)."""
    refs: list[str] = []
    sources: list[tuple[str, str]] = []
    config: dict[str, Any] = {}
    try:
        ast = env.parse(source)
    except jinja2.TemplateSyntaxError as e:
        raise ParsingError(f"jinja syntax error: {e}") from e

    def const(n):
        return n.value if isinstance(n, j2nodes.Const) else None

    for call in ast.find_all(j2nodes.Call):
        name = getattr(call.node, "name", None)
        if name == "ref":
            args = [const(a) for a in call.args]
            if args and args[-1] is not None:
                # version pin (ref('m', v=1) / version=1) rides along
                # as a (name, version) tuple so the DAG edge targets
                # the PINNED version, not latest (r12 parsing review
                # #5)
                ver = None
                for kw in call.kwargs:
                    if kw.key in ("v", "version"):
                        ver = const(kw.value)
                if ver is not None:
                    refs.append((args[-1], ver))
                else:
                    refs.append(args[-1])  # ref('pkg','name') → name
        elif name == "source":
            args = [const(a) for a in call.args]
            if len(args) == 2 and all(a is not None for a in args):
                sources.append((args[0], args[1]))
        elif name == "config":
            from sparkt.project import merge_config_call

            for kw in call.kwargs:
                v = _const_value(kw.value)
                if v is not _NOT_CONST:
                    # per-field merge behavior: repeated config()
                    # calls APPEND tags/hooks and dict-merge meta
                    # (reference experimental_parser corpus), so the
                    # static path and the render path agree
                    merge_config_call(config, {kw.key: v})
    return refs, sources, config, _static_node_ok(ast)


# --------------------------------------------------------------------------
# contexts
# --------------------------------------------------------------------------

def base_context(project_vars: dict, cli_vars: dict | None = None) -> dict:
    """``core/dbt/context/base.py`` surface."""
    from sparkt.secrets import scrub_secrets as _scrub

    merged_vars = dict(project_vars or {})
    merged_vars.update(cli_vars or {})

    def var(name, default=None):
        return merged_vars.get(name, default)

    def env_var(name, default=None):
        import os

        # secrets are usable ONLY in profiles.yml / packages.yml
        # rendering (sparkt.secrets.secret_env_var); refusing here
        # keeps them out of compiled SQL, manifest.json, and the
        # parse cache (reference core/dbt/context/base.py:311-312,
        # SecretEnvVarLocationError)
        from sparkt.secrets import SECRET_ENV_PREFIX

        if name.startswith(SECRET_ENV_PREFIX):
            raise ParsingError(
                f"Secret env vars are allowed only in profiles.yml "
                f"and packages.yml: env_var('{name}')"
            )
        # record the RAW environ state (None = unset) for parse-cache
        # invalidation: the reference tracks consumed env vars the
        # same way, else a TENANT=b rerun serves TENANT=a's cached
        # parse (r12 parsing review #1)
        raw = os.environ.get(name)
        ENV_VARS_READ[name] = raw
        v = raw if raw is not None else default
        if v is None:
            raise ParsingError(f"env_var '{name}' is not set")
        return v

    def _return(value):
        raise MacroReturn(value)

    def set_fn(value, default=None):
        try:
            return set(value)
        except TypeError:
            return default

    def zip_fn(*args, **kwargs):
        default = kwargs.get("default")
        try:
            return list(zip(*args))
        except TypeError:
            return default

    def diff_of_two_dicts(d1, d2):
        return {
            k: [v for v in vs if v not in d2.get(k, [])]
            for k, vs in d1.items()
            if [v for v in vs if v not in d2.get(k, [])]
        }

    return {
        "var": var,
        "env_var": env_var,
        "return": _return,
        "fromjson": json.loads,
        "tojson": json.dumps,
        "fromyaml": yaml.safe_load,
        "toyaml": yaml.safe_dump,
        "set": set_fn,
        "set_strict": set,
        "zip": zip_fn,
        "zip_strict": lambda *a: list(zip(*a)),
        # log() scrubs secret values/placeholders before any sink
        # (reference base.py:574 redaction)
        "log": lambda msg, info=False: (
            print(_scrub(str(msg))) if info else None
        ),
        "print": print,
        "run_started_at": RUN_STARTED_AT,
        "invocation_id": INVOCATION_ID,
        "thread_id": lambda: threading.current_thread().name,
        "modules": _Modules,
        "exceptions": _Exceptions,
        "flags": type("Flags", (), {"FULL_REFRESH": False, "WHICH": "run"})(),
        "diff_of_two_dicts": diff_of_two_dicts,
        "local_md5": lambda s: hashlib.md5(s.encode()).hexdigest(),
        "dbt_version": "1.9.0a1-sparkt",
        "builtins": {},
        "itertools": itertools,
        "re": _re_mod,
    }


class ParseConfigCollector:
    """Parse-phase ``config(...)`` (``providers.py:1033``)."""

    def __init__(self):
        self.collected: dict[str, Any] = {}

    def __call__(self, *args, **kwargs):
        from sparkt.project import merge_config_call

        if args and isinstance(args[0], dict):
            merge_config_call(self.collected, args[0])
        merge_config_call(self.collected, kwargs)
        return ""

    def get(self, name, default=None):
        return self.collected.get(name, default)

    def require(self, name):
        return self.collected.get(name)


def parse_context(project_vars: dict, cli_vars: dict | None = None):
    """Context for the parse-phase render (execute=False)."""
    ctx = base_context(project_vars, cli_vars)
    collector = ParseConfigCollector()
    refs: list[str] = []
    srcs: list[tuple[str, str]] = []

    def ref(*args, **kwargs):
        ver = kwargs.get("v", kwargs.get("version"))
        refs.append((args[-1], ver) if ver is not None else args[-1])
        return f"__parse_ref__{args[-1]}"

    def source(source_name, table_name):
        srcs.append((source_name, table_name))
        return f"__parse_source__{source_name}__{table_name}"

    ctx.update(
        {
            "ref": ref,
            "source": source,
            "config": collector,
            "execute": False,
            "is_incremental": lambda: False,
            "this": "__parse_this__",
            "adapter": _ParseAdapter(),
            "target": {"name": "dev", "type": "spark", "schema": "", "threads": 1},
            "run_query": lambda sql: [],
            "store_result": lambda *a, **k: "",
            "load_result": lambda name: None,
            "_submit_statement": lambda *a, **k: "",
            "pre_hooks": [],
            "post_hooks": [],
            "graph": {"nodes": {}, "sources": {}},
            "model": {},
            "database": "spark_catalog",
            "schema": "",
        }
    )
    return ctx, collector, refs, srcs


class _ParseAdapter:
    """Inert adapter for parse phase (execute=False: warehouse calls
    must not run; ``providers.py:1090``)."""

    def dispatch(self, name, macro_namespace=None):
        def noop(*a, **k):
            return ""

        return noop

    def __getattr__(self, item):
        def noop(*a, **k):
            return ""

        return noop


class RuntimeConfigGetter:
    def __init__(self, config: dict):
        self._config = config

    def __call__(self, *args, **kwargs):
        return ""

    def get(self, name, default=None):
        return self._config.get(name, default)

    def require(self, name):
        if name not in self._config:
            raise CompilationError(f"config '{name}' required but not set")
        return self._config[name]


class RuntimeAdapterFacade:
    """The ``adapter.*`` Jinja object (``providers.py:114-213``):
    dispatch + the SQL-helper methods macros commonly call.

    ``macros`` is the live render context dict (macros are bound into
    it by :func:`bind_macros`)."""

    def __init__(self, adapter, macros: dict):
        self._adapter = adapter
        self._macros = macros

    def dispatch(self, macro_name, macro_namespace=None):
        for candidate in (f"spark__{macro_name}", f"default__{macro_name}", macro_name):
            fn = self._macros.get(candidate)
            if fn is not None:
                return fn
        raise CompilationError(f"dispatch: no macro named {macro_name}")

    def quote(self, identifier):
        return self._adapter.quote(identifier)

    def get_columns_in_relation(self, relation):
        return [
            type("Column", (), {"name": n, "dtype": t, "data_type": t})()
            for n, t in self._adapter.get_columns_in_relation(relation)
        ]

    def get_relation(self, database=None, schema=None, identifier=None):
        return self._adapter.get_relation(schema, identifier)

    def execute(self, sql, auto_begin=False, fetch=False):
        return self._adapter.execute(sql, fetch=fetch)

    def type(self):
        return "spark"

    def optimize_table(self, relation, target_file_mb=128, cluster_by=None):
        """Maintenance entrypoint for run-operation macros:
        ``{% do adapter.optimize_table(this | string) %}``."""
        return self._adapter.optimize_table(
            relation if isinstance(relation, str) else str(relation),
            target_file_mb=target_file_mb,
            cluster_by=cluster_by,
        )

    def __getattr__(self, item):
        raise CompilationError(f"adapter.{item} is not implemented")


def metric_reference(*args):
    """``metric('name')`` / ``metric('pkg', 'name')`` context function
    (reference providers.py:1029, MetricReference): a handle rendering
    as the metric name — exposures/doc blocks interpolate it, the
    semantic layer resolves it."""
    name = args[-1]

    class _MetricRef:
        metric_name = name
        package_name = args[0] if len(args) == 2 else None

        def __str__(self):
            return str(name)

        def __repr__(self):
            return str(name)

    return _MetricRef()


class ColumnShim:
    """``api.Column`` type helpers (reference providers.py:1221 via
    dbt-common Column) — the subset cross-db macros call, in Spark SQL
    type names."""

    @staticmethod
    def translate_type(dtype: str) -> str:
        mapping = {
            "character varying": "string", "varchar": "string",
            "text": "string", "integer": "int", "float8": "double",
            "float4": "float", "numeric": "decimal(38,18)",
            "bool": "boolean",
        }
        return mapping.get(str(dtype).lower(), str(dtype))

    @staticmethod
    def string_type(size=None):
        return "string"

    @staticmethod
    def numeric_type(dtype="decimal", precision=38, scale=18):
        return f"decimal({precision},{scale})"
