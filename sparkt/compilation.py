"""Per-node compilation: runtime Jinja render + ephemeral CTE splice.

Mirrors ``core/dbt/compilation.py``: ``compile_node`` (510-537) renders
raw→compiled SQL with the runtime context, then
``_recursively_prepend_ctes`` (302-392) splices every ephemeral
ancestor in as a ``__dbt__cte__<name>`` CTE, and
``inject_ctes_into_sql`` (540-608) handles pre-existing WITH clauses
(regex here instead of sqlparse; Catalyst merges/prunes the CTEs at
plan time, SURVEY.md §4).
"""

from __future__ import annotations

import re

from sparkt.exceptions import CompilationError
from sparkt.manifest import Manifest, ParsedNode
from sparkt.parsing import context as ctx_mod
from sparkt.relation import Relation

_WITH_RE = re.compile(r"^(\s*)with(\s+recursive)?\b", re.IGNORECASE)


def _try_or_compiler_error(message_if_exception, func, *args, **kwargs):
    """Reference ``try_or_compiler_error`` (providers.py:948): run the
    callable; any exception becomes a CompilationError with the
    macro-supplied message."""
    try:
        return func(*args, **kwargs)
    except Exception:
        raise CompilationError(str(message_if_exception)) from None


def _infer_seed_column_type(cells: list[str]) -> str:
    """agate-TypeTester-style PER-COLUMN inference for undeclared seed
    columns: a column is int only if EVERY non-empty cell parses as
    int (then float, then bool), else text — per-cell inference would
    hand a macro mixed int/str values from one column."""
    vals = [c for c in cells if c != ""]
    if not vals:
        return "text"

    def _all(parse) -> bool:
        for v in vals:
            try:
                parse(v)
            except ValueError:
                return False
        return True

    if _all(int):
        return "int"
    if _all(float):
        return "float"
    if all(v.strip().lower() in ("true", "false") for v in vals):
        return "boolean"
    return "text"


def _coerce_seed_cell(raw: str, sql_type: str | None):
    """Typed parsing for load_agate_table (ADVICE r6): the reference's
    agate_helper.from_csv returns typed cells; honour the seed's
    column_types so macros doing numeric comparisons on seed values get
    number semantics. ``sql_type`` is the declared type or the
    per-column inferred one; empty cell → None."""
    if raw == "":
        return None
    t = (sql_type or "text").lower()
    try:
        if any(k in t for k in ("int", "long", "short", "byte")):
            return int(raw)
        if any(k in t for k in ("double", "float", "decimal", "numeric")):
            return float(raw)
        if "bool" in t:
            return raw.strip().lower() in ("true", "t", "1", "yes")
        return raw  # text/date/timestamp stay verbatim
    except ValueError:
        return raw


def _make_load_agate_table(node):
    """Reference ``load_agate_table`` (providers.py:957): seeds expose
    their CSV as a small driver-side table; calling it from any other
    node type is a compilation error (same as the reference). Cells are
    typed via the seed's ``column_types`` config with agate-style
    inference for undeclared columns (ADVICE r6)."""
    def load_agate_table():
        if node.resource_type != "seed":
            raise CompilationError(
                "can only load_agate_table for seeds "
                f"(got a {node.resource_type})"
            )
        import csv as _csv

        path = node.config["seed_path"]
        delim = node.config.get("delimiter", ",")
        ctypes = dict(node.config.get("column_types") or {})
        with open(path, newline="") as f:
            reader = _csv.reader(f, delimiter=delim)
            header = next(reader, [])
            raw_rows = [list(r) for r in reader]
        # undeclared columns: infer ONE type per column over all its
        # cells (agate TypeTester semantics)
        for ci, col in enumerate(header):
            if col not in ctypes:
                ctypes[col] = _infer_seed_column_type(
                    [r[ci] for r in raw_rows if ci < len(r)]
                )
        rows = [
            # extra cells beyond the header (ragged CSV) stay raw
            # rather than silently vanishing
            tuple(
                _coerce_seed_cell(cell, ctypes.get(col))
                for col, cell in zip(header, r)
            ) + tuple(r[len(header):])
            for r in raw_rows
        ]
        return type("AgateTable", (), {
            "column_names": header,
            "rows": rows,
            "__len__": lambda self: len(rows),
        })()

    return load_agate_table


def _make_write(project, node):
    """Reference ``write(payload)`` (providers.py:935): persist a
    payload under target/run/<node path> from inside a macro; returns
    '' so it can be called inline in jinja."""
    import os

    def write(payload):
        # mirror the reference's target write path: package + the
        # node's original subpath/extension under target/run, so
        # same-named nodes in different packages/subdirs don't
        # overwrite each other (ADVICE r6)
        rel = node.path or f"{node.name}.sql"
        out = os.path.join(
            project.target_dir, "run", node.package_name, rel
        )
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "w") as f:
            f.write(str(payload))
        return ""

    return write


def _skip_leading_comments(sql: str) -> int:
    """Index of the first real SQL token, past leading ``--`` line and
    ``/* */`` block comments — a WITH behind a comment must still be
    detected or the injection emits a double-WITH parse error (r12
    compilation review #5; the reference uses sqlparse for this)."""
    i, n = 0, len(sql)
    while i < n:
        if sql[i].isspace():
            i += 1
        elif sql.startswith("--", i):
            nl = sql.find("\n", i)
            if nl == -1:
                return n
            i = nl + 1
        elif sql.startswith("/*", i):
            end = sql.find("*/", i + 2)
            if end == -1:
                return n
            i = end + 2
        else:
            break
    return i


def inject_ctes_into_sql(sql: str, ctes: list[tuple[str, str]]) -> str:
    """Reference ``compilation.py:540-608``."""
    if not ctes:
        return sql
    cte_text = ", ".join(f"{name} as ({body.strip().rstrip(';')})" for name, body in ctes)
    start = _skip_leading_comments(sql)
    m = _WITH_RE.match(sql[start:])
    if m:
        idx = start + m.end()
        return sql[:idx] + " " + cte_text + "," + sql[idx:]
    # injected WITH goes AFTER the leading comments: a '-- note'
    # line comment would otherwise swallow the rest of the line
    return (
        f"{sql[:start]}with {cte_text} {sql[start:]}"
        if start
        else f"with {cte_text} {sql}"
    )


class Compiler:
    def __init__(self, project, manifest: Manifest, env, adapter=None,
                 cli_vars: dict | None = None, macro_templates=None):
        self.project = project
        self.manifest = manifest
        self.env = env
        self.adapter = adapter
        self.cli_vars = cli_vars or {}
        self.macro_templates = macro_templates or []
        # defer/state: unbuilt refs resolve to the state manifest's
        # relations (providers.py:548-573, favor-state semantics with
        # cache-miss fallback)
        self.defer_state = None
        # --favor-state (providers.py:559): prefer the state relation
        # for any UNSELECTED resource even when a local build exists
        self.favor_state = False
        self.selected_uids: set[str] = set()
        # --empty: refs/sources render as zero-row subqueries so models
        # build schema-only (reference resolve_limit,
        # context/providers.py:229-231 → Relation render_limited)
        self.empty = False
        # Event-time window bounds, two tiers:
        # - sample_bounds: invocation-global (--sample "3 days", dbt
        #   1.10 sample mode) — set once by the runner;
        # - event_time_bounds: THREAD-LOCAL override while a microbatch
        #   batch compiles (the compiler is shared across scheduler
        #   worker threads; a global would leak one node's batch window
        #   into concurrently-compiling nodes).
        # Refs/sources whose target declares event_time render as
        # window-filtered subqueries (dbt 1.9 microbatch semantics —
        # extension beyond the reference snapshot, which predates it).
        import threading

        self.sample_bounds: tuple[str, str] | None = None
        self._etb_local = threading.local()

    @property
    def event_time_bounds(self) -> tuple[str, str] | None:
        v = getattr(self._etb_local, "v", None)
        return v if v is not None else self.sample_bounds

    @event_time_bounds.setter
    def event_time_bounds(self, v: tuple[str, str] | None) -> None:
        self._etb_local.v = v

    def _maybe_limited(self, rendered: str) -> str:
        if self.empty:
            return f"(select * from {rendered} limit 0)"
        return rendered

    def _maybe_event_filtered(self, rendered: str, target) -> str:
        """Batch-window filter for microbatch compiles: a ref/source
        whose target declares ``event_time`` scans only the current
        batch (start-inclusive, end-exclusive). At scale this is what
        turns each batch into a partition-pruned scan when the input is
        partitioned on a date derived from its event_time."""
        et = (target.config or {}).get("event_time")
        if self.event_time_bounds is None or not et:
            return self._maybe_limited(rendered)
        from sparkt.relation import quote_identifier

        q = quote_identifier(et)
        start, end = self.event_time_bounds
        return self._maybe_limited(
            f"(select * from {rendered} where {q} >= TIMESTAMP '{start}'"
            f" and {q} < TIMESTAMP '{end}')"
        )

    # ----------------------------------------------------- naming macros
    def _naming_macros(self) -> dict:
        """Project-overridable ``generate_schema_name`` /
        ``generate_alias_name`` / ``generate_database_name``
        (reference: ``tests/functional/custom_aliases/fixtures.py:14-38``,
        ``tests/functional/context_methods/test_var_in_generate_name.py``;
        ``parser/partial.py:55`` lists them as special macros whose
        change forces re-render — satisfied here because macro file
        hashes key the whole-manifest parse cache). Bound ONCE against a
        minimal context (target/var/env_var/parse-adapter): naming
        macros run before any relation exists, so they may not ref() or
        run queries — same restriction as the reference.

        ``generate_database_name`` is deliberately NOT dispatched:
        Spark's session catalog is two-level and the real dbt-spark
        adapter errors on any ``database`` setting ("Cannot set database
        in spark!"), so there is no database component to name."""
        cached = getattr(self, "_naming_cache", None)
        if cached is None:
            ctx = ctx_mod.base_context(self.project.vars, self.cli_vars)
            ctx.update({
                "target": self.project.target_context(),
                "adapter": ctx_mod._ParseAdapter(),
            })
            ctx_mod.bind_macros(self.macro_templates, ctx)
            cached = {
                kind: ctx.get(f"generate_{kind}_name")
                for kind in ("schema", "alias", "database")
            }
            self._naming_cache = cached
        return cached

    @staticmethod
    def _node_view(node: ParsedNode) -> dict:
        """The ``node`` argument naming macros receive (attribute access
        works on dicts in Jinja)."""
        return {
            "name": node.name,
            "unique_id": node.unique_id,
            "resource_type": node.resource_type,
            "package_name": node.package_name,
            "config": node.config,
            "version": node.config.get("version"),
        }

    def generate_schema_name(self, custom: str | None, node: ParsedNode) -> str:
        fn = self._naming_macros()["schema"]
        if fn is not None:
            return str(fn(custom, self._node_view(node))).strip()
        # reference default__generate_schema_name: concat, NOT verbatim
        if custom is None:
            return self.project.schema
        return f"{self.project.schema}_{str(custom).strip()}"

    def generate_alias_name(self, custom: str | None, node: ParsedNode) -> str:
        fn = self._naming_macros()["alias"]
        if fn is not None:
            return str(fn(custom, self._node_view(node))).strip()
        # default: custom alias verbatim, else node name (versioned
        # model files are already named <base>_v<N>)
        return str(custom).strip() if custom is not None else node.name

    # ------------------------------------------------------------------
    def relation_for(self, node: ParsedNode) -> Relation:
        if node.resource_type == "source":
            return Relation(
                schema=node.config.get("schema", node.source_name),
                identifier=node.config.get("identifier", node.name),
            )
        if node.config.get("external_node"):
            # plugin-contributed external model (sparkt/plugins.py):
            # the relation already exists elsewhere — naming macros do
            # not apply, the declared coordinates are used verbatim
            return Relation(
                schema=node.config["schema"],
                identifier=node.config.get("alias", node.name),
            )
        cache = getattr(self, "_rel_name_cache", None)
        if cache is None:
            cache = self._rel_name_cache = {}
        names = cache.get(node.unique_id)
        if names is None:
            # snapshots: the reference sets node.schema =
            # config.target_schema VERBATIM at parse time
            # (core/dbt/parser/snapshots.py:39 — no
            # generate_schema_name pass), so refs and the snapshot
            # write resolve identically. Previously the writer
            # overrode the schema while refs went through the macro
            # path — the two never agreed when either schema config
            # was set (r12 core review #1).
            tgt = (
                node.config.get("target_schema")
                if node.resource_type == "snapshot"
                else None
            )
            names = cache[node.unique_id] = (
                str(tgt).strip()
                if tgt
                else self.generate_schema_name(
                    node.config.get("schema"), node
                ),
                self.generate_alias_name(node.config.get("alias"), node),
            )
        return Relation(
            schema=names[0],
            identifier=names[1],
            type="view" if node.materialized == "view" else "table",
        )

    # ------------------------------------------------------------------
    def _graph_view(self) -> dict:
        """The ``graph`` context var, built ONCE per manifest shape:
        rebuilding the manifest-wide dict for every node render was
        O(N) per compile → O(N²) per invocation (r12 compilation
        review #9). The inner per-node dicts hold LIVE references
        (tags/config), so config mutations stay visible; only a node
        count change (inline temp nodes) triggers a rebuild."""
        cached = getattr(self, "_graph_view_cache", None)
        # counts + KEY identity: a same-count swap of node dicts (a
        # reload replacing manifest.nodes, or a rename) must rebuild —
        # counts alone served dead unique_ids (second-opinion review
        # #7). Key tuples are O(N) to build but dwarfed by the nested
        # per-node dicts this cache avoids.
        shape = (
            id(self.manifest.nodes),
            tuple(self.manifest.nodes),
            tuple(self.manifest.sources),
        )
        if cached is not None and cached[0] == shape:
            return cached[1]
        view = {
            "nodes": {
                uid: {"name": n.name, "resource_type": n.resource_type,
                      "tags": n.tags, "config": n.config}
                for uid, n in self.manifest.nodes.items()
            },
            "sources": {
                uid: {"name": n.name, "source_name": n.source_name}
                for uid, n in self.manifest.sources.items()
            },
        }
        self._graph_view_cache = (shape, view)
        return view

    # ------------------------------------------------------------------
    def runtime_context(
        self,
        node: ParsedNode,
        extra_ctes: list[tuple[str, str]],
        ref_overrides: dict[str, str] | None = None,
        is_incremental: bool = False,
        unit_overrides: dict | None = None,
    ) -> dict:
        ctx = ctx_mod.base_context(self.project.vars, self.cli_vars)
        this = self.relation_for(node)
        results_store: dict[str, object] = {}

        def ref(*args, **kwargs):
            name = args[-1]
            package = args[0] if len(args) == 2 else None
            version = kwargs.get("v", kwargs.get("version"))
            if ref_overrides and name in ref_overrides:
                return ref_overrides[name]
            target = self.manifest.ref_lookup(name, package, version=version)
            if target is None:
                vtxt = f" v{version}" if version is not None else ""
                raise CompilationError(
                    f"unknown ref '{name}'{vtxt} in {node.unique_id}"
                )
            self._check_access(node, target)
            if target.is_ephemeral:
                cte_name = Relation.add_ephemeral_prefix(target.name)
                self._add_ephemeral_cte(target, cte_name, extra_ctes, ref_overrides)
                return cte_name
            rel = self.relation_for(target)
            if self.defer_state is not None and self.adapter is not None:
                use_defer = (
                    self.favor_state
                    and target.unique_id not in self.selected_uids
                ) or not self.adapter.relation_exists(rel)
                if use_defer:
                    deferred = self.defer_state.relation_name(
                        target.unique_id
                    )
                    if deferred:
                        return self._maybe_event_filtered(deferred, target)
            return self._maybe_event_filtered(rel.render(), target)

        def source(source_name, table_name):
            key = f"source:{source_name}.{table_name}"
            if ref_overrides and key in ref_overrides:
                return ref_overrides[key]
            target = self.manifest.source_lookup(source_name, table_name)
            if target is None:
                raise CompilationError(
                    f"unknown source '{source_name}.{table_name}'"
                )
            return self._maybe_event_filtered(
                self.relation_for(target).render(), target
            )

        def run_query(sql):
            _, res = self.adapter.execute(sql, fetch=True)
            return res

        def store_result(name, response, agate_table=None):
            results_store[name] = agate_table
            return ""

        def load_result(name):
            table = results_store.get(name)
            return type(
                "Result", (), {"table": table, "data": table, "response": "OK"}
            )()

        def _submit_statement(name, sql, fetch_result=False):
            if self.adapter is None:
                return ""
            _, res = self.adapter.execute(sql, fetch=bool(fetch_result))
            if name:
                results_store[name] = res
            return ""

        ctx.update(
            {
                "ref": ref,
                "source": source,
                "config": ctx_mod.RuntimeConfigGetter(node.config),
                "execute": True,
                "this": this,
                "is_incremental": lambda: is_incremental,
                "model": {
                    "unique_id": node.unique_id,
                    "name": node.name,
                    "config": node.config,
                    "columns": node.columns,
                },
                "run_query": run_query,
                "store_result": store_result,
                "load_result": load_result,
                "_submit_statement": _submit_statement,
                # facade resolves dispatch against the live ctx dict
                # (macros bound below)
                "adapter": (
                    ctx_mod.RuntimeAdapterFacade(self.adapter, ctx)
                    if self.adapter
                    else ctx_mod._ParseAdapter()
                ),
                "target": self.project.target_context(),
                "database": "spark_catalog",
                # unique_ids selected by the current invocation
                # (reference SELECTED_RESOURCES context var,
                # tests/functional/selected_resources) — available to
                # hooks and macros
                "selected_resources": sorted(self.selected_uids),
                "schema": this.schema,
                "pre_hooks": node.config.get("pre_hook", []),
                "post_hooks": node.config.get("post_hook", []),
                "graph": self._graph_view(),
                # remaining provider-context tail (SURVEY §2.3 /
                # reference providers.py; each cited inline):
                # the node's raw SQL (providers.py:1365)
                "sql": node.raw_code,
                # metric('name') → MetricReference-style handle
                # (providers.py:1029); renders as its name so exposure/
                # metric descriptions can interpolate it
                "metric": ctx_mod.metric_reference,
                # api.Column type helpers (providers.py:1221)
                "column": ctx_mod.ColumnShim,
                # store_result minus metadata (providers.py:902)
                "store_raw_result": store_result,
                # try_or_compiler_error (providers.py:948)
                "try_or_compiler_error": _try_or_compiler_error,
                # write(payload) → target/run/<name> (providers.py:935)
                "write": _make_write(self.project, node),
                # defer_relation (providers.py:1565): the state
                # artifact's relation for THIS node when deferral is
                # active, else None
                "defer_relation": (
                    self.defer_state.relation_name(node.unique_id)
                    if self.defer_state is not None else None
                ),
                # load_agate_table (providers.py:957): the seed's CSV
                # as a driver-side rows object; errors on non-seeds
                # exactly like the reference
                "load_agate_table": _make_load_agate_table(node),
            }
        )
        # builtins (reference providers.py generate_builtins +
        # tests/functional/ref_override): a project macro named
        # ref/source shadows the context function via bind_macros below;
        # `builtins.ref(...)` reaches the original — returned as a
        # Relation so the override can `.replace_path(identifier=...)`
        def _builtin_ref(*args, **kwargs):
            # same resolution pipeline as the ref closure (overrides,
            # access check, defer, event-time filter) — an override
            # macro must not accidentally bypass unit-test fixtures or
            # microbatch windows. The difference: when nothing rewrites
            # the relation, return the Relation OBJECT so the macro can
            # call replace_path()/render() (reference builtins.ref).
            name = args[-1]
            package = args[0] if len(args) == 2 else None
            version = kwargs.get("v", kwargs.get("version"))
            if ref_overrides and name in ref_overrides:
                return ref_overrides[name]
            target = self.manifest.ref_lookup(name, package, version=version)
            if target is None:
                raise CompilationError(
                    f"unknown ref '{name}' in {node.unique_id}"
                )
            self._check_access(node, target)
            if target.is_ephemeral:
                return ref(*args, **kwargs)  # CTE name string
            rel = self.relation_for(target)
            rendered = ref(*args, **kwargs)  # full pipeline, string
            if rendered == rel.render():
                return rel  # unmodified: keep the Relation object
            return rendered  # deferred/filtered/limited subquery

        ctx["builtins"] = {
            "ref": _builtin_ref,
            "source": source,
            "config": ctx.get("config"),
        }
        ctx_mod.bind_macros(self.macro_templates, ctx)
        if unit_overrides:
            # unit-test overrides (reference UnitTestOverrides,
            # unit_test_definition.py:40-43): vars/env_vars shadow the
            # lookup functions; each named macro becomes a constant
            # callable — is_incremental: true is THE way to unit-test
            # the incremental branch of a model. Applied AFTER
            # bind_macros so they win over real macro definitions.
            o_vars = unit_overrides.get("vars") or {}
            o_env = unit_overrides.get("env_vars") or {}
            o_macros = unit_overrides.get("macros") or {}
            if o_vars:
                base_var = ctx["var"]
                ctx["var"] = lambda name, default=None: (
                    o_vars[name] if name in o_vars
                    else base_var(name, default)
                )
            if o_env:
                base_env = ctx["env_var"]
                ctx["env_var"] = lambda name, default=None: (
                    o_env[name] if name in o_env
                    else base_env(name, default)
                )
            for mname, mval in o_macros.items():
                ctx[mname] = (lambda v: lambda *a, **k: v)(mval)
            if "__this__" in unit_overrides:
                # unit-test 'this' fixture (input: this): {{ this }}
                # resolves to the fixture view instead of the model's
                # real relation
                ctx["this"] = unit_overrides["__this__"]
        return ctx

    # ------------------------------------------------------------------
    def _check_access(self, consumer, target) -> None:
        """Group/access enforcement on ref
        (``providers.py:516-543``): a ``private`` model may only be
        referenced from its own group."""
        access = target.config.get("access")
        if access != "private":
            return
        tgroup = target.config.get("group")
        cgroup = consumer.config.get("group")
        if tgroup and cgroup != tgroup:
            raise CompilationError(
                f"{consumer.unique_id} cannot ref private model "
                f"'{target.name}' (group '{tgroup}')"
            )

    # ------------------------------------------------------------------
    def _add_ephemeral_cte(
        self,
        node: ParsedNode,
        cte_name: str,
        extra_ctes: list[tuple[str, str]],
        ref_overrides: dict[str, str] | None,
    ) -> None:
        """``_recursively_prepend_ctes`` — depth-first so ancestors land
        before dependents; dedupe by name."""
        if any(n == cte_name for n, _ in extra_ctes):
            return
        inner: list[tuple[str, str]] = []
        body = self.render(node, inner, ref_overrides=ref_overrides)
        for item in inner:
            if item not in extra_ctes:
                extra_ctes.append(item)
        extra_ctes.append((cte_name, body))

    # ------------------------------------------------------------------
    def render(
        self,
        node: ParsedNode,
        extra_ctes: list[tuple[str, str]],
        ref_overrides: dict[str, str] | None = None,
        is_incremental: bool = False,
        unit_overrides: dict | None = None,
    ) -> str:
        if not ctx_mod.has_jinja(node.raw_code):
            # pass-through compile (reference experimental parser's
            # skip-Jinja idea applied at compile time): a model with no
            # jinja delimiters renders to itself — no context build, no
            # template parse. Ephemeral CTEs / event-time filters /
            # --empty all act through ref()/source(), which such a
            # model cannot contain.
            return node.raw_code.strip()
        ctx = self.runtime_context(
            node, extra_ctes, ref_overrides, is_incremental=is_incremental,
            unit_overrides=unit_overrides,
        )
        try:
            return self.env.from_string(node.raw_code).render(**ctx).strip()
        except CompilationError:
            raise
        except Exception as e:
            raise CompilationError(
                f"rendering {node.unique_id}: {type(e).__name__}: {e}"
            ) from e

    def compile_node(
        self,
        node: ParsedNode,
        ref_overrides: dict[str, str] | None = None,
        is_incremental: bool = False,
        unit_overrides: dict | None = None,
    ) -> ParsedNode:
        if node.language == "python":
            node.compiled_code = node.raw_code
            node.relation = self.relation_for(node)
            return node
        extra_ctes: list[tuple[str, str]] = []
        compiled = self.render(
            node, extra_ctes, ref_overrides, is_incremental=is_incremental,
            unit_overrides=unit_overrides,
        )
        node.extra_ctes = extra_ctes
        node.compiled_code = inject_ctes_into_sql(compiled, extra_ctes)
        node.relation = self.relation_for(node)
        return node
