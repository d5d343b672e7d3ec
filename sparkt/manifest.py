"""Manifest: the parsed universe of project resources.

Mirrors the reference's node taxonomy and manifest
(``core/dbt/artifacts/resources/types.py:18-37``,
``core/dbt/contracts/graph/nodes.py:113-1586``,
``core/dbt/contracts/graph/manifest.py``) reduced to the fields this
engine executes. unique_id format is identical:
``"{type}.{package}.{name}"``.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any

from sparkt.relation import Relation

EXECUTABLE_TYPES = {"model", "seed", "snapshot", "test", "unit_test", "operation"}
REFABLE_TYPES = {"model", "seed", "snapshot"}


def unit_test_fingerprint(model, given, expect, overrides=None) -> str:
    """Stable md5 over a unit test's *definition* (model/given/expect).

    The published manifest-v12 UnitTestDefinition has no checksum field
    (``schemas/dbt/manifest/v12.json``), so state:modified compares unit
    tests by this canonical serialization instead — computed identically
    from a live ParsedNode and from a previously written artifact. The
    normalization below must mirror ``Manifest.to_dict``'s
    ``unit_test_dict`` exactly."""
    norm = {
        "model": model or "",
        "given": [
            {"input": str(g.get("input", "")),
             "rows": g.get("rows"),
             "format": g.get("format", "dict")}
            for g in (given or [])
        ],
        "expect": {"rows": (expect or {}).get("rows"),
                   "format": (expect or {}).get("format", "dict")},
    }
    if overrides:
        # only present when set, so pre-override fingerprints (and
        # artifacts written before this field existed) stay stable
        norm["overrides"] = overrides
    return hashlib.md5(
        json.dumps(norm, sort_keys=True, default=str).encode()
    ).hexdigest()


def source_state_dict(n: "ParsedNode") -> dict:
    """A source's manifest-v12 SourceDefinition dict — also the
    canonical form ``state:modified`` compares against the previous
    manifest (the reference's ``SourceDefinition.same_contents`` is
    definition equality, ``selector_methods.py:681``)."""
    return {
        "database": None,
        "schema": n.config.get("schema") or "",
        "name": n.name,
        "resource_type": "source",
        "package_name": n.package_name,
        "path": n.path,
        "original_file_path": n.original_file_path,
        "unique_id": n.unique_id,
        "fqn": [n.package_name, n.source_name or "", n.name],
        "source_name": n.source_name or "",
        "source_description": "",
        "loader": "",
        "identifier": n.config.get("identifier", n.name),
        "loaded_at_field": n.loaded_at_field,
        "freshness": None,
        "description": n.description,
        "columns": column_info_dict(n.columns),
        "config": n.config,
        "tags": n.tags,
        "relation_name": n.relation.render() if n.relation else None,
    }


def column_info_dict(cols: dict) -> dict:
    """YAML column entries → manifest-v12 ColumnInfo objects (the
    schema's per-column alternative sets additionalProperties: false).
    Also the canonical form for state:modified.contract comparison."""
    out = {}
    for cname, c in (cols or {}).items():
        c = c if isinstance(c, dict) else {}
        col = {"name": c.get("name", cname),
               "description": str(c.get("description", ""))}
        if c.get("data_type") is not None:
            col["data_type"] = str(c["data_type"])
        out[cname] = col
    return out


@dataclass
class ParsedNode:
    """One resource (reference ``ParsedNode``/``CompiledNode``,
    ``core/dbt/contracts/graph/nodes.py:239-424``)."""

    unique_id: str
    name: str
    package_name: str
    resource_type: str  # model | seed | snapshot | test | unit_test | source | operation | analysis
    path: str = ""
    raw_code: str = ""
    language: str = "sql"  # sql | python
    config: dict[str, Any] = field(default_factory=dict)
    # the precedence LAYERS behind config (reference config_call_dict /
    # unrendered project-tree config): the schema-yml patch splices
    # between them — project tree < yml < in-file config()
    project_tree_config: dict[str, Any] | None = None
    config_call_dict: dict[str, Any] | None = None
    tags: list[str] = field(default_factory=list)
    # name-level deps recorded at parse; resolved to unique_ids at link
    refs: list[str] = field(default_factory=list)
    sources: list[tuple[str, str]] = field(default_factory=list)
    depends_on: list[str] = field(default_factory=list)
    # filled at compile/run time
    compiled_code: str | None = None
    extra_ctes: list[tuple[str, str]] = field(default_factory=list)
    relation: Relation | None = None
    columns: dict[str, dict] = field(default_factory=dict)
    description: str = ""
    # tests
    test_metadata: dict[str, Any] = field(default_factory=dict)
    attached_node: str | None = None
    # unit tests
    given: list[dict] = field(default_factory=list)
    expect: dict = field(default_factory=dict)
    model: str | None = None
    # unit-test overrides (reference UnitTestOverrides,
    # unit_test_definition.py:40-43: macros / vars / env_vars)
    overrides: dict = field(default_factory=dict)
    # model versions (nodes.py:426): versioned nodes share a base_name;
    # config carries version / latest_version
    base_name: str | None = None
    # sources
    source_name: str | None = None
    loaded_at_field: str | None = None
    freshness: dict[str, Any] = field(default_factory=dict)
    external_location: str | None = None
    # external source file format (parquet | csv | json) + reader
    # options (e.g. csv header/delimiter), reference
    # artifacts/resources/v1/source_definition.py:25-60 (ExternalTable
    # carries file_format/row_format/tbl_properties)
    external_format: str = "parquet"
    external_options: dict[str, Any] = field(default_factory=dict)
    # the resource directory ``path`` is relative to (models/, seeds/,
    # a custom model-path, the schema yml's walk root). ``path`` stays
    # resource-dir-relative everywhere internal (fqn assembly, file
    # selector, partial-parse keys); the reference's project-relative
    # original_file_path is assembled on demand (r14 review: every
    # artifact/ls surface previously emitted the dir-less form, e.g.
    # "b.sql" where the reference records "models/b.sql")
    resource_dir: str | None = None

    @property
    def original_file_path(self) -> str:
        """Project-relative file path (reference nodes'
        original_file_path — includes the resource directory)."""
        if self.resource_dir and self.path:
            return f"{self.resource_dir.rstrip('/')}/{self.path}"
        return self.path or ""

    @property
    def fqn(self) -> list[str]:
        """[package, *subdirs, name] — the reference's fqn assembly
        (directory components under the resource path, NOT including
        the resource dir itself). Same shape the selector matches
        (graph/selector.py _node_fqn)."""
        dirs = self.path.split("/")[:-1] if self.path else []
        return [self.package_name, *dirs, self.name]

    @property
    def materialized(self) -> str:
        default = {
            "model": "view",  # reference default: artifacts/resources/v1/config.py:81
            "seed": "seed",
            "snapshot": "snapshot",
            "test": "test",
            "unit_test": "unit",
        }.get(self.resource_type, "view")
        return self.config.get("materialized", default)

    @property
    def alias(self) -> str:
        return self.config.get("alias", self.name)

    @property
    def is_ephemeral(self) -> bool:
        return self.materialized == "ephemeral"

    def checksum(self) -> str:
        # unit tests serialize to the artifact without raw_code (the v12
        # UnitTestDefinition has no checksum), so their identity is the
        # definition fingerprint — comparable against a state artifact.
        if self.resource_type == "unit_test":
            return unit_test_fingerprint(self.model, self.given, self.expect, self.overrides)
        return hashlib.md5(self.raw_code.encode()).hexdigest()


class _TrackedDict(dict):
    """dict that bumps a generation counter on every structural
    mutation. Backs ``Manifest.nodes`` so ``_ref_index`` invalidates on
    same-count mutations too (delete one + add another, key rename) —
    a pure len() check would serve stale index entries there."""

    __slots__ = ("gen",)

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.gen = 0

    def _bump(self):
        # unpickling repopulates via __setitem__ BEFORE __init__ runs,
        # so the slot may not exist yet
        try:
            self.gen += 1
        except AttributeError:
            self.gen = 1

    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        self._bump()

    def __delitem__(self, k):
        super().__delitem__(k)
        self._bump()

    def update(self, *a, **k):
        super().update(*a, **k)
        self._bump()

    def pop(self, *a):
        self._bump()
        return super().pop(*a)

    def popitem(self):
        self._bump()
        return super().popitem()

    def clear(self):
        self._bump()
        super().clear()

    def setdefault(self, k, d=None):
        self._bump()
        return super().setdefault(k, d)


@dataclass
class Manifest:
    """Reference ``Manifest`` (``core/dbt/contracts/graph/manifest.py``)."""

    nodes: dict[str, ParsedNode] = field(default_factory=_TrackedDict)
    sources: dict[str, ParsedNode] = field(default_factory=dict)
    macros: dict[str, str] = field(default_factory=dict)  # name -> raw jinja
    semantic_models: list = field(default_factory=list)  # raw yaml specs
    metrics: list = field(default_factory=list)  # raw yaml specs
    groups: dict[str, dict] = field(default_factory=dict)
    saved_queries: list = field(default_factory=list)
    parent_map: dict[str, list[str]] = field(default_factory=dict)
    child_map: dict[str, list[str]] = field(default_factory=dict)

    def _ref_index(self) -> dict:
        """(package|None, base_name-or-name) → [refable nodes, insertion
        order]. Rebuilt whenever ``nodes``' mutation generation changes
        (every add/remove/replace bumps ``_TrackedDict.gen``, so
        same-count mutations invalidate too); in-place patches keep the
        same objects, so index values stay live. Without this,
        ``ref_lookup`` scans every node per call — measured 11.5 s of a
        21 s cold parse at 2,000 models (r4)."""
        gen = (getattr(self.nodes, "gen", None), len(self.nodes))
        cached = getattr(self, "__ref_idx", None)
        if cached is not None and cached[0] == gen:
            return cached[1]
        idx: dict = {}
        for n in self.nodes.values():
            if n.resource_type not in REFABLE_TYPES:
                continue
            key_name = n.base_name or n.name
            idx.setdefault((n.package_name, key_name), []).append(n)
            idx.setdefault((None, key_name), []).append(n)
            if n.base_name and n.base_name != n.name:
                idx.setdefault((n.package_name, n.name), []).append(n)
                idx.setdefault((None, n.name), []).append(n)
        object.__setattr__(self, "__ref_idx", (gen, idx))
        return idx

    def ref_lookup(
        self,
        name: str,
        package: str | None = None,
        version: str | int | None = None,
    ) -> ParsedNode | None:
        """Name (optionally package/version) → node. A versioned ref
        matches on base_name + version; an unversioned ref to a
        versioned model resolves to its latest_version
        (``core/dbt/contracts/graph/manifest.py`` ref resolution +
        ``nodes.py:426``). O(1) via :meth:`_ref_index`."""
        candidates = self._ref_index().get((package, name), [])
        if version is not None:
            for n in candidates:
                if (n.base_name or n.name) == name and str(
                    n.config.get("version")
                ) == str(version):
                    return n
            return None
        versioned = [n for n in candidates if n.base_name == name]
        if versioned:
            for n in versioned:
                if str(n.config.get("version")) == str(
                    n.config.get("latest_version")
                ):
                    return n
            return max(
                versioned, key=lambda n: str(n.config.get("version"))
            )
        for n in candidates:
            if n.name == name:
                return n
        return None

    def source_lookup(self, source_name: str, table_name: str) -> ParsedNode | None:
        uid = f"source.{source_name}.{table_name}"
        return self.sources.get(uid)

    def all_nodes(self) -> dict[str, ParsedNode]:
        out = dict(self.nodes)
        out.update(self.sources)
        return out

    def build_parent_child_maps(self) -> None:
        self.parent_map = {uid: list(n.depends_on) for uid, n in self.all_nodes().items()}
        self.child_map = {uid: [] for uid in self.all_nodes()}
        for uid, parents in self.parent_map.items():
            for p in parents:
                self.child_map.setdefault(p, []).append(uid)

    def _tests_by_attached(self) -> dict:
        """attached_node → [test nodes], rebuilt when ``nodes``'
        mutation generation changes — ``infer_primary_key`` is called
        once per model inside ``to_dict``, and a per-call scan of every
        node is the same O(models × nodes) pattern the r4 ref-index
        cache removed from parsing (~20M iterations per manifest write
        at the 2,000-model bench scale)."""
        gen = (getattr(self.nodes, "gen", None), len(self.nodes))
        cached = getattr(self, "__tests_idx", None)
        if cached is not None and cached[0] == gen:
            return cached[1]
        idx: dict = {}
        for t in self.nodes.values():
            if t.resource_type == "test" and t.attached_node:
                idx.setdefault(t.attached_node, []).append(t)
        object.__setattr__(self, "__tests_idx", (gen, idx))
        return idx

    def infer_primary_key(self, node: "ParsedNode") -> list[str]:
        """Primary-key inference for model nodes, mirroring the
        reference's resolution order (``ModelNode.infer_primary_key``,
        ``core/dbt/contracts/graph/nodes.py:483-530``; behavior pinned
        by ``tests/functional/primary_keys``):

        1. model-level ``primary_key`` constraint (its ``columns``)
        2. a column with a ``primary_key`` constraint
        3. columns with unique AND not_null data tests
        4. columns with enabled unique tests
        5. columns with disabled unique tests
        """
        for c in node.config.get("constraints") or []:
            if isinstance(c, dict) and c.get("type") == "primary_key":
                return list(c.get("columns") or [])
        for cname, spec in node.columns.items():
            for c in (spec or {}).get("constraints", []) or []:
                if isinstance(c, dict) and c.get("type") == "primary_key":
                    return [cname]
        enabled_unique: set[str] = set()
        disabled_unique: set[str] = set()
        not_null: set[str] = set()
        for t in self._tests_by_attached().get(node.unique_id, []):
            meta = t.test_metadata or {}
            kwargs = meta.get("kwargs") or {}
            cols = (
                [meta["column_name"]] if meta.get("column_name")
                else list(kwargs.get("combination_of_columns") or [])
            )
            tname = meta.get("name")
            for col in cols:
                if tname in ("unique", "unique_combination_of_columns"):
                    if t.config.get("enabled", True):
                        enabled_unique.add(col)
                    else:
                        disabled_unique.add(col)
                elif tname == "not_null":
                    not_null.add(col)
        both = sorted(
            c for c in not_null if c in enabled_unique | disabled_unique
        )
        if both:
            return both
        if enabled_unique:
            return sorted(enabled_unique)
        return sorted(disabled_unique)

    def to_dict(self) -> dict:
        """``target/manifest.json`` in the reference's published
        manifest v12 shape (``schemas/dbt/manifest/v12.json`` —
        WritableManifest: every alternative there sets
        ``additionalProperties: false``, so each node emits exactly the
        schema's keys; engine-only extras ride in ``config``, which the
        schema leaves open). Validated by
        ``tests/test_state_and_artifacts.py``."""
        from sparkt import __version__

        columns_dict = column_info_dict

        def node_dict(n: ParsedNode) -> dict:
            d = {
                "database": None,
                "schema": n.relation.schema if n.relation else "",
                "name": n.name,
                "resource_type": n.resource_type,
                "package_name": n.package_name,
                "path": n.path,
                "original_file_path": n.original_file_path,
                "unique_id": n.unique_id,
                "fqn": n.fqn,
                "alias": n.alias,
                "checksum": {"name": "md5", "checksum": n.checksum()},
                "config": n.config,
                "tags": n.tags,
                "description": n.description,
                "columns": columns_dict(n.columns),
                "depends_on": {"nodes": n.depends_on},
                "raw_code": n.raw_code,
                "relation_name": n.relation.render() if n.relation else None,
            }
            if n.resource_type == "seed":
                # Seed: MacroDependsOn only ("No SQLDefaults!",
                # nodes.py:774) — no nodes key, no compiled fields
                d["depends_on"] = {"macros": []}
            else:
                d["language"] = n.language
                d["compiled_code"] = n.compiled_code
            if n.resource_type == "model":
                d["primary_key"] = self.infer_primary_key(n)
            return d

        def unit_test_dict(n: ParsedNode) -> dict:
            return {
                "model": n.model or "",
                "given": [
                    {"input": str(g.get("input", "")),
                     "rows": g.get("rows"),
                     "format": g.get("format", "dict")}
                    for g in (n.given or [])
                ],
                "expect": {"rows": n.expect.get("rows"),
                           "format": n.expect.get("format", "dict")},
                **({"overrides": n.overrides} if n.overrides else {}),
                "name": n.name,
                "resource_type": "unit_test",
                "package_name": n.package_name,
                "path": n.path,
                "original_file_path": n.original_file_path,
                "unique_id": n.unique_id,
                # path-derived fqn, same as models/seeds — keeps the
                # artifact in agreement with what selection matches
                # for unit tests in subdirectories
                "fqn": n.fqn,
                "config": {k: v for k, v in n.config.items()
                           if k in ("tags", "meta", "enabled")},
            }

        source_dict = source_state_dict

        def macro_dict(name: str, src: str) -> dict:
            pkg, _, rel = name.partition("/")
            stem = rel.rsplit("/", 1)[-1].rsplit(".", 1)[0] or pkg
            return {
                "name": stem,
                "resource_type": "macro",
                "package_name": pkg,
                "path": rel,
                "original_file_path": rel,
                "unique_id": f"macro.{pkg}.{stem}",
                "macro_sql": src,
            }

        return {
            "metadata": {
                "dbt_schema_version":
                    "https://schemas.getdbt.com/dbt/manifest/v12.json",
                "dbt_version": __version__,
                "generated_at": "",
                "invocation_id": None,
                "project_name": None,
            },
            "nodes": {
                uid: node_dict(n) for uid, n in self.nodes.items()
                if n.resource_type != "unit_test"
            },
            "sources": {uid: source_dict(n) for uid, n in self.sources.items()},
            "macros": {
                name: macro_dict(name, src)
                for name, src in self.macros.items()
            },
            "docs": {},
            "exposures": {},
            "metrics": {},
            "groups": {},
            "selectors": {},
            "disabled": {},
            "parent_map": self.parent_map,
            "child_map": self.child_map,
            "group_map": {},
            "saved_queries": {},
            "semantic_models": {},
            "unit_tests": {
                uid: unit_test_dict(n) for uid, n in self.nodes.items()
                if n.resource_type == "unit_test"
            },
        }

    def write(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=1, default=str)
