"""Project + profile loading.

Mirrors the reference's RuntimeConfig assembly
(``core/dbt/config/runtime.py:96-299``): ``dbt_project.yml`` declares
resource paths and config trees; ``profiles.yml`` declares the target
(here: warehouse dir, schema, threads, Spark master). Profile defaults
are inlined so a project file alone is enough.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass
class Project:
    project_root: str
    name: str = "sparkt_project"
    version: str = "1.0"
    model_paths: list[str] = field(default_factory=lambda: ["models"])
    seed_paths: list[str] = field(default_factory=lambda: ["seeds"])
    snapshot_paths: list[str] = field(default_factory=lambda: ["snapshots"])
    test_paths: list[str] = field(default_factory=lambda: ["tests"])
    macro_paths: list[str] = field(default_factory=lambda: ["macros"])
    analysis_paths: list[str] = field(default_factory=lambda: ["analyses"])
    target_path: str = "target"
    # config trees: models: {+materialized: view, subdir: {...}}
    models_config: dict[str, Any] = field(default_factory=dict)
    seeds_config: dict[str, Any] = field(default_factory=dict)
    snapshots_config: dict[str, Any] = field(default_factory=dict)
    tests_config: dict[str, Any] = field(default_factory=dict)
    vars: dict[str, Any] = field(default_factory=dict)
    on_run_start: list[str] = field(default_factory=list)
    on_run_end: list[str] = field(default_factory=list)
    # profile
    schema: str = "analytics"
    threads: int = 4
    # selected profile output name (reference --target/-t; surfaces as
    # {{ target.name }} in jinja)
    target_name: str = "dev"
    # selectors.yml: {name: {"default": bool, "definition": <raw yaml>}}
    # (reference: core/dbt/config/selectors.py + graph/cli.py:235)
    selectors: dict[str, dict] = field(default_factory=dict)
    # dbt clean targets (reference Project.clean_targets; default
    # matches dbt: target + installed packages)
    clean_targets: list[str] = field(
        default_factory=lambda: ["target", "dbt_packages"]
    )
    # dbt_project.yml `flags:` (reference ProjectFlags,
    # core/dbt/cli/flags.py precedence: CLI flag > env var > project
    # flags > default) — consumed as the default tier by execute_nodes
    flags: dict[str, Any] = field(default_factory=dict)
    # query-comment (reference core/dbt/config/project.py:211-240):
    # {"comment": jinja str | None (None = dbt-style default JSON),
    #  "append": bool} — rendered per node and attached to every
    # submitted statement + the Spark job description
    query_comment: dict[str, Any] = field(
        default_factory=lambda: {"comment": None, "append": False}
    )

    def target_context(self) -> dict:
        """The ``target`` Jinja/context dict — single source for the
        compiler's runtime context, naming macros, and query-comment
        rendering (was hand-built in three places)."""
        return {
            "name": self.target_name,
            "type": "spark",
            "schema": self.schema,
            "threads": self.threads,
        }

    @property
    def target_dir(self) -> str:
        return os.path.join(self.project_root, self.target_path)

    @property
    def warehouse_dir(self) -> str:
        return os.path.join(self.target_dir, "warehouse")

    def config_for_path(
        self, kind: str, rel_path: str, package: str | None = None
    ) -> dict[str, Any]:
        """Resolve the project-file config tree for a resource path —
        the ``models: {subdir: {+materialized: table}}`` cascade
        (reference: project-level configs merged in
        ``core/dbt/config/project.py``). ``+``-prefixed keys apply at
        that level; nesting follows directories. ``package`` resolves
        THIS project's tree for a resource living in another package
        (the root project configuring a dependency: top-level +keys
        apply to every package, ``models: {<package>: {...}}`` scopes
        deeper levels — reference root-over-package precedence)."""
        tree = {
            "model": self.models_config,
            "seed": self.seeds_config,
            "snapshot": self.snapshots_config,
            "test": self.tests_config,
        }.get(kind, {})
        out: dict[str, Any] = {}

        def take(level: dict) -> None:
            # each cascade level merges with dbt's per-field behavior
            # (tags/hooks append down the tree, meta dict-merges,
            # scalars clobber) — see merge_config_call
            merge_config_call(
                out,
                {k[1:]: v for k, v in level.items() if k.startswith("+")},
            )

        take(tree)
        level = tree
        # dbt's canonical tree nests under the PACKAGE name first
        # (``models: {my_project: {staging: {+tags: ...}}}``); this
        # level was silently skipped before r9, so project-scoped
        # configs in the standard layout never applied. A tree without
        # the package level (directories at the top) keeps working.
        pkg = package or self.name
        if isinstance(tree.get(pkg), dict):
            level = tree[pkg]
            take(level)
        elif package is not None:
            # resolving for a foreign package: only the top-level
            # +defaults apply when the tree has no entry for it —
            # this project's own directory levels must not leak in
            return out
        parts = rel_path.split(os.sep)
        for part in parts[:-1]:
            nxt = level.get(part)
            if not isinstance(nxt, dict):
                break
            take(nxt)
            level = nxt
        else:
            # resource-name leaf level: models: {my_model: {+alias: x}}
            stem = os.path.splitext(parts[-1])[0]
            leaf = level.get(stem)
            if isinstance(leaf, dict):
                take(leaf)
        return out


# dbt's canonical YAML spellings for hooks use hyphens
# (core/dbt/config: pre-hook/post-hook); runtime config keys use
# underscores — normalize at every YAML → config merge point
_HOOK_ALIASES = {"pre-hook": "pre_hook", "post-hook": "post_hook"}


def normalize_config_keys(cfg: dict) -> dict:
    return {_HOOK_ALIASES.get(k, k): v for k, v in cfg.items()}


def _listify(v) -> list[str]:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


# dbt's per-field config merge behavior (public dbt-common
# ``BaseConfig.mergebehavior`` + the field metadata in the reference's
# ``core/dbt/artifacts/resources/v1/config.py:55-125``): repeated
# ``config()`` calls and the project-tree → in-file cascade APPEND
# these list keys and UPDATE these dict keys instead of clobbering —
# ``{{ config(tags='hello') }} {{ config(tags='world') }}`` yields
# ``['hello', 'world']`` (pinned by the reference's own
# ``tests/functional/experimental_parser`` corpus).
_MERGE_APPEND = frozenset({"pre_hook", "post_hook", "tags", "packages"})
_MERGE_UPDATE = frozenset(
    {"meta", "quoting", "column_types", "docs", "contract"}
)


def merge_config_call(dst: dict, opts: dict) -> dict:
    """Merge one ``config(...)`` call (or one cascade level) into
    ``dst`` with dbt's per-field behavior, mirroring the reference's
    ``context_config._add_config_call``: append-keys listify and
    extend; update-keys dict-merge; ``grants`` does dict-key-append
    (a ``+select`` key extends the role list, a bare key replaces
    it); everything else clobbers. Returns ``dst``."""
    for k, v in opts.items():
        k = _HOOK_ALIASES.get(k, k)
        if k in _MERGE_APPEND:
            cur = dst.get(k)
            cur = list(cur) if isinstance(cur, list) else _listify(cur)
            dst[k] = cur + _listify(v)
        elif k in _MERGE_UPDATE and isinstance(v, dict):
            cur = dst.get(k)
            merged = dict(cur) if isinstance(cur, dict) else {}
            merged.update(v)
            dst[k] = merged
        elif k == "grants" and isinstance(v, dict):
            cur = dict(dst.get(k) or {})
            for gk, gv in v.items():
                if gk.startswith("+"):
                    base = gk[1:]
                    cur[base] = list(cur.get(base) or []) + _listify(gv)
                else:
                    cur[gk] = _listify(gv)
            dst[k] = cur
        else:
            dst[k] = v
    return dst


def load_project(project_root: str, overrides: dict | None = None) -> Project:
    # absolute: a relative LOCATION in Spark DDL resolves against the
    # Spark warehouse dir, not the cwd that df.write resolves against
    project_root = os.path.abspath(project_root)
    path = os.path.join(project_root, "dbt_project.yml")
    raw: dict[str, Any] = {}
    if os.path.exists(path):
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
    proj = Project(
        project_root=project_root,
        name=raw.get("name", "sparkt_project"),
        version=str(raw.get("version", "1.0")),
        model_paths=raw.get(
            "model-paths",
            raw.get("model_paths", raw.get("source-paths", ["models"])),
        ),
        seed_paths=raw.get(
            "seed-paths",
            raw.get("seed_paths", raw.get("data-paths", ["seeds"])),
        ),
        snapshot_paths=raw.get("snapshot-paths", raw.get("snapshot_paths", ["snapshots"])),
        test_paths=raw.get("test-paths", raw.get("test_paths", ["tests"])),
        macro_paths=raw.get("macro-paths", raw.get("macro_paths", ["macros"])),
        analysis_paths=raw.get("analysis-paths", raw.get("analysis_paths", ["analyses"])),
        # env > project file (reference core/dbt/cli/flags.py:
        # DBT_TARGET_PATH overrides the project's target-path)
        target_path=os.environ.get("DBT_TARGET_PATH")
        or raw.get("target-path", "target"),
        models_config=raw.get("models", {}) or {},
        seeds_config=raw.get("seeds", {}) or {},
        snapshots_config=raw.get("snapshots", {}) or {},
        tests_config=raw.get("data_tests", raw.get("tests", {})) or {},
        vars=raw.get("vars", {}) or {},
        on_run_start=_listify(raw.get("on-run-start")),
        on_run_end=_listify(raw.get("on-run-end")),
    )
    if raw.get("clean-targets") is not None:
        proj.clean_targets = _listify(raw.get("clean-targets"))
    if isinstance(raw.get("flags"), dict):
        proj.flags = raw["flags"]
    # renamed-config deprecations (core/dbt/deprecations.py, once-only)
    from sparkt import deprecations

    if "source-paths" in raw and "model-paths" not in raw:
        deprecations.warn("project-config-source-paths")
    if "data-paths" in raw and "seed-paths" not in raw:
        deprecations.warn("project-config-data-paths")
    if "tests" in raw and "data_tests" not in raw \
            and isinstance(raw.get("tests"), dict):
        deprecations.warn("project-test-config")
    if "query-comment" in raw or "query_comment" in raw:
        qc = raw.get("query-comment", raw.get("query_comment"))
        if isinstance(qc, dict):
            proj.query_comment = {
                "comment": qc.get("comment"),
                "append": bool(qc.get("append", False)),
            }
        else:
            # string comment; explicit null/empty DISABLES the comment
            # ("" sentinel), matching the reference's NoValue handling
            proj.query_comment = {"comment": qc or "", "append": False}
    # selectors.yml (optional): named YAML selectors
    spath = os.path.join(project_root, "selectors.yml")
    if os.path.exists(spath):
        with open(spath) as f:
            sel_raw = yaml.safe_load(f) or {}
        for entry in sel_raw.get("selectors", []) or []:
            proj.selectors[entry["name"]] = {
                "default": bool(entry.get("default", False)),
                "definition": entry.get("definition"),
            }
    # profiles.yml (optional): schema/threads. DBT_PROFILES_DIR
    # (reference cli/params.py profiles_dir) takes precedence over the
    # project root copy.
    pdir = os.environ.get("DBT_PROFILES_DIR") or project_root
    ppath = os.path.join(pdir, "profiles.yml")
    if not os.path.exists(ppath):
        ppath = os.path.join(project_root, "profiles.yml")
    if os.path.exists(ppath):
        with open(ppath) as f:
            prof_doc = yaml.safe_load(f) or {}
        out = None
        # dbt shape (reference core/dbt/config/profile.py):
        # {<profile>: {target: <name>, outputs: {<name>: {schema,
        # threads, ...}}}} — profile chosen by dbt_project.yml
        # `profile:` (project name fallback), output by DBT_TARGET
        # (--target/-t) > the profile's `target:` key > first output
        prof_name = raw.get("profile") or proj.name
        entry = prof_doc.get(prof_name)
        if entry is None:
            shaped = {k: v for k, v in prof_doc.items()
                      if isinstance(v, dict) and "outputs" in v}
            if len(shaped) == 1:
                entry = next(iter(shaped.values()))
        if isinstance(entry, dict) and isinstance(entry.get("outputs"), dict):
            outputs = entry["outputs"]
            tname = os.environ.get("DBT_TARGET") or entry.get("target")
            if tname is None and outputs:
                tname = next(iter(outputs))
            out = outputs.get(tname)
            if out is None:
                from sparkt.exceptions import ParsingError

                raise ParsingError(
                    f"profiles.yml: target '{tname}' not found in "
                    f"outputs {sorted(outputs)}"
                )
            proj.target_name = str(tname)
        elif isinstance(prof_doc.get("target"), dict):
            # legacy single-target form: `target: {schema, threads}`
            out = prof_doc["target"]
        if isinstance(out, dict):
            # profiles.yml is a SECRET-capable rendering context
            # (reference config/renderer.py:222 ProfileRenderer):
            # DBT_ENV_SECRET_* env vars are usable here and only here
            # (plus packages.yml), via placeholder substitution
            from sparkt.secrets import render_secret_tree

            out = render_secret_tree(out, where="profiles.yml")
            proj.schema = out.get("schema", proj.schema)
            proj.threads = int(out.get("threads", proj.threads))
    if overrides:
        for k, v in overrides.items():
            setattr(proj, k, v)
    return proj
