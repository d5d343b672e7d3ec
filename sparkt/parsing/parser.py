"""Project file parser → Manifest.

Mirrors the reference's load pipeline
(``core/dbt/parser/manifest.py:263-512``): discover files by
path/extension (``parser/read_files.py:386-430``), parse macros first,
then models/seeds/snapshots/singular tests, then schema YAML (sources,
model patches, generic data tests, unit tests), then resolve refs.
Partial parsing is two-tier: a whole-manifest cache (inline in
``load``, ``partial_parse.pickle``) for the nothing-changed case, and
the file-level cache in ``sparkt/partial.py`` (reference
``core/dbt/parser/partial.py``) that re-parses only changed files.
"""

from __future__ import annotations

import os
import re
from typing import Any

from sparkt.exceptions import ParsingError
from sparkt.manifest import Manifest, ParsedNode
from sparkt.parsing import context as ctx_mod
from sparkt.parsing.macros import BUILTIN_MACRO_SOURCES
from sparkt.project import (
    Project,
    _listify,
    merge_config_call,
    normalize_config_keys,
)

SNAPSHOT_BLOCK_RE = re.compile(
    r"{%-?\s*snapshot\s+(\w+)\s*-?%}(.*?){%-?\s*endsnapshot\s*-?%}", re.S
)


def _walk(root: str, paths: list[str], exts: tuple[str, ...]):
    """Yields (full_path, path_relative_to_resource_dir, resource_dir)
    — the third element is the configured dir the file was found under
    (models/, seeds/, a custom model-path), which nodes record as
    ``resource_dir`` so original_file_path matches the reference's
    project-relative form (r14 review)."""
    for p in paths:
        base = os.path.join(root, p)
        if not os.path.isdir(base):
            continue
        # strip the base prefix by slicing: os.path.relpath is ~20 µs
        # a call and this walk runs twice per load over every file
        cut = len(base.rstrip(os.sep)) + 1
        for dirpath, _, files in os.walk(base):
            for fn in sorted(files):
                if fn.endswith(exts):
                    full = os.path.join(dirpath, fn)
                    yield full, full[cut:], p


_has_jinja = ctx_mod.has_jinja


class ManifestLoader:
    def __init__(self, project: Project, cli_vars: dict | None = None):
        self.project = project
        self.cli_vars = cli_vars or {}
        self.env = ctx_mod.build_environment()
        self.macro_templates = []
        self.manifest = Manifest()
        #: models parsed via the skip-Jinja static fast path this load
        #: (reference experimental parser's sampling stat)
        self.static_parsed = 0
        #: jinja models whose AST extraction was provably complete
        #: (only ref/source/config with constant args), so the
        #: parse-phase render was skipped — the reference's stable
        #: static parser path (core/dbt/parser/models.py:378-398)
        self.static_extracted = 0
        #: files whose parse actually ran this load (cache misses);
        #: the file-level partial-parsing tests pin this
        self.files_reparsed = 0
        self._hashes: dict[str, str] = {}
        self._pcache = None
        self.packages = self._load_packages()

    def _load_packages(self) -> list[Project]:
        """Package deps from packages.yml (reference: ``core/dbt/deps``,
        ``core/dbt/task/deps.py``). Supported pinning methods:

        - ``local:`` path (``deps/local.py``)
        - ``tarball:`` path/file-URL to a ``.tar.gz`` whose root (or
          single top-level dir) is a dbt project (``deps/tarball.py``);
          extracted once into ``target/packages/<stem>``
        - ``git:`` URL + ``revision:`` pin (``deps/git.py``); cloned
          shallow at the revision into ``target/packages/``; local
          ``file://``/path remotes work offline, network remotes need
          egress
        - ``package:`` hub entries resolved through a hub-API-shaped
          local registry (``sparkt/deps.py``; reference
          ``core/dbt/deps/registry.py:30``, ``core/dbt/task/deps.py``):
          semver ranges merged and pinned to the highest installable
          version, pins recorded in ``package-lock.yml`` and reused
          while ``packages.yml`` is unchanged, tarballs installed into
          ``<project>/dbt_packages/``

        Each package is a full project whose resources join the
        manifest under its own package name."""
        import yaml

        from sparkt.project import load_project

        pkg_file = os.path.join(self.project.project_root, "packages.yml")
        if not os.path.exists(pkg_file):
            return []
        with open(pkg_file) as f:
            text = f.read()
        # packages.yml is the second SECRET-capable rendering context
        # (reference config/renderer.py:228 PackageRenderer): a git
        # token wired as {{ env_var('DBT_ENV_SECRET_TOKEN') }} renders
        # here (placeholder-substituted, never persisted — the lock
        # hash below uses the RAW text)
        from sparkt.secrets import render_secret_tree

        spec = render_secret_tree(yaml.safe_load(text) or {}, where="packages.yml")
        out = []
        hub_entries = []
        for entry in spec.get("packages", []) or []:
            entry = entry or {}
            if entry.get("local"):
                path = os.path.join(self.project.project_root, entry["local"])
                if os.path.isdir(path):
                    out.append(load_project(path))
            elif entry.get("tarball"):
                out.append(load_project(self._fetch_tarball(entry["tarball"])))
            elif entry.get("git"):
                out.append(
                    load_project(
                        self._fetch_git(entry["git"], entry.get("revision"))
                    )
                )
            elif entry.get("package"):
                hub_entries.append(entry)
        if hub_entries:
            out.extend(self._install_hub_packages(hub_entries, text))
        return out

    def _install_hub_packages(
        self, entries: list[dict], packages_yml_text: str
    ) -> list:
        """Resolve hub pins (lock-aware) and install their tarballs into
        ``<project>/dbt_packages/`` (the reference's default
        packages-install-path)."""
        import tarfile

        from sparkt import deps as D
        from sparkt.project import load_project

        root = self.project.project_root
        registry = None  # lazy: a valid lock + installed packages need none
        pins = D.read_lock(root, packages_yml_text)
        if pins is None:
            registry = D.LocalRegistry()  # base from DBT_PACKAGE_HUB_URL
            pins = D.resolve_registry_packages(entries, registry)
            D.write_lock(root, pins, packages_yml_text)
        out = []
        for pin in pins:
            dest = os.path.join(
                root, "dbt_packages", D.install_dir_name(pin.package)
            )
            if not os.path.isdir(dest):
                if registry is None:
                    registry = D.LocalRegistry()
                tarball = pin.tarball or registry.tarball(
                    pin.package, pin.version
                )
                os.makedirs(dest, exist_ok=True)
                with tarfile.open(tarball) as tf:
                    tf.extractall(dest, filter="data")
            out.append(
                load_project(
                    self._project_root_within(dest, f"hub '{pin.package}'")
                )
            )
        return out

    def _packages_dir(self) -> str:
        d = os.path.join(self.project.target_dir, "packages")
        os.makedirs(d, exist_ok=True)
        return d

    def _fetch_tarball(self, source: str) -> str:
        import tarfile

        if source.startswith("file://"):
            source = source[len("file://"):]
        if not os.path.isabs(source):
            source = os.path.join(self.project.project_root, source)
        if not os.path.exists(source):
            raise ParsingError(f"tarball package not found: {source}")
        stem = os.path.basename(source)
        for ext in (".tar.gz", ".tgz", ".tar"):
            if stem.endswith(ext):
                stem = stem[: -len(ext)]
                break
        dest = os.path.join(self._packages_dir(), stem)
        if not os.path.isdir(dest):
            with tarfile.open(source) as tf:
                tf.extractall(dest, filter="data")
        return self._project_root_within(dest, f"tarball '{source}'")

    def _fetch_git(self, url: str, revision: str | None) -> str:
        import subprocess

        safe = re.sub(r"\W+", "_", url.rstrip("/").rsplit("/", 1)[-1]) or "pkg"
        rev_safe = re.sub(r"\W+", "_", revision or "HEAD")
        dest = os.path.join(self._packages_dir(), f"{safe}_{rev_safe}")
        if not os.path.isdir(dest):
            cmd = ["git", "clone", "--depth", "1"]
            if revision:
                cmd += ["--branch", revision]
            cmd += [url, dest]
            res = subprocess.run(
                cmd, capture_output=True, text=True, timeout=120
            )
            if res.returncode != 0:
                raise ParsingError(
                    f"git package clone failed for {url}"
                    f"{' @' + revision if revision else ''}: "
                    f"{res.stderr.strip()[:500]}"
                )
        return self._project_root_within(dest, f"git '{url}'")

    @staticmethod
    def _project_root_within(dest: str, what: str) -> str:
        if os.path.exists(os.path.join(dest, "dbt_project.yml")):
            return dest
        entries = [
            e for e in sorted(os.listdir(dest))
            if os.path.isdir(os.path.join(dest, e))
        ]
        for e in entries:
            if os.path.exists(os.path.join(dest, e, "dbt_project.yml")):
                return os.path.join(dest, e)
        raise ParsingError(f"{what}: no dbt_project.yml found in package")

    @property
    def all_projects(self) -> list[Project]:
        return [self.project] + self.packages

    # ------------------------------------------------------------------
    def load(self, partial: bool = True) -> Manifest:
        """Full parse, or reuse of the cached parse when no project file
        changed (coarse-grained analogue of the reference's partial
        parsing, ``core/dbt/parser/partial.py`` + the
        ``partial_parse.msgpack`` gate ``parser/manifest.py:330-362``;
        pickle instead of msgpack, whole-manifest granularity)."""
        self._load_macros()
        hashes = self._file_hashes()
        cache_path = os.path.join(
            self.project.target_dir, "partial_parse.pickle"
        )
        # cache key includes the ParsedNode field list: a pickle written
        # by an older engine unpickles FINE but its nodes lack newly
        # added fields and explode at use — same reason the reference
        # gates partial_parse.msgpack on dbt_version
        # (parser/manifest.py:330-362)
        import dataclasses

        node_schema = ",".join(
            sorted(f.name for f in dataclasses.fields(ParsedNode))
        )
        if partial and os.path.exists(cache_path):
            import pickle

            try:
                manifest = None
                with open(cache_path, "rb") as f:
                    # two-stage pickle: the small header (hashes, key)
                    # loads first so a changed project skips unpickling
                    # the whole manifest (~100 ms at 2,000 models) on
                    # its way to the file-level partial path
                    stored = pickle.load(f)
                    env_ok = all(
                        os.environ.get(k) == v
                        for k, v in (stored.get("env") or {}).items()
                    )
                    if (
                        stored.get("hashes") == hashes
                        and stored.get("node_schema") == node_schema
                        and stored.get("vars")
                        == (self.project.vars, self.cli_vars)
                        and env_ok
                    ):
                        try:
                            manifest = pickle.load(f)
                        except EOFError:
                            # legacy single-blob cache carries the
                            # manifest inline
                            manifest = stored.get("manifest")
                if manifest is not None:
                    self.manifest = manifest
                    # external nodes are plugin-provided, not file-backed:
                    # re-inject on every load (reference parser/
                    # manifest.py:453 runs inject_external_nodes even on
                    # a reused partial parse). No-op without plugins, so
                    # the warm-parse path stays O(0).
                    if self._inject_external_nodes():
                        self._resolve_refs()
                        self.manifest.build_parent_child_maps()
                    return self.manifest
            except Exception:  # noqa: BLE001 — stale/corrupt cache
                pass
        # file-level partial parsing (sparkt/partial.py; reference
        # core/dbt/parser/partial.py): something changed, so the
        # whole-manifest reuse above missed — serve every UNCHANGED
        # file's parse output from the per-file cache and re-parse
        # only the changed ones. Global parse inputs (macros, project
        # files, vars, node schema) ride in the cache key: any change
        # there discards the whole cache.
        import hashlib as _hl

        from sparkt.partial import FileParseCache

        macro_hash = _hl.md5(
            "".join(
                f"{k}\x00{v}\x01"
                for k, v in sorted(self.manifest.macros.items())
            ).encode()
        ).hexdigest()
        proj_files = tuple(sorted(
            (p, h) for p, h in hashes.items()
            if os.path.basename(p) in ("dbt_project.yml", "profiles.yml")
        ))
        fkey = (
            node_schema,
            (self.project.vars, self.cli_vars),
            macro_hash,
            proj_files,
        )
        self._hashes = hashes
        fcache_path = os.path.join(
            self.project.target_dir, "partial_files.pickle"
        )
        self._pcache = (
            FileParseCache.load(fcache_path, fkey)
            if partial else FileParseCache(fcache_path, fkey)
        )
        # env-var invalidation (r12 parsing review #1): clear the
        # tracker so this parse records exactly the env vars IT
        # consumes; both caches store the snapshot and compare against
        # the live environ on their next load.
        from sparkt.parsing import context as _ctx_mod

        _ctx_mod.ENV_VARS_READ.clear()
        self._parse_models()
        self._parse_seeds()
        self._parse_snapshots()
        self._parse_singular_tests()
        self._parse_schema_yaml()
        self._parse_analyses()
        self._add_semantic_nodes()
        self._inject_external_nodes()
        # spaces in resource names (reference manifest validation,
        # D014 per resource + once-only D015 summary)
        spaced = [uid for uid, n in self.manifest.nodes.items()
                  if " " in n.name]
        if spaced:
            from sparkt import deprecations as _depr

            for uid in spaced:
                _depr.fire_event(
                    _depr.SpacesInResourceNameDeprecation(unique_id=uid)
                )
            _depr.warn("resource-names-with-spaces",
                       count_invalid_names=len(spaced))
        self._resolve_refs()
        self.manifest.build_parent_child_maps()
        # merge the prior cache's env snapshot UNDER the fresh reads:
        # cache-served files never re-rendered, so their env_var()
        # consumption is only known from the prior snapshot — saving
        # just the fresh tracker would forget them after one partial
        # reparse and resurrect the staleness hole (second-opinion
        # review #1). The prior snapshot passed env_ok at load, so its
        # values are still current; fresh reads win on overlap.
        env_snapshot = {
            **self._pcache.stored_env,
            **dict(_ctx_mod.ENV_VARS_READ),
        }
        self._pcache.save(hashes, env=env_snapshot)
        try:
            import pickle

            os.makedirs(self.project.target_dir, exist_ok=True)
            with open(cache_path, "wb") as f:
                # header first, manifest second (see the two-stage
                # load above)
                pickle.dump(
                    {
                        "hashes": hashes,
                        "node_schema": node_schema,
                        "vars": (self.project.vars, self.cli_vars),
                        "env": env_snapshot,
                    },
                    f,
                )
                pickle.dump(self.manifest, f)
        except Exception:  # noqa: BLE001 — cache is best-effort
            pass
        return self.manifest

    def _file_hashes(self) -> dict[str, str]:
        import hashlib

        hashes: dict[str, str] = {}
        for proj in self.all_projects:
            # each package's OWN path lists: a package declaring
            # non-default model-paths etc. must still have its files
            # hashed, or edits there serve stale cached parses
            all_paths = (
                proj.model_paths
                + proj.seed_paths
                + proj.snapshot_paths
                + proj.test_paths
                + proj.macro_paths
                + proj.analysis_paths
            )
            for full, rel, _rdir in _walk(
                proj.project_root, all_paths,
                (".sql", ".py", ".csv", ".yml", ".yaml"),
            ):
                with open(full, "rb") as f:
                    hashes[full] = hashlib.md5(f.read()).hexdigest()
        # project files of the ROOT AND every package: their configs
        # merge into each node at parse (config_for_path), so a change
        # must invalidate cached parses
        for proj in self.all_projects:
            for name in ("dbt_project.yml", "profiles.yml"):
                p = os.path.join(proj.project_root, name)
                if os.path.exists(p):
                    with open(p, "rb") as f:
                        hashes[p] = hashlib.md5(f.read()).hexdigest()
        return hashes

    # ------------------------------------------------------------- macros
    def _load_macros(self) -> None:
        sources = list(BUILTIN_MACRO_SOURCES)
        # PACKAGES first, the ROOT project last: bind_macros is
        # last-write-wins per name, and dbt resolves an unqualified
        # macro root-project-over-packages — loading root first let a
        # dependency shipping e.g. generate_schema_name silently
        # clobber the user's override (r12 parsing review #4)
        for proj in self.packages + [self.project]:
            for full, rel, _rdir in _walk(
                proj.project_root, proj.macro_paths, (".sql",)
            ):
                with open(full) as f:
                    src = f.read()
                self.manifest.macros[f"{proj.name}/{rel}"] = src
                sources.append(src)
        self.macro_templates = ctx_mod.load_macro_templates(self.env, sources)

    # ------------------------------------------------------------- models
    def _parse_sql_node(
        self, resource_type: str, name: str, rel_path: str, raw: str,
        project: Project | None = None,
    ) -> ParsedNode:
        project = project or self.project
        if not _has_jinja(raw):
            # static fast path (reference experimental parser,
            # ``core/dbt/parser/models.py:255-299`` — skip-Jinja when a
            # model is statically parseable): a model with NO jinja
            # delimiters has no refs/sources/config and renders to
            # itself, so both the AST walk and the parse-phase render
            # are skipped entirely
            self.static_parsed += 1
            all_refs, all_sources, config = [], [], {}
        else:
            refs, sources, static_config, complete = (
                ctx_mod.extract_statically(self.env, raw)
            )
            if complete:
                # stable static parser (reference core/dbt/parser/
                # models.py:378-398, the dbt-extractor contract): the
                # template is ONLY literal SQL + ref/source/config with
                # constant args, so AST extraction provably equals what
                # a render would collect — skip the parse-phase render
                self.static_extracted += 1
                config = dict(static_config)
                all_refs = list(dict.fromkeys(refs))
                all_sources = list(dict.fromkeys(sources))
            else:
                # parse-phase render for dynamic config()/ref() the AST
                # missed
                # a package model sees its OWN project's vars, with
                # the root project's overriding (dbt var precedence;
                # r12 parsing review #10 — root-only vars made a
                # package's self-declared var('flag') parse as None)
                if project is not self.project:
                    pvars = dict(project.vars or {})
                    pvars.update(self.project.vars or {})
                else:
                    pvars = self.project.vars
                pctx, collector, r_refs, r_srcs = ctx_mod.parse_context(
                    pvars, self.cli_vars
                )
                ctx_mod.bind_macros(self.macro_templates, pctx)
                try:
                    self.env.from_string(raw).render(**pctx)
                except Exception:
                    # runtime-only constructs may fail at parse; AST
                    # capture stands
                    pass
                config = dict(static_config)
                config.update(collector.collected)
                all_refs = list(dict.fromkeys(refs + r_refs))
                all_sources = list(dict.fromkeys(sources + r_srcs))
        node = ParsedNode(
            unique_id=f"{resource_type}.{project.name}.{name}",
            name=name,
            package_name=project.name,
            resource_type=resource_type,
            path=rel_path,
            raw_code=raw,
            refs=all_refs,
            sources=all_sources,
        )
        proj_cfg = project.config_for_path(resource_type, rel_path)
        merged = dict(proj_cfg)
        if project is not self.project:
            # ROOT project configures dependency packages (reference
            # root-over-package precedence): its tree for this package
            # merges over the package's own tree
            merge_config_call(merged, self.project.config_for_path(
                resource_type, rel_path, package=project.name,
            ))
        # keep the precedence LAYERS separately so the schema-yml
        # patch can splice between them (dbt's ladder: project tree <
        # yml < in-file config(); r12 parsing review #2 — patching
        # merged state inverted yml vs project-tree precedence)
        import copy as _copy

        node.project_tree_config = _copy.deepcopy(merged)
        node.config_call_dict = _copy.deepcopy(config)
        # in-file config() merges over the project tree with dbt's
        # per-field behavior (tags/hooks append, meta dict-merges,
        # scalars clobber) — reference context_config._add_config_call
        merge_config_call(merged, config)
        node.config = merged
        node.tags = _listify(merged.get("tags"))
        return node

    def _cached_file(self, full: str, build) -> list[ParsedNode]:
        """Serve a file's ParsedNodes from the per-file cache when its
        content hash is unchanged; otherwise run ``build`` (the real
        parse) and cache its output. The cache snapshot is taken here,
        BEFORE yml patches / ref resolution mutate the nodes."""
        h = self._hashes.get(full)
        if self._pcache is not None:
            cached = self._pcache.get_nodes(full, h)
            if cached is not None:
                return cached
        self.files_reparsed += 1
        nodes = build()
        if self._pcache is not None:
            self._pcache.put_nodes(full, h, nodes)
        return nodes

    def _cached_yaml(self, full: str):
        """yaml.safe_load with per-file caching (the load is the
        expensive part; patch APPLICATION re-runs every parse)."""
        import yaml

        h = self._hashes.get(full)
        if self._pcache is not None:
            cached = self._pcache.get_doc(full, h)
            if cached is not None:
                return cached
        self.files_reparsed += 1
        with open(full) as f:
            doc = yaml.safe_load(f) or {}
        if self._pcache is not None:
            self._pcache.put_doc(full, h, doc)
        return doc

    def _add_unique(self, node: ParsedNode, path: str) -> None:
        """Duplicate-resource detection (reference
        ``tests/functional/duplicates``): two resources compiling to the
        same unique_id is a PARSE ERROR, not a silent last-wins
        overwrite — a dup would otherwise make ref() resolution depend
        on filesystem walk order."""
        existing = self.manifest.nodes.get(node.unique_id)
        if existing is not None:
            raise ParsingError(
                f"found two {node.resource_type}s with the name "
                f"'{node.name}' in package '{node.package_name}' "
                f"({existing.path!r} and {path!r}): {node.unique_id} "
                "must be unique"
            )
        self.manifest.nodes[node.unique_id] = node

    def _parse_models(self) -> None:
        for proj in self.all_projects:
            for full, rel, rdir in _walk(
                proj.project_root, proj.model_paths, (".sql", ".py")
            ):
                name = os.path.splitext(os.path.basename(rel))[0]

                def build(full=full, rel=rel, name=name, proj=proj):
                    with open(full) as f:
                        raw = f.read()
                    if full.endswith(".py"):
                        return [self._parse_python_model(
                            name, rel, raw, project=proj,
                        )]
                    return [self._parse_sql_node(
                        "model", name, rel, raw, project=proj
                    )]

                for node in self._cached_file(full, build):
                    node.resource_dir = rdir
                    self._add_unique(node, rel)

    def _parse_python_model(
        self, name: str, rel: str, raw: str, project: Project | None = None,
    ) -> ParsedNode:
        """Python models (``core/dbt/parser/models.py:32-104``): extract
        dbt.ref/dbt.source/dbt.config calls textually; the model function
        runs natively against the engine's SparkSession at execute time
        (the reference's ADR-004 design with zero submit indirection)."""
        refs = re.findall(r"""dbt\.ref\(\s*['"]([\w.]+)['"]\s*\)""", raw)
        sources = re.findall(
            r"""dbt\.source\(\s*['"]([\w.]+)['"]\s*,\s*['"]([\w.]+)['"]\s*\)""", raw
        )
        # AST extraction like the reference's PythonParseVisitor
        # (core/dbt/parser/models.py): literal values keep their types
        # — the old regex stringified everything, so enabled=False
        # became the truthy 'False' and the disabled model still ran
        # (r12 parsing review #3); lists/dicts (partition_by=[...])
        # now parse too. Non-literal values are skipped (config must
        # be static, as in dbt).
        import ast as _ast

        config: dict[str, Any] = {}
        try:
            tree = _ast.parse(raw)
        except SyntaxError:
            tree = None
        if tree is not None:
            for call in _ast.walk(tree):
                if not (
                    isinstance(call, _ast.Call)
                    and isinstance(call.func, _ast.Attribute)
                    and call.func.attr == "config"
                    and isinstance(call.func.value, _ast.Name)
                    and call.func.value.id == "dbt"
                ):
                    continue
                for kw in call.keywords:
                    if kw.arg is None:
                        continue
                    try:
                        config[kw.arg] = _ast.literal_eval(kw.value)
                    except (ValueError, SyntaxError):
                        pass
        else:
            # unparseable file: legacy regex capture (strings only)
            for m in re.finditer(r"dbt\.config\(([^)]*)\)", raw):
                for kv in re.finditer(
                    r"""(\w+)\s*=\s*(?:['"]([^'"]*)['"]|(\w+))""",
                    m.group(1),
                ):
                    config[kv.group(1)] = (
                        kv.group(2)
                        if kv.group(2) is not None
                        else kv.group(3)
                    )
        project = project or self.project
        node = ParsedNode(
            unique_id=f"model.{project.name}.{name}",
            name=name,
            package_name=project.name,
            resource_type="model",
            path=rel,
            raw_code=raw,
            language="python",
            refs=list(dict.fromkeys(refs)),
            sources=list(dict.fromkeys(sources)),
        )
        merged = project.config_for_path("model", rel)
        if project is not self.project:
            # root-over-package, as in _parse_sql_node
            merge_config_call(merged, self.project.config_for_path(
                "model", rel, package=project.name,
            ))
        merge_config_call(merged, config)
        # default table (dbt-core's only python materializations are
        # table/incremental); an EXPLICIT materialized='view' is
        # accepted and table-backed (materializations/view.py r9)
        merged.setdefault("materialized", "table")
        node.config = merged
        node.tags = _listify(merged.get("tags"))
        return node

    # -------------------------------------------------------------- seeds
    def _parse_seeds(self) -> None:
        for proj in self.all_projects:
            for full, rel, rdir in _walk(
                proj.project_root, proj.seed_paths, (".csv",)
            ):
                name = os.path.splitext(os.path.basename(rel))[0]

                def build(full=full, rel=rel, name=name, proj=proj):
                    cfg = proj.config_for_path("seed", rel)
                    if proj is not self.project:
                        # root-over-package (same precedence as
                        # _parse_sql_node): the root project's
                        # seeds: {<package>: ...} tree applies
                        merge_config_call(cfg, self.project.config_for_path(
                            "seed", rel, package=proj.name,
                        ))
                    node = ParsedNode(
                        unique_id=f"seed.{proj.name}.{name}",
                        name=name,
                        package_name=proj.name,
                        resource_type="seed",
                        path=rel,
                        raw_code="",  # "No SQLDefaults!" — nodes.py:774
                        config=cfg,
                    )
                    node.config["seed_path"] = full
                    return [node]

                for node in self._cached_file(full, build):
                    node.resource_dir = rdir
                    self._add_unique(node, rel)

    # ---------------------------------------------------------- snapshots
    def _parse_snapshots(self) -> None:
        for proj in self.all_projects:
            for full, rel, rdir in _walk(
                proj.project_root, proj.snapshot_paths, (".sql",)
            ):
                def build(full=full, rel=rel, proj=proj):
                    with open(full) as f:
                        raw = f.read()
                    blocks = SNAPSHOT_BLOCK_RE.findall(raw)
                    if not blocks:
                        raise ParsingError(
                            f"no {{% snapshot %}} block in {rel}"
                        )
                    return [
                        self._parse_sql_node(
                            "snapshot", name, rel, body, project=proj
                        )
                        for name, body in blocks
                    ]

                for node in self._cached_file(full, build):
                    node.resource_dir = rdir
                    self._add_unique(node, rel)

    # ------------------------------------------------------ singular tests
    def _parse_singular_tests(self) -> None:
        for proj in self.all_projects:
            for full, rel, rdir in _walk(
                proj.project_root, proj.test_paths, (".sql",)
            ):
                name = os.path.splitext(os.path.basename(rel))[0]

                def build(full=full, rel=rel, name=name, proj=proj):
                    with open(full) as f:
                        raw = f.read()
                    return [self._parse_sql_node(
                        "test", name, rel, raw, project=proj
                    )]

                for node in self._cached_file(full, build):
                    node.resource_dir = rdir
                    self._add_unique(node, rel)

    # ------------------------------------------------------------ analyses
    def _parse_analyses(self) -> None:
        for proj in self.all_projects:
            for full, rel, rdir in _walk(
                proj.project_root, proj.analysis_paths, (".sql",)
            ):
                name = os.path.splitext(os.path.basename(rel))[0]

                def build(full=full, rel=rel, name=name, proj=proj):
                    with open(full) as f:
                        raw = f.read()
                    return [self._parse_sql_node(
                        "analysis", name, rel, raw, project=proj
                    )]

                for node in self._cached_file(full, build):
                    node.resource_dir = rdir
                    self._add_unique(node, rel)

    # --------------------------------------------------------- schema yaml
    def _parse_schema_yaml(self) -> None:
        pending_sources: list[tuple[dict, Project, str, str]] = []
        for proj in self.all_projects:
            for full, rel, rdir in _walk(
                proj.project_root,
                proj.model_paths + proj.seed_paths + proj.snapshot_paths,
                (".yml", ".yaml"),
            ):
                doc = self._cached_yaml(full)
                for src in doc.get("sources", []) or []:
                    pending_sources.append((src, proj, rel, rdir))
                for patch in doc.get("models", []) or []:
                    self._patch_node("model", patch, project=proj)
                for patch in doc.get("seeds", []) or []:
                    self._patch_node("seed", patch, project=proj)
                for patch in doc.get("snapshots", []) or []:
                    self._patch_node("snapshot", patch, project=proj)
                for ut in doc.get("unit_tests", []) or []:
                    self._add_unit_test(ut, project=proj, path=rel, rdir=rdir)
                # semantic layer specs (SURVEY.md §2.6) — validated lazily
                # by sparkt.semantic at query-compile time
                self.manifest.semantic_models.extend(
                    doc.get("semantic_models", []) or []
                )
                self.manifest.metrics.extend(doc.get("metrics", []) or [])
                # remaining NodeType taxonomy (types.py:18-37): exposures,
                # groups, saved queries — graph participants, never executed
                for exp in doc.get("exposures", []) or []:
                    self._add_exposure(exp, project=proj, path=rel, rdir=rdir)
                for grp in doc.get("groups", []) or []:
                    self.manifest.groups[grp["name"]] = grp
                self.manifest.saved_queries.extend(
                    doc.get("saved_queries", []) or []
                )
        self._register_sources(pending_sources)

    def _register_sources(
        self, pending: list[tuple[dict, "Project"]]
    ) -> None:
        """Register buffered source specs, honoring ``overrides:``
        (reference ``tests/functional/source_overrides`` +
        ``core/dbt/parser/sources.py`` patch_source): a root-project
        source with ``overrides: <package>`` replaces the package's
        same-named source — its source-level schema / freshness /
        loaded_at defaults apply, its table entries win by name, and
        package-only tables remain. An override with no matching
        package source registers as a plain source."""
        root = self.project.name
        overrides: dict[tuple[str, str], dict] = {}
        for src, proj, _rel, _rdir in pending:
            if proj.name == root and src.get("overrides"):
                overrides[(src["overrides"], src["name"])] = src
        applied: set[int] = set()
        for src, proj, rel, rdir in pending:
            if proj.name == root and src.get("overrides"):
                continue  # applied at its target package's position
            o = overrides.get((proj.name, src["name"]))
            if o is None:
                self._add_source(src, project=proj, path=rel, rdir=rdir)
                continue
            merged = dict(src)
            for k in ("schema", "freshness", "loaded_at_field"):
                if k in o:
                    merged[k] = o[k]
            tables = {t["name"]: t for t in (src.get("tables") or [])}
            for t in o.get("tables") or []:
                tables[t["name"]] = t
            merged["tables"] = list(tables.values())
            self._add_source(merged, project=proj, path=rel, rdir=rdir)
            applied.add(id(o))
        for src, proj, rel, rdir in pending:
            if (proj.name == root and src.get("overrides")
                    and id(src) not in applied):
                # no target package
                self._add_source(src, project=proj, path=rel, rdir=rdir)

    def _add_source(self, src: dict, project: Project | None = None,
                    path: str | None = None,
                    rdir: str | None = None) -> None:
        project = project or self.project
        source_name = src["name"]
        schema = src.get("schema", source_name)
        for tbl in src.get("tables", []) or []:
            uid = f"source.{source_name}.{tbl['name']}"
            # duplicate detection like nodes get (r12 parsing review
            # #6): the same source.table declared by a DIFFERENT
            # package silently overwrote the first (schema/freshness/
            # external settings vanished, walk-order-dependent).
            # Re-declaration within one package (yml moved/partial
            # reparse) keeps last-wins.
            existing = self.manifest.sources.get(uid)
            if existing is not None and existing.package_name != project.name:
                raise ParsingError(
                    f"duplicate source '{source_name}.{tbl['name']}' "
                    f"declared by both '{existing.package_name}' and "
                    f"'{project.name}' — source names are global; "
                    "rename one or remove the duplicate declaration"
                )
            node = ParsedNode(
                unique_id=uid,
                name=tbl["name"],
                package_name=project.name,
                resource_type="source",
                source_name=source_name,
                path=path or "",  # defining schema yml (r14 review)
                resource_dir=rdir,
                config={
                    "schema": schema,
                    "identifier": tbl.get("identifier", tbl["name"]),
                    # event_time powers microbatch ref/source filters
                    # (table-level wins over source-level)
                    "event_time": (tbl.get("config") or {}).get(
                        "event_time",
                        (src.get("config") or {}).get("event_time"),
                    ),
                },
                loaded_at_field=tbl.get(
                    "loaded_at_field", src.get("loaded_at_field")
                ),
                freshness=tbl.get("freshness", src.get("freshness")) or {},
                external_location=(tbl.get("external") or {}).get("location")
                or (tbl.get("meta") or {}).get("external_location"),
                external_format=(tbl.get("external") or {}).get(
                    "file_format",
                    (tbl.get("external") or {}).get("format", "parquet"),
                ),
                external_options=(tbl.get("external") or {}).get("options")
                or {},
                description=tbl.get("description", ""),
            )
            self.manifest.sources[uid] = node
            # data tests on source tables (reference: SourcePatcher,
            # core/dbt/parser/sources.py — sources carry column- and
            # table-level generic tests just like models)
            for col in tbl.get("columns", []) or []:
                node.columns[col["name"]] = col
                for t in col.get("data_tests", col.get("tests", [])) or []:
                    self._add_generic_test(
                        node, t, column_name=col["name"]
                    )
            for t in tbl.get("data_tests", tbl.get("tests", [])) or []:
                self._add_generic_test(node, t, column_name=None)

    def _patch_node(
        self, resource_type: str, patch: dict, project: Project | None = None
    ) -> None:
        project = project or self.project
        name = patch["name"]
        if resource_type == "model" and patch.get("versions"):
            self._patch_versioned_model(patch, project)
            return
        uid = f"{resource_type}.{project.name}.{name}"
        node = self.manifest.nodes.get(uid)
        if node is None:
            return
        node.description = patch.get("description", node.description)
        yml_cfg = normalize_config_keys(patch.get("config", {}) or {})
        call = getattr(node, "config_call_dict", None)
        if call is not None:
            # dbt precedence ladder (reference context_config): project
            # tree < schema-yml < in-file config(), with per-field
            # merge behavior (tags append, meta dict-merges) at every
            # rung — the old merged.update(node.config) clobbered yml
            # keys with project-tree keys (r12 parsing review #2)
            import copy as _copy

            merged = _copy.deepcopy(
                getattr(node, "project_tree_config", {}) or {}
            )
            merge_config_call(merged, yml_cfg)
            merge_config_call(merged, call)
            node.tags = _listify(merged.get("tags"))
        else:
            # legacy cached node without layer info: prior behavior
            merged = dict(yml_cfg)
            merged.update(node.config)
        node.config = merged
        if patch.get("constraints"):
            # model-level constraints ride in config (column-level ones
            # live on node.columns); see contracts.enforce_constraints
            node.config.setdefault("constraints", patch["constraints"])
        for col in patch.get("columns", []) or []:
            node.columns[col["name"]] = col
            for t in col.get("data_tests", col.get("tests", [])) or []:
                self._add_generic_test(node, t, column_name=col["name"])
        for t in patch.get("data_tests", patch.get("tests", [])) or []:
            self._add_generic_test(node, t, column_name=None)

    def _patch_versioned_model(self, patch: dict, project: Project) -> None:
        """Model versions (``core/dbt/contracts/graph/nodes.py:426``,
        ``node_types.py:23-31``): each ``versions: [{v: N}]`` entry binds
        to the file ``<name>_v<N>.sql`` (or ``defined_in``, or the bare
        ``<name>.sql`` as a fallback); ``ref('<name>')`` resolves the
        latest_version, ``ref('<name>', v=N)`` pins."""
        name = patch["name"]
        versions = patch.get("versions") or []
        latest = patch.get(
            "latest_version", max((v.get("v") for v in versions), default=None)
        )
        bound: dict[str, object] = {}
        for vspec in versions:
            v = vspec.get("v")
            defined_in = vspec.get("defined_in", f"{name}_v{v}")
            node = self.manifest.nodes.get(
                f"model.{project.name}.{defined_in}"
            ) or self.manifest.nodes.get(f"model.{project.name}.{name}")
            if node is None:
                raise ParsingError(
                    f"versioned model '{name}' v{v}: no file "
                    f"'{defined_in}.sql' (or '{name}.sql')"
                )
            # two versions binding one file would silently overwrite
            # each other's config and break ref(name, v=N) at compile
            # — a parse-time error like the reference's (r12 parsing
            # review #7)
            if node.unique_id in bound:
                raise ParsingError(
                    f"versioned model '{name}': versions "
                    f"v{bound[node.unique_id]} and v{v} both bind to "
                    f"'{node.path}' — give each version its own file "
                    "(name_v<N>.sql or defined_in)"
                )
            bound[node.unique_id] = v
            node.base_name = name
            node.config["version"] = v
            node.config["latest_version"] = latest
            node.description = patch.get("description", node.description)
            cols = {c["name"]: c for c in patch.get("columns", []) or []}
            # version-level column overrides (include/exclude ignored;
            # explicit column entries win)
            for col in vspec.get("columns", []) or []:
                cols[col["name"]] = col
            for col in cols.values():
                node.columns[col["name"]] = col
                for t in col.get("data_tests", col.get("tests", [])) or []:
                    self._add_generic_test(node, t, column_name=col["name"])

    def _add_generic_test(
        self, attached: ParsedNode, spec, column_name: str | None
    ) -> None:
        """Generic tests become macro-call nodes
        (``core/dbt/parser/generic_test_builders.py`` analogue)."""
        if isinstance(spec, str):
            test_name, kwargs = spec, {}
        elif isinstance(spec, dict):
            test_name, kwargs = next(iter(spec.items()))
            kwargs = dict(kwargs or {})
        else:
            raise ParsingError(f"bad test spec {spec!r}")
        config_keys = {
            "severity", "error_if", "warn_if", "fail_calc", "limit",
            "where", "store_failures", "store_failures_as", "enabled", "tags",
        }
        config = {k: kwargs.pop(k) for k in list(kwargs) if k in config_keys}
        if isinstance(spec, dict) and isinstance(next(iter(spec.values())), dict):
            nested_cfg = (next(iter(spec.values())) or {}).get("config") or {}
            kwargs.pop("config", None)
            config.update(nested_cfg)
        is_source = attached.resource_type == "source"
        # node name uses the bare macro name ('dbt_utils.x' → 'x'),
        # like the reference — a dot inside unique_id would collide
        # with selector syntax
        bare = test_name.rpartition(".")[2]
        parts = (
            [bare, "source", attached.source_name, attached.name]
            if is_source
            else [bare, attached.name]
        ) + ([column_name] if column_name else [])
        for v in kwargs.values():
            slug = re.sub(r"\W+", "_", str(v))
            if len(slug) > 30:
                # disambiguating hash suffix (the reference appends a
                # content hash to long generated names): two tests
                # whose kwarg values share the first 30 chars must not
                # collide on unique_id — the second silently replaced
                # the first (r12 parsing review #8)
                import hashlib as _h

                slug = (
                    slug[:30]
                    + "_"
                    + _h.md5(str(v).encode()).hexdigest()[:8]
                )
            parts.append(slug)
        name = "_".join(parts)
        def render_kwarg(v):
            # dbt evaluates ref()/source() kwarg values as Jinja
            # expressions (relationships' `to:`), not string literals
            if isinstance(v, str) and re.match(
                r"^\s*(ref|source)\(.*\)\s*$", v
            ):
                return v
            return repr(v)

        kw_render = ", ".join(
            f"{k}={render_kwarg(v)}" for k, v in kwargs.items()
        )
        where = config.get("where")
        # tests on sources scan via source(), not ref() (reference:
        # SourcePatcher builds generic tests off the source table,
        # core/dbt/parser/sources.py)
        target_expr = (
            f"source('{attached.source_name}', '{attached.name}')"
            if is_source
            else f"ref('{attached.name}')"
        )
        model_expr = (
            f"get_where_subquery({target_expr}, where={where!r})"
            if where
            else target_expr
        )
        call_args = [f"model={model_expr}"]
        if column_name:
            call_args.append(f"column_name={column_name!r}")
        if kw_render:
            call_args.append(kw_render)
        # a package-qualified test ('dbt_utils.not_empty_string')
        # dispatches to the package's macro: the namespace is flat
        # (bind_macros), so the call strips the package prefix —
        # 'test_dbt_utils.not_empty_string' rendered as an Undefined
        # attribute access and produced an empty subquery (r12
        # parsing review #9)
        macro_name = test_name.rpartition(".")[2]
        raw = "{{ test_%s(%s) }}" % (macro_name, ", ".join(call_args))
        # tests live in the package of the node they attach to
        node = ParsedNode(
            unique_id=f"test.{attached.package_name}.{name}",
            name=name,
            package_name=attached.package_name,
            resource_type="test",
            raw_code=raw,
            refs=[] if is_source else [attached.name],
            sources=(
                [(attached.source_name, attached.name)] if is_source else []
            ),
            config=config,
            test_metadata={
                "name": test_name,
                "kwargs": kwargs,
                # reference keeps column_name in kwargs; primary-key
                # inference (manifest.infer_primary_key) reads it
                "column_name": column_name,
            },
            attached_node=attached.unique_id,
        )
        if isinstance(kwargs.get("to"), str):
            m = re.match(r"ref\(['\"](\w+)['\"]\)", kwargs["to"])
            if m:
                node.refs.append(m.group(1))
        node.tags = _listify(config.get("tags"))
        self.manifest.nodes[node.unique_id] = node

    def _add_exposure(self, exp: dict, project: Project | None = None,
                      path: str | None = None,
                      rdir: str | None = None) -> None:
        """Exposures (``contracts/graph/nodes.py:1282``): downstream
        consumers; they join the DAG as leaf nodes so ``+exposure`` and
        impact analysis work, but never execute."""
        project = project or self.project
        name = exp["name"]
        refs = []
        for dep in exp.get("depends_on", []) or []:
            m = re.match(r"""ref\(['"](\w+)['"]\)""", str(dep))
            if m:
                refs.append(m.group(1))
        node = ParsedNode(
            unique_id=f"exposure.{project.name}.{name}",
            name=name,
            package_name=project.name,
            resource_type="exposure",
            refs=refs,
            config={"type": exp.get("type", "dashboard"),
                    "owner": exp.get("owner")},
            description=exp.get("description", ""),
            # the defining yml (r14 review: path=None made `ls
            # --output path` print the literal string 'None' and left
            # original_file_path null in --output json; reference
            # exposures carry their schema file as original_file_path)
            path=path,
            resource_dir=rdir,
        )
        self._add_unique(node, node.path or name)

    def _add_unit_test(self, ut: dict, project: Project | None = None,
                       path: str | None = None,
                       rdir: str | None = None) -> None:
        """Unit-test definitions (``core/dbt/parser/unit_tests.py``)."""
        project = project or self.project
        name = ut["name"]
        model = ut["model"]
        node = ParsedNode(
            unique_id=f"unit_test.{project.name}.{name}",
            name=name,
            package_name=project.name,
            resource_type="unit_test",
            refs=[model],
            model=model,
            given=ut.get("given", []) or [],
            expect=ut.get("expect", {}) or {},
            config=ut.get("config", {}) or {},
            overrides=ut.get("overrides", {}) or {},
            path=path,  # defining yml (r14 review, same as exposures)
            resource_dir=rdir,
        )
        self._add_unique(node, node.path or name)

    def _add_semantic_nodes(self) -> None:
        """Semantic models, metrics and saved queries join the manifest
        as graph nodes (reference: they are first-class NodeTypes,
        ``core/dbt/artifacts/resources/types.py:18-37``) so selection
        (``metric:``, ``semantic_model:``, ``saved_query:``, ``+``
        walks) sees them; they never execute."""
        pname = self.project.name
        measure_owner: dict[str, str] = {}
        for sm in self.manifest.semantic_models:
            name = sm.get("name")
            if not name:
                continue
            uid = f"semantic_model.{pname}.{name}"
            m = re.match(r"""\s*ref\(['"](\w+)['"]\)\s*$""",
                         str(sm.get("model", "")))
            node = ParsedNode(
                unique_id=uid, name=name, package_name=pname,
                resource_type="semantic_model",
                refs=[m.group(1)] if m else [],
                description=sm.get("description", ""),
            )
            self.manifest.nodes[uid] = node
            for meas in sm.get("measures", []) or []:
                if meas.get("name"):
                    measure_owner[meas["name"]] = uid
        metric_uid = {}
        for met in self.manifest.metrics:
            name = met.get("name")
            if not name:
                continue
            uid = f"metric.{pname}.{name}"
            metric_uid[name] = uid
            tp = met.get("type_params", {}) or {}
            deps = []
            for meas in (
                tp.get("measure"), met.get("measure"),
                tp.get("numerator"), tp.get("denominator"),
                tp.get("base_measure"), tp.get("conversion_measure"),
            ):
                meas_name = (
                    meas.get("name") if isinstance(meas, dict) else meas
                )
                if meas_name and meas_name in measure_owner:
                    deps.append(measure_owner[meas_name])
            node = ParsedNode(
                unique_id=uid, name=name, package_name=pname,
                resource_type="metric",
                config={"type": met.get("type", "simple")},
                description=met.get("description", ""),
            )
            node.depends_on = list(dict.fromkeys(deps))
            self.manifest.nodes[uid] = node
        # derived metrics depend on input metrics
        for met in self.manifest.metrics:
            tp = met.get("type_params", {}) or {}
            uid = metric_uid.get(met.get("name"))
            if uid is None:
                continue
            for inp in tp.get("metrics", []) or []:
                inp_name = inp.get("name") if isinstance(inp, dict) else inp
                if inp_name in metric_uid:
                    self.manifest.nodes[uid].depends_on.append(
                        metric_uid[inp_name]
                    )
        for sq in self.manifest.saved_queries:
            name = sq.get("name")
            if not name:
                continue
            uid = f"saved_query.{pname}.{name}"
            qp = sq.get("query_params", {}) or {}
            deps = [
                metric_uid[mn] for mn in qp.get("metrics", []) or []
                if mn in metric_uid
            ]
            node = ParsedNode(
                unique_id=uid, name=name, package_name=pname,
                resource_type="saved_query",
                description=sq.get("description", ""),
            )
            node.depends_on = deps
            self.manifest.nodes[uid] = node

    # ------------------------------------------------------------- linking
    def _inject_external_nodes(self) -> bool:
        """Plugin-contributed external model nodes (reference
        ``core/dbt/parser/manifest.py:795`` inject_external_nodes +
        ``plugins/manager.py:163``): drop previously injected externals,
        then add the current plugin set — a project-parsed node with the
        same unique_id wins (never clobbered). Returns True when the
        manifest changed."""
        from sparkt import plugins as plugin_mod

        pm = plugin_mod.get_plugin_manager(self.project.name)
        stale = [uid for uid, n in self.manifest.nodes.items()
                 if n.config.get("external_node")]
        if not pm.plugins and not stale:
            return False
        changed = False
        for uid in stale:
            del self.manifest.nodes[uid]
            changed = True
        if not pm.plugins:
            return changed
        for args in pm.get_nodes().models.values():
            if args.unique_id in self.manifest.nodes:
                continue
            self.manifest.nodes[args.unique_id] = ParsedNode(
                unique_id=args.unique_id,
                name=args.name,
                package_name=args.package_name,
                resource_type="model",
                config={
                    "external_node": True,
                    "schema": args.schema,
                    "alias": args.identifier,
                    "enabled": args.enabled,
                    "materialized": "external",
                },
                depends_on=list(args.depends_on_nodes),
            )
            changed = True
        return changed

    def _resolve_refs(self) -> None:
        """``process_refs``/``process_sources``
        (``core/dbt/contracts/graph/manifest.py:1103,1248``)."""
        for node in self.manifest.nodes.values():
            deps: list[str] = []
            for ref_name in node.refs:
                # a (name, version) entry is a pinned ref — the DAG
                # edge must target the pinned version, not latest
                # (r12 parsing review #5)
                if isinstance(ref_name, (tuple, list)):
                    rname, rver = ref_name[0], ref_name[1]
                else:
                    rname, rver = ref_name, None
                target = self.manifest.ref_lookup(rname, version=rver)
                if target is None:
                    vtxt = f" v{rver}" if rver is not None else ""
                    raise ParsingError(
                        f"{node.unique_id} depends on missing ref "
                        f"'{rname}'{vtxt}"
                    )
                deps.append(target.unique_id)
            for source_name, table_name in node.sources:
                target = self.manifest.source_lookup(source_name, table_name)
                if target is None:
                    raise ParsingError(
                        f"{node.unique_id} depends on missing source "
                        f"'{source_name}.{table_name}'"
                    )
                deps.append(target.unique_id)
            # keep deps preset by parsers (semantic nodes) and add
            # ref/source resolutions
            node.depends_on = list(dict.fromkeys(list(node.depends_on) + deps))
