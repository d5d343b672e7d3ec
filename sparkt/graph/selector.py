"""Node selection algebra.

Reference: spec regex ``core/dbt/graph/selector_spec.py:15-24``
(``[@][N+]name[+N]``), union/intersection ``core/dbt/graph/cli.py:21-55``
(space = union, ``,`` = intersection), graph walks
``core/dbt/graph/graph.py:29-75``, methods
``core/dbt/graph/selector_methods.py:45-67``.

Supported methods: fqn/name (default, fnmatch glob), ``tag:``,
``source:``, ``path:``, ``file:``, ``package:``, ``resource_type:``,
``test_type:``, ``test_name:``, ``config.<key>:``, ``group:``,
``access:``, ``version:``, ``exposure:``, ``metric:``,
``semantic_model:``, ``saved_query:``, ``unit_test:``,
``source_status:``, ``state:`` (incl. ``modified.body/.configs/
.relation/.macros/.contract``), ``result:``, plus
``+``/``N+``/``+N``/``@`` graph operators and ``--exclude``.

Indirect test selection (reference ``core/dbt/graph/selector.py:216-274``
``expand_selection``/``incorporate_indirect_nodes``): selecting a model
also selects its attached data/unit tests. Four modes
(``selector_spec.py:26`` IndirectSelection):

- ``eager`` (default): a test is selected if ANY of its parents is;
- ``cautious``: only if ALL its parents are selected;
- ``buildable``: if all its parents are within selected ∪ ancestors of
  selected ∪ sources (so a relationships test to a parent dim passes);
- ``empty``: no expansion — only the named nodes.

cautious/buildable keep not-yet-qualified tests as *indirect*
candidates and re-check them after set algebra combines criteria, so a
union whose parts each select one parent of a two-parent test still
selects it (reference ``incorporate_indirect_nodes``).
"""

from __future__ import annotations

import fnmatch
import re

import networkx as nx

from sparkt.exceptions import SelectorError
from sparkt.manifest import Manifest

_SPEC_RE = re.compile(
    r"^(?P<childrens_parents>\@)?(?P<parents>(?P<parents_depth>\d*)\+)?"
    r"(?P<value>[^+@]+?)(?P<children>\+(?P<children_depth>\d*))?$"
)


def _node_fqn(node) -> list[str]:
    """[package, *subdirs, name] — the reference's fqn shape
    (core/dbt/contracts/graph/nodes.py fqn assembly: project name,
    directory components under the resource path, node name)."""
    dirs = node.path.split("/")[:-1] if getattr(node, "path", None) else []
    return [node.package_name, *dirs, node.name]


def _is_selected_fqn(fqn: list[str], selector: str, versioned: bool) -> bool:
    """The reference's is_selected_node
    (core/dbt/graph/selector_methods.py:69-107): exact leaf match,
    else path-anchored segment-prefix match with a wildcard slurp —
    the first selector segment containing a wildcard fnmatches the
    dot-joined remainder of the fqn."""
    sel_parts = selector.split(".")
    if versioned:
        # versioned models: fqn ends [.., name, vN]; allow the exact
        # name (fqn[-2]) and the '.'/'_'-delimited name.version forms
        if len(fqn) >= 2 and (
            fqn[-2] == selector
            or "_".join(fqn[-2:]) == "_".join(sel_parts[-2:])
        ):
            return True
    elif fqn and fqn[-1] == selector:
        return True
    flat = [item for seg in fqn for item in seg.split(".")]
    if len(flat) < len(sel_parts):
        return False
    slurp_from = None
    for i, part in enumerate(sel_parts):
        if any(w in part for w in "*?[]"):
            slurp_from = i
            break
        if flat[i] != part:
            return False
    if slurp_from is not None:
        return fnmatch.fnmatch(
            ".".join(flat[slurp_from:]), ".".join(sel_parts[slurp_from:])
        )
    return True


def _fqn_match(node, value: str) -> bool:
    """Reference QualifiedNameSelectorMethod
    (core/dbt/graph/selector_methods.py:243-259): try the scoped fqn,
    then the package-unscoped fqn (cross-package selection) — so
    ``-s staging`` selects the whole models/staging/ subtree and
    ``-s pkg.staging.stg_*`` anchors at the package."""
    fqn = _node_fqn(node)
    versioned = bool(
        node.resource_type == "model" and node.config.get("version")
    )
    return _is_selected_fqn(fqn, value, versioned) or _is_selected_fqn(
        fqn[1:], value, versioned
    )


# resource-dir prefixes the reference's original_file_path carries but
# node.path (relative to its resource dir) does not
_PATH_PREFIXES = (
    "", "models/", "seeds/", "snapshots/", "tests/", "analyses/",
    "macros/",
)


def _path_match(node, value: str) -> bool:
    """Reference PathSelectorMethod
    (core/dbt/graph/selector_methods.py:454-474): a node matches when
    the selector glob hits its file path OR any parent directory
    (directory selection). Since r14 nodes carry their real
    resource_dir, the reference's project-relative original_file_path
    is matched directly (custom resource dirs like ``dbt_models/``
    now work); the resource-dir-LESS form and the default-prefix
    guesses stay accepted for selector compatibility and for nodes
    without a recorded resource_dir (old parse caches)."""
    value = value.rstrip("/")
    ofp = node.original_file_path
    candidates = {ofp} if ofp else set()
    for pre in _PATH_PREFIXES:
        candidates.add(pre + node.path)
    for p in candidates:
        if fnmatch.fnmatch(p, value):
            return True
        parts = p.split("/")
        for i in range(1, len(parts)):
            if fnmatch.fnmatch("/".join(parts[:i]), value):
                return True
    return False


def _method_match(manifest: Manifest, raw: str, state=None) -> set[str]:
    if ":" in raw:
        method, _, value = raw.partition(":")
    else:
        method, value = "fqn", raw
    if method == "state":
        from sparkt import state as state_mod

        if state is None:
            return set()
        base, _, sub = value.partition(".")
        if base == "modified":
            return state_mod.modified_nodes(manifest, state, sub=sub or None)
        if base == "new":
            return state_mod.new_nodes(manifest, state)
        if base == "old":
            # reference state_checks 'old': the previous manifest
            # already had the node (selector_methods.py:739)
            return {
                uid for uid in manifest.all_nodes()
                if uid in state.nodes or uid in state.sources
            }
        if base == "unmodified":
            return (
                set(manifest.all_nodes())
                - state_mod.modified_nodes(manifest, state)
            )
        raise SelectorError(
            f"invalid state selector 'state:{value}'; expected one of "
            "new, old, modified[.<sub>], unmodified"
        )
    if method == "result":
        results = (
            state
            if isinstance(state, dict)
            else getattr(state, "results", None) or {}
        )
        return {uid for uid, st in results.items() if st == value}
    if method == "source_status":
        # reference selector_methods.py SourceStatusSelectorMethod:
        # 'fresher' = current max_loaded_at > previous (or new in
        # current), runtime errors excluded on either side; status
        # classes (pass/warn/error) kept as a sparkt extension
        fresh_prev = getattr(state, "freshness", None) or []
        if value == "fresher":
            fresh_cur = getattr(state, "freshness_current", None) or []
            err = {
                r["unique_id"]
                for r in list(fresh_prev) + list(fresh_cur)
                if r.get("status") == "runtime error"
                or r.get("max_loaded_at") is None
            }
            prev = {
                r["unique_id"]: r["max_loaded_at"]
                for r in fresh_prev
                if r["unique_id"] not in err
            }
            out = set()
            for r in fresh_cur:
                uid = r["unique_id"]
                if uid in err:
                    continue
                if uid not in prev or r["max_loaded_at"] > prev[uid]:
                    out.add(uid)
            return out
        return {
            r["unique_id"]
            for r in fresh_prev
            if r.get("status") == value
        }
    out: set[str] = set()
    for uid, node in manifest.all_nodes().items():
        if method == "fqn":
            ok = _fqn_match(node, value)
        elif method == "tag":
            ok = any(fnmatch.fnmatch(t, value) for t in node.tags)
        elif method == "source":
            ok = node.resource_type == "source" and (
                fnmatch.fnmatch(node.source_name or "", value)
                or fnmatch.fnmatch(f"{node.source_name}.{node.name}", value)
            )
        elif method == "path":
            ok = _path_match(node, value)
        elif method == "file":
            fname = node.path.rsplit("/", 1)[-1]
            ok = fnmatch.fnmatch(fname, value) or fnmatch.fnmatch(
                fname, value + ".sql"
            )
        elif method == "package":
            ok = fnmatch.fnmatch(node.package_name, value)
        elif method == "resource_type":
            ok = node.resource_type == value
        elif method == "test_type":
            kind = "generic" if node.test_metadata else "singular"
            ok = node.resource_type == "test" and kind == value
        elif method == "test_name":
            ok = node.resource_type == "test" and fnmatch.fnmatch(
                (node.test_metadata or {}).get("name", ""), value
            )
        elif method == "group":
            ok = str(node.config.get("group")) == value
        elif method == "access":
            ok = node.resource_type == "model" and (
                node.config.get("access", "protected") == value
            )
        elif method == "version":
            ver = node.config.get("version")
            latest = node.config.get("latest_version", ver)

            def _vkey(v):
                # numeric-aware ordering: str() compared v10 < v9
                # lexicographically, inverting old/prerelease for any
                # version crossing a digit-count boundary (r12 runner
                # review #5). Floats and ints order numerically;
                # non-numeric versions fall back to string order.
                try:
                    return (0, float(v), "")
                except (TypeError, ValueError):
                    return (1, 0.0, str(v))

            if value == "latest":
                ok = ver is not None and ver == latest
            elif value == "prerelease":
                ok = (
                    ver is not None
                    and latest is not None
                    and _vkey(ver) > _vkey(latest)
                )
            elif value == "old":
                ok = (
                    ver is not None
                    and latest is not None
                    and _vkey(ver) < _vkey(latest)
                )
            elif value == "none":
                ok = node.resource_type == "model" and ver is None
            else:
                ok = ver is not None and str(ver) == value
        elif method in ("exposure", "metric", "semantic_model",
                        "saved_query", "unit_test"):
            ok = node.resource_type == method and fnmatch.fnmatch(
                node.name, value
            )
        elif method.startswith("config."):
            # loose matching like the reference's config method: bools
            # match their conventional lowercase CLI spelling
            # (config.enabled:true), comparison is case-insensitive,
            # and glob patterns work as in every other method (r12
            # runner review #6)
            key = method[len("config."):]
            got = node.config.get(key)
            got_s = str(got).lower() if isinstance(got, bool) else str(got)
            ok = fnmatch.fnmatch(got_s.lower(), value.lower())
        else:
            ok = False
        if ok:
            out.add(uid)
    return out


def _expand_spec(graph: nx.DiGraph, manifest: Manifest, spec: str,
                 state=None) -> set[str]:
    m = _SPEC_RE.match(spec.strip())
    if not m:
        # a malformed spec is a user error, not an empty selection —
        # silently dropping one half of 'good_model ++typo' ran the
        # wrong node set (r12 runner review #10; dbt raises too)
        raise SelectorError(
            f"could not parse selection spec '{spec}' — expected "
            "[@][N+]method:value[+[N]]"
        )
    base = _method_match(manifest, m.group("value"), state=state)
    out = set(base)
    if m.group("parents"):
        depth = m.group("parents_depth")
        depth = int(depth) if depth else None
        for uid in base:
            if uid in graph:
                anc = (
                    nx.ancestors(graph, uid)
                    if depth is None
                    else {
                        n
                        for n, d in nx.single_source_shortest_path_length(
                            graph.reverse(copy=False), uid, cutoff=depth
                        ).items()
                        if n != uid
                    }
                )
                out |= anc
    if m.group("children"):
        depth = m.group("children_depth")
        depth = int(depth) if depth else None
        for uid in base:
            if uid in graph:
                desc = (
                    nx.descendants(graph, uid)
                    if depth is None
                    else {
                        n
                        for n, d in nx.single_source_shortest_path_length(
                            graph, uid, cutoff=depth
                        ).items()
                        if n != uid
                    }
                )
                out |= desc
    if m.group("childrens_parents"):
        # @x = x, descendants of x, and all ancestors of those
        fam = set(out)
        for uid in set(out):
            if uid in graph:
                fam |= nx.descendants(graph, uid)
        for uid in set(fam):
            if uid in graph:
                fam |= nx.ancestors(graph, uid)
        out = fam
    return out


INDIRECT_MODES = ("eager", "cautious", "buildable", "empty")

_INDIRECT_TYPES = ("test", "unit_test")


def _expand_indirect(
    graph: nx.DiGraph, manifest: Manifest, selected: set[str], mode: str
) -> tuple[set[str], set[str]]:
    """(direct, indirect) test expansion over the immediate successors
    of ``selected`` (reference ``expand_selection``,
    ``core/dbt/graph/selector.py:216-274``; only data/unit tests can be
    indirectly selected, ``can_select_indirectly`` ibid:22-34)."""
    if mode == "empty":
        return set(selected), set()
    if mode not in INDIRECT_MODES:
        raise SelectorError(
            f"invalid indirect selection mode {mode!r}; "
            f"expected one of {INDIRECT_MODES}"
        )
    direct = set(selected)
    indirect: set[str] = set()
    nodes = manifest.all_nodes()
    sel_and_parents: set[str] = set()
    if mode == "buildable":
        sel_and_parents = set(selected) | set(manifest.sources)
        for uid in selected:
            if uid in graph:
                sel_and_parents |= nx.ancestors(graph, uid)
    succ: set[str] = set()
    for uid in selected:
        if uid in graph:
            succ |= set(graph.successors(uid))
    for uid in succ - direct:
        node = nodes.get(uid)
        if node is None or node.resource_type not in _INDIRECT_TYPES:
            continue
        deps = set(node.depends_on)
        if mode == "eager" or deps <= set(selected):
            direct.add(uid)
        elif mode == "buildable" and deps <= sel_and_parents:
            direct.add(uid)
        else:
            indirect.add(uid)
    return direct, indirect


def _incorporate_indirect(
    graph: nx.DiGraph,
    manifest: Manifest,
    direct: set[str],
    indirect: set[str],
    mode: str,
) -> set[str]:
    """Re-check indirect candidates against the post-set-algebra direct
    set (reference ``incorporate_indirect_nodes``,
    ``core/dbt/graph/selector.py:276-305``). Under eager the reference
    UNIONS the candidates in — this matters when a stricter
    per-criteria ``indirect_selection`` (yaml) withheld a test that
    the eager invocation-level incorporation should admit
    (second-opinion review #5; in same-mode runs the candidate set is
    empty under eager, so this is a no-op there)."""
    if not indirect or mode == "empty":
        return direct
    if mode == "eager":
        return direct | indirect
    selected = set(direct)
    sel_and_parents = set(selected) | set(manifest.sources)
    if mode == "buildable":
        for uid in direct:
            if uid in graph:
                sel_and_parents |= nx.ancestors(graph, uid)
    nodes = manifest.all_nodes()
    for uid in indirect:
        node = nodes.get(uid)
        if node is None:
            continue
        deps = set(node.depends_on)
        if mode == "cautious" and deps <= set(direct):
            selected.add(uid)
        elif mode == "buildable" and deps <= sel_and_parents:
            selected.add(uid)
    return selected


def select_from_definition(
    graph: nx.DiGraph,
    manifest: Manifest,
    definition,
    named: dict | None = None,
    state=None,
    _seen: frozenset = frozenset(),
    indirect: str = "eager",
) -> set[str]:
    """Evaluate a selectors.yml definition (reference
    ``core/dbt/graph/cli.py:120-235``): string specs, {method, value}
    dicts with graph-operator keys, union/intersection lists with one
    exclude, and cross-references via method: selector (cycle-guarded
    by ``_seen`` — a self/mutually-referencing selector raises)."""
    named = named or {}
    d, di = _definition_raw(
        graph, manifest, definition, named, state, _seen, indirect
    )
    # ONE incorporation pass over the whole definition tree, exactly
    # like the CLI path (select_nodes accumulates indirect candidates
    # across union parts before incorporating). Per-part incorporation
    # dropped cross-part indirect tests: union: [model_a, model_b]
    # with cautious missed a relationships test depending on both —
    # the documented guarantee (r12 runner review #3).
    #
    # LEAF definitions incorporate nothing extra (reference
    # NodeSelector.select_nodes discards a lone criteria's indirect
    # set): a per-criteria `indirect_selection: cautious` on a leaf
    # must keep its withheld tests out, even under an eager
    # invocation (pinned by test_yaml_selector_indirect_key) —
    # composite incorporation (with the invocation mode, matching the
    # reference's composite-spec behavior) applies only to
    # union/intersection shapes.
    if _is_composite_definition(definition, named):
        return _incorporate_indirect(graph, manifest, d, di - d, indirect)
    return d


def _is_composite_definition(definition, named, _seen=frozenset()) -> bool:
    if isinstance(definition, list):
        return True
    if isinstance(definition, str):
        # space/comma spec strings are composite when multi-part
        return len(definition.split()) > 1 or "," in definition
    if isinstance(definition, dict):
        if "union" in definition or "intersection" in definition:
            return True
        if definition.get("method") == "selector":
            target = definition.get("value")
            if target in named and target not in _seen:
                return _is_composite_definition(
                    named[target].get("definition"), named,
                    _seen | {target},
                )
    return False


def _definition_raw(
    graph: nx.DiGraph,
    manifest: Manifest,
    definition,
    named: dict,
    state,
    _seen: frozenset,
    indirect: str,
) -> tuple[set[str], set[str]]:
    """(direct, direct∪indirect-candidates) of a selectors.yml
    definition subtree — set algebra runs on the raw pairs; the
    caller incorporates once at the top."""
    if isinstance(definition, str):
        return _collect_select(graph, manifest, definition, state, indirect)
    if isinstance(definition, list):
        # bare list = implicit union (lenient vs reference, which
        # requires an explicit union key at root level)
        d_out: set[str] = set()
        di_out: set[str] = set()
        for part in definition:
            d, di = _definition_raw(
                graph, manifest, part, named, state, _seen, indirect
            )
            d_out |= d
            di_out |= di
        return d_out, di_out
    if not isinstance(definition, dict):
        raise SelectorError(
            f"selector definition must be str/dict/list, got {definition!r}"
        )
    if "union" in definition or "intersection" in definition:
        key = "union" if "union" in definition else "intersection"
        acc_d: set[str] | None = None
        acc_di: set[str] | None = None
        ex_d: set[str] = set()
        ex_di: set[str] = set()
        for part in definition[key] or []:
            if isinstance(part, dict) and "exclude" in part:
                for e in part["exclude"] or []:
                    ed, edi = _definition_raw(
                        graph, manifest, e, named, state, _seen, indirect
                    )
                    ex_d |= ed
                    ex_di |= edi
            else:
                d, di = _definition_raw(
                    graph, manifest, part, named, state, _seen, indirect
                )
                if key == "union":
                    acc_d = d if acc_d is None else (acc_d | d)
                    acc_di = di if acc_di is None else (acc_di | di)
                else:
                    acc_d = d if acc_d is None else (acc_d & d)
                    acc_di = di if acc_di is None else (acc_di & di)
        excluded = ex_d | ex_di
        return (acc_d or set()) - excluded, (acc_di or set()) - excluded
    if definition.get("method") == "selector":
        target = definition.get("value")
        if target not in named:
            raise SelectorError(f"unknown selector reference '{target}'")
        if target in _seen:
            raise SelectorError(
                f"selector cycle: '{target}' references itself "
                f"(via {sorted(_seen)})"
            )
        return _definition_raw(
            graph, manifest, named[target]["definition"], named, state,
            _seen | {target}, indirect,
        )
    if "method" in definition and "value" in definition:
        spec = f"{definition['method']}:{definition['value']}"
        pdepth = definition.get("parents_depth")
        cdepth = definition.get("children_depth")
        left = (
            f"{pdepth}+" if pdepth
            else ("+" if definition.get("parents") else "")
        )
        right = (
            f"+{cdepth}" if cdepth
            else ("+" if definition.get("children") else "")
        )
        prefix = "@" if definition.get("childrens_parents") else ""
        d, di = _collect_select(
            graph, manifest, f"{prefix}{left}{spec}{right}", state,
            # per-criteria yaml key wins over the invocation-level mode
            definition.get("indirect_selection", indirect),
        )
        for e in definition.get("exclude") or []:
            ed, edi = _definition_raw(
                graph, manifest, e, named, state, _seen, indirect
            )
            d -= ed | edi
            di -= ed | edi
        return d, di
    if len(definition) == 1:
        k, v = next(iter(definition.items()))
        return _collect_select(
            graph, manifest, f"{k}:{v}", state, indirect
        )
    raise SelectorError(f"cannot parse selector definition: {definition!r}")


def _collect_select(
    graph: nx.DiGraph,
    manifest: Manifest,
    select: str | list[str],
    state,
    indirect: str,
) -> tuple[set[str], set[str]]:
    """(direct, direct∪indirect-candidate) sets of a space/comma spec
    string — the shared core of :func:`select_nodes` and the
    selectors.yml evaluator (both must accumulate candidates BEFORE
    incorporation; reference ``select_nodes_recursively``)."""
    specs = select.split() if isinstance(select, str) else list(select)
    selected: set[str] = set()
    indirect_nodes: set[str] = set()
    for union_part in specs:  # space = union
        inter_parts = union_part.split(",")  # comma = intersection
        acc_d: set[str] | None = None
        acc_di: set[str] | None = None
        for part in inter_parts:
            coll = _expand_spec(graph, manifest, part, state=state)
            d, i = _expand_indirect(graph, manifest, coll, indirect)
            # reference select_nodes_recursively: combine direct
            # sets and (direct|indirect) sets separately
            acc_d = d if acc_d is None else (acc_d & d)
            acc_di = (d | i) if acc_di is None else (acc_di & (d | i))
        selected |= acc_d or set()
        indirect_nodes |= acc_di or set()
    return selected, indirect_nodes


def select_nodes(
    graph: nx.DiGraph,
    manifest: Manifest,
    select: str | list[str] | None = None,
    exclude: str | list[str] | None = None,
    state=None,
    indirect: str = "eager",
) -> set[str]:
    all_ids = set(manifest.all_nodes())
    if select is None or select == []:
        selected = set(all_ids)
        indirect_nodes: set[str] = set()
    else:
        selected, indirect_nodes = _collect_select(
            graph, manifest, select, state, indirect
        )
        selected = _incorporate_indirect(
            graph, manifest, selected, indirect_nodes - selected, indirect
        )
    if exclude:
        specs = exclude.split() if isinstance(exclude, str) else list(exclude)
        for spec in specs:
            coll = _expand_spec(graph, manifest, spec, state=state)
            # an excluded model drags its attached tests out with it
            d, i = _expand_indirect(graph, manifest, coll, indirect)
            selected -= d | i
    return selected & all_ids
