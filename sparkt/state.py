"""State artifacts: previous-manifest comparison (state:modified),
defer, clone, and retry.

Reference: ``core/dbt/graph/selector_methods.py:609-787`` (state
method), ``core/dbt/context/providers.py:548-573`` +
``task/runnable.py:124-133`` (defer), ``core/dbt/task/clone.py:18-126``,
``core/dbt/task/retry.py``.
"""

from __future__ import annotations

import json
import os


class StateManifest:
    """A previously written target/manifest.json."""

    def __init__(self, path: str):
        if os.path.isdir(path):
            path = os.path.join(path, "manifest.json")
        with open(path) as f:
            raw = json.load(f)
        self.nodes: dict[str, dict] = raw.get("nodes", {})
        self.sources: dict[str, dict] = raw.get("sources", {})

    def checksum(self, unique_id: str) -> str | None:
        node = self.nodes.get(unique_id)
        return None if node is None else node.get("checksum")

    def config(self, unique_id: str) -> dict:
        node = self.nodes.get(unique_id) or {}
        return node.get("config") or {}

    def relation_name(self, unique_id: str) -> str | None:
        node = self.nodes.get(unique_id) or {}
        return node.get("relation_name")


def modified_nodes(manifest, state: StateManifest) -> set[str]:
    """state:modified = new nodes + body/config-changed nodes
    (``selector_methods.py:609-787``; the `.body`/`.configs`
    submethods collapsed into one predicate)."""
    out = set()
    for uid, node in manifest.nodes.items():
        old = state.nodes.get(uid)
        if old is None:
            out.add(uid)
            continue
        if node.checksum() != old.get("checksum"):
            out.add(uid)
            continue
        if (old.get("config") or {}) != node.config:
            out.add(uid)
    return out


def new_nodes(manifest, state: StateManifest) -> set[str]:
    return {uid for uid in manifest.nodes if uid not in state.nodes}


def retry_candidates(run_results_path: str) -> set[str]:
    """Nodes not in terminal success from the previous invocation
    (``core/dbt/task/retry.py``)."""
    with open(run_results_path) as f:
        raw = json.load(f)
    bad = {"error", "fail", "skipped"}
    return {
        r["unique_id"]
        for r in raw.get("results", [])
        if r.get("status") in bad
    }
