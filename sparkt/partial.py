"""File-level partial parsing.

Reference analogue: ``core/dbt/parser/partial.py`` (diff-driven
re-parse scheduling over the saved ``partial_parse.msgpack``,
``parser/manifest.py:330-362``). The reference walks a file diff and
schedules exactly the changed files' parsers; this module keeps the
same contract with a much smaller mechanism suited to a 3-second cold
parse: per-file parse OUTPUTS are cached keyed by file content hash,
so a load after editing one file re-parses exactly that file and
re-runs only the cheap whole-project steps (yml patch application,
ref resolution).

Two caches compose in ``ManifestLoader.load``:

1. the whole-manifest cache (``partial_parse.pickle``) — byte-for-byte
   unchanged project ⇒ reuse the finished manifest, zero work;
2. this per-file cache (``partial_files.pickle``) — some files changed
   ⇒ unchanged .sql/.py/.csv files serve their ParsedNodes from cache
   (skipping the jinja AST walk AND the parse-phase render, the two
   expensive steps) and unchanged .yml files serve their parsed
   document (skipping ``yaml.safe_load``).

Invalidation is deliberately coarse where correctness demands it: a
macro change, project-file change, or vars change invalidates the
whole per-file cache (macros and project configs are global inputs to
every file's parse — the reference's partial.py reaches the same
"schedule everything" answer for macro changes).

Cached values are stored as pickle blobs and deep-copied on every
get/put via a pickle round-trip: manifest nodes are mutated in place
downstream (yml patches, ref resolution), and a shared reference
would corrupt the cache for the next load.
"""

from __future__ import annotations

import os
import pickle


class FileParseCache:
    """Per-file parse-output cache keyed by content hash.

    ``key`` captures every global parse input (node dataclass schema,
    project+cli vars, macro corpus hash, project-file hashes): any
    mismatch discards the whole cache rather than risking stale nodes.
    """

    def __init__(self, path: str, key: tuple):
        self.path = path
        self.key = key
        #: full_path -> (content_hash, pickled nodes/doc)
        self._nodes: dict[str, tuple[str, bytes]] = {}
        self._docs: dict[str, tuple[str, bytes]] = {}
        #: env snapshot of the loaded (still-valid) cache — the parser
        #: MERGES this under the fresh tracker at save time: files
        #: served from this cache never re-render, so their env_var()
        #: reads are absent from the fresh tracker, and saving only
        #: the fresh snapshot would forget them after one partial
        #: reparse (second-opinion review #1)
        self.stored_env: dict = {}

    @classmethod
    def load(cls, path: str, key: tuple) -> "FileParseCache":
        cache = cls(path, key)
        try:
            with open(path, "rb") as f:
                stored = pickle.load(f)
            # env vars consumed by the cached parse must still hold
            # (None = was unset); a changed env invalidates every
            # entry — a per-file hash can't see env drift (r12
            # parsing review #1)
            env_ok = all(
                os.environ.get(k) == v
                for k, v in (stored.get("env") or {}).items()
            )
            if stored.get("key") == key and env_ok:
                cache._nodes = stored.get("nodes", {})
                cache._docs = stored.get("docs", {})
                cache.stored_env = dict(stored.get("env") or {})
        except Exception:  # noqa: BLE001 — absent/stale/corrupt cache
            pass
        return cache

    def save(self, live_files, env: dict | None = None) -> None:
        """Persist, pruning entries for files that no longer exist
        (``live_files`` = the current walk's hash map). ``env`` is the
        env-var snapshot the parse consumed (validated on load)."""
        try:
            live = set(live_files)
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            with open(self.path, "wb") as f:
                pickle.dump(
                    {
                        "key": self.key,
                        "env": dict(env or {}),
                        "nodes": {
                            p: v for p, v in self._nodes.items()
                            if p in live
                        },
                        "docs": {
                            p: v for p, v in self._docs.items()
                            if p in live
                        },
                    },
                    f,
                )
        except Exception:  # noqa: BLE001 — cache is best-effort
            pass

    # ---------------------------------------------------------- nodes
    def get_nodes(self, full: str, content_hash: str | None):
        """Fresh ParsedNode copies for an UNCHANGED file, else None."""
        ent = self._nodes.get(full)
        if ent is None or content_hash is None or ent[0] != content_hash:
            return None
        return pickle.loads(ent[1])

    def put_nodes(self, full: str, content_hash: str | None, nodes) -> None:
        if content_hash is None:
            return
        # snapshot taken BEFORE yml patches / ref resolution mutate
        # the very same node objects
        self._nodes[full] = (content_hash, pickle.dumps(nodes))

    # ----------------------------------------------------------- docs
    def get_doc(self, full: str, content_hash: str | None):
        ent = self._docs.get(full)
        if ent is None or content_hash is None or ent[0] != content_hash:
            return None
        return pickle.loads(ent[1])

    def put_doc(self, full: str, content_hash: str | None, doc) -> None:
        if content_hash is None:
            return
        self._docs[full] = (content_hash, pickle.dumps(doc))
