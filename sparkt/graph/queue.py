"""GraphQueue: thread-safe, dependency-ordered node dispenser.

Reference: ``core/dbt/graph/queue.py:19-205`` — priority by topological
generation (level-0 first), ``get``/``mark_done`` protocol consumed by
the thread-pool scheduler.
"""

from __future__ import annotations

import threading
from queue import PriorityQueue

import networkx as nx


def build_order_graph(graph: nx.DiGraph, to_run: set[str]) -> nx.DiGraph:
    """Restrict the full manifest DAG to the selected executables,
    preserving transitive order between them. ONE topological pass
    links each selected node to its NEAREST selected ancestors
    (unselected nodes forward their reach-set) — the old per-node
    nx.ancestors closure + transitive_reduction materialized O(n²)
    edges and took 40+ s of scheduler startup on a 2,000-node chain
    (r12 runner review #8); this is linear in practice and needs no
    reduction pass (a redundant transitive edge only gates, never
    deadlocks). Scaling pinned at 10k nodes by
    tests/test_orchestration_scale.py."""
    order_graph = nx.DiGraph()
    order_graph.add_nodes_from(to_run)
    reach: dict[str, frozenset] = {}
    for n in nx.topological_sort(graph):
        preds = list(graph.predecessors(n))
        if n in to_run:
            for p in preds:
                for s in reach.get(p, ()):
                    order_graph.add_edge(s, n)
            reach[n] = frozenset((n,))
        else:
            acc: set[str] = set()
            for p in preds:
                acc |= reach.get(p, frozenset())
            reach[n] = frozenset(acc)
    return order_graph


class GraphQueue:
    def __init__(self, graph: nx.DiGraph, selected: set[str]):
        self.graph = graph.subgraph(selected).copy()
        self.lock = threading.Lock()
        self.inner: PriorityQueue = PriorityQueue()
        self.in_progress: set[str] = set()
        self.queued: set[str] = set()
        self._scores = self._get_scores(self.graph)
        for node in self.graph.nodes():
            if self.graph.in_degree(node) == 0:
                self._mark_queued(node)

    @staticmethod
    def _get_scores(graph: nx.DiGraph) -> dict[str, int]:
        scores = {}
        for level, generation in enumerate(nx.topological_generations(graph)):
            for node in generation:
                scores[node] = level
        return scores

    def _mark_queued(self, node: str) -> None:
        self.queued.add(node)
        self.inner.put((self._scores.get(node, 0), node))

    def get(self, block: bool = True, timeout: float | None = None) -> str:
        _, node = self.inner.get(block=block, timeout=timeout)
        with self.lock:
            self.queued.discard(node)
            self.in_progress.add(node)
        return node

    def mark_done(self, node: str) -> list[str]:
        """Complete a node; returns newly-unblocked node ids."""
        unblocked = []
        with self.lock:
            self.in_progress.discard(node)
            successors = list(self.graph.successors(node))
            self.graph.remove_node(node)
            for succ in successors:
                if (
                    self.graph.in_degree(succ) == 0
                    and succ not in self.queued
                    and succ not in self.in_progress
                ):
                    self._mark_queued(succ)
                    unblocked.append(succ)
            self.inner.task_done()
        return unblocked

    def descendants_of(self, node: str) -> set[str]:
        """Remaining (not-yet-done) descendants of ``node``, computed
        under the queue's own lock — callers must NOT traverse
        ``self.graph`` themselves while workers mutate it in
        ``mark_done`` (a concurrent traversal raises RuntimeError)."""
        with self.lock:
            if node in self.graph:
                return set(nx.descendants(self.graph, node))
            return set()

    def empty(self) -> bool:
        with self.lock:
            return len(self.graph.nodes()) == 0

    def remaining(self) -> int:
        with self.lock:
            return len(self.graph.nodes())
