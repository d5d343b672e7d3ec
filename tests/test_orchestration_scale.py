"""10,000-node orchestration stress (VERDICT r12 ask #7): pin the r12
nearest-selected-ancestor scheduler rewrite at 5x the pathology scale
and bound the surrounding driver paths — manifest parse+link, selector
evaluation, order-graph + queue construction, artifact write.

Bounds are committed wall budgets with ~10x headroom over the measured
idle-box times (r13: parse+link 2.7 s, order-graph full 0.28 s /
sparse 0.07 s, manifest.write 0.55 s, selectors < 15 ms), loose enough
for a loaded CI box but tight enough that the O(n^2) failure modes the
r12 review found (per-node nx.ancestors closure: 40+ s at 2k nodes,
so minutes at 10k) trip immediately."""

from __future__ import annotations

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkt.graph.linker import link_graph  # noqa: E402
from sparkt.graph.queue import GraphQueue, build_order_graph  # noqa: E402
from sparkt.graph.selector import select_nodes  # noqa: E402
from sparkt.parsing.parser import ManifestLoader  # noqa: E402
from sparkt.project import load_project  # noqa: E402

N_PATHS = 1_000
PER_PATH = 10  # 10,000 models in 1,000 ref-chained directories


@pytest.fixture(scope="module")
def big(tmp_path_factory):
    root = tmp_path_factory.mktemp("stress10k")
    (root / "dbt_project.yml").write_text(
        "name: stress10k\nmodel-paths: [models]\n"
    )
    for p in range(N_PATHS):
        d = root / "models" / f"path_{p}"
        d.mkdir(parents=True)
        for i in range(PER_PATH):
            sql = (
                "select 1 as id"
                if i == 0
                else f"select id from {{{{ ref('node_{p}_{i-1}') }}}}"
            )
            (d / f"node_{p}_{i}.sql").write_text(sql)
    t0 = time.time()
    project = load_project(str(root))
    manifest = ManifestLoader(project).load(partial=False)
    graph = link_graph(manifest, add_test_edges=True)
    parse_s = time.time() - t0
    return root, manifest, graph, parse_s


def test_10k_parse_and_link_bound(big):
    _, manifest, graph, parse_s = big
    assert graph.number_of_nodes() == N_PATHS * PER_PATH
    assert parse_s < 30.0, f"10k-model cold parse+link took {parse_s:.1f}s"


def test_10k_selector_evaluation_bound(big):
    _, manifest, graph, _ = big
    t0 = time.time()
    alln = select_nodes(graph, manifest, None)
    subtree = select_nodes(graph, manifest, "path_500")  # directory
    desc = select_nodes(graph, manifest, "node_500_0+")
    anc = select_nodes(graph, manifest, "+node_500_9")
    sel_s = time.time() - t0
    assert len(alln) == 10_000
    assert len(subtree) == 10
    assert len(desc) == 10 and len(anc) == 10
    assert sel_s < 5.0, f"4 selector evaluations took {sel_s:.1f}s"


def test_10k_order_graph_and_queue_bound(big):
    """The r12 rewrite's scaling pin: full selection AND the sparse
    nearest-ancestor-forwarding selection (every chain position that
    is not selected forwards its reach-set)."""
    _, manifest, graph, _ = big
    full = set(manifest.nodes)
    t0 = time.time()
    og = build_order_graph(graph, full)
    GraphQueue(og, full)
    full_s = time.time() - t0
    # chain edges only: each node gates on its nearest selected parent
    assert og.number_of_edges() == N_PATHS * (PER_PATH - 1)
    sparse = {u for u in full if int(u.rsplit("_", 1)[-1]) % 3 == 0}
    t0 = time.time()
    og2 = build_order_graph(graph, sparse)
    GraphQueue(og2, sparse)
    sparse_s = time.time() - t0
    # forwarding must link selected grandchildren through unselected
    # intermediates: node_p_0 -> node_p_3 -> node_p_6 -> node_p_9
    assert og2.number_of_edges() == N_PATHS * 3
    assert full_s < 5.0, f"10k full order-graph+queue took {full_s:.1f}s"
    assert sparse_s < 5.0, f"10k sparse order-graph took {sparse_s:.1f}s"


def test_10k_artifact_write_bound(big, tmp_path):
    _, manifest, _, _ = big
    dest = tmp_path / "manifest.json"
    t0 = time.time()
    manifest.write(str(dest))
    write_s = time.time() - t0
    assert dest.stat().st_size > 1_000_000  # it really is the 10k manifest
    assert write_s < 10.0, f"10k manifest.json write took {write_s:.1f}s"
