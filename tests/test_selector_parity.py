"""fqn / path selector-method parity with the reference
(core/dbt/graph/selector_methods.py:69-107 is_selected_node,
:243-259 QualifiedNameSelectorMethod, :454-474 PathSelectorMethod).

Found by the r13 10k-node probe: the old fqn method matched only leaf
names (``-s staging`` selected NOTHING instead of the directory
subtree) and the old path method required an exact node.path glob
(``path:models/staging`` selected nothing because node.path lacks the
resource-dir prefix and directories never matched)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkt.graph.linker import link_graph  # noqa: E402
from sparkt.graph.selector import select_nodes  # noqa: E402
from sparkt.parsing.parser import ManifestLoader  # noqa: E402
from sparkt.project import load_project  # noqa: E402


@pytest.fixture(scope="module")
def proj(tmp_path_factory):
    root = tmp_path_factory.mktemp("selparity")
    (root / "dbt_project.yml").write_text(
        "name: selproj\nmodel-paths: [models]\n"
    )
    stg = root / "models" / "staging"
    stg.mkdir(parents=True)
    (stg / "stg_orders.sql").write_text("select 1 as id")
    (stg / "stg_payments.sql").write_text("select 1 as id")
    (root / "models" / "top_model.sql").write_text("select 1 as id")
    project = load_project(str(root))
    manifest = ManifestLoader(project).load(partial=False)
    graph = link_graph(manifest, add_test_edges=True)
    return graph, manifest


CASES = [
    # reference fqn semantics (selector_methods.py:69-107):
    ("staging", 2),            # unscoped prefix -> directory subtree
    ("selproj.staging", 2),    # scoped prefix
    ("staging.stg_*", 2),      # anchored glob
    ("staging.*", 2),          # wildcard slurp over the remainder
    ("stg_orders", 1),         # exact leaf name
    ("stg_*", 0),              # UNanchored glob does NOT reach subdirs
    ("top_*", 1),              # top-level model: unscoped flat = [name]
    ("selproj", 3),            # whole package
    # reference path semantics (selector_methods.py:454-474):
    ("path:models/staging", 2),            # directory selection
    ("path:models/staging/stg_orders.sql", 1),
    ("path:models", 3),
    ("nonexistent", 0),
]


@pytest.mark.parametrize("spec,want", CASES)
def test_selector_reference_parity(proj, spec, want):
    graph, manifest = proj
    assert len(select_nodes(graph, manifest, spec)) == want


def test_path_selector_matches_custom_resource_dirs(tmp_path):
    """r14: nodes carry their real resource_dir, so `path:` works with
    a CUSTOM model-path (the old default-prefix guessing only covered
    models/seeds/snapshots/tests/analyses/macros), and the manifest
    fqn/original_file_path match the reference's project-relative
    forms."""
    root = tmp_path / "customp"
    (root / "dbt_models" / "staging").mkdir(parents=True)
    (root / "dbt_project.yml").write_text(
        "name: custp\nmodel-paths: [dbt_models]\n"
    )
    (root / "dbt_models" / "staging" / "stg_x.sql").write_text(
        "select 1 as id"
    )
    project = load_project(str(root))
    manifest = ManifestLoader(project).load(partial=False)
    graph = link_graph(manifest, add_test_edges=True)
    node = manifest.nodes["model.custp.stg_x"]
    assert node.original_file_path == "dbt_models/staging/stg_x.sql"
    assert node.fqn == ["custp", "staging", "stg_x"]
    # reference-form (with the custom resource dir) selects
    assert len(select_nodes(
        graph, manifest, "path:dbt_models/staging")) == 1
    assert len(select_nodes(
        graph, manifest, "path:dbt_models/staging/stg_x.sql")) == 1
    # resource-dir-less form stays accepted (documented compatibility)
    assert len(select_nodes(graph, manifest, "path:staging")) == 1
    assert len(select_nodes(graph, manifest, "path:nowhere")) == 0
