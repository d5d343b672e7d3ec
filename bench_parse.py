"""Parse+DAG benchmark: the BASELINE.md commitment is
"parse+DAG 2,000 models <= 45 s cold / <= 5 s warm".

Mirrors the reference's performance harness project shape
(``performance/projects/01_2000_simple_models``: 200 dirs x 10 models
of ``select 1 as id``, each with a yml adding unique/not_null/
relationships tests — 2,000 models + 6,000 generic tests), generated
programmatically here, plus ref() chain edges so the DAG is non-trivial.

Prints ONE JSON line:
{"metric": "parse_2000_models", "cold_s": N, "warm_s": N,
 "nodes": N, "unit": "sec"}

No SparkSession is needed — parsing and DAG construction are pure
driver work (the point: orchestration overhead stays O(nodes), far from
the 45 s budget).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_PATHS = 200
PER_PATH = 10


def generate(root: str) -> None:
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "dbt_project.yml"), "w") as f:
        f.write("name: parse_bench\nmodel-paths: [models]\n")
    for p in range(N_PATHS):
        d = os.path.join(root, "models", f"path_{p}")
        os.makedirs(d, exist_ok=True)
        for i in range(PER_PATH):
            name = f"node_{p}_{i}"
            if i == 0:
                sql = "select 1 as id"
            else:
                # chain: real DAG edges inside each path
                sql = f"select id from {{{{ ref('node_{p}_{i-1}') }}}}"
            with open(os.path.join(d, f"{name}.sql"), "w") as f:
                f.write(sql)
            rel_to = f"node_{p}_0"
            with open(os.path.join(d, f"{name}.yml"), "w") as f:
                f.write(
                    "version: 2\n"
                    "models:\n"
                    f"- name: {name}\n"
                    "  columns:\n"
                    "  - name: id\n"
                    "    data_tests:\n"
                    "    - unique\n"
                    "    - not_null\n"
                    "    - relationships:\n"
                    "        field: id\n"
                    f"        to: ref('{rel_to}')\n"
                )


def parse_once(root: str, partial: bool) -> tuple[float, int]:
    from sparkt.graph.linker import link_graph
    from sparkt.parsing.parser import ManifestLoader
    from sparkt.project import load_project

    t0 = time.time()
    project = load_project(root)
    loader = ManifestLoader(project)
    manifest = loader.load(partial=partial)
    graph = link_graph(manifest, add_test_edges=True)
    dt = time.time() - t0
    return dt, graph.number_of_nodes()


def main():
    root = tempfile.mkdtemp(prefix="sparkt_parse_bench_")
    try:
        generate(root)
        cold_s, n_nodes = parse_once(root, partial=False)
        # warm both caches the way a second invocation would see them:
        # first partial=True run writes the pickle, second reads it
        parse_once(root, partial=True)
        warm_s, _ = parse_once(root, partial=True)
        # file-level partial parse: ONE model changed out of 2,000 —
        # only that file re-parses (sparkt/partial.py)
        with open(
            os.path.join(root, "models", "path_0", "node_0_1.sql"), "w"
        ) as f:
            f.write("select id, 1 as v from {{ ref('node_0_0') }}")
        warm_1change_s, _ = parse_once(root, partial=True)
        print(
            json.dumps(
                {
                    "metric": "parse_2000_models",
                    "cold_s": round(cold_s, 3),
                    "warm_s": round(warm_s, 3),
                    "warm_1change_s": round(warm_1change_s, 3),
                    "nodes": n_nodes,
                    "unit": "sec",
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
