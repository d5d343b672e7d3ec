"""Structured event log (sparkt/events.py; reference
core/dbt/events/types.py + logging.py): every run appends jsonl events
with the reference's stable codes to logs/dbt.log."""

from __future__ import annotations

import json
import os

FILES = {
    "dbt_project.yml": "name: ev\nmodel-paths: [models]\nseed-paths: [seeds]\n",
    "seeds/raw.csv": "id,v\n1,10\n2,20\n",
    "models/a.sql": "select * from {{ ref('raw') }}",
    "models/b.sql": "{{ config(materialized='table') }}\nselect sum(v) as s from {{ ref('a') }}",
}


def _read_log(runner):
    path = os.path.join(runner.project.project_root, "logs", "dbt.log")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_run_emits_structured_events(make_project, spark):
    runner = make_project(FILES, schema="t_events")
    assert runner.seed().ok
    assert runner.run().ok
    events = _read_log(runner)

    by_code = {}
    for e in events:
        by_code.setdefault(e["info"]["code"], []).append(e)

    # session-level events
    assert by_code["A001"][0]["info"]["msg"].startswith("Running with sparkt")
    assert any(e["data"]["args"]["which"] == "run" for e in by_code["A002"])
    assert by_code["Q027"][0]["data"]["num_threads"] >= 1

    # node lifecycle: NodeStart/NodeFinished pairs with timings
    started = {e["data"]["unique_id"] for e in by_code["Q024"]}
    finished = {e["data"]["unique_id"]: e["data"] for e in by_code["Q025"]}
    assert {"model.ev.a", "model.ev.b"} <= started
    assert finished["model.ev.b"]["status"] == "success"
    assert finished["model.ev.b"]["execution_time"] > 0

    # per-node result lines carry index/total and execution_time
    q012 = [e["data"] for e in by_code["Q012"]]
    assert all(d["total"] >= 1 and d["index"] >= 1 for d in q012)

    # command completion with success + elapsed
    done = [e["data"] for e in by_code["Q039"]]
    assert any(d["command"] == "run" and d["success"] for d in done)

    # every line carries the common info envelope
    for e in events:
        info = e["info"]
        assert info["invocation_id"] and info["ts"] and info["level"]
        assert info["name"] and info["thread"]


def test_failed_node_emits_error_and_skip_events(make_project, spark):
    files = dict(FILES)
    files["models/bad.sql"] = "select no_such_col from {{ ref('a') }}"
    files["models/child.sql"] = "select * from {{ ref('bad') }}"
    runner = make_project(files, schema="t_events_err")
    assert runner.seed().ok
    res = runner.run()
    assert not res.ok
    events = _read_log(runner)
    codes = [(e["info"]["code"], e["data"]) for e in events]
    assert any(
        c == "Z024" and d["unique_id"] == "model.t_events_err.bad"
        or c == "Z024" and d["unique_id"] == "model.ev.bad"
        for c, d in codes
    )
    assert any(
        c == "Q034" and d["unique_id"].endswith(".child") for c, d in codes
    )
