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


def test_warn_error_options_parsing():
    """include/exclude/silence + the error/warn aliases and 'all'
    (reference option_types.py:46-66)."""
    from sparkt.events import WarnErrorOptions

    o = WarnErrorOptions.from_yaml('{"include": "all", "exclude": ["B"]}')
    assert o.includes("A") and not o.includes("B")
    o = WarnErrorOptions.from_yaml('{"error": ["A"], "warn": ["B"]}')
    assert o.includes("A") and not o.includes("B") and not o.includes("C")
    o = WarnErrorOptions.from_yaml('{"include": "all", "silence": ["S"]}')
    assert o.silenced("S") and not o.includes("S")
    assert WarnErrorOptions.from_yaml(None).includes("X") is False


WARN_TEST_FILES = {
    "dbt_project.yml": "name: ev\nmodel-paths: [models]\nseed-paths: [seeds]\n",
    "seeds/raw.csv": "id,v\n1,10\n2,20\n",
    "models/a.sql": "select * from {{ ref('raw') }}",
    "models/schema.yml": """
models:
  - name: a
    columns:
      - name: v
        data_tests:
          - accepted_values:
              values: [999]
              config: {severity: warn}
""",
}


def test_warn_error_options_promote_and_exclude(make_project, spark):
    """Granular promotion: include TestWarning -> the warn-severity test
    errors; blanket --warn-error with exclude TestWarning leaves it a
    warning (reference core/dbt/cli/main.py:138 WarnErrorOptions)."""
    runner = make_project(WARN_TEST_FILES, schema="t_weo")
    assert runner.seed().ok

    res = runner.build()
    assert {r.status for r in res.results if "accepted_values" in r.unique_id} \
        == {"warn"}

    res = runner.build(warn_error_options='{"include": ["TestWarning"]}')
    assert {r.status for r in res.results if "accepted_values" in r.unique_id} \
        == {"error"}

    res = runner.build(warn_error=True,
                       warn_error_options='{"exclude": ["TestWarning"]}')
    assert {r.status for r in res.results if "accepted_values" in r.unique_id} \
        == {"warn"}


def test_no_nodes_selected_warning(make_project, spark):
    """Empty selection fires NoNodesForSelectionCriteria (M030); under
    include it raises; under silence it doesn't even log."""
    import pytest

    from sparkt.events import WarnAsError

    runner = make_project(dict(FILES), schema="t_nonodes")
    assert runner.seed().ok
    res = runner.run(select="does_not_exist")
    assert res.results == []
    assert any(e["info"]["code"] == "M030" for e in _read_log(runner))

    with pytest.raises(WarnAsError, match="NoNodesForSelectionCriteria"):
        runner.run(
            select="does_not_exist",
            warn_error_options='{"include": ["NoNodesForSelectionCriteria"]}',
        )

    # silence: no new M030 line
    before = sum(1 for e in _read_log(runner)
                 if e["info"]["code"] == "M030")
    runner.run(
        select="does_not_exist",
        warn_error_options='{"silence": ["NoNodesForSelectionCriteria"]}',
    )
    after = sum(1 for e in _read_log(runner)
                if e["info"]["code"] == "M030")
    assert after == before


def test_deprecations_once_only_event_log(make_project, spark):
    """Named deprecations (sparkt/deprecations.py; reference
    core/dbt/deprecations.py): renamed project configs fire a D-code
    warning event ONCE per process, visible in logs/dbt.log, and
    --warn-error-options can promote a specific deprecation by name."""
    import pytest

    from sparkt import deprecations
    from sparkt.events import WarnAsError

    deprecations.reset()
    try:
        files = {
            # legacy source-paths/data-paths keys (renamed in dbt 1.0)
            "dbt_project.yml": (
                "name: dep\nsource-paths: [models]\ndata-paths: [seeds]\n"
            ),
            "seeds/raw.csv": "id,v\n1,10\n",
            "models/a.sql": "select * from {{ ref('raw') }}",
        }
        runner = make_project(files, schema="t_depr")
        # legacy keys still work
        assert runner.seed().ok and runner.run().ok
        codes = [e["info"]["code"] for e in _read_log(runner)]
        assert codes.count("D003") == 1 and codes.count("D004") == 1

        # once-only: loading the project again fires nothing new
        from sparkt.runner import Runner

        runner2 = Runner(runner.project.project_root, spark=spark,
                         project_overrides={"schema": "t_depr"})
        codes = [e["info"]["code"] for e in _read_log(runner2)]
        assert codes.count("D003") == 1

        # a deprecation fired mid-invocation can be promoted by name
        deprecations.reset()
        deprecations.set_event_manager(runner.events)
        runner.events.warn_error_options = __import__(
            "sparkt.events", fromlist=["WarnErrorOptions"]
        ).WarnErrorOptions(include=["PackageRedirectDeprecation"])
        with pytest.raises(WarnAsError, match="PackageRedirectDeprecation"):
            deprecations.warn("package-redirect",
                              old_name="fishtown/x", new_name="dbt-labs/x")
        # while an un-included deprecation stays a warning
        deprecations.warn("project-test-config")
    finally:
        deprecations.reset()


def test_project_flags_tier(make_project, spark):
    """dbt_project.yml `flags:` provides defaults below CLI/env
    (reference ProjectFlags, core/dbt/cli/flags.py precedence)."""
    files = dict(WARN_TEST_FILES)
    files["dbt_project.yml"] = (
        "name: ev\nmodel-paths: [models]\nseed-paths: [seeds]\n"
        "flags:\n  warn_error_options:\n    include: [TestWarning]\n"
    )
    runner = make_project(files, schema="t_pflags")
    assert runner.seed().ok
    res = runner.build()
    assert {r.status for r in res.results if "accepted_values" in r.unique_id} \
        == {"error"}
    # explicit CLI-level options override the project tier
    res = runner.build(warn_error_options='{"exclude": ["TestWarning"]}')
    assert {r.status for r in res.results if "accepted_values" in r.unique_id} \
        == {"warn"}


def test_spaces_in_resource_names_deprecation(make_project, spark):
    """A model file with spaces in its name parses but fires D014 per
    resource + a once-only D015 summary (reference
    manifest_validations/test_check_for_spaces_in_model_names.py)."""
    from sparkt import deprecations

    deprecations.reset()
    try:
        files = {
            "dbt_project.yml": "name: sp\nmodel-paths: [models]\n",
            "models/my model.sql": "select 1 as id",
            "models/clean_model.sql": "select 2 as id",
        }
        runner = make_project(files, schema="t_spaces")
        # parse-time deprecations flush when a task applies its warn
        # options (so --warn-error-options can promote/silence them),
        # not at Runner construction
        runner.compile()
        codes = [e["info"]["code"] for e in _read_log(runner)]
        assert codes.count("D014") == 1 and codes.count("D015") == 1
        msgs = [e["info"]["msg"] for e in _read_log(runner)
                if e["info"]["code"] == "D014"]
        assert "Found spaces in the name of `model.sp.my model`" in msgs[0]
    finally:
        deprecations.reset()


def test_microbatch_batch_events(make_project, spark):
    """Each microbatch batch fires Q043 start / Q044 completed into
    logs/dbt.log (extension: dbt 1.9 LogStartBatch/LogBatchResult
    shape)."""
    import json
    import os

    files = {
        "dbt_project.yml": "name: mbe\nmodel-paths: [models]\nseed-paths: [seeds]\n",
        "seeds/e2.csv": "id,ts\n1,2024-01-01 05:00:00\n2,2024-01-03 05:00:00\n",
        "models/stg2.sql": (
            "{{ config(materialized='table', event_time='ts') }}\n"
            "select id, cast(ts as timestamp) as ts from {{ ref('e2') }}"
        ),
        "models/mb2.sql": (
            "{{ config(materialized='incremental', "
            "incremental_strategy='microbatch', event_time='ts', "
            "batch_size='day', begin='2024-01-01') }}\n"
            "select id, ts from {{ ref('stg2') }}"
        ),
    }
    runner = make_project(files, schema="t_mbe")
    assert runner.seed().ok
    assert runner.run(event_time_end="2024-01-04 00:00:00").ok
    log = os.path.join(runner.project.project_root, "logs", "dbt.log")
    lines = [json.loads(x) for x in open(log)]
    starts = [x for x in lines if x["info"]["code"] == "Q043"]
    dones = [x for x in lines if x["info"]["code"] == "Q044"]
    assert len(starts) == 3 and len(dones) == 3  # 3 day batches
    assert starts[0]["data"]["batch_start"] == "2024-01-01 00:00:00"
    assert starts[0]["data"]["total"] == 3
    assert all(d["data"]["execution_time"] >= 0 for d in dones)


def test_parse_time_deprecation_promotable(make_project, spark):
    """Parse-time deprecations (renamed configs) flush AFTER
    --warn-error-options applies, so they can be promoted to errors
    (review finding: the early flush in __init__ made them permanently
    un-promotable)."""
    from sparkt import deprecations

    deprecations.reset()
    try:
        files = {
            "dbt_project.yml": (
                "name: dp\nsource-paths: [models]\n"  # renamed config
            ),
            "models/m1.sql": "select 1 as id",
        }
        import pytest

        from sparkt.events import WarnAsError

        runner = make_project(files, schema="t_depr_promote")
        with pytest.raises(WarnAsError, match="ConfigSourcePath"):
            # promoted parse warning aborts the command
            runner.run(warn_error_options=(
                '{"include": ["ConfigSourcePathDeprecation"]}'
            ))
    finally:
        deprecations.reset()
    deprecations.reset()
    runner2 = make_project({}, schema="t_depr_promote")
    res = runner2.run(warn_error_options=(
        '{"include": "all", "silence": ["ConfigSourcePathDeprecation"]}'
    ))
    assert res.ok
    codes = [e["info"]["code"] for e in _read_log(runner2)]
    assert "D003" not in codes  # silenced entirely


def test_warn_error_options_scalar_strings():
    """A scalar-string include/exclude/silence is ONE event name, not a
    character list (review finding: list('TestWarning') matched
    nothing, silently disabling the exclusion)."""
    from sparkt.events import WarnErrorOptions

    o = WarnErrorOptions.from_yaml(
        '{"include": "all", "exclude": "TestWarning"}'
    )
    assert not o.includes("TestWarning") and o.includes("Other")
    o = WarnErrorOptions.from_yaml('{"include": "FooWarning"}')
    assert o.includes("FooWarning")
    assert not o.includes("Foo")        # no substring matches
    assert not o.includes("FooWarningX")
    o = WarnErrorOptions.from_yaml('{"silence": "Quiet"}')
    assert o.silenced("Quiet") and not o.silenced("Q")
