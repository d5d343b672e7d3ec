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


def test_run_lifecycle_event_tail(make_project, spark):
    """r9 (VERDICT r8 ask #7): the run-lifecycle codes a log consumer
    keys on next — typed result lines per resource (Q007 test, Q016
    seed, Q015 snapshot), compile/execute markers (Q030/Q031), hook
    lines (Q032/Q033), per-node timing (Z010), manifest stats (W006),
    and the adapter family with public dbt-adapters codes (E016 SQL
    query, E017 status, E022 cache action)."""
    files = dict(FILES)
    files["models/b.sql"] = (
        "{{ config(materialized='table', "
        "pre_hook='select 1 as pre_probe') }}\n"
        "select sum(v) as s from {{ ref('a') }}"
    )
    files["models/schema.yml"] = (
        "version: 2\nmodels:\n  - name: a\n    columns:\n"
        "      - name: id\n        data_tests: [not_null]\n"
    )
    files["snapshots/snap.sql"] = (
        "{% snapshot raw_snap %}\n"
        "{{ config(unique_key='id', strategy='check', "
        "check_cols='all', target_schema='t_events_tail') }}\n"
        "select * from {{ ref('raw') }}\n"
        "{% endsnapshot %}\n"
    )
    files["dbt_project.yml"] += "snapshot-paths: [snapshots]\n"
    runner = make_project(files, schema="t_events_tail")
    assert runner.seed().ok
    assert runner.build().ok
    assert runner.snapshot().ok
    events = _read_log(runner)
    by_code = {}
    for e in events:
        by_code.setdefault(e["info"]["code"], []).append(e)

    # W006: manifest stats line
    stat = by_code["W006"][0]["data"]["stat_line"]
    assert "2 models" in stat and "1 seeds" in stat
    assert "1 data tests" in stat and "1 snapshots" in stat

    # Q016: the seed result rides its own code with schema.relation
    seed = by_code["Q016"][0]["data"]
    assert seed["relation"] == "raw" and seed["status"] == "success"
    assert seed["schema"] == "t_events_tail"

    # Q007: the test result with pass status + num_failures
    t = by_code["Q007"][0]["data"]
    assert t["status"] == "pass" and t["num_failures"] == 0
    assert "not_null" in t["name"]

    # Q015: snapshot result
    snap = by_code["Q015"][0]["data"]
    assert snap["status"] == "success"
    assert "raw_snap" in snap["description"]

    # Q030/Q031 compile/execute markers for every executed node
    compiling = {e["data"]["unique_id"] for e in by_code["Q030"]}
    executing = {e["data"]["unique_id"] for e in by_code["Q031"]}
    assert "model.ev.b" in compiling and "model.ev.b" in executing

    # Q032/Q033 hook lines around the model's pre_hook
    assert any(
        "pre_probe" in e["data"]["statement"] for e in by_code["Q032"]
    )
    hook_end = next(
        e["data"] for e in by_code["Q033"]
        if "pre_probe" in e["data"]["statement"]
    )
    assert hook_end["status"] == "success"

    # Z010 timing info per finished node
    z = [e["data"] for e in by_code["Z010"]]
    b_timing = next(d for d in z if d["unique_id"] == "model.ev.b")
    assert b_timing["name"] == "execute"
    assert b_timing["started_at"] and b_timing["completed_at"]

    # adapter family: SQL statements + cache actions (debug level)
    assert any(
        "pre_probe" in e["data"]["sql"] for e in by_code["E016"]
    )
    assert all(e["data"]["elapsed"] >= 0 for e in by_code["E017"])
    cache = [e["data"] for e in by_code["E022"]]
    assert any(
        c["action"] == "add_relation" and c["ref_key"].endswith(".b")
        for c in cache
    )


def test_freshness_emits_q018(make_project, spark):
    files = {
        "dbt_project.yml": (
            "name: ev\nmodel-paths: [models]\nseed-paths: [seeds]\n"
        ),
        "seeds/raw.csv": "id,ts\n1,2024-01-01 00:00:00\n",
        "models/schema.yml": (
            "version: 2\nsources:\n  - name: ext\n"
            "    schema: t_events_fresh\n    tables:\n"
            "      - name: raw\n        loaded_at_field: ts\n"
            "        freshness:\n"
            "          warn_after: {count: 1, period: hour}\n"
        ),
    }
    runner = make_project(files, schema="t_events_fresh")
    assert runner.seed().ok
    runner.source_freshness()
    events = _read_log(runner)
    q018 = [
        e["data"] for e in events if e["info"]["code"] == "Q018"
    ]
    assert q018 and q018[0]["source_name"] == "ext"
    assert q018[0]["table_name"] == "raw"
    # the 2024 timestamp is long past warn_after: 1 hour
    assert q018[0]["status"] == "warn"


def test_duplicate_hooks_get_distinct_indices(make_project, spark):
    """r9 review fix: two IDENTICAL hook statements (legal in dbt)
    must log '1 of 2' and '2 of 2', not '1 of 2' twice; empty hook
    entries must not leave holes in the sequence."""
    files = dict(FILES)
    files["models/b.sql"] = (
        "{{ config(materialized='table', pre_hook=["
        "'select 41 as probe', '', 'select 41 as probe']) }}\n"
        "select sum(v) as s from {{ ref('a') }}"
    )
    runner = make_project(files, schema="t_events_dup_hooks")
    assert runner.seed().ok
    assert runner.run().ok
    starts = [
        e["data"] for e in _read_log(runner)
        if e["info"]["code"] == "Q032"
        and "41" in e["data"]["statement"]
    ]
    assert [(s["index"], s["total"]) for s in starts] == [(1, 2), (2, 2)]


def test_failed_statement_still_emits_sql_status(make_project, spark):
    """r9 review fix: a failing statement terminates its E016 with an
    E017 status=ERROR line — the dbt-adapters pairing holds on both
    outcomes."""
    files = dict(FILES)
    # a failing HOOK routes through adapter.execute (a failing view
    # body goes through create_view_as, which is not an E016 site)
    files["models/bad.sql"] = (
        "{{ config(pre_hook='select boom from no_such_table') }}\n"
        "select * from {{ ref('a') }}"
    )
    runner = make_project(files, schema="t_events_sqlerr")
    assert runner.seed().ok
    res = runner.run()
    assert not res.ok
    events = _read_log(runner)
    assert any(
        e["info"]["code"] == "E017" and e["data"]["status"] == "ERROR"
        for e in events
    )
