"""Data-test + unit-test materializations (reference:
core/dbt/task/test.py:126-255; tests/functional/schema_tests/,
tests/functional/unit_testing/fixtures.py)."""

from __future__ import annotations

FILES = {
    "dbt_project.yml": "name: tst\nmodel-paths: [models]\nseed-paths: [seeds]\n",
    "seeds/users.csv": (
        "id,email,status\n1,a@x.com,active\n2,b@x.com,active\n"
        "3,,inactive\n4,d@x.com,unknown\n4,dd@x.com,active\n"
    ),
    "models/clean_users.sql": "select * from {{ ref('users') }}",
    "models/schema.yml": """
version: 2
models:
  - name: clean_users
    columns:
      - name: id
        data_tests:
          - unique
          - not_null
      - name: email
        data_tests:
          - not_null:
              severity: warn
      - name: status
        data_tests:
          - accepted_values:
              values: [active, inactive]
              config: {severity: warn}
""",
}


def test_generic_tests_statuses(make_project, spark):
    runner = make_project(FILES, schema="t_tests")
    assert runner.seed().ok
    assert runner.run().ok
    res = runner.test()
    by_name = {r.unique_id.split(".")[-1]: r for r in res.results}
    uniq = next(v for k, v in by_name.items() if k.startswith("unique"))
    assert uniq.status == "fail" and uniq.failures == 1  # id=4 duplicated
    nn_id = by_name["not_null_clean_users_id"]
    assert nn_id.status == "pass"
    nn_email = by_name["not_null_clean_users_email"]
    assert nn_email.status == "warn" and nn_email.failures == 1
    acc = next(v for k, v in by_name.items() if k.startswith("accepted_values"))
    assert acc.status == "warn" and acc.failures == 1  # 'unknown'


def test_singular_test_and_store_failures(make_project, spark):
    files = dict(FILES)
    files["tests/dup_emails.sql"] = (
        "{{ config(store_failures=true) }}\n"
        "select email, count(*) as n from {{ ref('clean_users') }} "
        "where email is not null group by email having count(*) > 1"
    )
    runner = make_project(files, schema="t_tests_sf")
    assert runner.seed().ok
    assert runner.run().ok
    res = runner.test(select="dup_emails")
    assert res.results[0].status == "pass"
    # audit table exists even when passing (reference stores the query)
    assert spark.catalog.tableExists("t_tests_sf_dbt_test__audit.dup_emails")


def test_relationships(make_project, spark):
    files = {
        "dbt_project.yml": "name: rel\nmodel-paths: [models]\nseed-paths: [seeds]\n",
        "seeds/parents.csv": "id\n1\n2\n",
        "seeds/children.csv": "id,parent_id\n10,1\n11,2\n12,3\n",
        "models/kids.sql": "select * from {{ ref('children') }}",
        "models/schema.yml": """
version: 2
models:
  - name: kids
    columns:
      - name: parent_id
        data_tests:
          - relationships:
              to: ref('parents')
              field: id
""",
    }
    runner = make_project(files, schema="t_rel")
    assert runner.seed().ok
    assert runner.run().ok
    res = runner.test()
    assert res.results[0].status == "fail"  # parent_id=3 missing
    assert res.results[0].failures == 1


def test_unit_test(make_project, spark):
    files = {
        "dbt_project.yml": "name: ut\nmodel-paths: [models]\nseed-paths: [seeds]\n",
        "seeds/model_a.csv": "id,a\n1,10\n2,20\n",
        "seeds/model_b.csv": "id,b\n1,100\n2,200\n",
        "models/joined.sql": (
            "select a.id, a.a + b.b as c from {{ ref('model_a') }} a "
            "join {{ ref('model_b') }} b on a.id = b.id"
        ),
        "models/schema.yml": """
version: 2
unit_tests:
  - name: ut_joined_sums
    model: joined
    given:
      - input: ref('model_a')
        rows:
          - {id: 1, a: 1}
          - {id: 2, a: 2}
      - input: ref('model_b')
        rows:
          - {id: 1, b: 2}
    expect:
      rows:
        - {id: 1, c: 3}
  - name: ut_joined_empty
    model: joined
    given:
      - input: ref('model_a')
        rows: []
      - input: ref('model_b')
        rows: []
    expect:
      rows: []
  - name: ut_joined_wrong
    model: joined
    given:
      - input: ref('model_a')
        rows: [{id: 1, a: 1}]
      - input: ref('model_b')
        rows: [{id: 1, b: 1}]
    expect:
      rows: [{id: 1, c: 999}]
""",
    }
    runner = make_project(files, schema="t_ut")
    assert runner.seed().ok
    assert runner.run().ok
    res = runner.test()
    by_name = {r.unique_id.split(".")[-1]: r for r in res.results}
    assert by_name["ut_joined_sums"].status == "pass"
    assert by_name["ut_joined_empty"].status == "pass"
    assert by_name["ut_joined_wrong"].status == "fail"


def test_unit_test_sql_fixtures(make_project, spark):
    """format: sql fixtures (reference core/dbt/parser/unit_tests.py:185-193):
    given inputs and expect evaluated as SQL SELECTs."""
    files = {
        "dbt_project.yml": "name: uts\nmodel-paths: [models]\nseed-paths: [seeds]\n",
        "seeds/model_a.csv": "id,a\n1,10\n2,20\n",
        "seeds/model_b.csv": "id,b\n1,100\n2,200\n",
        "models/joined2.sql": (
            "select a.id, a.a + b.b as c from {{ ref('model_a') }} a "
            "join {{ ref('model_b') }} b on a.id = b.id"
        ),
        "models/schema.yml": """
version: 2
unit_tests:
  - name: ut_sql_given_expect
    model: joined2
    given:
      - input: ref('model_a')
        format: sql
        rows: |
          select 1 as id, 5 as a union all select 2 as id, 7 as a
      - input: ref('model_b')
        format: sql
        rows: |
          select 1 as id, 10 as b
    expect:
      format: sql
      rows: |
        select 1 as id, 15 as c
  - name: ut_sql_given_dict_expect
    model: joined2
    given:
      - input: ref('model_a')
        format: sql
        rows: select 3 as id, 1 as a
      - input: ref('model_b')
        format: sql
        rows: select 3 as id, 2 as b
    expect:
      rows:
        - {id: 3, c: 3}
  - name: ut_sql_wrong
    model: joined2
    given:
      - input: ref('model_a')
        format: sql
        rows: select 1 as id, 1 as a
      - input: ref('model_b')
        format: sql
        rows: select 1 as id, 1 as b
    expect:
      format: sql
      rows: select 1 as id, 999 as c
""",
    }
    runner = make_project(files, schema="t_uts")
    assert runner.seed().ok
    assert runner.run().ok
    res = runner.test()
    by_name = {r.unique_id.split(".")[-1]: r for r in res.results}
    assert by_name["ut_sql_given_expect"].status == "pass", by_name["ut_sql_given_expect"].message
    assert by_name["ut_sql_given_dict_expect"].status == "pass", by_name["ut_sql_given_dict_expect"].message
    assert by_name["ut_sql_wrong"].status == "fail"


def test_source_table_tests(make_project, spark):
    """Generic tests declared on SOURCE tables (reference
    core/dbt/parser/sources.py SourcePatcher): column- and table-level,
    scanning via source() against the registered external table."""
    files = {
        "dbt_project.yml": "name: srct\nmodel-paths: [models]\n",
        "models/sources.yml": """
version: 2
sources:
  - name: tpch
    schema: tpch_srct
    tables:
      - name: region
        external: {location: /root/testdata/sf0.001/region.parquet}
        columns:
          - name: r_regionkey
            data_tests:
              - unique
              - not_null
          - name: r_name
            data_tests:
              - accepted_values:
                  values: [AFRICA, AMERICA, ASIA, EUROPE, MIDDLE EAST]
        data_tests:
          - row_count_nonzero
""",
        "macros/row_count.sql": (
            "{% macro test_row_count_nonzero(model) %}"
            "select count(*) as n from {{ model }} having count(*) = 0"
            "{% endmacro %}"
        ),
    }
    files["dbt_project.yml"] += "macro-paths: [macros]\n"
    runner = make_project(files, schema="t_srct")
    res = runner.test()
    by_name = {r.unique_id.split(".")[-1]: r for r in res.results}
    assert len(by_name) == 4
    assert by_name["unique_source_tpch_region_r_regionkey"].status == "pass"
    assert by_name["not_null_source_tpch_region_r_regionkey"].status == "pass"
    acc = next(k for k in by_name if k.startswith("accepted_values_source"))
    assert by_name[acc].status == "pass"
    rc = next(k for k in by_name if k.startswith("row_count_nonzero"))
    assert by_name[rc].status == "pass"
    # indirect selection reaches them from the source selector
    res = runner.test(select="source:tpch.region")
    assert len(res.results) == 4


def test_unit_test_overrides(make_project, spark):
    """Unit-test `overrides:` (reference UnitTestOverrides,
    unit_test_definition.py:40-43): macros.is_incremental forces the
    incremental branch with an `input: this` fixture for {{ this }};
    vars and env_vars shadow their lookups; a macro name overrides to a
    constant."""
    import os

    os.environ.pop("UT_ENV", None)
    files = {
        "dbt_project.yml": "name: uo\nmodel-paths: [models]\nseed-paths: [seeds]\n",
        "seeds/raw.csv": "id,v\n1,10\n2,20\n3,30\n",
        "models/inc.sql": (
            "{{ config(materialized='incremental') }}\n"
            "select id, v, '{{ var('tag', 'none') }}' as tag,\n"
            "       '{{ env_var('UT_ENV', 'unset') }}' as env_tag\n"
            "from {{ ref('raw') }}\n"
            "{% if is_incremental() %}"
            "where id > (select max(id) from {{ this }})"
            "{% endif %}"
        ),
        "models/schema.yml": (
            "version: 2\n"
            "unit_tests:\n"
            "  - name: ut_incremental_branch\n"
            "    model: inc\n"
            "    overrides:\n"
            "      macros: {is_incremental: true}\n"
            "      vars: {tag: from_override}\n"
            "      env_vars: {UT_ENV: env_override}\n"
            "    given:\n"
            "      - input: ref('raw')\n"
            "        rows:\n"
            "          - {id: 1, v: 10}\n"
            "          - {id: 5, v: 50}\n"
            "      - input: this\n"
            "        rows:\n"
            "          - {id: 1, v: 10, tag: x, env_tag: y}\n"
            "    expect:\n"
            "      rows:\n"
            "        - {id: 5, v: 50, tag: from_override,"
            " env_tag: env_override}\n"
            "  - name: ut_full_branch\n"
            "    model: inc\n"
            "    overrides:\n"
            "      macros: {is_incremental: false}\n"
            "    given:\n"
            "      - input: ref('raw')\n"
            "        rows:\n"
            "          - {id: 7, v: 70}\n"
            "    expect:\n"
            "      rows:\n"
            "        - {id: 7, v: 70, tag: none, env_tag: unset}\n"
    )
    }
    runner = make_project(files, schema="t_unit_ovr")
    assert runner.seed().ok
    assert runner.run().ok  # the model itself builds (first run)
    res = runner.test()
    by = {r.unique_id: r for r in res.results}
    ut1 = by["unit_test.uo.ut_incremental_branch"]
    ut2 = by["unit_test.uo.ut_full_branch"]
    assert ut1.status == "pass", ut1.message
    assert ut2.status == "pass", ut2.message


def test_unit_fixture_dict_key_order_and_sparse_rows(make_project, spark):
    """Schema-inferred fixtures (upstream not built): dict rows whose
    KEY ORDER differs must still bind values by name, and sparse rows
    NULL-fill (r12 core review #3 — tuple(r.values()) silently
    column-misaligned reordered rows and crashed on sparse ones).
    The swap fixture row {a: ..., id: ...} would have put a=2/id=20
    under the old zip; the filter then returns the WRONG rows."""
    files = {
        "dbt_project.yml": "name: uord\nmodel-paths: [models]\n",
        "models/pass_through.sql": (
            "select id, a from {{ ref('upstream') }} where a >= 10"
        ),
        "models/upstream.sql": "select 1 as id, 10 as a",
        "models/schema.yml": """
version: 2
unit_tests:
  - name: ut_key_order
    model: pass_through
    given:
      - input: ref('upstream')
        rows:
          - {id: 1, a: 10}
          - {a: 20, id: 2}
          - {id: 3}
    expect:
      rows:
        - {id: 1, a: 10}
        - {id: 2, a: 20}
""",
    }
    # upstream NOT built -> the schema-inferred path runs
    runner = make_project(files, schema="t_uord")
    res = runner.test()
    assert res.ok, [str(r.message) for r in res.results]


def test_severity_warn_skips_error_if(make_project, spark):
    """Reference core/dbt/task/test.py:274-289: under severity warn
    the outcome is driven by warn_if ALONE — error_if is only
    consulted under severity error. 5 failures with warn_if '> 10' /
    error_if '!= 0' must PASS (the old promotion warned)."""
    files = {
        "dbt_project.yml": "name: sev\nmodel-paths: [models]\ntest-paths: [tests]\n",
        "models/five_rows.sql": (
            "select * from (select explode(sequence(1, 5)) as id)"
        ),
        "tests/five_failures.sql": (
            "{{ config(severity='warn', warn_if='> 10', error_if='!= 0') }}\n"
            "select * from {{ ref('five_rows') }}"
        ),
    }
    runner = make_project(files, schema="t_sev")
    assert runner.run().ok
    res = runner.test()
    assert res.ok
    tr = next(r for r in res.results if "five_failures" in r.unique_id)
    assert tr.status == "pass", tr.status


def test_unit_test_manifest_fqn_includes_subdirs(make_project, spark):
    """ADVICE r14: the writable manifest's unit_test fqn must be
    path-derived ([pkg, *subdirs, name]) like models/seeds, so the
    artifact agrees with what fqn-based selection actually matches for
    unit tests defined in subdirectory yml files."""
    import json as _json
    import os as _os

    files = {
        "dbt_project.yml": "name: utf\nmodel-paths: [models]\n",
        "models/marts/m.sql": "select 1 as id",
        "models/marts/schema.yml": """
unit_tests:
  - name: ut_m
    model: m
    given: []
    expect:
      rows:
        - {id: 1}
""",
    }
    runner = make_project(files, schema="t_utfqn")
    assert runner.build().ok
    with open(_os.path.join(runner.project.target_dir, "manifest.json")) as f:
        manifest = _json.load(f)
    fqn = manifest["unit_tests"]["unit_test.utf.ut_m"]["fqn"]
    assert fqn == ["utf", "marts", "ut_m"], fqn


def test_store_failures_limit_and_single_execution(make_project, spark):
    """r15 review: with store_failures the failing rows are written
    ONCE (limit applied at store time) and the fail count reads from
    the stored audit table — the old path executed the test query
    twice."""
    files = {
        "dbt_project.yml": "name: sfl\nmodel-paths: [models]\ntest-paths: [tests]\n",
        "models/five.sql": "select explode(sequence(1, 5)) as id",
        "tests/always_fails.sql": (
            "{{ config(store_failures=true, limit=2, severity='warn') }}\n"
            "select * from {{ ref('five') }}"
        ),
    }
    runner = make_project(files, schema="t_sfl")
    assert runner.run().ok
    res = runner.test()
    tr = res.results[0]
    assert tr.status == "warn"
    # fail count honors the limit (counted from the stored rows)
    assert tr.failures == 2
    assert spark.table("t_sfl_dbt_test__audit.always_fails").count() == 2


def test_unit_test_sparse_expect_and_two_arg_ref(make_project, spark):
    """r15 review: (1) a sparse expect whose FIRST row lacks a column
    still compares that column; (2) ref('package', 'model') fixture
    inputs parse (the model name is the last string)."""
    files = {
        "dbt_project.yml": "name: utsp\nmodel-paths: [models]\n",
        "models/base.sql": "select 1 as id, 'x' as tag",
        "models/m.sql": "select id, tag from {{ ref('base') }}",
        "models/schema.yml": """
unit_tests:
  - name: ut_sparse
    model: m
    given:
      - input: ref('utsp', 'base')
        rows:
          - {id: 1, tag: WRONG}
    expect:
      rows:
        - {id: 1}
""",
    }
    runner = make_project(files, schema="t_utsp")
    assert runner.run().ok
    res = runner.test()
    tr = next(r for r in res.results if "ut_sparse" in r.unique_id)
    # columns absent from the expect fixture are not compared (dbt
    # semantics), so 'tag' is ignored and only id=1 checks — PASS.
    # The load-bearing part: the two-arg ref('utsp', 'base') fixture
    # input parsed (it previously errored 'cannot parse fixture
    # input') and redirected the model's ref to the fixture row.
    assert tr.status == "pass", tr.message

    # now a sparse expect where a LATER row introduces the column
    files["models/schema.yml"] = """
unit_tests:
  - name: ut_sparse2
    model: m
    given:
      - input: ref('base')
        format: dict
        rows:
          - {id: 1, tag: a}
          - {id: 2}
    expect:
      rows:
        - {id: 1, tag: a}
        - {id: 2, tag: null}
"""
    runner2 = make_project(files, schema="t_utsp")
    res2 = runner2.test()
    tr2 = next(r for r in res2.results if "ut_sparse2" in r.unique_id)
    assert tr2.status == "pass", tr2.message
