"""Phase-0 exit test (SURVEY.md §7): seed → ephemeral/view staging →
joined+aggregated mart table; golden relational equality, mirroring
the reference's ``tests/functional/basic/test_simple_reference.py``.
"""

from __future__ import annotations

USERS_CSV_HEADER = "id,first_name,last_name,email,gender,ip_address\n"


def users_csv(n: int, start: int = 1) -> str:
    rows = [USERS_CSV_HEADER]
    for i in range(start, start + n):
        gender = "Male" if i % 5 != 0 else "Female"  # 80/20
        rows.append(f"{i},First{i},Last{i},u{i}@example.com,{gender},10.0.0.{i % 256}\n")
    return "".join(rows)


PROJECT = {
    "dbt_project.yml": """
name: basic_ref
model-paths: [models]
seed-paths: [seeds]
models:
  basic_ref:
    +materialized: view
""",
    "seeds/users.csv": users_csv(100),
    "models/ephemeral_users.sql": (
        "{{ config(materialized='ephemeral') }}\n"
        "select id, gender from {{ ref('users') }}"
    ),
    "models/users_view.sql": "select * from {{ ref('users') }}",
    "models/users_table.sql": (
        "{{ config(materialized='table') }}\n"
        "select * from {{ ref('users') }}"
    ),
    "models/gender_summary.sql": (
        "{{ config(materialized='table') }}\n"
        "select gender, count(*) as ct from {{ ref('ephemeral_users') }} "
        "group by gender order by gender asc"
    ),
}


def test_seed_run_flow(make_project, spark):
    runner = make_project(PROJECT, schema="t_basic")
    seed_res = runner.seed()
    assert seed_res.ok, [r.message for r in seed_res.results]
    run_res = runner.run()
    assert run_res.ok, [r.message for r in run_res.results]

    # golden: 100 rows, 20 female / 80 male
    assert spark.table("t_basic.users").count() == 100
    assert spark.table("t_basic.users_view").count() == 100
    rows = {
        r["gender"]: r["ct"]
        for r in spark.table("t_basic.gender_summary").collect()
    }
    assert rows == {"Female": 20, "Male": 80}

    # ephemeral model must NOT be materialized (compilation.py:302-392)
    tables = {t.name for t in spark.catalog.listTables("t_basic")}
    assert "ephemeral_users" not in tables
    # view is a view, table is a table
    kinds = {t.name: t.tableType for t in spark.catalog.listTables("t_basic")}
    assert kinds["users_view"] == "VIEW"
    assert kinds["gender_summary"] in ("EXTERNAL", "MANAGED")

    # compiled SQL has the CTE spliced in
    manifest_node = runner.manifest.nodes["model.basic_ref.gender_summary"]
    assert "__dbt__cte__ephemeral_users" in manifest_node.compiled_code


def test_seed_rerun_is_idempotent(make_project, spark):
    runner = make_project(PROJECT, schema="t_basic2")
    assert runner.seed().ok
    assert runner.run().ok
    assert runner.seed().ok  # replace, not append
    assert runner.run().ok
    assert spark.table("t_basic2.users").count() == 100


def test_show_inline(make_project, spark):
    runner = make_project(PROJECT, schema="t_basic3")
    runner.seed()
    runner.run()
    df = runner.show(inline="select count(*) as n from {{ ref('users') }}", limit=5)
    assert df.collect()[0]["n"] == 100


def test_persist_docs_comments(make_project, spark):
    """persist_docs {relation, columns} writes descriptions as catalog
    comments (reference adapter macro persist_docs,
    tests/functional/docs)."""
    files = {
        "dbt_project.yml": "name: pd\nmodel-paths: [models]\n",
        "models/commented.sql": (
            "{{ config(materialized='table', "
            "persist_docs={'relation': true, 'columns': true}) }}\n"
            "select 1 as a, 'x' as b"
        ),
        "models/viewed.sql": (
            "{{ config(materialized='view', "
            "persist_docs={'relation': true}) }}\nselect 2 as c"
        ),
        "models/schema.yml": """
version: 2
models:
  - name: commented
    description: "the o'clock table"
    columns:
      - name: a
        description: "column a docs"
  - name: viewed
    description: "a documented view"
""",
    }
    runner = make_project(files, schema="t_pdocs")
    res = runner.run()
    assert res.ok, [r.message for r in res.results]
    desc = spark.sql("describe extended t_pdocs.commented").collect()
    cols = {r["col_name"]: r["comment"] for r in desc if r["col_name"]}
    assert cols.get("a") == "column a docs"
    props = {r["col_name"]: r["data_type"] for r in desc}
    assert "the o'clock table" in str(props.get("Comment", "")) or any(
        "the o'clock table" in str(r) for r in desc
    )
    # view comment surfaces as the Comment row of DESCRIBE EXTENDED
    # (Spark folds the 'comment' tblproperty into view metadata)
    vdesc = spark.sql("describe extended t_pdocs.viewed").collect()
    vmeta = {r["col_name"]: r["data_type"] for r in vdesc}
    assert vmeta.get("Comment") == "a documented view"
