"""Snapshot SCD-2 semantics (reference:
tests/functional/simple_snapshot/fixtures.py, incl. the
lead(dbt_valid_from) validity-interval invariant at lines 138-148)."""

from __future__ import annotations

import os


def _seed(rows):
    return "id,name,status\n" + "".join(f"{i},{n},{s}\n" for i, n, s in rows)


FILES = {
    "dbt_project.yml": (
        "name: snap\nseed-paths: [seeds]\nsnapshot-paths: [snapshots]\n"
    ),
    "seeds/items.csv": _seed([(1, "a", "new"), (2, "b", "new"), (3, "c", "new")]),
    "snapshots/items_snap.sql": """
{% snapshot items_snap %}
{{ config(strategy='check', unique_key='id', check_cols=['status']) }}
select * from {{ ref('items') }}
{% endsnapshot %}
""",
}


def test_snapshot_check_strategy(make_project, spark):
    runner = make_project(FILES, schema="t_snap")
    assert runner.seed().ok
    assert runner.snapshot().ok
    t = spark.table("t_snap.items_snap")
    assert t.count() == 3
    assert t.filter("dbt_valid_to is null").count() == 3
    meta = {"dbt_scd_id", "dbt_updated_at", "dbt_valid_from", "dbt_valid_to"}
    assert meta <= set(t.columns)

    # change one row, add one row
    root = runner.project.project_root
    with open(os.path.join(root, "seeds/items.csv"), "w") as f:
        f.write(_seed([(1, "a", "sold"), (2, "b", "new"), (3, "c", "new"),
                       (4, "d", "new")]))
    assert runner.seed().ok
    assert runner.snapshot().ok
    t = spark.table("t_snap.items_snap")
    assert t.count() == 5  # 3 originals + 1 new version of id=1 + id=4
    cur = t.filter("dbt_valid_to is null")
    assert cur.count() == 4
    assert cur.filter("id = 1").first()["status"] == "sold"
    closed = t.filter("dbt_valid_to is not null")
    assert closed.count() == 1 and closed.first()["id"] == 1

    # unchanged rerun: no new versions
    assert runner.snapshot().ok
    assert spark.table("t_snap.items_snap").count() == 5

    # validity-interval invariant (fixtures.py:138-148): for each id,
    # lead(dbt_valid_from) == dbt_valid_to
    bad = spark.sql(
        """
        select * from (
          select id, dbt_valid_to,
                 lead(dbt_valid_from) over (partition by id
                                            order by dbt_valid_from) as nxt
          from t_snap.items_snap)
        where (dbt_valid_to is null) != (nxt is null)
           or (dbt_valid_to is not null and dbt_valid_to != nxt)
        """
    )
    assert bad.count() == 0


def test_snapshot_check_all(make_project, spark):
    files = dict(FILES)
    files["snapshots/items_snap.sql"] = """
{% snapshot items_snap %}
{{ config(strategy='check', unique_key='id', check_cols='all') }}
select * from {{ ref('items') }}
{% endsnapshot %}
"""
    runner = make_project(files, schema="t_snap_all")
    assert runner.seed().ok
    assert runner.snapshot().ok
    root = runner.project.project_root
    with open(os.path.join(root, "seeds/items.csv"), "w") as f:
        f.write(_seed([(1, "a2", "new"), (2, "b", "new"), (3, "c", "new")]))
    assert runner.seed().ok
    assert runner.snapshot().ok
    t = spark.table("t_snap_all.items_snap")
    assert t.count() == 4  # name change on id=1 detected via check 'all'


def test_snapshot_check_empty_cols_raises(make_project, spark):
    """check strategy where every data column is in unique_key must be
    rejected up front (would compile to invalid SQL 'changed = ()')."""
    files = {
        "dbt_project.yml": "name: snapx\nmodel-paths: [models]\nsnapshot-paths: [snapshots]\n",
        "models/src_only_keys.sql": "select 1 as id",
        "snapshots/empty_check.sql": (
            "{% snapshot empty_check %}\n"
            "{{ config(target_schema='t_snap_ec', unique_key='id', "
            "strategy='check', check_cols='all') }}\n"
            "select id from {{ ref('src_only_keys') }}\n"
            "{% endsnapshot %}"
        ),
    }
    runner = make_project(files, schema="t_snap_ec")
    assert runner.run().ok
    res = runner.snapshot()
    assert not res.ok
    msg = " ".join(str(r.message) for r in res.results)
    assert "check_cols" in msg
