"""Bucketed tables (bucket_by/buckets/sort_by configs): the co-located
join layout — two tables bucketed the same way join without a shuffle
(Spark CLUSTERED BY ... INTO n BUCKETS; the 100 TB repeated-join path
called out in PLANS.md)."""

from __future__ import annotations


FILES = {
    "dbt_project.yml": "name: bk\nmodel-paths: [models]\n",
    "models/fact.sql": (
        "{{ config(materialized='table', bucket_by='k', buckets=4, "
        "sort_by='k') }}\n"
        "select id % 50 as k, id as amount from range(1000)"
    ),
    "models/dim.sql": (
        "{{ config(materialized='table', bucket_by='k', buckets=4) }}\n"
        "select id as k, concat('name_', id) as name from range(50)"
    ),
}


def test_bucketed_join_no_shuffle(make_project, spark):
    runner = make_project(FILES, schema="t_bk")
    assert runner.run().ok, [r.message for r in runner.run().results]
    # both sides bucketed on k into 4 buckets -> SortMergeJoin with no
    # Exchange on either side (disable broadcast so the join strategy
    # actually exercises the bucket layout)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_bk.fact").join(spark.table("t_bk.dim"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_table_correct_and_replayed(make_project, spark, tmp_path):
    from sparkt.adapter import SparkAdapter
    from sparkt.relation import Relation

    runner = make_project(FILES, schema="t_bk2")
    assert runner.run().ok
    total = spark.sql("select sum(amount) s from t_bk2.fact").first()["s"]
    assert total == sum(range(1000))
    # simulate a fresh process: drop from the session catalog, then
    # rebuild an adapter over the same warehouse -> bucketed replay
    spark.sql("DROP TABLE t_bk2.fact")
    adapter = SparkAdapter(spark, runner.adapter.warehouse_dir)
    assert adapter.relation_exists(Relation(schema="t_bk2", identifier="fact"))
    desc = spark.sql("DESCRIBE EXTENDED t_bk2.fact").collect()
    desc_txt = "\n".join(str(r) for r in desc)
    assert "Num Buckets" in desc_txt and "4" in desc_txt
    assert (
        spark.sql("select sum(amount) s from t_bk2.fact").first()["s"] == total
    )
