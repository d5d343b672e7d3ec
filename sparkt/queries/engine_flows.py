"""Engine-materialization gate queries: run a real sparkt project
(parse → DAG → materialize) inside the query callable and return the
resulting table, with an ANSI-SQL oracle describing the end state.

This puts the *engine semantics* (incremental merge, SCD-2 snapshots,
seed typing) under the driver's duckdb hash check — the strongest
form of the reference's golden-relational-equality tests
(``core/dbt/tests/util.py:396`` check_relations_equal).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from contextlib import contextmanager


@contextmanager
def _low_shuffle(spark, n: int = 8):
    """Clamp ``spark.sql.shuffle.partitions`` for a gate-scale flow.

    Structured Streaming fixes its state-store partition count from this
    conf at query start and AQE never coalesces streaming stages, so the
    driver's default 200 partitions means 200 tasks per microbatch for a
    handful of output rows (round-2 verdict: stage 87/90 ran 200 tasks
    for 23 rows). Gate checkpoints are fresh per run, so clamping is
    safe here; at production scale the caller sizes this to the cluster.
    """
    key = "spark.sql.shuffle.partitions"
    try:
        old = spark.conf.get(key)
    except Exception:  # noqa: BLE001 - conf unset
        old = None
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def _write(root: str, files: dict[str, str]) -> None:
    for rel, content in files.items():
        path = os.path.join(root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(content)


def _schema_for(prefix: str, sf_dir: str) -> str:
    return f"{prefix}_{hashlib.md5(sf_dir.encode()).hexdigest()[:6]}"


def _sources_yml(sf_dir: str) -> str:
    return f"""
version: 2
sources:
  - name: tpch
    schema: tpch
    tables:
      - name: orders
        external: {{location: {sf_dir}/orders.parquet}}
"""


# ------------------------------------------------------------------ m1
def m1_incremental_merge(spark, sf_dir):
    """Two-batch incremental merge: batch 1 loads orders before 1998;
    batch 2 re-selects everything from 1997 on (overlap ⇒ merge on
    unique_key, new keys ⇒ insert). Final state must equal the oracle's
    set expression."""
    from sparkt.runner import Runner

    proj = tempfile.mkdtemp(prefix="sparkt_m1_")
    schema = _schema_for("m1", sf_dir)
    _write(
        proj,
        {
            "dbt_project.yml": "name: flows\nmodel-paths: [models]\n",
            "models/sources.yml": _sources_yml(sf_dir),
            "models/orders_incr.sql": """
{{ config(materialized='incremental', unique_key='o_orderkey', incremental_strategy='merge') }}
select o_orderkey, o_custkey, o_orderstatus,
       round(o_totalprice, 2) as totalprice, o_orderdate
from {{ source('tpch', 'orders') }}
{% if var('batch') == 1 %}
where o_orderdate < timestamp'1998-01-01'
{% else %}
where o_orderdate >= timestamp'1997-01-01'
{% endif %}
""",
        },
    )
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    with _low_shuffle(spark):
        r1 = Runner(proj, spark=spark, cli_vars={"batch": 1},
                    project_overrides={"schema": schema})
        res1 = r1.run()
        assert res1.ok, [x.message for x in res1.results]
        r2 = Runner(proj, spark=spark, cli_vars={"batch": 2},
                    project_overrides={"schema": schema})
        res2 = r2.run()
        assert res2.ok, [x.message for x in res2.results]
    return spark.table(f"{schema}.orders_incr").orderBy("o_orderkey")


M1_SQL = """
WITH b1 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         round(o_totalprice, 2) AS totalprice, o_orderdate
  FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'),
b2 AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         round(o_totalprice, 2) AS totalprice, o_orderdate
  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')
SELECT * FROM b2
UNION ALL
SELECT * FROM b1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
ORDER BY o_orderkey
"""


# ------------------------------------------------------------------ m2
def m2_snapshot_scd2(spark, sf_dir):
    """SCD-2 snapshot (timestamp strategy) over two source states:
    state 1 = pre-1997 orders; state 2 doubles their price with a
    +180-day updated_at (all state-1 keys change) and adds the rest.
    All snapshot timestamps derive from data columns, so the result is
    fully deterministic and oracle-checkable."""
    from sparkt.runner import Runner

    proj = tempfile.mkdtemp(prefix="sparkt_m2_")
    schema = _schema_for("m2", sf_dir)
    _write(
        proj,
        {
            "dbt_project.yml": "name: flows\nsnapshot-paths: [snapshots]\nmodel-paths: [models]\n",
            "models/sources.yml": _sources_yml(sf_dir),
            "snapshots/orders_snap.sql": """
{% snapshot orders_snap %}
{{ config(strategy='timestamp', unique_key='id', updated_at='updated_at') }}
{% if var('batch') == 1 %}
select o_orderkey as id, o_orderstatus as status,
       round(o_totalprice, 2) as price, o_orderdate as updated_at
from {{ source('tpch', 'orders') }}
where o_orderdate < timestamp'1997-01-01'
{% else %}
select o_orderkey as id, o_orderstatus as status,
       case when o_orderdate < timestamp'1997-01-01'
            then round(o_totalprice * 2, 2) else round(o_totalprice, 2) end as price,
       case when o_orderdate < timestamp'1997-01-01'
            then o_orderdate + interval 180 days else o_orderdate end as updated_at
from {{ source('tpch', 'orders') }}
{% endif %}
{% endsnapshot %}
""",
        },
    )
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    with _low_shuffle(spark):
        r1 = Runner(proj, spark=spark, cli_vars={"batch": 1},
                    project_overrides={"schema": schema})
        res1 = r1.snapshot()
        assert res1.ok, [x.message for x in res1.results]
        r2 = Runner(proj, spark=spark, cli_vars={"batch": 2},
                    project_overrides={"schema": schema})
        res2 = r2.snapshot()
        assert res2.ok, [x.message for x in res2.results]
    return (
        spark.table(f"{schema}.orders_snap")
        .select("id", "status", "price", "dbt_valid_from", "dbt_valid_to")
        .orderBy("id", "dbt_valid_from")
    )


M2_SQL = """
WITH v1 AS (
  SELECT o_orderkey AS id, o_orderstatus AS status,
         round(o_totalprice, 2) AS price, o_orderdate AS updated_at
  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
v2 AS (
  SELECT o_orderkey AS id, o_orderstatus AS status,
         CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
              THEN round(o_totalprice * 2, 2) ELSE round(o_totalprice, 2) END AS price,
         CASE WHEN o_orderdate < TIMESTAMP '1997-01-01'
              THEN o_orderdate + INTERVAL 180 DAY ELSE o_orderdate END AS updated_at
  FROM orders)
-- closed-out first versions of keys that changed
SELECT v1.id, v1.status, v1.price,
       v1.updated_at AS dbt_valid_from, v2.updated_at AS dbt_valid_to
FROM v1 JOIN v2 ON v1.id = v2.id
UNION ALL
-- current versions (changed keys' new version + brand-new keys)
SELECT id, status, price, updated_at AS dbt_valid_from,
       CAST(NULL AS TIMESTAMP) AS dbt_valid_to
FROM v2
ORDER BY id, dbt_valid_from
"""


# ------------------------------------------------------------------ m3
SEED_CSV = """id,name,val,joined
1,alice,1.5,2021-01-01
2,bob,2.25,2021-06-15
3,,3.75,2022-03-10
4,dave,,2023-11-30
"""


def m3_seed_types(spark, sf_dir):
    """Seed CSV typing round-trip: header, type inference (int, double,
    date), empty string → NULL (SURVEY.md §7 agate-inference parity)."""
    from sparkt.runner import Runner

    proj = tempfile.mkdtemp(prefix="sparkt_m3_")
    schema = _schema_for("m3", sf_dir)
    _write(
        proj,
        {
            "dbt_project.yml": (
                "name: flows\nseed-paths: [seeds]\n"
                "seeds:\n  +column_types: {joined: timestamp}\n"
            ),
            "seeds/people.csv": SEED_CSV,
        },
    )
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    r = Runner(proj, spark=spark, project_overrides={"schema": schema})
    res = r.seed()
    assert res.ok, [x.message for x in res.results]
    return spark.table(f"{schema}.people").orderBy("id")


M3_SQL = """
SELECT * FROM (VALUES
  (1, 'alice', 1.5::DOUBLE, TIMESTAMP '2021-01-01'),
  (2, 'bob', 2.25::DOUBLE, TIMESTAMP '2021-06-15'),
  (3, NULL, 3.75::DOUBLE, TIMESTAMP '2022-03-10'),
  (4, 'dave', NULL::DOUBLE, TIMESTAMP '2023-11-30')
) AS t(id, name, val, joined)
ORDER BY id
"""


# ------------------------------------------------------------------ m4
def m4_insert_overwrite(spark, sf_dir):
    """Partitioned insert_overwrite: batch 1 loads all orders
    partitioned by year; batch 2 recomputes ONLY year-2000 rows with
    doubled price — dynamic partition overwrite must replace exactly
    that partition (the no-rewrite scale path from PLANS.md)."""
    from sparkt.runner import Runner

    proj = tempfile.mkdtemp(prefix="sparkt_m4_")
    schema = _schema_for("m4", sf_dir)
    _write(
        proj,
        {
            "dbt_project.yml": "name: flows\nmodel-paths: [models]\n",
            "models/sources.yml": _sources_yml(sf_dir),
            "models/orders_part.sql": """
{{ config(materialized='incremental', incremental_strategy='insert_overwrite',
          partition_by='order_year') }}
select o_orderkey,
       round(o_totalprice{% if var('batch') == 2 %} * 2{% endif %}, 2) as totalprice,
       year(o_orderdate) as order_year
from {{ source('tpch', 'orders') }}
{% if is_incremental() %}
where year(o_orderdate) = 2000
{% endif %}
""",
        },
    )
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    r1 = Runner(proj, spark=spark, cli_vars={"batch": 1},
                project_overrides={"schema": schema})
    res1 = r1.run()
    assert res1.ok, [x.message for x in res1.results]
    r2 = Runner(proj, spark=spark, cli_vars={"batch": 2},
                project_overrides={"schema": schema})
    res2 = r2.run()
    assert res2.ok, [x.message for x in res2.results]
    return spark.table(f"{schema}.orders_part").orderBy("o_orderkey")


M4_SQL = """
SELECT o_orderkey,
       CASE WHEN year(o_orderdate) = 2000
            THEN round(o_totalprice * 2, 2)
            ELSE round(o_totalprice, 2) END AS totalprice,
       year(o_orderdate) AS order_year
FROM orders
ORDER BY o_orderkey
"""


# ----------------------------------------------------------------- m11
def m11_materialized_view(spark, sf_dir):
    """materialized_view emulation (table + recorded refresh query —
    Spark has no managed MVs, the SURVEY §2.1 documented divergence):
    batch 1 creates the MV; batch 2 changes the definition (adds a
    status filter) and ``on_configuration_change='apply'`` refreshes it
    in place. The final content must equal the batch-2 definition —
    proving both the create and the changed-definition refresh paths."""
    from sparkt.runner import Runner

    proj = tempfile.mkdtemp(prefix="sparkt_m11_")
    schema = _schema_for("m11", sf_dir)
    _write(
        proj,
        {
            "dbt_project.yml": "name: flows\nmodel-paths: [models]\n",
            "models/sources.yml": _sources_yml(sf_dir),
            "models/order_mv.sql": """
{{ config(materialized='materialized_view', on_configuration_change='apply') }}
select o_orderpriority,
       count(*) as n_orders,
       round(sum(o_totalprice), 2) as total
from {{ source('tpch', 'orders') }}
{% if var('batch') == 2 %}where o_orderstatus = 'F'{% endif %}
group by o_orderpriority
""",
        },
    )
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    for batch in (1, 2):
        r = Runner(proj, spark=spark, cli_vars={"batch": batch},
                   project_overrides={"schema": schema})
        res = r.run()
        assert res.ok, [x.message for x in res.results]
    return spark.table(f"{schema}.order_mv").orderBy("o_orderpriority")


M11_SQL = """
SELECT o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ------------------------------------------------------------------ m5
def m5_python_model(spark, sf_dir):
    """Python model (model(dbt, session) -> DataFrame, ADR-004 native
    design) materialized as a table and oracle-checked."""
    from sparkt.runner import Runner

    proj = tempfile.mkdtemp(prefix="sparkt_m5_")
    schema = _schema_for("m5", sf_dir)
    _write(
        proj,
        {
            "dbt_project.yml": "name: flows\nmodel-paths: [models]\n",
            "models/sources.yml": _sources_yml(sf_dir),
            "models/orders_py.py": '''
import pyspark.sql.functions as F


def model(dbt, session):
    dbt.config(materialized="table")
    orders = dbt.source("tpch", "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
''',
        },
    )
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    r = Runner(proj, spark=spark, project_overrides={"schema": schema})
    res = r.run()
    assert res.ok, [x.message for x in res.results]
    return spark.table(f"{schema}.orders_py").orderBy("o_orderpriority")


M5_SQL = """
SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ------------------------------------------------------------------ m6
def m6_streaming_ingest(spark, sf_dir):
    """Structured Streaming ingestion (availableNow, exactly-once) of
    the events table with a projection/filter transform; the drained
    output equals the batch oracle. ns timestamps repaired in the
    transform (sparkt/sources.py)."""
    from pyspark.sql import functions as F

    from sparkt.sources import ns_timestamp_columns, repair_event_time
    from sparkt.streaming.incremental import stream_append

    src = os.path.join(sf_dir, "events.parquet")
    work = tempfile.mkdtemp(prefix="sparkt_m6_")
    tgt = os.path.join(work, "target")
    cp = os.path.join(work, "checkpoint")
    ns_cols = ns_timestamp_columns(src)

    def transform(stream):
        out = repair_event_time(stream, ns_cols)
        return out.filter(F.col("event_type") != "error").select(
            "event_id", "ts", "user_id", "event_type",
            F.round("value", 2).alias("value"),
        )

    with _low_shuffle(spark):
        stream_append(spark, src, tgt, cp, transform=transform)
    return spark.read.parquet(tgt).orderBy("event_id")


M6_SQL = """
SELECT event_id, ts, user_id, event_type, round(value, 2) AS value
FROM events
WHERE event_type != 'error'
ORDER BY event_id
"""


# ------------------------------------------------------------------ m7
def m7_streaming_window(spark, sf_dir):
    """Watermarked tumbling-window aggregation as a stream (availableNow
    drain): hourly event counts per event_type. Append-mode watermark
    semantics: with a 0-second watermark the final watermark equals
    max(ts), so only windows that END at or before it are finalized and
    emitted — the oracle applies the same cutoff (this is the
    deterministic late-data contract, not an approximation)."""
    from pyspark.sql import functions as F

    from sparkt.sources import ns_timestamp_columns, repair_event_time
    from sparkt.streaming.incremental import run_windowed_stream

    src = os.path.join(sf_dir, "events.parquet")
    work = tempfile.mkdtemp(prefix="sparkt_m7_")
    tgt = os.path.join(work, "target")
    cp = os.path.join(work, "checkpoint")
    ns_cols = ns_timestamp_columns(src)

    def transform(stream):
        return repair_event_time(stream, ns_cols)

    with _low_shuffle(spark):
        run_windowed_stream(
            spark, src, tgt, cp, ts_col="ts", window_duration="1 hour",
            group_cols=["event_type"], transform=transform,
        )
    return (
        spark.read.parquet(tgt)
        .select("window_start", "event_type", "n_events")
        .orderBy("window_start", "event_type")
    )


M7_SQL = """
WITH mx AS (SELECT max(ts) AS max_ts FROM events)
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events
FROM events
GROUP BY 1, 2
HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= (SELECT max_ts FROM mx)
ORDER BY window_start, event_type
"""


# ------------------------------------------------------------------ m8
def m8_stateful_sessions(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user gap sessionization of the events stream via availableNow.
    Emitted = inline closures (a >gap silence inside the batch) plus
    timeout closures from the final no-data microbatch, where the
    watermark (= global max ts) has advanced beyond last_event + gap.
    Deterministic: a trailing session stays open only for users active
    within the last gap of the stream. The oracle reproduces exactly
    that with the q17 window-sum formulation."""
    from pyspark.sql import functions as F

    from sparkt.streaming.stateful import stateful_sessionize

    src = os.path.join(sf_dir, "events.parquet")
    work = tempfile.mkdtemp(prefix="sparkt_m8_")
    tgt = os.path.join(work, "target")
    cp = os.path.join(work, "checkpoint")
    from sparkt.sources import (
        ensure_nanos_conf, ns_timestamp_columns, repair_event_time,
    )

    ensure_nanos_conf(spark)
    schema = spark.read.parquet(src).schema
    stream = repair_event_time(
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(src),
        ns_timestamp_columns(src),
    )
    with _low_shuffle(spark):
        q = (
            stateful_sessionize(stream, gap="30 minutes")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", tgt)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(tgt)
        .select("user_id", "session_start", "session_end", "n_events")
        .repartition(1)
        .sortWithinPartitions("user_id", "session_start")
    )


M8_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
numbered AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged),
sess AS (
  SELECT user_id, sess_id,
         min(ts) AS session_start, max(ts) AS session_end,
         count(*) AS n_events
  FROM numbered GROUP BY user_id, sess_id)
SELECT user_id, session_start, session_end, n_events
FROM sess
WHERE sess_id < (SELECT max(s2.sess_id) FROM sess s2
                 WHERE s2.user_id = sess.user_id)
   OR session_end + INTERVAL 30 MINUTE < (SELECT max(ts) FROM events)
ORDER BY user_id, session_start
"""


# ------------------------------------------------------------------ m9
def m9_stream_stream_join(spark, sf_dir):
    """Watermarked stream-stream interval join (the canonical
    Structured Streaming two-input stateful operator): purchases
    stream ⋈ clicks stream on user_id with the click inside the 30
    minutes before the purchase. Both sides drain via availableNow;
    the INNER interval join emits exactly the matching pairs (the
    watermark + time-range constraint bound join STATE — at scale
    clicks older than purchase_watermark - 30min are evicted — they
    never change inner-join results). Output aggregated batch-side to
    match a2_range_join's oracle shape."""
    from pyspark.sql import functions as F

    from sparkt.sources import (
        ensure_nanos_conf, ns_timestamp_columns, repair_event_time,
    )

    ensure_nanos_conf(spark)
    src = os.path.join(sf_dir, "events.parquet")
    work = tempfile.mkdtemp(prefix="sparkt_m9_")
    tgt = os.path.join(work, "target")
    cp = os.path.join(work, "checkpoint")
    schema = spark.read.parquet(src).schema

    def stream():
        return repair_event_time(
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(src),
            ns_timestamp_columns(src),
        )

    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        stream()
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            "p_user = c_user AND c_ts >= p_ts - INTERVAL 30 MINUTES"
            " AND c_ts <= p_ts"
        ),
    ).select("purchase_id", "click_id")
    with _low_shuffle(spark):
        q = (
            joined.writeStream.format("parquet")
            .outputMode("append")
            .option("path", tgt)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(tgt)
        .groupBy("purchase_id")
        .agg(F.countDistinct("click_id").alias("n_recent_clicks"))
        .orderBy("purchase_id")
    )


M9_SQL = """
SELECT p.event_id AS purchase_id, count(DISTINCT c.event_id) AS n_recent_clicks
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
GROUP BY p.event_id
ORDER BY purchase_id
"""


# ----------------------------------------------------------------- m10
def m10_stream_dedup(spark, sf_dir):
    """Stateful streaming deduplication — the duplicate-delivery /
    exactly-once pattern: the source delivers every event TWICE (two
    file copies, at-least-once semantics); ``dropDuplicates`` on the
    event key holds seen-keys in the state store so the drained output
    carries each event exactly once. At scale the state is bounded with
    ``dropDuplicatesWithinWatermark`` (keys older than the watermark
    are evicted — same operator, bounded memory); the availableNow
    drain here processes both copies in one run, where the unbounded
    form is exact. Oracle: the batch table itself (each event once)."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from sparkt.sources import ns_timestamp_columns, repair_event_time
    from sparkt.streaming.incremental import stream_append

    src = os.path.join(sf_dir, "events.parquet")
    work = tempfile.mkdtemp(prefix="sparkt_m10_")
    dup_src = os.path.join(work, "src")
    os.makedirs(dup_src)
    # duplicate delivery: the same payload arrives as two files
    if os.path.isdir(src):
        _sh.copytree(src, os.path.join(dup_src, "copy_a"))
        _sh.copytree(src, os.path.join(dup_src, "copy_b"))
    else:
        _sh.copy(src, os.path.join(dup_src, "copy_a.parquet"))
        _sh.copy(src, os.path.join(dup_src, "copy_b.parquet"))
    tgt = os.path.join(work, "target")
    cp = os.path.join(work, "checkpoint")
    ns_cols = ns_timestamp_columns(src)

    def transform(stream):
        out = repair_event_time(stream, ns_cols)
        return out.select(
            "event_id", "ts", "user_id", "event_type",
            F.round("value", 2).alias("value"),
        ).dropDuplicates(["event_id"])

    with _low_shuffle(spark):
        stream_append(spark, dup_src, tgt, cp, transform=transform)
    return spark.read.parquet(tgt).orderBy("event_id")


M10_SQL = """
SELECT event_id, ts, user_id, event_type, round(value, 2) AS value
FROM events
ORDER BY event_id
"""


# ----------------------------------------------------------------- m12
def m12_microbatch(spark, sf_dir):
    """Microbatch incremental strategy (dbt 1.9 semantics — extension;
    the reference snapshot predates it): a daily event rollup built in
    two invocations — a 15-day initial backfill from ``begin``, then an
    explicit backfill window that OVERLAPS day 15 (idempotent window
    replace) and extends through day 30. Refs/sources declaring
    ``event_time`` compile per-batch to window-filtered subqueries, so
    each batch scans only its slice. Final state must equal the
    whole-range rollup."""
    from sparkt.runner import Runner

    proj = tempfile.mkdtemp(prefix="sparkt_m12_")
    schema = _schema_for("m12", sf_dir)
    _write(
        proj,
        {
            "dbt_project.yml": "name: flows\nmodel-paths: [models]\n",
            "models/sources.yml": f"""
version: 2
sources:
  - name: evsrc
    schema: evsrc
    tables:
      - name: events
        config: {{event_time: ts}}
        external: {{location: {sf_dir}/events.parquet}}
""",
            "models/daily_rollup.sql": """
{{ config(materialized='incremental', incremental_strategy='microbatch',
          event_time='day', batch_size='day', begin='2024-01-01',
          lookback=1, concurrent_batches=true) }}
select date_trunc('day', ts) as day, event_type,
       count(*) as n, round(sum(value), 2) as total
from {{ source('evsrc', 'events') }}
group by date_trunc('day', ts), event_type
""",
        },
    )
    spark.sql(f"DROP DATABASE IF EXISTS {schema} CASCADE")
    with _low_shuffle(spark):
        r1 = Runner(proj, spark=spark, project_overrides={"schema": schema})
        res1 = r1.run(event_time_end="2024-01-09 00:00:00")
        assert res1.ok, [x.message for x in res1.results]
        res2 = r1.run(
            event_time_start="2024-01-08 00:00:00",
            event_time_end="2024-01-16 00:00:00",
        )
        assert res2.ok, [x.message for x in res2.results]
    return spark.table(f"{schema}.daily_rollup").orderBy(
        "day", "event_type"
    )


M12_SQL = """
SELECT date_trunc('day', ts) AS day, event_type,
       count(*) AS n, round(sum(value), 2) AS total
FROM events
WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
GROUP BY 1, 2
ORDER BY day, event_type
"""


# ----------------------------------------------------------------- m13
def m13_stream_static_join(spark, sf_dir):
    """Stream-static dimension enrichment: the events stream joins a
    BROADCAST static customer dim per microbatch (the canonical
    streaming enrichment shape — dimension snapshot read fresh each
    microbatch, no state store involved, unlike the m9 stream-stream
    join). availableNow drain; output equals the batch join oracle."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    from sparkt.sources import (
        load_parquet,
        ns_timestamp_columns,
        repair_event_time,
    )
    from sparkt.streaming.incremental import stream_append

    src = os.path.join(sf_dir, "events.parquet")
    work = tempfile.mkdtemp(prefix="sparkt_m13_")
    tgt = os.path.join(work, "target")
    cp = os.path.join(work, "checkpoint")
    ns_cols = ns_timestamp_columns(src)
    dim = load_parquet(spark, os.path.join(sf_dir, "customer.parquet")) \
        .select("c_custkey", "c_mktsegment", "c_nationkey")

    def transform(stream):
        out = repair_event_time(stream, ns_cols)
        return (
            out.join(broadcast(dim),
                     out.user_id == dim.c_custkey, "left")
            .select(
                "event_id", "user_id", "event_type",
                F.round("value", 2).alias("value"),
                "c_mktsegment", "c_nationkey",
            )
        )

    with _low_shuffle(spark):
        stream_append(spark, src, tgt, cp, transform=transform)
    return spark.read.parquet(tgt).orderBy("event_id")


M13_SQL = """
SELECT event_id, user_id, event_type, round(value, 2) AS value,
       c_mktsegment, c_nationkey
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
ORDER BY event_id
"""


# ------------------------------------------------------------------ m14
def m14_stream_upsert(spark, sf_dir):
    """Streaming MERGE (upsert) sink — the streaming analogue of the
    incremental 'merge' strategy (sparkt.streaming.incremental.
    stream_upsert): per micro-batch, latest-row-per-user wins by
    (ts, event_id) DESC; the drained target equals the batch
    latest-per-key oracle regardless of how the files split into
    micro-batches (the merge is associative)."""
    from pyspark.sql import functions as F

    from sparkt.sources import ns_timestamp_columns, repair_event_time
    from sparkt.streaming.incremental import (
        stream_upsert,
        upsert_current_path,
    )

    src = os.path.join(sf_dir, "events.parquet")
    work = tempfile.mkdtemp(prefix="sparkt_m14_")
    tgt = os.path.join(work, "target")
    cp = os.path.join(work, "checkpoint")
    ns_cols = ns_timestamp_columns(src)

    def transform(stream):
        out = repair_event_time(stream, ns_cols)
        return out.select(
            "user_id", "event_id", "ts", "event_type",
            F.round("value", 2).alias("value"),
        )

    with _low_shuffle(spark):
        stream_upsert(
            spark, src, tgt, cp,
            unique_key="user_id", order_by=["ts", "event_id"],
            transform=transform,
        )
    return spark.read.parquet(
        upsert_current_path(tgt)
    ).orderBy("user_id")


M14_SQL = """
SELECT user_id, event_id, ts, event_type, round(value, 2) AS value
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
  FROM events)
WHERE rk = 1
ORDER BY user_id
"""


# ------------------------------------------------------------------ m15
def m15_stream_shards(spark, sf_dir):
    """Streaming shard sink (sparkt.streaming.incremental.
    stream_shard_sink): continuous ingestion packed into a fixed
    number of hash shards. The gate drains the corpus in TWO separate
    sink invocations (even doc_ids land first, odd ones arrive as a
    later file drop the checkpoint picks up alone), proving
    batch-split invariance for real: the union of all batch dirs
    carries exactly the static md5-shard assignment the oracle
    computes, independent of how ingestion was split."""
    from pyspark.sql import functions as F

    from sparkt.streaming.incremental import stream_shard_sink

    src_parquet = os.path.join(sf_dir, "documents.parquet")
    work = tempfile.mkdtemp(prefix="sparkt_m15_")
    src = os.path.join(work, "src")
    tgt = os.path.join(work, "target")
    cp = os.path.join(work, "checkpoint")
    docs = spark.read.parquet(src_parquet).select(
        "doc_id", "lang", "n_chars"
    )
    with _low_shuffle(spark):
        docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(src)
        stream_shard_sink(
            spark, src, tgt, cp, id_col="doc_id",
            n_shards=8, seed="m15",
        )
        docs.filter("doc_id % 2 = 1").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream_shard_sink(
            spark, src, tgt, cp, id_col="doc_id",
            n_shards=8, seed="m15",
        )
    out = spark.read.parquet(tgt)
    return out.select(
        "doc_id",
        F.col("shard_id").cast("bigint").alias("shard_id"),
        F.col("batch").cast("bigint").alias("batch"),
    ).orderBy("doc_id")


M15_SQL = """
SELECT doc_id,
       CAST(('0x' || substr(md5('m15|' || CAST(doc_id AS VARCHAR)),
                            1, 4))::BIGINT % 8 AS BIGINT) AS shard_id,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS BIGINT)
           AS batch
FROM documents ORDER BY doc_id
"""


QUERIES = {
    "m15_stream_shards": m15_stream_shards,
    "m14_stream_upsert": m14_stream_upsert,
    "m13_stream_static_join": m13_stream_static_join,
    "m12_microbatch": m12_microbatch,
    "m1_incremental_merge": m1_incremental_merge,
    "m2_snapshot_scd2": m2_snapshot_scd2,
    "m3_seed_types": m3_seed_types,
    "m4_insert_overwrite": m4_insert_overwrite,
    "m5_python_model": m5_python_model,
    "m6_streaming_ingest": m6_streaming_ingest,
    "m7_streaming_window": m7_streaming_window,
    "m8_stateful_sessions": m8_stateful_sessions,
    "m9_stream_stream_join": m9_stream_stream_join,
    "m10_stream_dedup": m10_stream_dedup,
    "m11_materialized_view": m11_materialized_view,
}

ORACLES = {
    "m15_stream_shards": M15_SQL,
    "m14_stream_upsert": M14_SQL,
    "m13_stream_static_join": M13_SQL,
    "m12_microbatch": M12_SQL,
    "m1_incremental_merge": M1_SQL,
    "m2_snapshot_scd2": M2_SQL,
    "m3_seed_types": M3_SQL,
    "m4_insert_overwrite": M4_SQL,
    "m5_python_model": M5_SQL,
    "m6_streaming_ingest": M6_SQL,
    "m7_streaming_window": M7_SQL,
    "m8_stateful_sessions": M8_SQL,
    "m9_stream_stream_join": M9_SQL,
    "m10_stream_dedup": M10_SQL,
    "m11_materialized_view": M11_SQL,
}
