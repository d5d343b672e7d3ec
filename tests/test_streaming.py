"""Structured Streaming extension: exactly-once file ingestion and
watermarked windowed aggregation (batch reference analogue: the
incremental materialization's high-water-mark predicate)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_stream_append_exactly_once(spark, tmp_path):
    from sparkt.streaming.incremental import stream_append

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    cp = str(tmp_path / "cp")

    spark.range(0, 100).withColumn("v", F.col("id") * 2).write.parquet(
        src + "/batch1.parquet"
    )
    stream_append(spark, src, tgt, cp)
    assert spark.read.parquet(tgt).count() == 100

    # second batch of files: only the new ones are processed
    spark.range(100, 150).withColumn("v", F.col("id") * 2).write.parquet(
        src + "/batch2.parquet"
    )
    stream_append(spark, src, tgt, cp)
    out = spark.read.parquet(tgt)
    assert out.count() == 150
    assert out.select("id").distinct().count() == 150

    # idempotent rerun with no new files
    stream_append(spark, src, tgt, cp)
    assert spark.read.parquet(tgt).count() == 150


def test_windowed_stream(spark, tmp_path):
    from sparkt.streaming.incremental import run_windowed_stream

    src = str(tmp_path / "ev")
    tgt = str(tmp_path / "agg")
    cp = str(tmp_path / "cp2")

    df = spark.createDataFrame(
        [(i, f"2024-01-01 0{i % 3}:15:00", "click" if i % 2 else "view")
         for i in range(60)],
        ["id", "ts_str", "etype"],
    ).withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
    df.write.parquet(src + "/f1.parquet")

    run_windowed_stream(
        spark, src, tgt, cp, ts_col="ts",
        window_duration="1 hour", group_cols=["etype"],
    )
    out = spark.read.parquet(tgt)
    # append mode emits only windows CLOSED by the watermark: the hour
    # containing max(ts) stays open until later events arrive
    rows = {(str(r["window_start"]), r["etype"]): r["n_events"]
            for r in out.collect()}
    assert sum(rows.values()) == 40  # hours 0 and 1 closed; hour 2 open
    assert len({k[0] for k in rows}) == 2

    # a later batch advances the watermark and closes hour 2
    late = spark.createDataFrame(
        [(100, "2024-01-01 05:00:00", "view")], ["id", "ts_str", "etype"]
    ).withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
    late.write.parquet(src + "/f2.parquet")
    run_windowed_stream(
        spark, src, tgt, cp, ts_col="ts",
        window_duration="1 hour", group_cols=["etype"],
    )
    out = spark.read.parquet(tgt)
    rows = {(str(r["window_start"]), r["etype"]): r["n_events"]
            for r in out.collect()}
    assert sum(rows.values()) == 60  # hours 0-2 all closed now
    assert len({k[0] for k in rows}) == 3


def test_stateful_sessionize(spark, tmp_path):
    """applyInPandasWithState gap sessions: a quiet period (enforced by
    the event-time watermark) closes and emits the session; the open
    trailing session stays in state across availableNow drains."""
    import os

    from pyspark.sql import functions as F

    from sparkt.streaming.stateful import stateful_sessionize

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    cp = str(tmp_path / "cp")
    os.makedirs(src)

    def write_batch(name, rows):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.parquet(os.path.join(src, name))

    def drain():
        schema = "user_id long, ts timestamp"
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
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
        try:
            return spark.read.parquet(tgt).collect()
        except Exception:  # noqa: BLE001 — sink empty on first drain
            return []

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    # user 1: two sessions separated by >30min INSIDE one batch; the
    # second session is still open at drain end
    write_batch("b1", [
        (1, t0), (1, t0 + 5 * m), (1, t0 + 10 * m),
        (1, t0 + 60 * m), (1, t0 + 62 * m),
        (2, t0 + 61 * m),
    ])
    rows1 = drain()
    # inline closure: user 1's first session closes within the batch
    assert [(r.user_id, r.n_events) for r in rows1] == [(1, 3)]
    # a much later event advances the watermark past both open sessions
    write_batch("b2", [(3, t0 + 300 * m)])
    rows2 = drain()
    got = {(r.user_id, r.n_events, str(r.session_start)) for r in rows2}
    assert (1, 2, str(t0 + 60 * m)) in got
    assert (2, 1, str(t0 + 61 * m)) in got


def test_stream_upsert_multi_batch_converges(spark, tmp_path):
    """stream_upsert's merge is associative: feeding the same rows as
    TWO file batches (two availableNow drains) converges to the same
    latest-per-key state as one batch — and newer rows REPLACE older
    ones."""
    import os

    from sparkt.streaming.incremental import (
        stream_upsert,
        upsert_current_path,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    tgt = str(tmp_path / "target")
    cp = str(tmp_path / "cp")
    spark.createDataFrame(
        [(1, 100, "a"), (2, 100, "b")], "k long, ver long, v string"
    ).write.mode("append").parquet(src)
    stream_upsert(spark, src, tgt, cp, unique_key="k",
                  order_by=["ver", "v"])
    got = {r["k"]: (r["ver"], r["v"])
           for r in spark.read.parquet(upsert_current_path(tgt)).collect()}
    assert got == {1: (100, "a"), 2: (100, "b")}
    # second drain: key 1 updated, key 3 new, stale row for 2 ignored
    spark.createDataFrame(
        [(1, 200, "a2"), (2, 50, "stale"), (3, 10, "c")],
        "k long, ver long, v string",
    ).write.mode("append").parquet(src)
    stream_upsert(spark, src, tgt, cp, unique_key="k",
                  order_by=["ver", "v"])
    got = {r["k"]: (r["ver"], r["v"])
           for r in spark.read.parquet(upsert_current_path(tgt)).collect()}
    assert got == {1: (200, "a2"), 2: (100, "b"), 3: (10, "c")}
    # superseded version dirs were swept; one live version + pointer
    import os as _os

    entries = [e for e in _os.listdir(tgt) if not e.startswith(".")]
    assert "current" in entries and len(entries) == 2


def test_stream_shard_sink_replay_is_idempotent(spark, tmp_path):
    """Losing the checkpoint and re-draining the whole source must
    OVERWRITE each batch directory, not duplicate rows — the
    idempotent-foreachBatch contract of stream_shard_sink."""
    import os

    from pyspark.sql import functions as F

    from sparkt.streaming.incremental import stream_shard_sink

    src = str(tmp_path / "src")
    tgt = str(tmp_path / "tgt")
    cp1 = str(tmp_path / "cp1")
    cp2 = str(tmp_path / "cp2")
    spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    ).coalesce(1).write.parquet(src)

    stream_shard_sink(
        spark, src, tgt, cp1, id_col="doc_id", n_shards=4, seed="t"
    )
    first = sorted(
        (r["doc_id"], r["shard_id"])
        for r in spark.read.parquet(tgt).collect()
    )
    assert len(first) == 100
    # fresh checkpoint = the whole source replays into the same
    # batch ids; overwrite keeps the target exact
    stream_shard_sink(
        spark, src, tgt, cp2, id_col="doc_id", n_shards=4, seed="t"
    )
    again = sorted(
        (r["doc_id"], r["shard_id"])
        for r in spark.read.parquet(tgt).collect()
    )
    assert again == first
    # hive-layout: both levels are k=v partition dirs
    assert any(d.startswith("batch=") for d in os.listdir(tgt))
