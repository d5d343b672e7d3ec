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
