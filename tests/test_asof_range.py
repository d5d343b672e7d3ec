"""As-of and range join operators (sparkt/functions/asof.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _mk(spark):
    trades = spark.createDataFrame(
        [(1, "A", "2024-01-01 10:00:05"), (2, "A", "2024-01-01 10:00:00"),
         (3, "B", "2024-01-01 09:00:00")],
        ["trade_id", "sym", "ts"],
    ).withColumn("ts", F.to_timestamp("ts"))
    quotes = spark.createDataFrame(
        [("A", "2024-01-01 10:00:00", 100.0),
         ("A", "2024-01-01 10:00:03", 101.0),
         ("A", "2024-01-01 10:00:10", 102.0),
         ("B", "2024-01-01 09:30:00", 50.0)],
        ["sym", "ts", "price"],
    ).withColumn("ts", F.to_timestamp("ts"))
    return trades, quotes


def test_asof_backward(spark):
    from sparkt.functions.asof import asof_join

    trades, quotes = _mk(spark)
    out = {
        r["trade_id"]: r["price"]
        for r in asof_join(trades, quotes, "sym", "ts", "ts",
                           right_cols=["price"]).collect()
    }
    assert out[1] == 101.0  # latest quote <= 10:00:05
    assert out[2] == 100.0  # exactly-simultaneous quote matches (<=)
    assert out[3] is None   # B's only quote is after the trade


def test_asof_forward(spark):
    from sparkt.functions.asof import asof_join

    trades, quotes = _mk(spark)
    out = {
        r["trade_id"]: r["price"]
        for r in asof_join(trades, quotes, "sym", "ts", "ts",
                           right_cols=["price"], direction="forward").collect()
    }
    assert out[1] == 102.0  # earliest quote >= 10:00:05
    assert out[2] == 100.0  # equality matches forward too
    assert out[3] == 50.0


def test_range_join_bucketed_equals_plain(spark):
    from sparkt.functions.asof import range_join

    trades, quotes = _mk(spark)
    plain = range_join(trades, quotes, "sym", "ts", "ts",
                       lower_seconds=-5, upper_seconds=5)
    bucketed = range_join(trades, quotes, "sym", "ts", "ts",
                          lower_seconds=-5, upper_seconds=5,
                          bucket_seconds=3)
    key = lambda df: sorted(  # noqa: E731
        (r["trade_id"], r["price"]) for r in df.select(
            "l.trade_id", "r.price").collect()
    )
    assert key(plain) == key(bucketed)
    assert (1, 100.0) in key(plain) and (1, 101.0) in key(plain)


def test_asof_carries_whole_right_row(spark):
    """A NULL in one right column must surface as NULL — not fall back
    to an OLDER right row's value for just that column (the right row is
    carried as one struct)."""
    from sparkt.functions.asof import asof_join

    left = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00")], ["key", "lts"]
    )
    right = spark.createDataFrame(
        [
            ("k", "2024-01-01 08:00:00", 1.0, "old"),
            ("k", "2024-01-01 09:00:00", None, "new"),
        ],
        ["key", "rts", "price", "tag"],
    )
    out = asof_join(left, right, on="key", left_ts="lts", right_ts="rts").collect()
    assert len(out) == 1
    # latest right row has price=NULL: must NOT mix in the older 1.0
    assert out[0]["price"] is None
    assert out[0]["tag"] == "new"
