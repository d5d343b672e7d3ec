"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch engine has the same semantics as a window expression (the
q17 sessionize gate query: ``sum(case when ts - lag(ts) > gap ...)
over (partition by user order by ts)``) — but a stream can't look
back over unbounded history, so sessions live in managed per-key
state: events extend the open session, a quiet period of ``gap``
(enforced by an event-time timeout against the watermark) closes and
emits it. This is the operator the reference cannot express at all
(batch-only surface, SURVEY.md §2.5 streaming row).

Scale: state is partitioned by the grouping key across executors
(RocksDB-backed state store on a real cluster); each microbatch
touches only keys with new events plus timed-out keys. No global
shuffle beyond the groupBy hash partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import col
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# state: (session_start_us, last_event_us, n_events) as plain longs —
# cheapest stable encoding across state-store versions
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _sessionize_fn(gap_us: int, session_tz: str = "UTC"):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((start_us, last_us, n))
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                # Arrow hands event times as tz-NAIVE wall clock in the
                # SESSION timezone; localize before taking epoch micros
                # or the timeout timestamp (true epoch millis) is off by
                # the UTC offset whenever the session tz is not UTC
                # DST transitions: a wall clock that occurs twice
                # (fall-back) resolves to the DST instant, one that
                # never occurs (spring-forward) shifts to the next
                # valid instant — deterministic policies instead of the
                # default raise, which would kill the streaming query
                # mid-batch for any non-UTC session timezone
                vals = (
                    pd.to_datetime(pdf["ts"])
                    .dt.tz_localize(
                        session_tz,
                        ambiguous=np.ones(len(pdf), dtype=bool),
                        nonexistent="shift_forward",
                    )
                    .astype("int64") // 1000
                )
                ts_us.extend(int(v) for v in vals)
            ts_us.sort()
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = ts_us[0]
                n = 0
                # brand-new key: first event opens the session
            for t in ts_us:
                if n > 0 and t - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    start_us, last_us, n = t, t, 0
                else:
                    # late-but-valid events (above the watermark, below
                    # the stored last) extend the open session WITHOUT
                    # regressing its end/timeout
                    start_us = min(start_us, t)
                    last_us = max(last_us, t)
                n += 1
            state.update((start_us, last_us, n))
            # close when the watermark passes last event + gap
            state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us", tz="UTC")
                        .tz_convert(session_tz).tz_localize(None)
                        for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us", tz="UTC")
                        .tz_convert(session_tz).tz_localize(None)
                        for _, e, _ in closed
                    ],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def stateful_sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-user gap sessions over an event stream. Emits one row per
    CLOSED session (closure = ``gap`` of event-time silence, decided by
    the watermark — deterministic late-data semantics, not wall-clock).
    Multiple sessions of one user inside a single microbatch close
    inline; the trailing open session waits in state."""
    unit_seconds = {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    }
    try:
        count, unit = gap.split()
        gap_us = int(count) * unit_seconds[unit] * 1_000_000
    except (ValueError, KeyError):
        raise ValueError(
            f"stateful_sessionize: cannot parse gap {gap!r} — expected "
            f"'<n> <unit>' with unit one of {sorted(unit_seconds)}"
        ) from None
    renamed = stream.select(
        col(user_col).alias("user_id"), col(ts_col).alias("ts")
    ).withWatermark("ts", watermark)
    session_tz = stream.sparkSession.conf.get(
        "spark.sql.session.timeZone", "UTC"
    )
    return renamed.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_us, session_tz),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
