"""Custom stateful streaming operator: per-user session aggregation with
``applyInPandasWithState``.

The reference has no streaming state (SURVEY.md §2.10); this supplies the
task-mandated custom stateful operator class: sessions are accumulated in
GroupState across micro-batches (count + span) and emitted exactly once when
a later event proves the gap was exceeded (NoTimeout: with AvailableNow
triggers a processing-time timeout would keep the query alive waiting to
fire; the trailing open session stays in state for the next increment).

Gap semantics match the batch sessionizer
(__spark_entry__._q_events_sessions) under a BOUNDED-LATENESS contract:
late events may arrive any time while their session (or a later one) is
still open; events that arrive late for a session that already CLOSED
cannot reopen it (the streaming-vs-batch tradeoff every watermarked
operator makes). Late events that chain into the open session (consecutive
gaps <= the session gap, transitively) weld into it exactly as the batch
sessionizer would; events before the first chain break are sessionized
among themselves and closed.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from demeter_spark.streaming.windowed import EVENTS_SCHEMA

SESSION_GAP_S = 1800
OUT_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, n_events BIGINT"
)
STATE_SCHEMA = "start BIGINT, end BIGINT, n BIGINT"  # microseconds


def _sessionize(
    key: Tuple[Any], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events into the user's open session; emit
    every session that closes (gap exceeded). State = (start, end, n)."""
    (user_id,) = key
    ts = (
        pd.concat([b["ts"] for b in batches])
        .sort_values()
        .astype("int64")
        .to_numpy()
        // 1000  # ns -> us (integers: no float precision loss)
    )
    closed = []
    if state.exists:
        cur_s, cur_e, cur_n = state.get
        # events arriving more than a gap BEFORE the open session's start
        # belong to earlier sessions, not the open one: sessionize them
        # among themselves and close them (bounded-lateness assumption:
        # anything still earlier would have arrived by now — the batch twin
        # sorts globally, so this is where the streaming flavor's contract
        # lives). Welding them into the open session would merge sessions
        # the batch sessionizer keeps apart.
        if cur_n > 0:
            gap_us = SESSION_GAP_S * 1_000_000
            # weld-chain split (transitive, not a flat cutoff): walking the
            # sorted batch backward from the open session's start, any
            # suffix whose consecutive gaps are <= gap belongs to the open
            # session — a chain t1 < cur_s-gap <= t2 with t2-t1 <= gap must
            # weld WHOLE (the batch sessionizer would merge all of it);
            # only events before the first break close separately.
            thresh = cur_s
            k = len(ts)
            while k > 0 and thresh - int(ts[k - 1]) <= gap_us:
                thresh = min(thresh, int(ts[k - 1]))
                k -= 1
            pre = ts[:k]
            ts = ts[k:]
            if len(pre):
                s = e = int(pre[0])
                n = 1
                for t in pre[1:]:
                    if t - e > gap_us:
                        closed.append((s, e, n))
                        s = e = int(t)
                        n = 1
                    else:
                        e = int(t)
                        n += 1
                closed.append((s, e, n))
    else:
        cur_s = cur_e = int(ts[0]) if len(ts) else 0
        cur_n = 0
    for t in ts:
        if cur_n > 0 and t - cur_e > SESSION_GAP_S * 1_000_000:
            closed.append((cur_s, cur_e, cur_n))
            cur_s, cur_e, cur_n = int(t), int(t), 1
        else:
            # max/min, not assignment: a late event from a previous
            # micro-batch (t < cur_e) must extend/backfill the open session,
            # never regress its end — a regressed end would fake a gap and
            # split one session in two (batch twin fully sorts, so only the
            # streaming path can see cross-batch disorder)
            if cur_n == 0:
                cur_s = cur_e = int(t)
            else:
                cur_e = max(cur_e, int(t))
                cur_s = min(cur_s, int(t))
            cur_n += 1
    state.update((cur_s, cur_e, cur_n))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [n for _, _, n in closed],
            }
        )


def streaming_sessions(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Run the stateful sessionizer incrementally (AvailableNow)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        sessions.writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
