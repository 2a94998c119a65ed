"""Custom stateful streaming operator via ``applyInPandasWithState``.

Per-user running activity state over the event stream: counts, value
sum, and last-seen timestamp maintained in GroupState with a processing-
time timeout; each micro-batch emits the updated snapshot per user. The
genuinely non-SQL-expressible streaming shape (incremental state across
micro-batches) the north_star's "custom stateful operators" calls for.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events BIGINT, sum_value_cents BIGINT, last_ts TIMESTAMP"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value_cents", T.LongType()),
        T.StructField("batch_events", T.LongType()),
    ]
)


def _update_user_state(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # idle-timeout invocation: no input rows for this key. Drop the
        # state (the whole point of the timeout — otherwise state grows
        # unboundedly in a long-running stream) and emit nothing; do NOT
        # update/re-arm, which would pin the key alive forever.
        state.remove()
        return
    n, total = 0, 0
    last_ts = None
    for pdf in pdfs:
        n += len(pdf)
        total += int((pdf["value"] * 100).round().sum())
        ts_max = pdf["ts"].max()
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    if state.exists:
        prev_n, prev_total, prev_ts = state.get
        if last_ts is None or (prev_ts is not None and prev_ts > last_ts):
            last_ts = prev_ts  # never regress the last-seen timestamp
    else:
        prev_n, prev_total = 0, 0
    new_n, new_total = prev_n + n, prev_total + total
    state.update((new_n, new_total, last_ts))
    state.setTimeoutDuration(3_600_000)  # expire idle users after 1h
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [new_n],
            "sum_value_cents": [new_total],
            "batch_events": [n],
        }
    )


def user_activity_state(events: DataFrame) -> DataFrame:
    """events stream → per-user cumulative activity snapshots."""
    from tesseract_glue_spark.sources.shipping import ensure_shipped

    # the state handler is a package closure: executors must be able to
    # unpickle it regardless of the driver's cwd (verify-skill gotcha;
    # latent here until the round-5 funnel stream was driven from /tmp)
    ensure_shipped(events.sparkSession)
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
