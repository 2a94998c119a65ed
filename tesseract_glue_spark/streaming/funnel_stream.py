"""Streaming funnel: incremental view→click→purchase staging via
``applyInPandasWithState`` — the streaming twin of the batch
``rel_events_funnel`` operator (operators/relational.py::events_funnel_sql).

State per user is just the three funnel timestamps (µs); each micro-batch
replays its rows in (ts, event_id) order against the same transition
rules the batch SQL implements with stage aggregates:

* the FIRST view opens the funnel,
* the earliest click STRICTLY AFTER that view advances it,
* the earliest purchase STRICTLY AFTER that click completes it.

Because each transition only ever takes the FIRST qualifying event, the
one-pass incremental update is exact whenever each user's events arrive
in timestamp order across micro-batches (the usual log-stream contract);
out-of-order arrivals within one micro-batch are handled by the per-batch
sort. A late event older than already-consumed state would need
watermark-gated reprocessing upstream — same caveat as every
exactly-once streaming aggregation.

State lifecycle: a COMPLETED funnel can never change again, so its state
is dropped immediately after the final emit (bounded state = active
funnels only); a user's NEXT view after that opens a fresh funnel (repeat
funnels are emitted as new snapshots — batch equivalence with
``rel_events_funnel`` holds for the FIRST funnel per user, i.e. the
earliest max-stage snapshot). Users idle past the processing-time timeout
are dropped too, trading a bounded state store for forgetting
eternally-idle half-funnels. Events before a user's first view carry no
information for this operator and create NO state at all.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "view_us BIGINT, click_us BIGINT, purchase_us BIGINT"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("view_us", T.LongType()),
        T.StructField("click_us", T.LongType()),
        T.StructField("purchase_us", T.LongType()),
        T.StructField("funnel_stage", T.LongType()),
    ]
)

IDLE_TIMEOUT_MS = 3_600_000  # forget idle half-funnels after 1h


def _update_funnel_state(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    view_us, click_us, purchase_us = state.get if state.exists else (None, None, None)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
    ts_us = rows["ts"].astype("int64") // 1_000
    for t, etype in zip(ts_us, rows["event_type"]):
        t = int(t)
        if etype == "view":
            if view_us is None:
                view_us = t
        elif etype == "click":
            if view_us is not None and click_us is None and t > view_us:
                click_us = t
        elif etype == "purchase":
            if click_us is not None and purchase_us is None and t > click_us:
                purchase_us = t
    if view_us is None:
        return  # pre-view events carry nothing; create no state
    stage = 3 if purchase_us is not None else (2 if click_us is not None else 1)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "view_us": [view_us],
            "click_us": [click_us if click_us is not None else -1],
            "purchase_us": [purchase_us if purchase_us is not None else -1],
            "funnel_stage": [stage],
        }
    )
    if stage == 3:
        state.remove()  # terminal: nothing can ever change this funnel
        return
    state.update((view_us, click_us, purchase_us))
    state.setTimeoutDuration(IDLE_TIMEOUT_MS)


def funnel_state(events: DataFrame) -> DataFrame:
    """events stream → per-user funnel snapshots (updated stages only)."""
    from tesseract_glue_spark.sources.shipping import ensure_shipped

    # the state handler is a package closure: executors must be able to
    # unpickle it regardless of the driver's cwd (verify-skill gotcha)
    ensure_shipped(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _update_funnel_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
