"""Arbitrary stateful streaming (SURVEY.md §2.9): a per-key alert FSM
via ``applyInPandasWithState`` — the sensor-pipeline 'N consecutive
out-of-range readings' alarm, the one operator class windowed aggs
cannot express.

State per user is two integers (run length, alert count): constant
memory per key regardless of stream length — exactly what keeps custom
state viable on a 100 TB stream. Rows inside a micro-batch are sorted
by (ts, event_id) before folding so replay chunking does not change
the result (chunks are time-ordered).
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_THRESHOLD = 50.0
RUN_LENGTH = 3

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("run", T.IntegerType()),
    ]
)


def _alert_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    run = state.get[0] if state.exists else 0
    batches = [pdf for pdf in pdfs if len(pdf)]
    if not batches:
        state.update((run,))
        return
    pdf = pd.concat(batches).sort_values(["ts", "event_id"])
    high = pdf["value"].to_numpy() > ALERT_THRESHOLD
    n = len(high)
    # run[i] = length of the consecutive-high run ending at i:
    # distance to the most recent non-high position (vectorized fold).
    idx = np.arange(n)
    last_low = np.maximum.accumulate(np.where(~high, idx, -1))
    run_vec = idx - last_low
    lows = np.flatnonzero(~high)
    first_low = lows[0] if lows.size else n
    run_vec[:first_low] += run  # carry the run in progress from prior batches
    state.update((int(run_vec[-1]),))
    alert_ids = pdf["event_id"].to_numpy()[run_vec >= RUN_LENGTH]
    if alert_ids.size:
        yield pd.DataFrame({"user_id": user_id, "event_id": alert_ids})


def alert_fsm(events: DataFrame) -> DataFrame:
    """Emit one row per event that is the >=3rd consecutive reading
    above the threshold for its user."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _alert_fn,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
