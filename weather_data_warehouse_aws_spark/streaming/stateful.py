"""Custom stateful streaming operator via `applyInPandasWithState`.

The built-in windowed aggregations (streaming/jobs.py) cover the reference's
analytic surface; this module shows the escape hatch for semantics the
built-ins can't express: an exact per-user RUNNING counter with a
high-water-mark anomaly flag — state that must survive across micro-batches
and emit per-batch deltas.

State design for scale: state is keyed by user_id (hash-partitioned by the
engine), each key holds a 3-field tuple — O(#distinct users) total, no
per-event growth. A GroupStateTimeout would bound idle-key state in a real
deployment; omitted here so the availableNow drain sees every user.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, batch_events int, total_events int, total_value double, "
    "new_high_water boolean"
)
STATE_SCHEMA = "total_events int, total_value double, max_value double"


def _update_user_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        total_events, total_value, max_value = state.get
    else:
        total_events, total_value, max_value = 0, 0.0, float("-inf")

    batch_events = 0
    new_high = False
    for pdf in pdfs:
        batch_events += len(pdf)
        total_events += len(pdf)
        vals = pdf["value"].fillna(0.0)
        total_value += float(vals.sum())
        batch_max = float(vals.max()) if len(vals) else float("-inf")
        if batch_max > max_value:
            max_value = batch_max
            new_high = True

    state.update((total_events, total_value, max_value))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "batch_events": [batch_events],
            "total_events": [total_events],
            "total_value": [round(total_value, 2)],
            "new_high_water": [new_high],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Stateful per-user running stats over a stream of events."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
