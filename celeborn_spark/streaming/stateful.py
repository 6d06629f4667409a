"""Custom stateful streaming operator via applyInPandasWithState.

The escape hatch for operators Spark's built-in streaming aggregations
can't express (per-key custom state machines). State lives in the
state store (checkpointable — the analogue of the reference's
graceful-restart LevelDB/RocksDB state, worker/.../shuffledb/DB.java);
batches arrive as Arrow-backed pandas frames.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in group state.

    Equivalent batch semantics on bounded input:
    groupBy(user_id).agg(count(*), sum(value)) — tested in
    tests/test_streaming.py.
    """

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PROFILE_OUTPUT_SCHEMA = (
    "user_id long, n_events long, first_us long, last_us long, type_mask long"
)
PROFILE_STATE_SCHEMA = "n long, first_us long, last_us long, mask long"

# stable stage bits for the funnel mask (subset of event types)
_TYPE_BITS = {"view": 1, "click": 2, "purchase": 4, "signup": 8, "error": 16}


def user_profile_state(events: DataFrame) -> DataFrame:
    """Per-user profile accumulator in group state: event count,
    first/last event-time (microseconds), and a bitmask of event types
    seen. Every component is a COMMUTATIVE MONOID (count-sum, min,
    max, bitwise OR), so the final state is EXACT under any batch
    split or arrival order — the design rule for custom stateful
    operators at 100 TB, where cross-batch event-time order can never
    be assumed (contrast: a funnel stage machine that discards
    not-yet-valid events is order-dependent and silently wrong under
    replay). Equivalent batch semantics on bounded input: one
    groupBy(user_id) aggregate — the oracle of q_stream_user_profile."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, first_us, last_us, mask = (
            state.get if state.exists else (0, None, None, 0)
        )
        for pdf in batches:
            if pdf.empty:
                continue
            n += len(pdf)
            us = pdf["us"]
            lo, hi = int(us.min()), int(us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
            for t in pdf["event_type"].unique():
                mask |= _TYPE_BITS.get(t, 0)
        state.update((n, first_us, last_us, mask))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "first_us": [first_us],
                "last_us": [last_us],
                "type_mask": [mask],
            }
        )

    from pyspark.sql import functions as F

    with_us = events.withColumn("us", F.unix_micros("ts"))
    return with_us.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        stateStructType=PROFILE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
