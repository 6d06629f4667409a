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
