"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the engine's arbitrary-state surface (running per-user totals; the shape
for sessionization, CDC folding, feature backfills...).

State is per group key, Arrow-serialized between micro-batches; the
function sees each batch's rows for its key plus the persisted state.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"
STATE_SCHEMA = "n LONG, total DOUBLE"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running (n_events, total_value) per user, updated every micro-batch.
    Emits the current cumulative totals for each user seen in the batch."""

    def update(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
