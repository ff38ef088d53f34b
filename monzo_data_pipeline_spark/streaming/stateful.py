"""Custom stateful streaming operator — applyInPandasWithState.

The reference's only state is the `since` cursor persisted in
DynamoDB between runs (/root/reference/src/utils/api/token_manager.py
pattern); here the general form: arbitrary per-key state maintained
by the engine's state store across micro-batches, with Arrow-batched
user logic.

Scale: state lives per key in the executor state store (RocksDB
provider in production); the watermark/timeout policy bounds it. This
operator is the escape hatch for semantics `F.window`/aggregations
can't express (per-key custom accumulators, custom eviction).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, total_value) maintained across
    micro-batches; emits the updated totals for keys seen in each
    batch. Closure is self-contained (no module globals) so executors
    never import this package.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
