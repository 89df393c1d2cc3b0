"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 ext; the harness the reference's forever-spinning
per-message node state maps onto in Spark).

The operator keeps one state row per key across micro-batches — the Spark
spelling of the reference node's long-lived in-process accumulators — and
emits the refreshed aggregate each batch.  State lives in the state store
(checkpointed, partitioned by key), so at 100 TB of events the state scales
with |keys|, not |events|, and a watermark bounds it further.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def running_user_stats(events: DataFrame, key: str = "user_id",
                       value: str = "value") -> DataFrame:
    """Per-key running (count, sum) maintained in streaming state.

    Works on a streaming DataFrame grouped by ``key``; each micro-batch folds
    its rows into the per-key state and emits the updated totals.  On a
    single availableNow drain the result equals the batch group-by — the
    equivalence the tests pin.
    """

    def fold(key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value].sum())
        state.update((n, total))
        yield pd.DataFrame({
            "user_id": [key_tuple[0]], "n_events": [n], "total_value": [total],
        })

    return events.groupBy(key).applyInPandasWithState(
        fold, RUNNING_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout)
