"""Custom stateful streaming operator: per-key running totals via
``applyInPandasWithState`` (SURVEY.md §2.9 north-star surface).

The reference's closest analog is the per-symbol TTL memo cache that
accumulates latest quote state across polling rounds
(/root/reference/src/extractors/price_extractor.py:16-136). Here the state is
explicit, fault-tolerant (checkpointed with the query), and partitioned by
key — the 100 TB shape: state lives with the shuffle partition, no driver
involvement, Arrow batches in and out of Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def running_totals(events: DataFrame) -> DataFrame:
    """Cumulative (count, Σvalue) per user across micro-batches. Emits one
    updated row per key per batch (outputMode=update); the state survives
    batches and restarts via the checkpoint."""

    def update(key, pdf_iter, state: GroupState):
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdf_iter:
            vals = pd.to_numeric(pdf["value"], errors="coerce")
            n += int(vals.notna().sum())
            total += float(vals.fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
