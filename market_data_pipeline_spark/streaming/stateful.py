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


ANOMALY_OUTPUT_SCHEMA = (
    "user_id bigint, event_id bigint, value double, zscore double, is_anomaly boolean"
)
ANOMALY_STATE_SCHEMA = "n bigint, mean double, m2 double"


def streaming_anomaly_zscore(
    events: DataFrame, threshold: float = 3.0, min_obs: int = 10
) -> DataFrame:
    """Streaming per-key anomaly detection: each event is z-scored against
    the key's RUNNING mean/std (Welford's online algorithm in state), then
    the state absorbs it. Flags |z| > threshold once ≥ min_obs events have
    been seen — the streaming twin of operators/anomaly.py's batch z-score
    (reference placeholder: src/analyzers/anomaly_detector.py, 0 bytes).

    State is three scalars per key (n, mean, M2) — O(active keys) total, no
    window buffer; Welford is numerically stable where naive Σx² cancels
    catastrophically after ~1e8 observations. Rows inside one batch are
    processed in event order (batch sorted before the update), so replaying
    history through the stream yields the same flags as a batch prefix scan.
    """

    def update(key, pdf_iter, state):
        if state.exists:
            n, mean, m2 = state.get
        else:
            n, mean, m2 = 0, 0.0, 0.0
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            for ev_id, v in zip(pdf["event_id"], pd.to_numeric(pdf["value"], errors="coerce")):
                if pd.isna(v):
                    continue
                v = float(v)
                if n >= min_obs:
                    var = m2 / (n - 1) if n > 1 else 0.0
                    sd = var ** 0.5
                    z = (v - mean) / sd if sd > 0 else 0.0
                else:
                    z = 0.0
                out.append((int(ev_id), v, round(z, 4), n >= min_obs and abs(z) > threshold))
                n += 1
                delta = v - mean
                mean += delta / n
                m2 += delta * (v - mean)
        state.update((n, mean, m2))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out),
                "event_id": [o[0] for o in out],
                "value": [o[1] for o in out],
                "zscore": [o[2] for o in out],
                "is_anomaly": [o[3] for o in out],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
