"""Custom stateful streaming operators (applyInPandasWithState).

Two canonical shapes for the telematics/training-data paths:

- running_device_stats: per-key running aggregates that survive
  across micro-batches (count/sum/max), emitting refreshed rows per
  batch — the streaming form of the batch risk-stats aggregation.
- streaming_dedup: emit only first-seen keys; state remembers the
  set of keys already passed (bounded per group — group BY the
  dedup key itself so state per group is one flag).

State is partitioned by the grouping key (scales horizontally) and
should be bounded with timeouts in production; the smoke runner in
streaming/telematics.py drives these with availableNow.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_device_stats(events: DataFrame, key_col: str = "deviceId",
                         value_col: str = "sensor_value") -> DataFrame:
    """Per-key running (n, total, peak) maintained in group state;
    each micro-batch emits the refreshed totals for keys it touched."""

    key_type = events.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, n long, total double, peak double"
    state_schema = "n long, total double, peak double"

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, peak = state.get
        else:
            n, total, peak = 0, 0.0, float("-inf")
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += len(vals)
            total += float(vals.sum()) if len(vals) else 0.0
            if len(vals):
                peak = max(peak, float(vals.max()))
        state.update((n, total, peak))
        yield pd.DataFrame(
            {key_col: [key[0]], "n": [n], "total": [total],
             "peak": [peak if peak != float("-inf") else None]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_dedup(df: DataFrame, key_col: str) -> DataFrame:
    """First-seen filter: group by the dedup key; state is a single
    seen-flag per key, so memory is O(distinct keys) spread across
    the state store — the streaming form of exact_dedup. Emits each
    key exactly once, with the occurrence count within its first
    batch (``n_first_batch``)."""

    key_type = df.schema[key_col].dataType.simpleString()
    out_schema = f"{key_col} {key_type}, n_first_batch long"
    state_schema = "seen boolean"

    def first_only(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return iter(())  # already emitted; nothing to track
        n = sum(len(p) for p in pdfs)
        state.update((True,))
        return iter([pd.DataFrame({key_col: [key[0]], "n_first_batch": [n]})])

    return df.groupBy(key_col).applyInPandasWithState(
        first_only, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
