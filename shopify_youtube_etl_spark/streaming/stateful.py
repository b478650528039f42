"""Custom stateful streaming operator via applyInPandasWithState.

SURVEY §2.10: the reference's only state is the control-table watermark
and a driver-memory dedup set (shopify_etl.py:285-347).  This is the
idiomatic Spark generalization — arbitrary per-key state kept by the
engine (checkpointed, partitioned by key, survives executor loss)
updated with Arrow-batched pandas, not a driver-side dict.

The operator keeps per-user running totals (event count + value sum):
the streaming twin of ``GROUP BY user_id`` that emits refreshed totals
every micro-batch.  At 100 TB state shards across executors on the
grouping key; each micro-batch touches only keys present in the batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_TOTALS_OUTPUT = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
USER_TOTALS_STATE = "n BIGINT, total DOUBLE"


def _user_totals_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals over a STREAMING events frame; one row
    per (user, micro-batch) in update mode — the latest row per user is
    the current total."""
    return events.groupBy("user_id").applyInPandasWithState(
        _user_totals_fn,
        USER_TOTALS_OUTPUT,
        USER_TOTALS_STATE,
        "update",
        GroupStateTimeout.NoTimeout,
    )
