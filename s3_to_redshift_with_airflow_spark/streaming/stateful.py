"""Custom stateful streaming operators via applyInPandasWithState.

For stateful semantics the built-in operators can't express (running
per-key accumulators surviving across micro-batches, custom eviction
policies), Structured Streaming exposes arbitrary per-key state through
`applyInPandasWithState`: Spark shuffles each key's rows to one task per
micro-batch, hands the group to Python as Arrow batches together with its
persisted state, and stores whatever state the function leaves behind.

Scale properties: state is partitioned by key across executors (RocksDB or
in-memory store), one Python invocation per key per batch (Arrow-batched,
not per-row), and event-time timeouts let state expire by watermark — the
same bounded-state discipline as the built-in stateful ops.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_OUTPUT = "user_id long, n_events long, total_value double"
RUNNING_STATS_STATE = "n long, total double"


def _running_stats_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, total_value) per key across micro-batches and emit
    the running totals once per batch the key appears in."""
    (n, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_stats(stream: DataFrame, key: str = "user_id") -> DataFrame:
    """Running per-user event count + value total across the whole stream —
    state the built-in windowed aggregations cannot carry (they scope state
    to a window; this scopes it to the key's lifetime)."""
    return stream.groupBy(key).applyInPandasWithState(
        _running_stats_fn,
        outputStructType=RUNNING_STATS_OUTPUT,
        stateStructType=RUNNING_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_to_memory(agg: DataFrame, query_name: str) -> Any:
    """Drive a stateful transformation to completion against a memory sink."""
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
