"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 / charter: "applyInPandasWithState for custom stateful
operators").

``running_user_totals`` maintains per-user (event count, value sum)
state across micro-batches and emits the updated running totals for
every user seen in each batch — the arbitrary-state primitive that
windows/dedup can't express (cross-batch accumulators, custom
eviction, enrichment caches all take this shape).

Scale shape: state is partitioned by the group key across executors
(one shuffle per micro-batch on ``user_id``), Arrow-batched into
pandas, and checkpointed by the state store; with a timeout conf the
store is GC'd per key.  At 100 TB of events the state size is bounded
by |distinct users|, not event volume.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
STATE_SCHEMA = "n long, s double"


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    """GroupState update function: fold the batch into (n, s) state and
    emit one updated-totals row for the key."""
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals (update output mode).

    The last row emitted per user after a stream drains equals the
    batch ``groupBy(user_id).agg(count, sum)`` of the same data —
    tests assert exactly that equivalence.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
