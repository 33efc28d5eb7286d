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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4): the successor API to
# applyInPandasWithState — typed per-key state handles (value/list/map),
# TTL, timers, and an initial-state hook, managed by the same
# checkpointed state store.  `user_new_maxima` exercises it with a
# cross-batch high-water-mark detector: emit a row ONLY when a user's
# event value exceeds every value they have produced before (alerting /
# record-tracking shape; needs remembered state, inexpressible as a
# windowed aggregate over the stream).
NEW_MAX_OUTPUT_SCHEMA = "user_id long, event_id long, value double"


class _NewMaxProcessor:
    """Per-user ValueState holding the running maximum.  Rows within a
    batch are processed in (ts, event_id) order so intra-batch
    semantics match the batch twin exactly."""

    def init(self, handle) -> None:
        self._max = handle.getValueState("mx", "m double")

    def handleInputRows(self, key, rows, timerValues):
        mx = self._max.get()[0] if self._max.exists() else None
        out_eid, out_val = [], []
        # Buffer ALL Arrow chunks before sorting: a key whose batch spans
        # multiple chunks (> arrow.maxRecordsPerBatch rows) would
        # otherwise be ordered only within each chunk, and a later-chunk
        # earlier-ts row would be wrongly suppressed by a maximum the
        # earlier chunk set.
        chunks = list(rows)
        if not chunks:
            return
        batch = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        for r in batch.sort_values(["ts", "event_id"]).itertuples():
            v = r.value
            if v is not None and v == v and (mx is None or v > mx):
                mx = v
                out_eid.append(r.event_id)
                out_val.append(v)
        if mx is not None:
            self._max.update((float(mx),))
        if out_eid:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_eid),
                    "event_id": out_eid,
                    "value": out_val,
                }
            )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def close(self) -> None:
        pass


def user_new_maxima(events: DataFrame) -> DataFrame:
    """Streaming per-user new-maximum detector on
    ``transformWithStateInPandas``; append output, processing-time mode.

    Batch twin (tests assert equivalence): events whose value strictly
    exceeds the running max over all earlier (ts, event_id) events of
    the same user (``queries/streaming_batch.user_value_records``,
    oracle-checked).

    Environment note: the TWS state-server protocol is protobuf-encoded;
    in containers without ``google.protobuf`` the query fails at stream
    start with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE (the
    equivalence test importorskips on exactly that).  The legacy-API
    twin ``running_user_totals`` (applyInPandasWithState) runs without
    protobuf.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # Subclass dynamically so the module imports even on Spark < 4.
    # Dunder descriptors (__dict__/__weakref__) must NOT be copied onto
    # the new class: cloudpickle round-trips the instance to ship it to
    # Python workers, and a copied '__dict__' descriptor bound to the
    # donor class fails on load with "descriptor '__dict__' ... doesn't
    # apply" — i.e. the operator would crash at task start exactly in
    # the protobuf-enabled environments it exists for.
    members = {
        k: v for k, v in _NewMaxProcessor.__dict__.items() if not k.startswith("__")
    }
    proc = type("NewMaxProcessor", (StatefulProcessor,), members)()
    return events.select("user_id", "ts", "event_id", "value").groupBy(
        "user_id"
    ).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=NEW_MAX_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
