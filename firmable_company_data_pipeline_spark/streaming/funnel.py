"""Streaming funnel state machine via ``applyInPandasWithState``
(§2.9 charter extension: cross-batch per-user funnel progression — the
sessionization-style stateful operator a product-analytics stream
ships).

Per user the state is ``(stage, ts_us)``: how many funnel steps have
been completed (first-touch chaining — a step counts only strictly
after the previous step's first touch) and the event time of the last
advancement.  Each micro-batch folds its events in event-time order
into that machine and emits the user's current stage.

Ordering contract: advancement is exact when each user's events arrive
in event-time order across micro-batches (the per-key ordering a
Kafka-partitioned-by-user topic or a time-chunked file source
provides; ``tests/test_streaming.py`` drives exactly that and asserts
equality with the batch ``funnel_user_stages``).  Late events that
would have advanced an earlier stage are ignored — the standard
at-the-watermark funnel caveat.

Scale shape: one shuffle per micro-batch on user_id; state is two
scalars per user (bounded by |users|, not event volume), checkpointed
by the state store.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id long, stage int"
STATE_SCHEMA = "stage int, ts_us long"

_TS_FLOOR = -(2**62)


def _make_update(steps: tuple[str, ...]):
    def _update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        stage, ts_us = state.get if state.exists else (0, _TS_FLOOR)
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("ts")
            ev_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            for etype, us in zip(pdf["event_type"], ev_us):
                if stage < len(steps) and etype == steps[stage]:
                    if stage == 0 or us > ts_us:
                        stage += 1
                        ts_us = int(us)
        state.update((stage, ts_us))
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    return _update


def funnel_stages_stream(
    events: DataFrame, steps: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Streaming per-user funnel stage (update output mode).  After a
    time-ordered stream drains, the last emission per user equals the
    batch ``operators.behavior.funnel_user_stages`` of the same data."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(steps),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
