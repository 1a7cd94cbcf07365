"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the extension point for semantics Spark's built-in windows can't express
(SURVEY.md §7 Phase D; the reference has no streaming at all, §2c).

Example operator: per-user running activity profile with inactivity timeout —
emits a record when a user goes quiet (processing-time timeout), carrying
event count, value sum, and first/last event times accumulated across
micro-batches. State is partitioned by user_id across executors; timeouts
bound state lifetime.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def _make_update(timeout_ms: int | None):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, s, first, last = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "sum_value": s,
                  "first_ts": first, "last_ts": last, "closed": True}]
            )
            return

        n, s, first, last = state.get if state.exists else (0, 0.0, None, None)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            lo, hi = pdf["ts"].min(), pdf["ts"].max()
            first = lo if first is None or lo < first else first
            last = hi if last is None or hi > last else last
        state.update((n, s, first, last))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "sum_value": s,
              "first_ts": first, "last_ts": last, "closed": False}]
        )

    return _update


def user_activity_profile(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Stateful per-user profile over a stream with ``ts``/``value`` columns.
    Emits an updated profile per micro-batch; with ``timeout_ms`` set, also a
    final ``closed=True`` record when a user goes quiet for that long
    (processing-time timeout — a continuous-trigger production setting).

    Default is no timeout: state lives for the query lifetime, which is the
    deterministic choice for ``availableNow`` drains (a timeout would add an
    extra wait-and-fire micro-batch after the backlog is consumed).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update(timeout_ms),
        outputStructType=PROFILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
