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


FUNNEL_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("step", T.IntegerType()),
        T.StructField("frontier_ts", T.TimestampType()),
    ]
)

_FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("step", T.IntegerType()),
        T.StructField("frontier_ts", T.TimestampType()),
    ]
)


def _make_funnel(steps: list[str]):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        step, frontier = state.get if state.exists else (0, None)
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows[rows["event_type"].isin(steps)].sort_values("ts")
        for ts, etype in zip(rows["ts"], rows["event_type"]):
            if step < len(steps) and etype == steps[step] and (
                frontier is None or ts > frontier
            ):
                step += 1
                frontier = ts
        state.update((step, frontier))
        yield pd.DataFrame(
            [{"user_id": user_id, "step": step, "frontier_ts": frontier}]
        )

    return _update


def funnel_progress(events: DataFrame, steps: list[str]) -> DataFrame:
    """Streaming funnel: per-user conversion progress maintained as keyed
    state — the streaming twin of ``operators.funnel.funnel_counts``.

    State per user is just (step, frontier_ts): the earliest-completion
    frontier advances when an event of the NEXT step type arrives strictly
    after it. Within a micro-batch events sort by ``ts`` before the scan, so
    intra-batch disorder is handled; ACROSS batches the greedy frontier
    matches the batch operator's earliest-completion semantics when event
    time is non-decreasing batch-to-batch (the usual log-stream contract —
    bound violations with a watermark upstream). Emits each user's current
    (step, frontier_ts) per micro-batch in update mode; final step counts
    aggregate downstream or at read time.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    return events.groupBy("user_id").applyInPandasWithState(
        _make_funnel(list(steps)),
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


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
