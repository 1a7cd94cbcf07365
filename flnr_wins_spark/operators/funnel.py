"""Event-sequence analytics: funnel conversion and cohort retention.

The reference engine has no event/time-series surface at all (SURVEY.md §2c:
the 319-line ETL at /root/reference/src/wins_transform_staging.py is batch
attribute QA only); these are the standard product-analytics operators a
warehouse engine is expected to ship, expressed as pure DataFrame dataflow
so the driver's DuckDB oracle can hash-check them.

Scale shape (both operators, at 100 TB of events):

  * every shuffle is keyed on ``user_col`` — high-cardinality, naturally
    uniform (user ids), so no skew mitigation is needed;
  * each funnel stage filters the corpus to ONE event type before its
    shuffle (predicate pushes to the scan), and the per-user frontier it
    joins against is bounded by distinct-user cardinality, not event count;
  * aggregations are min/count — map-side partial aggregation halves
    shuffle volume for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: a user completes step *k* if an event of
    type ``steps[k]`` exists STRICTLY AFTER their earliest completion of
    step *k-1* (earliest-completion semantics, the standard funnel
    definition). Returns one row per step: (step, event_type, users).

    Dataflow: a per-user "frontier" (earliest completion time) advances one
    stage at a time — stage k is ``filter(type==steps[k]) ⋈ frontier`` then
    ``groupBy(user).min(ts)``. Counts are exact and deterministic.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    stages = [frontier]
    for s in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == s)
            .select(user_col, ts_col)
            .join(frontier.select(user_col, "_t"), user_col)
            .filter(F.col(ts_col) > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("_t"))
        )
        stages.append(nxt)
        frontier = nxt
    parts = [
        df.agg(F.count("*").alias("users")).select(
            F.lit(i).alias("step"),
            F.lit(s).alias("event_type"),
            F.col("users"),
        )
        for i, (s, df) in enumerate(zip(steps, stages), start=1)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: cohort = ISO week of a user's first event;
    a user is "active at offset k" if they have any event in the week k
    weeks after their cohort week. Returns
    (cohort_week DATE, week_offset INT, active_users BIGINT).

    Two shuffles, both on ``user_col`` (first-seen agg, then the enrich
    join); the final groupBy is on the tiny (cohort, offset) grid with
    count_distinct — Spark expands distinct aggregation map-side.
    """
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    firsts = events.groupBy(user_col).agg(F.min(wk).alias("cohort_week"))
    return (
        events.select(user_col, wk.alias("_wk"))
        .join(firsts, user_col)
        .withColumn(
            "week_offset",
            # both weeks are Monday-truncated so the difference is an exact
            # multiple of 7; `div` keeps it in integer arithmetic end-to-end
            F.expr("datediff(_wk, cohort_week) div 7").cast("int"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(user_col).alias("active_users"))
    )


def linear_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Linear MULTI-touch marketing attribution: each conversion's value
    splits EQUALLY across every distinct-channel touch the user made
    before it (the position-agnostic complement of last-touch). Returns
    per channel (touch, n_purchases_touched, revenue_micro) — plus a
    'none' row for conversions with no prior touch, which keep full
    credit.

    Exactness discipline: credit is computed in integer micro-units —
    ``value_micro = floor(value * 1e6 + 0.5)`` and each channel gets
    ``(value_micro * cnt_c) div n`` where cnt_c is the channel's touch
    count and n the conversion's total touches. Floor division drops at
    most n-1 micro-units of "dust" per conversion (deterministic, both
    engines identical) — the price of an engine-exact oracle, documented
    rather than papered over with decimal division whose scale rules
    differ between engines.

    Shape: conversions join their user's prior events (ordering by
    (ts, id) so simultaneous events break ties deterministically), then
    two small aggregations. The join fans out per user activity — for
    power users at 100 TB, pre-bucket both sides by user (bucketing.py)
    and cap lookback with a time-range predicate so the join condition
    prunes.
    """
    vmic = F.floor(F.col(value_col) * 1e6 + F.lit(0.5)).cast("bigint")
    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("p_ts"),
        F.col(id_col).alias("p_id"),
        vmic.alias("v_mic"),
    )
    touches = events.filter(F.col(type_col) != conversion_type).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t_ts"),
        F.col(id_col).alias("t_id"),
        F.col(type_col).alias("touch"),
    )
    before = (F.col("t_ts") < F.col("p_ts")) | (
        (F.col("t_ts") == F.col("p_ts")) & (F.col("t_id") < F.col("p_id"))
    )
    per = (
        conv.join(touches, "u")
        .filter(before)
        .groupBy("p_id", "v_mic", "touch")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tot = per.groupBy("p_id").agg(F.sum("cnt").cast("bigint").alias("n"))
    credited = per.join(tot, "p_id").select(
        "touch",
        "p_id",
        F.expr("(v_mic * cnt) div n").alias("credit_mic"),
    )
    touched = credited.groupBy("touch").agg(
        F.count_distinct("p_id").cast("bigint").alias("n_purchases_touched"),
        F.sum("credit_mic").cast("bigint").alias("revenue_micro"),
    )
    untouched = (
        conv.join(per.select("p_id").distinct(), "p_id", "left_anti")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases_touched"),
            F.coalesce(F.sum("v_mic"), F.lit(0)).cast("bigint").alias("revenue_micro"),
        )
        .select(F.lit("none").alias("touch"), "n_purchases_touched", "revenue_micro")
        .filter(F.col("n_purchases_touched") > 0)
    )
    return touched.unionByName(untouched)
