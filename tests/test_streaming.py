"""Structured Streaming tests: file source -> watermark -> stateful agg ->
memory sink, drained with availableNow; results must equal the batch twin."""

from __future__ import annotations

import pytest

from flnr_wins_spark.sources import read_table
from flnr_wins_spark.streaming.events import (
    dedup_within_watermark,
    read_events_stream,
    run_available_now,
    session_counts,
    sliding_counts,
    tumbling_counts,
    with_watermark,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # materialize the events table as a parquet *directory* (file-source shape)
    from flnr_wins_spark.session import get_spark

    spark = get_spark(app_name="flnr-wins-tests", master="local[4]", shuffle_partitions=4)
    path = str(tmp_path_factory.mktemp("stream") / "events")
    read_table(spark, SF, "events").write.parquet(path)
    return path


def _batch_events(spark):
    from pyspark.sql import functions as F

    # cast to LTZ to mirror the watermark path's event-time type
    return read_table(spark, SF, "events").withColumn("ts", F.col("ts").cast("timestamp"))


def test_tumbling_stream_equals_batch(spark, events_dir):
    stream = with_watermark(read_events_stream(spark, events_dir), "1 day")
    run_available_now(tumbling_counts(stream), "t_tumbling", "complete")
    got = {(r.window_start, r.event_type): r.n
           for r in spark.table("t_tumbling").collect()}
    want = {(r.window_start, r.event_type): r.n
            for r in tumbling_counts(_batch_events(spark)).collect()}
    assert got == want and len(got) > 100


def test_sliding_stream_equals_batch(spark, events_dir):
    stream = with_watermark(read_events_stream(spark, events_dir), "1 day")
    run_available_now(sliding_counts(stream), "t_sliding", "complete")
    got = {r.window_start: r.n for r in spark.table("t_sliding").collect()}
    want = {r.window_start: r.n for r in sliding_counts(_batch_events(spark)).collect()}
    assert got == want


def test_session_stream_equals_batch(spark, events_dir):
    stream = with_watermark(read_events_stream(spark, events_dir), "1 day")
    run_available_now(session_counts(stream), "t_sessions", "complete")
    got = {(r.user_id, r.session_start): r.n_events
           for r in spark.table("t_sessions").collect()}
    want = {(r.user_id, r.session_start): r.n_events
            for r in session_counts(_batch_events(spark)).collect()}
    assert got == want


def test_stream_dedup_counts(spark, events_dir):
    stream = with_watermark(read_events_stream(spark, events_dir), "1 day")
    run_available_now(dedup_within_watermark(stream), "t_dedup", "append")
    n_keys = _batch_events(spark).select("user_id", "event_type").distinct().count()
    assert spark.table("t_dedup").count() == n_keys


def test_stream_static_enrich(spark, events_dir):
    from pyspark.sql import functions as F

    from flnr_wins_spark.streaming.events import enrich_stream

    dim = (
        _batch_events(spark)
        .select("user_id")
        .distinct()
        .withColumn("segment", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd"))
    )
    stream = read_events_stream(spark, events_dir)
    run_available_now(
        enrich_stream(stream, dim).select("event_id", "user_id", "segment"),
        "t_enriched",
        "append",
    )
    got = spark.table("t_enriched")
    assert got.count() == _batch_events(spark).count()
    assert got.filter(F.col("segment").isNull()).count() == 0
    bad = got.filter(
        ((F.col("user_id") % 2 == 0) & (F.col("segment") != "even"))
        | ((F.col("user_id") % 2 != 0) & (F.col("segment") != "odd"))
    )
    assert bad.count() == 0


def test_stream_stream_join_equals_batch(spark, events_dir):
    from pyspark.sql import functions as F

    from flnr_wins_spark.streaming.events import join_streams

    a = read_events_stream(spark, events_dir)
    b = read_events_stream(spark, events_dir)
    joined = join_streams(a, b, key="user_id", within="5 minutes").select(
        "event_id", "event_id_r"
    )
    run_available_now(joined, "t_ss_join", "append")
    got = spark.table("t_ss_join").count()

    ev = _batch_events(spark)
    ev_r = ev.select([F.col(c).alias(f"{c}_r") for c in ev.columns])
    want = ev.join(
        ev_r,
        (F.col("user_id") == F.col("user_id_r"))
        & (F.col("ts_r") >= F.col("ts") - F.expr("INTERVAL 5 minutes"))
        & (F.col("ts_r") <= F.col("ts") + F.expr("INTERVAL 5 minutes")),
    ).count()
    assert got == want and got > 0


def test_foreachbatch_partitioned_sink_idempotent(spark, events_dir, tmp_path):
    from pyspark.sql import functions as F

    from flnr_wins_spark.streaming.sinks import partitioned_overwrite_sink

    out = str(tmp_path / "out")
    stream = read_events_stream(spark, events_dir).withColumn(
        "event_date", F.to_date("ts")
    )
    n_expected = _batch_events(spark).count()
    for ckpt in ("ck1", "ck2"):  # second run = full replay with a fresh checkpoint
        q = partitioned_overwrite_sink(
            stream, out, ["event_date"], str(tmp_path / ckpt)
        )
        q.awaitTermination(120)
        assert q.exception() is None
        assert spark.read.parquet(out).count() == n_expected  # no duplication


def test_foreachbatch_sink_later_batch_preserves_earlier_rows(spark, tmp_path):
    """A second micro-batch writing into the SAME date partition must not
    clobber the first batch's rows (the failure mode of naive per-partition
    dynamic overwrite)."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.streaming.sinks import partitioned_overwrite_sink

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    base = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7, "a", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    base.write.mode("append").parquet(src)

    stream = spark.readStream.schema(base.schema).parquet(src).withColumn(
        "event_date", F.to_date("ts")
    )
    q = partitioned_overwrite_sink(stream, out, ["event_date"], ckpt)
    q.awaitTermination(120)
    assert q.exception() is None

    # second file, SAME event date -> processed as a later micro-batch
    base.withColumn("event_id", F.lit(2)).write.mode("append").parquet(src)
    q = partitioned_overwrite_sink(stream, out, ["event_date"], ckpt)
    q.awaitTermination(120)
    assert q.exception() is None
    got = spark.read.parquet(out)
    assert sorted(r.event_id for r in got.collect()) == [1, 2]


def test_stateful_user_profile(spark, events_dir):
    from pyspark.sql import functions as F

    from flnr_wins_spark.streaming.stateful import user_activity_profile

    stream = read_events_stream(spark, events_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    run_available_now(user_activity_profile(stream), "t_profile", "update")
    got = {r.user_id: r for r in spark.table("t_profile").collect()}
    want = {
        r.user_id: r
        for r in _batch_events(spark)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g.n_events == w.n and g.first_ts == w.first_ts and g.last_ts == w.last_ts


def test_incremental_agg_sink_equals_batch_aggregate(spark, tmp_path):
    """Streaming materialized view: maxFilesPerTrigger=1 forces one
    micro-batch per input file, each folding into the previous state via
    the signed-changeset merge; the final state must equal the one-shot
    batch aggregate of everything."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.streaming.sinks import incremental_agg_sink, read_agg_state

    src = str(tmp_path / "src")
    ev = read_table(spark, SF, "events").select(
        "event_type",
        F.col("value").cast("decimal(18,2)").alias("value"),
        F.pmod(F.col("event_id"), F.lit(3)).alias("_b"),
    )
    # three separate files -> three micro-batches (complete disjoint split)
    for i in range(3):
        ev.filter(F.col("_b") == i).coalesce(1).write.mode("append").parquet(src)
    ev = ev.drop("_b")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = incremental_agg_sink(
        stream,
        str(tmp_path / "state"),
        key_cols=["event_type"],
        sum_cols=["value"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = {r.event_type: (r.n, r.value)
           for r in read_agg_state(spark, str(tmp_path / "state")).collect()}
    want = {r.event_type: (r.n, r.value)
            for r in ev.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n"), F.sum("value").alias("value")
            ).collect()}
    assert got == want and len(got) == 5


def test_stateful_funnel_equals_batch(spark, tmp_path):
    """Streaming funnel (applyInPandasWithState) over two time-ordered
    micro-batches must land every user on the same final step as the batch
    earliest-completion operator."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.operators.funnel import funnel_counts
    from flnr_wins_spark.streaming.stateful import funnel_progress

    steps = ["signup", "click", "purchase"]
    ev = (
        read_table(spark, SF, "events")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")
    )
    # split by time so batch order == event-time order (the stream contract)
    cut = ev.agg(F.percentile_approx("ts", 0.5)).first()[0]
    src = str(tmp_path / "src")
    ev.filter(F.col("ts") <= cut).coalesce(1).write.mode("append").parquet(src)
    ev.filter(F.col("ts") > cut).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        funnel_progress(stream, steps)
        .writeStream.format("memory")
        .queryName("t_funnel")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # memory sink in update mode appends re-emissions: keep the max step per
    # user (the frontier only advances)
    final = (
        spark.table("t_funnel")
        .groupBy("user_id")
        .agg(F.max("step").alias("step"))
    )
    got = {
        r.step: r.n
        for r in final.filter(F.col("step") > 0).groupBy("step").agg(F.count("*").alias("n")).collect()
    }
    # users at step >= k in streaming == batch funnel count at step k
    want = {r["step"]: r["users"] for r in funnel_counts(ev, steps).collect()}
    got_cum = {k: sum(v for s, v in got.items() if s >= k) for k in want}
    assert got_cum == want and want[1] > 0


def test_incremental_agg_sink_replay_is_idempotent(spark, tmp_path):
    """Checkpoint reset (full replay) must rebuild the same state, not fold
    the data in twice — the point of version-per-batch state."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.streaming.sinks import incremental_agg_sink, read_agg_state

    src = str(tmp_path / "src")
    ev = read_table(spark, SF, "events").select(
        "event_type", F.col("value").cast("decimal(18,2)").alias("value")
    )
    ev.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    for ckpt in ("ck1", "ck2"):  # second run = replay with fresh checkpoint
        q = incremental_agg_sink(
            stream, str(tmp_path / "state"), ["event_type"], ["value"],
            str(tmp_path / ckpt),
        )
        q.awaitTermination(120)
        assert q.exception() is None
    got = {r.event_type: (r.n, r.value)
           for r in read_agg_state(spark, str(tmp_path / "state")).collect()}
    want = {r.event_type: (r.n, r.value)
            for r in ev.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n"), F.sum("value").alias("value")
            ).collect()}
    assert got == want


def test_stream_stream_left_outer_join(spark, events_dir):
    from pyspark.sql import functions as F

    from flnr_wins_spark.streaming.events import join_streams_outer

    a = read_events_stream(spark, events_dir)
    b = read_events_stream(spark, events_dir).filter(F.col("user_id") % 3 == 0)
    joined = join_streams_outer(
        a, b, key="user_id", within="5 minutes", watermark="0 seconds"
    ).select("event_id", "user_id", "event_id_r")
    run_available_now(joined, "t_ss_outer", "append")
    got = spark.table("t_ss_outer")

    ev = _batch_events(spark)
    ev_r = ev.filter(F.col("user_id") % 3 == 0)
    ev_r = ev_r.select([F.col(c).alias(f"{c}_r") for c in ev_r.columns])
    inner_want = ev.join(
        ev_r,
        (F.col("user_id") == F.col("user_id_r"))
        & (F.col("ts_r") >= F.col("ts") - F.expr("INTERVAL 5 minutes"))
        & (F.col("ts_r") <= F.col("ts") + F.expr("INTERVAL 5 minutes")),
    ).count()
    # matched rows emit immediately: exact match with the batch inner join
    assert got.filter(F.col("event_id_r").isNotNull()).count() == inner_want
    # null-padded rows exist and are genuinely unmatched (users 1,2 mod 3)
    nulls = got.filter(F.col("event_id_r").isNull())
    assert nulls.count() > 0
    assert nulls.filter(F.col("user_id") % 3 == 0).count() == 0
    # outer emission is watermark-gated: every unmatched left row older than
    # the final watermark minus the join window must have been emitted
    max_ts = ev.agg(F.max("ts")).first()[0]
    expected_old = ev.filter(
        (F.col("user_id") % 3 != 0)
        & (F.col("ts") < F.lit(max_ts) - F.expr("INTERVAL 6 minutes"))
    ).count()
    old_nulls = nulls.join(ev.select("event_id", "ts"), "event_id").filter(
        F.col("ts") < F.lit(max_ts) - F.expr("INTERVAL 6 minutes")
    )
    assert old_nulls.count() == expected_old


def test_kmv_sketch_sink_equals_batch_sketch(spark, tmp_path):
    """Streaming KMV maintenance: merging per-micro-batch bottom-k sketches
    (union, re-rank, keep k) must land on the IDENTICAL sketch — and hence
    identical estimates — as one batch pass over the full history. This is
    the mergeability property the sketch module claims, pinned end-to-end."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.functions.sketches import kmv_distinct
    from flnr_wins_spark.streaming.sinks import kmv_sketch_sink, read_kmv_estimates

    src = str(tmp_path / "src")
    ev = read_table(spark, SF, "events").select(
        "event_type", "user_id", F.pmod(F.col("event_id"), F.lit(3)).alias("_b")
    )
    for i in range(3):
        ev.filter(F.col("_b") == i).coalesce(1).write.mode("append").parquet(src)
    ev = ev.drop("_b")
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = kmv_sketch_sink(
        stream,
        str(tmp_path / "state"),
        group_col="event_type",
        value_col="user_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=16,
    )
    q.awaitTermination(120)
    got = {
        r.g: (r.n_kept, r.est_distinct)
        for r in read_kmv_estimates(spark, str(tmp_path / "state"), k=16).collect()
    }
    want = {
        r.event_type: (r.n_kept, r.est_distinct)
        for r in kmv_distinct(ev, "event_type", "user_id", k=16).collect()
    }
    assert got == want and len(got) == 5


def test_exact_dedup_sink_equals_batch_dedup(spark, tmp_path):
    """Streaming exact-dedup gate over id-ordered micro-batches must keep
    exactly the rows batch exact_dedup keeps (lowest id per content)."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.operators.dedup import exact_dedup
    from flnr_wins_spark.streaming.sinks import exact_dedup_sink, read_dedup_kept

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    # duplicate every 4th doc's text under a new higher id (cross-batch dups)
    dups = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dups)
    src = str(tmp_path / "src")
    # id-ordered batches: originals first, duplicates after
    docs.coalesce(1).write.mode("append").parquet(src)
    dups.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(corpus.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = exact_dedup_sink(
        stream,
        str(tmp_path / "state"),
        id_col="doc_id",
        text_col="text",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = {r.doc_id for r in read_dedup_kept(spark, str(tmp_path / "state")).collect()}
    want = {r.doc_id for r in exact_dedup(corpus, "text", "doc_id").collect()}
    assert got == want
    # every injected duplicate was gated out
    assert not any(d >= 1_000_000 for d in got)


def test_exact_dedup_sink_retention_bounds_state(spark, tmp_path):
    """TTL posture for unbounded streams: with retention_batches=1 the
    gate consults only the newest delta, deletes aged-out state from
    disk, still drops duplicates INSIDE the horizon, and (the explicit
    trade) re-admits a duplicate recurring beyond it."""
    import os

    from flnr_wins_spark.streaming.sinks import exact_dedup_sink, read_dedup_kept

    src = str(tmp_path / "src")
    schema = "doc_id long, text string"
    batches = [
        [(1, "alpha"), (2, "beta")],
        [(3, "beta"), (4, "gamma")],   # dup of batch 0, inside horizon
        [(5, "alpha"), (6, "gamma")],  # alpha beyond horizon; gamma inside
    ]
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    state = str(tmp_path / "state")
    q = exact_dedup_sink(
        stream, state, "doc_id", "text", str(tmp_path / "ckpt"),
        retention_batches=1,
    )
    q.awaitTermination(120)
    got = sorted(r.doc_id for r in read_dedup_kept(spark, state).collect())
    # 3 (beta, horizon hit) dropped; 5 (alpha, aged out) re-admitted;
    # 6 (gamma, horizon hit) dropped
    assert got == [1, 2, 4, 5]
    # aged-out delta physically gone; state bounded by the horizon
    assert not os.path.isdir(f"{state}/v0")
    assert os.path.isdir(f"{state}/v2")

    # same feed, unbounded: every recurrence gated
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q2 = exact_dedup_sink(
        stream2, str(tmp_path / "state_u"), "doc_id", "text",
        str(tmp_path / "ckpt_u"),
    )
    q2.awaitTermination(120)
    got_u = sorted(
        r.doc_id
        for r in read_dedup_kept(spark, str(tmp_path / "state_u")).collect()
    )
    assert got_u == [1, 2, 4]


def test_minhash_dedup_sink_equals_batch_pairs(spark, tmp_path):
    """Streaming near-dup gate: rejected ids across ordered micro-batches ==
    {later id of every verified batch minhash_lsh_pairs pair} — exact twin
    because the gate's 'any earlier seen doc' rule is order-independent."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.operators.dedup import minhash_lsh_pairs
    from flnr_wins_spark.streaming.sinks import minhash_dedup_sink, read_dedup_kept

    docs = read_table(spark, SF, "documents").select("doc_id", "text")
    # near-dups: every 5th doc re-appears with one word changed, higher id
    variants = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("zq "), F.expr("substring(text, 1, length(text))")).alias("text"),
    )
    corpus = docs.unionByName(variants)
    src = str(tmp_path / "src")
    docs.coalesce(1).write.mode("append").parquet(src)
    variants.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(corpus.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = minhash_dedup_sink(
        stream,
        str(tmp_path / "state"),
        id_col="doc_id",
        text_col="text",
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.8,
    )
    q.awaitTermination(180)
    kept = {r.doc_id for r in read_dedup_kept(spark, str(tmp_path / "state")).collect()}
    pairs = minhash_lsh_pairs(corpus, "text", "doc_id", threshold=0.8).collect()
    rejected_want = {r.id_b for r in pairs}
    want = {r.doc_id for r in corpus.collect()} - rejected_want
    assert kept == want
    # the injected variants really are near-dups and really got gated
    injected_rejects = {v for v in rejected_want if v >= 1_000_000}
    assert injected_rejects and injected_rejects.isdisjoint(kept)


def test_minhash_gate_compacts_state_deltas(spark, tmp_path):
    """r13 VERDICT task 3: the gate's band-bucket state is bounded — after
    many micro-batches the per-batch delta versions compact into at most
    ``compact_every`` dirs, while the gate's kept set still equals the
    batch twin (state CONTENTS unchanged by compaction)."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.operators.dedup import minhash_lsh_pairs
    from flnr_wins_spark.streaming.sinks import (
        _state_versions,
        minhash_dedup_sink,
        read_dedup_kept,
    )

    # deterministic subset (limit() on an unordered scan may differ
    # between the stream build and the twin's collect)
    docs = (
        read_table(spark, SF, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 60)
    )
    variants = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("zq "), F.col("text")).alias("text"),
    )
    corpus = docs.unionByName(variants)
    src = str(tmp_path / "src")
    # six mtime-ordered micro-batch files -> six foreachBatch invocations
    import glob
    import os

    # id-ordered batches so arrival order == id order (the batch twin's
    # contract); 5 doc batches then the high-id variants
    parts = [
        docs.filter((F.col("doc_id") >= i * 12) & (F.col("doc_id") < (i + 1) * 12))
        for i in range(5)
    ] + [variants]
    stamped: set[str] = set()
    t0 = 1_700_000_000
    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("append").parquet(src)
        for f in glob.glob(src + "/*.parquet"):
            if f not in stamped:
                os.utime(f, (t0 + 100 * i, t0 + 100 * i))
                stamped.add(f)
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "state")
    q = minhash_dedup_sink(
        stream, state, "doc_id", "text", str(tmp_path / "ckpt"),
        threshold=0.8, compact_every=3,
    )
    q.awaitTermination(240)
    assert q.exception() is None
    # 6 deltas compacted down to <= compact_every versions, no tmp litter
    for root in (state + "/bands", state + "/shsets"):
        assert len(_state_versions(spark, root)) <= 3, root
    import pathlib

    litter = [
        p.name
        for p in pathlib.Path(state).rglob("*")
        if "compact" in p.name
    ]
    assert litter == []
    # semantics unchanged: kept == corpus minus batch-twin rejects
    kept = {r.doc_id for r in read_dedup_kept(spark, state).collect()}
    pairs = minhash_lsh_pairs(corpus, "text", "doc_id", threshold=0.8).collect()
    want = {r.doc_id for r in corpus.collect()} - {r.id_b for r in pairs}
    assert kept == want


def test_compaction_crash_recovery(spark, tmp_path):
    """_recover_compaction finishes or discards every interruption point:
    (a) marked tmp with originals still visible, (b) unmarked tmp,
    (c) side-renamed leftovers after the target took its place."""
    from flnr_wins_spark.streaming.sinks import (
        _compact_delta_versions,
        _recover_compaction,
        _state_versions,
    )

    def _seed(root, versions):
        for v in versions:
            spark.range(v * 10, v * 10 + 3).write.mode("overwrite").parquet(
                f"{root}/v{v}"
            )

    def _rows(root):
        vs = _state_versions(spark, root)
        return sorted(
            r.id
            for r in spark.read.parquet(
                *[f"{root}/v{v}" for v in vs]
            ).collect()
        )

    # happy path first: 5 versions, max 3 -> oldest 3 merge into v2
    root = str(tmp_path / "happy")
    _seed(root, [0, 1, 2, 3, 4])
    before = _rows(root)
    _compact_delta_versions(spark, root, max_versions=3)
    assert _state_versions(spark, root) == [2, 3, 4]
    assert _rows(root) == before

    # (a) marked tmp, originals untouched: recovery promotes the tmp
    root = str(tmp_path / "marked")
    _seed(root, [0, 1, 2])
    before = _rows(root)
    spark.read.parquet(f"{root}/v0", f"{root}/v1").write.parquet(
        f"{root}/compact_tmp_v1"
    )
    _recover_compaction(spark, root)
    assert _state_versions(spark, root) == [1, 2]
    assert _rows(root) == before

    # (b) unmarked tmp (simulated torn write): discarded, originals kept
    root = str(tmp_path / "unmarked")
    _seed(root, [0, 1, 2])
    before = _rows(root)
    spark.read.parquet(f"{root}/v0", f"{root}/v1").write.parquet(
        f"{root}/compact_tmp_v1"
    )
    import os

    os.remove(f"{root}/compact_tmp_v1/_SUCCESS")
    _recover_compaction(spark, root)
    assert _state_versions(spark, root) == [0, 1, 2]
    assert _rows(root) == before
    assert not os.path.exists(f"{root}/compact_tmp_v1")

    # (c) leftover side-renames after the target landed: deleted
    root = str(tmp_path / "leftover")
    _seed(root, [1, 2])
    spark.range(100, 103).write.parquet(f"{root}/compacted_v0")
    before = _rows(root)
    _recover_compaction(spark, root)
    assert _state_versions(spark, root) == [1, 2]
    assert _rows(root) == before
    assert not os.path.exists(f"{root}/compacted_v0")


def test_minhash_gate_rejects_out_of_order_newcomer(spark, tmp_path):
    """A near-dup arriving AFTER its match must be rejected even when it
    carries a LOWER id (the arrival-order contract; the old cross-batch
    join required state.id < new.id and silently kept both)."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.streaming.sinks import minhash_dedup_sink, read_dedup_kept

    text = "the quick brown fox jumps over the lazy dog again and again today"
    batch1 = spark.createDataFrame([(1_000_000, text)], "doc_id long, text string")
    batch2 = spark.createDataFrame([(5, text + " x")], "doc_id long, text string")
    src = str(tmp_path / "src")
    batch1.coalesce(1).write.mode("append").parquet(src)
    batch2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(batch1.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = minhash_dedup_sink(
        stream,
        str(tmp_path / "state"),
        id_col="doc_id",
        text_col="text",
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.8,
    )
    q.awaitTermination(120)
    kept = {r.doc_id for r in read_dedup_kept(spark, str(tmp_path / "state")).collect()}
    assert kept == {1_000_000}  # first arrival kept, low-id newcomer gated


def test_quantile_sketch_sink_equals_batch_sketch(spark, tmp_path):
    """Streaming bottom-k quantile maintenance: merging per-micro-batch
    samples (union, re-rank by hash, keep k) must land on the IDENTICAL
    sample — and hence identical order-statistic estimates — as one batch
    pass over the full history (the sample is a pure function of the
    row-key set)."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.functions.sketches import bottomk_quantiles
    from flnr_wins_spark.streaming.sinks import (
        quantile_sketch_sink,
        read_quantile_estimates,
    )

    src = str(tmp_path / "src")
    ev = read_table(spark, SF, "events").select(
        "event_id", "event_type", "value",
        F.pmod(F.col("event_id"), F.lit(3)).alias("_b"),
    )
    for i in range(3):
        ev.filter(F.col("_b") == i).coalesce(1).write.mode("append").parquet(src)
    ev = ev.drop("_b")
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = quantile_sketch_sink(
        stream,
        str(tmp_path / "state"),
        group_col="event_type",
        value_col="value",
        key_col="event_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=32,
    )
    q.awaitTermination(120)
    got = {
        r.g: (r.n_kept, r.q50, r.q90)
        for r in read_quantile_estimates(spark, str(tmp_path / "state")).collect()
    }
    want = {
        r.event_type: (r.n_kept, r.q50, r.q90)
        for r in bottomk_quantiles(
            ev, "event_type", "value", "event_id", k=32
        ).collect()
    }
    assert got == want and len(got) == 5


def test_quantile_sink_batch_duplicates_do_not_evict(spark, tmp_path):
    """Review finding: the sink cut its per-batch bottom-k BEFORE
    deduplication, so an at-least-once redelivered row occupied two of the
    k slots and permanently evicted a distinct row. Dedup-then-cut (the
    kmv_sketch_sink order) keeps the state equal to the batch twin."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.functions.sketches import bottomk_quantiles
    from flnr_wins_spark.streaming.sinks import (
        quantile_sketch_sink,
        read_quantile_estimates,
    )

    src = str(tmp_path / "src")
    base = spark.createDataFrame(
        [(i, "g", float(i * 3 % 11)) for i in range(6)],
        "event_id long, event_type string, value double",
    )
    # one micro-batch containing every row TWICE (at-least-once delivery)
    base.unionByName(base).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(base.schema).parquet(src)
    q = quantile_sketch_sink(
        stream,
        str(tmp_path / "state"),
        group_col="event_type",
        value_col="value",
        key_col="event_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=4,  # k < distinct rows: eviction would be visible
    )
    q.awaitTermination(120)
    got = {r.g: (r.n_kept, r.q50, r.q90)
           for r in read_quantile_estimates(spark, str(tmp_path / "state")).collect()}
    want = {r.event_type: (r.n_kept, r.q50, r.q90)
            for r in bottomk_quantiles(base, "event_type", "value", "event_id", k=4).collect()}
    assert got == want


def test_checkpoint_reset_sheds_stale_timeline(spark, tmp_path):
    """Review finding: after a checkpoint reset, the re-run's batch ids
    restart at 0 but the old timeline's higher-numbered state versions
    survived pruning — and every reader prefers the HIGHEST version, so
    fresh data was silently invisible forever. Superseded versions must be
    dropped at write time."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.operators.merge import incremental_agg  # noqa: F401
    from flnr_wins_spark.streaming.sinks import incremental_agg_sink, read_agg_state

    src = str(tmp_path / "src")
    for i in range(3):  # three files -> three micro-batches
        spark.createDataFrame([(i, 10)], "k long, v long").coalesce(1).write.mode(
            "append"
        ).parquet(src)
    schema = "k long, v long"

    def run(ckpt):
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = incremental_agg_sink(
            stream, str(tmp_path / "state"), ["k"], ["v"],
            checkpoint_dir=str(tmp_path / ckpt),
        )
        q.awaitTermination(120)

    run("ckpt1")  # writes v0, v1, v2
    # new data arrives, then the checkpoint is lost -> whole backlog = batch 0
    spark.createDataFrame([(99, 10)], schema).coalesce(1).write.mode("append").parquet(src)
    run("ckpt2")
    got = {r.k for r in read_agg_state(spark, str(tmp_path / "state")).collect()}
    assert 99 in got  # the fresh timeline's data is what readers see
    assert got == {0, 1, 2, 99}


def test_exact_dedup_sink_null_text_deduped_across_batches(spark, tmp_path):
    """Review finding: NULL-text handling diverged between the sink and
    the batch operator. The aligned doctrine: NULL text has no content to
    compare, so every NULL-text row is KEPT (bypassing dedup entirely) on
    both sides."""
    from flnr_wins_spark.operators.dedup import exact_dedup
    from flnr_wins_spark.streaming.sinks import exact_dedup_sink, read_dedup_kept

    src = str(tmp_path / "src")
    schema = "doc_id long, text string"
    spark.createDataFrame([(1, None), (2, "x")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame([(3, None), (4, "y")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = exact_dedup_sink(
        stream, str(tmp_path / "state"), "doc_id", "text",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    kept = sorted(r.doc_id for r in read_dedup_kept(spark, str(tmp_path / "state")).collect())
    corpus = spark.createDataFrame([(1, None), (2, "x"), (3, None), (4, "y")], schema)
    want = sorted(r.doc_id for r in exact_dedup(corpus, "text", "doc_id").collect())
    assert kept == want == [1, 2, 3, 4]


class TestPtableMergeSink:
    """CDC stream -> partition-level MVCC table (delta-proportional MERGE
    per micro-batch, exactly-once via the manifest-riding batch id)."""

    def _bootstrap(self, spark, tmp_path):
        from flnr_wins_spark.sources.ptable import write_ptable

        base = spark.createDataFrame(
            [(1, "en", 10.0), (2, "en", 20.0), (3, "fr", 30.0)],
            "id long, lang string, score double",
        )
        path = str(tmp_path / "tbl")
        write_ptable(base, path, "lang")
        return path

    def _feed(self, spark, tmp_path):
        """Three single-file micro-batches of changesets."""
        src = str(tmp_path / "src")
        batches = [
            [(2, "en", 21.0, False)],                      # update
            [(4, "de", 40.0, False), (1, "en", 0.0, True)],  # insert + delete
            [(3, "fr", 33.0, False)],                      # update
        ]
        schema = "id long, lang string, score double, is_delete boolean"
        for rows in batches:
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        return src, schema

    def test_stream_merge_equals_sequential_batch_merge(self, spark, tmp_path):
        from flnr_wins_spark.sources.ptable import read_ptable
        from flnr_wins_spark.streaming.sinks import ptable_merge_sink

        path = self._bootstrap(spark, tmp_path)
        src, schema = self._feed(spark, tmp_path)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = ptable_merge_sink(
            stream, path, ["id"], str(tmp_path / "ckpt"),
            delete_flag_col="is_delete",
        )
        q.awaitTermination(120)
        got = {r.id: (r.lang, r.score) for r in read_ptable(spark, path).collect()}
        assert got == {2: ("en", 21.0), 3: ("fr", 33.0), 4: ("de", 40.0)}

    def test_checkpoint_reset_replay_is_skipped(self, spark, tmp_path):
        """A fresh checkpoint redelivers every batch with restarted ids;
        the manifest-riding applied-batch-id must gate them all out —
        content unchanged, exactly-once preserved."""
        from flnr_wins_spark.sources.ptable import ptable_history, read_ptable
        from flnr_wins_spark.streaming.sinks import ptable_merge_sink

        path = self._bootstrap(spark, tmp_path)
        src, schema = self._feed(spark, tmp_path)
        for ckpt in ("ckpt1", "ckpt2"):  # second run = full redelivery
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = ptable_merge_sink(
                stream, path, ["id"], str(tmp_path / ckpt),
                delete_flag_col="is_delete",
            )
            q.awaitTermination(120)
            if ckpt == "ckpt1":
                history = ptable_history(spark, path)
                content = {tuple(r) for r in read_ptable(spark, path).collect()}
        assert ptable_history(spark, path) == history  # no extra commits
        assert {tuple(r) for r in read_ptable(spark, path).collect()} == content

    def test_exactly_once_survives_compaction(self, spark, tmp_path):
        """OPTIMIZE between micro-batches must be invisible to the
        sink's replay gate: compact_ptable carries the applied-batch-id
        meta forward in its manifest, so a full redelivery after a
        compaction is still skipped (no double-merge) and the compacted
        table keeps accepting new batches."""
        from flnr_wins_spark.sources.ptable import (
            compact_ptable,
            ptable_history,
            read_manifest_meta,
            read_ptable,
        )
        from flnr_wins_spark.streaming.sinks import ptable_merge_sink

        path = self._bootstrap(spark, tmp_path)
        src, schema = self._feed(spark, tmp_path)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = ptable_merge_sink(
            stream, path, ["id"], str(tmp_path / "ckpt1"),
            delete_flag_col="is_delete",
        )
        q.awaitTermination(120)
        applied = read_manifest_meta(spark, path).get("batch_id")
        assert applied is not None
        compact_ptable(spark, path, partitions=["en", "fr", "de"])
        # the batch id rode the compaction manifest forward
        assert read_manifest_meta(spark, path).get("batch_id") == applied
        content = {tuple(r) for r in read_ptable(spark, path).collect()}
        history = ptable_history(spark, path)
        # fresh checkpoint = full redelivery; every batch must be gated out
        stream2 = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q2 = ptable_merge_sink(
            stream2, path, ["id"], str(tmp_path / "ckpt2"),
            delete_flag_col="is_delete",
        )
        q2.awaitTermination(120)
        assert ptable_history(spark, path) == history  # no extra commits
        assert {tuple(r) for r in read_ptable(spark, path).collect()} == content

    def test_stream_schema_evolution_reaches_table(self, spark, tmp_path):
        from flnr_wins_spark.sources.ptable import read_ptable
        from flnr_wins_spark.streaming.sinks import ptable_merge_sink

        path = self._bootstrap(spark, tmp_path)
        src = str(tmp_path / "src2")
        schema = "id long, lang string, origin string"
        spark.createDataFrame([(2, "en", "web")], schema).coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = ptable_merge_sink(stream, path, ["id"], str(tmp_path / "ckpt3"))
        q.awaitTermination(120)
        got = {r.id: (r.score, r.origin) for r in read_ptable(spark, path).collect()}
        assert got[2] == (20.0, "web")  # score preserved, origin evolved
        assert got[3] == (30.0, None)   # untouched partition null-fills


class TestDriftPsiSink:
    def test_streaming_histogram_equals_batch_psi(self, spark, tmp_path):
        """The maintained histogram is a sum of exact integers, so PSI
        from the streaming state must equal the batch operator on the
        full history — including the fixed-grid binning and the per-bin
        term arithmetic (shared implementations)."""
        from pyspark.sql import functions as F

        from flnr_wins_spark.operators.dataquality import drift_psi
        from flnr_wins_spark.streaming.sinks import drift_psi_sink, read_drift_psi

        src = str(tmp_path / "src")
        rows = [(i, float((i * 37) % 90) + 10.0) for i in range(300)]
        cur = spark.createDataFrame(rows, "id long, v double")
        cur = cur.withColumn("_b", (F.col("id") % 3).cast("int"))
        for b in range(3):
            cur.filter(F.col("_b") == b).drop("_b").coalesce(1).write.mode(
                "append"
            ).parquet(src)
        ref = spark.createDataFrame(
            [(i, float((i * 13) % 100)) for i in range(400)], "id long, v double"
        )
        stream = (
            spark.readStream.schema("id long, v double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = drift_psi_sink(
            stream, str(tmp_path / "state"), "v", str(tmp_path / "ckpt"),
            lo=0.0, hi=100.0, bins=10,
        )
        q.awaitTermination(120)
        got = sorted(
            map(tuple, read_drift_psi(
                spark, str(tmp_path / "state"), ref, "v", lo=0.0, hi=100.0, bins=10
            ).collect())
        )
        want = sorted(
            map(tuple, drift_psi(
                cur.drop("_b"), ref, "v", lo=0.0, hi=100.0, bins=10
            ).collect())
        )
        assert got == want and len(got) == 10


class TestPtableSinkSidecars:
    """The streaming lakehouse loop maintains the manifest sidecars for
    free: ptable_merge_sink routes every micro-batch through
    merge_ptable, which re-derives zone maps / row counts / bloom
    filters for rewritten partitions and carries the rest by reference —
    so metadata-only queries stay correct under continuous ingestion."""

    def test_stream_maintains_rowcounts_and_blooms(self, spark, tmp_path):
        from flnr_wins_spark.sources.ptable import (
            partition_rows,
            prune_partitions_eq,
            read_ptable,
            write_ptable,
        )
        from flnr_wins_spark.streaming.sinks import ptable_merge_sink

        base = spark.createDataFrame(
            [(1, "en", "alpha"), (2, "en", "beta"), (3, "fr", "gamma")],
            "id long, lang string, name string",
        )
        path = str(tmp_path / "tbl")
        write_ptable(
            base, path, "lang",
            stats_cols=["id"], bloom_cols=["name"], ndv_cols=["name"],
        )
        src = str(tmp_path / "src")
        schema = "id long, lang string, name string, is_delete boolean"
        for rows in (
            [(4, "de", "delta", False)],                     # new partition
            [(2, "en", "beta2", False), (1, "en", "", True)],  # update+delete
        ):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = ptable_merge_sink(
            stream, path, ["id"], str(tmp_path / "ckpt"),
            delete_flag_col="is_delete",
        )
        q.awaitTermination(120)
        # metadata counts match the data after two streamed merges
        rows = partition_rows(spark, path)
        actual = {
            str(r.lang): r.n
            for r in read_ptable(spark, path).groupBy("lang").count()
            .withColumnRenamed("count", "n").collect()
        }
        assert rows == actual == {"en": 1, "fr": 1, "de": 1}
        # blooms: streamed-in values are findable, stale value pruned away
        assert prune_partitions_eq(spark, path, "name", "delta") == ["de"]
        assert prune_partitions_eq(spark, path, "name", "beta2") == ["en"]
        assert "en" not in prune_partitions_eq(spark, path, "name", "beta")
        # NDV sketches streamed along too: 3 live names, all below k -> exact
        from flnr_wins_spark.sources.ptable import ndv_table

        assert ndv_table(spark, path, "name") == (3, 3.0)

    def test_stream_sidecars_equal_batch_twin(self, spark, tmp_path):
        """VERDICT r7 item 5: the FULL sidecar sections of the manifest —
        zone maps, row counts, bloom filters, NDV sketches — after two
        streamed micro-batches must equal those of a batch twin that
        applied the same changesets through merge_ptable directly. The
        sink adds exactly-once plumbing, never different statistics."""
        from flnr_wins_spark.sources.ptable import (
            _manifest_ids,
            _read_manifest,
            merge_ptable,
            read_ptable,
            write_ptable,
        )
        from flnr_wins_spark.streaming.sinks import ptable_merge_sink

        base = spark.createDataFrame(
            [(i, str(i % 3), f"n{i}", i * 10) for i in range(30)],
            "id long, kb string, name string, v long",
        )
        kwargs = dict(
            stats_cols=["id", "v"], bloom_cols=["name"], ndv_cols=["name"]
        )
        b1 = spark.createDataFrame(
            [(3, "0", "n3b", 31, False), (100, "1", "new", 1000, False)],
            "id long, kb string, name string, v long, is_delete boolean",
        )
        b2 = spark.createDataFrame(
            [(6, "0", "", 0, True), (7, "1", "", 0, True)],
            "id long, kb string, name string, v long, is_delete boolean",
        )

        # streamed path
        sp = str(tmp_path / "streamed")
        write_ptable(base, sp, "kb", **kwargs)
        src = str(tmp_path / "src")
        for b in (b1, b2):
            b.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(b1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = ptable_merge_sink(
            stream, sp, ["id"], str(tmp_path / "ckpt"),
            delete_flag_col="is_delete",
        )
        q.awaitTermination(120)

        # batch twin: same changesets through merge_ptable directly
        bp = str(tmp_path / "batch")
        write_ptable(base, bp, "kb", **kwargs)
        for b in (b1, b2):
            merge_ptable(
                spark, bp,
                b.filter("NOT is_delete").drop("is_delete"),
                ["id"],
                delete_keys=b.filter("is_delete").select("id", "kb"),
            )

        ms = _read_manifest(spark, sp, _manifest_ids(spark, sp)[-1])
        mb = _read_manifest(spark, bp, _manifest_ids(spark, bp)[-1])
        for section in ("stats", "rows", "blooms", "ndv", "bloom_dtypes"):
            assert ms.get(section) == mb.get(section), section
        # and the data itself matches
        key = lambda df: sorted(  # noqa: E731
            (r.id, r.name, r.v) for r in read_ptable(spark, df).collect()
        )
        assert key(sp) == key(bp)


def test_streamed_merges_keep_heavy_sidecar_exact(spark, tmp_path):
    """Continuous ingestion must keep the VALUE-level skew statistics
    honest: after streamed CDC merges through ptable_merge_sink, the
    heavy sidecar's merged kmin counts equal a real groupBy over the
    post-stream table, and the hot key's bound stays exact — the same
    lossless-maintenance contract the zone-map entry grades."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.sources.ptable import (
        heavy_hitters,
        read_ptable,
        write_ptable,
    )
    from flnr_wins_spark.streaming.sinks import ptable_merge_sink

    rows = [(i, 7 if i % 2 == 0 else i % 5, str(i % 3)) for i in range(120)]
    base = spark.createDataFrame(rows, "id long, k long, pb string")
    path = str(tmp_path / "tbl")
    write_ptable(base, path, "pb", stats_cols=["k"],
                 heavy_cols=["k"], heavy_k=6, heavy_threshold=10)

    src = str(tmp_path / "src")
    schema = "id long, k long, pb string, is_delete boolean"
    batches = [
        # move 10 ids onto the hot key (updates)
        [(i, 7, str(i % 3), False) for i in range(1, 40, 4)],
        # delete 5 hot rows
        [(i, 7, str(i % 3), True) for i in range(0, 20, 4)],
    ]
    for rows_b in batches:
        spark.createDataFrame(rows_b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ptable_merge_sink(
        stream, path, ["id"], str(tmp_path / "ckpt"),
        delete_flag_col="is_delete",
    )
    assert q.awaitTermination(120)

    kmin, hot = heavy_hitters(spark, path, "k")
    exact = {
        r["k"]: r["n"]
        for r in read_ptable(spark, path)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for v, c in kmin:
        assert exact[v] == c, (v, c, exact[v])
    lb, err = hot[7]
    assert lb <= exact[7] <= lb + err


class TestGateOffsetBandGuard:
    """The dedup/minhash gate fixtures clone docs at doc_id + k*1M with
    the same literals hardcoded in their STATIC oracle SQL; a real id
    landing on a clone id diverges oracle vs sink silently (r12 ADVICE).
    _assert_offset_bands_free reduces collision-freedom to 1M-band
    disjointness (offsets are exact multiples of 1M => no carry)."""

    def _docs(self, spark, ids):
        from flnr_wins_spark.localrel import local_df

        return local_df(
            spark, [(i, f"t{i}") for i in ids], "doc_id bigint, text string"
        )

    def test_plain_and_scale_stress_bands_pass(self, spark):
        from flnr_wins_spark.plans.events import _assert_offset_bands_free

        # plain testdata shape: band {0}
        _assert_offset_bands_free(self._docs(spark, [0, 4999]))
        # scale_stress replica shape: bands {0,10,...,90}
        _assert_offset_bands_free(
            self._docs(spark, [i * 10_000_000 + 4999 for i in range(10)])
        )

    def test_colliding_band_raises(self, spark):
        import pytest

        from flnr_wins_spark.plans.events import _assert_offset_bands_free

        # an id in band 2 collides with the +2M clone band of band 0
        with pytest.raises(ValueError, match="id-offset collision"):
            _assert_offset_bands_free(self._docs(spark, [10, 2_000_005]))

    def test_negative_ids_use_floor_bands(self, spark):
        """r13 ADVICE: cast('bigint') truncates toward zero, so
        -500_000 and +500_000 would BOTH land in band 0 while the ids
        -500_000 and -500_000 + 1M = +500_000 genuinely collide at the
        +1M clone offset — the guard must catch it. floor puts
        -500_000 in band -1; band -1 + offset 1 = band 0 is occupied,
        so the guard raises (real collision detected)."""
        import pytest

        from flnr_wins_spark.plans.events import _assert_offset_bands_free

        with pytest.raises(ValueError, match="id-offset collision"):
            _assert_offset_bands_free(self._docs(spark, [-500_000, 500_000]))
        # negative ids alone (bands {-1}) are still collision-free
        _assert_offset_bands_free(self._docs(spark, [-500_000, -1]))


class TestR15AdviceGuards:
    """r14 ADVICE items: loud failures instead of silent state corruption."""

    def test_legacy_flat_state_layout_refused(self, spark, tmp_path):
        """A pre-band-index state (flat <state>/v<N> signature deltas)
        must be refused at sink construction, not silently treated as
        empty history."""
        from flnr_wins_spark.streaming.sinks import minhash_dedup_sink

        state = tmp_path / "state"
        spark.range(3).toDF("id").write.parquet(str(state / "v0"))
        docs = read_table(spark, SF, "documents").select("doc_id", "text").limit(2)
        src = str(tmp_path / "src")
        docs.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        with pytest.raises(ValueError, match="pre-band-index"):
            minhash_dedup_sink(
                stream,
                str(state),
                id_col="doc_id",
                text_col="text",
                checkpoint_dir=str(tmp_path / "ckpt"),
            )

    def test_compaction_raises_on_rename_failure(self, spark, tmp_path, monkeypatch):
        """Hadoop FileSystem.rename signals failure by returning false;
        a false during delta compaction must raise, not silently leave
        duplicate/missing versions."""
        from flnr_wins_spark.streaming import sinks as S

        root = str(tmp_path / "delta")
        for v in range(5):
            spark.range(v * 10, v * 10 + 3).toDF("id").write.parquet(f"{root}/v{v}")

        real_state_fs = S._state_fs

        class RenameRefusingFS:
            def __init__(self, fs):
                self._fs = fs

            def rename(self, *a):
                return False

            def __getattr__(self, name):
                return getattr(self._fs, name)

        def fake_state_fs(spark_, path):
            fs, jpath = real_state_fs(spark_, path)
            return RenameRefusingFS(fs), jpath

        monkeypatch.setattr(S, "_state_fs", fake_state_fs)
        with pytest.raises(IOError, match="side-rename"):
            S._compact_delta_versions(spark, root, max_versions=3)
        # originals are untouched when the first side-rename refuses
        monkeypatch.undo()
        assert S._state_versions(spark, root) == [0, 1, 2, 3, 4]
