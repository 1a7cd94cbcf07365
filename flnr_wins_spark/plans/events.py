"""Event-stream operators, batch-checked (SURVEY.md §7 Phase D).

Each entry is the batch twin of a Structured Streaming op in
``flnr_wins_spark/streaming/events.py`` — same window semantics, checkable by
the DuckDB oracle. The streaming variants share the aggregation code.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flnr_wins_spark.plans.common import dsum, query, sql_dsum, t


def _run_stream(spark, start, timeout: int = 300, shuffle: int = 8, what: str = "stream"):
    """Start and synchronously drain an ``availableNow`` streaming query
    with ``spark.sql.shuffle.partitions`` pinned to ``shuffle`` for the
    duration (restored after).

    Stateful streaming operators build ONE state store per shuffle
    partition per operator per micro-batch (a stream-stream join keeps
    four): under the driver's default-conf session that is 200 stores x
    stores-per-op x micro-batches of open/commit/maintenance on a few
    thousand rows of graded fixture — pure fixed overhead that was ~15%
    of the full-sweep wall time (q_stream_outer_join alone 28 s, r11
    SWEEP_TIMINGS). Pinning at query start sets the checkpoint's state
    partition count (each invocation starts a fresh checkpoint under
    scratch_dir, so the pin always takes); foreachBatch sinks likewise
    run their per-batch relational jobs under the pinned width. At real
    scale the pin is per-pipeline capacity sizing — graded fixtures size
    for their data, a production stream sizes for its peak, and the
    restore guarantees neighboring BATCH entries keep their own plans.

    A half-drained stream would grade as missing batches, so a slow host
    fails LOUDLY as a timeout, never as wrong rows; a failed query
    re-raises its own exception."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
    try:
        q = start()
        if not q.awaitTermination(timeout):
            q.stop()
            raise TimeoutError(f"availableNow {what} did not finish in {timeout} s")
        if q.exception() is not None:
            raise q.exception()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _assert_offset_bands_free(docs, offsets=(1, 2, 3)) -> None:
    """Guard the dedup/minhash gate fixtures' synthetic-id scheme.

    Both gates clone docs at ``doc_id + k*1_000_000`` and their STATIC
    oracle SQL hardcodes the same literals, so a real ``doc_id`` landing
    on a clone id would produce duplicate ids whose oracle/sink
    divergence (the sink has an ``a.id != b.id`` guard, the cross-batch
    oracle arm does not) is silent (r12 ADVICE). Because every offset is
    an exact multiple of 1M, a clone's 1M-band is exactly ``band(real) +
    k`` (no carry), so collision-freedom reduces to: no occupied band
    plus any offset is itself occupied. That invariant holds for the
    plain testdata (band {0}) AND for scale_stress's ``+i*10M`` replicas
    (bands {0,10,..,90}); a future SF whose ids cross 1M fails LOUDLY
    here instead of diverging. Cost: one column-pruned distinct over
    doc_id (the fixture scans documents several times anyway)."""
    bands = {
        r[0]
        for r in docs.select(
            # floor, not cast: cast('bigint') truncates toward zero, so a
            # negative doc_id (e.g. -500_000) would share band 0 with
            # +500_000 and the no-carry invariant silently breaks
            # (r13 ADVICE). floor keeps band(real)+k == band(real+k*1M)
            # exact for every integer doc_id.
            F.floor(F.col("doc_id") / 1_000_000).alias("b")
        )
        .distinct()
        .collect()
    }
    clashes = {b + k for b in bands for k in offsets} & bands
    if clashes:
        raise ValueError(
            "gate fixture id-offset collision: real doc_id bands "
            f"{sorted(bands)} occupy clone bands {sorted(clashes)} "
            "(offsets are doc_id + k*1M; re-band the input ids)"
        )


@query(
    "q_events_interval_join",
    sql="""
    SELECT a.user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts <= a.ts AND a.ts < b.ts + INTERVAL '300 seconds'
     AND a.event_id <> b.event_id
    GROUP BY a.user_id
    """,
    note="interval/range join via time-bucket equi-join rewrite "
    "(operators/interval.py) — exact, no per-key quadratic filter",
)
def q_events_interval_join(spark, sf_dir):
    from flnr_wins_spark.operators.interval import interval_join

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    joined = interval_join(ev, ev, key="user_id", time_col="ts", window_seconds=300)
    return (
        joined.filter(F.col("event_id") != F.col("event_id_r"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


@query(
    "q_events_multires_rollup",
    sql=f"""
    SELECT resolution, bucket, event_type,
           CAST(COUNT(*) AS BIGINT) AS n, {sql_dsum('value')} AS sum_value
    FROM (
      SELECT 'hour' AS resolution, date_trunc('hour', ts) AS bucket, event_type, value FROM events
      UNION ALL
      SELECT 'day', date_trunc('day', ts), event_type, value FROM events
      UNION ALL
      SELECT 'month', date_trunc('month', ts), event_type, value FROM events
    ) buckets
    GROUP BY resolution, bucket, event_type
    """,
    note="hypertable-style multi-resolution rollup: hour/day/month buckets "
    "in one grouping-sets pass (single scan, partial aggs per set)",
)
def q_events_multires_rollup(spark, sf_dir):
    # date_trunc promotes NTZ->LTZ, and LTZ collect() renders via the PYTHON
    # process's local timezone (datetime.fromtimestamp) — cast back to NTZ so
    # buckets are wall-clock values regardless of driver machine TZ.
    ev = t(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour"),
        F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"),
        F.date_trunc("month", "ts").cast("timestamp_ntz").alias("month"),
        "event_type",
        "value",
    )
    # grouping sets: one scan, one shuffle, all three resolutions
    # grouping() indicators are computed IN the aggregate (they are only
    # valid there) and discriminate the active set null-safely: a NULL ts
    # makes every truncated column NULL, so isNotNull would misattribute
    # the row, while grouping() reflects the set structure itself.
    agg = ev.groupingSets(
        [["hour", "event_type"], ["day", "event_type"], ["month", "event_type"]],
        "hour", "day", "month", "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value")).alias("sum_value"),
        F.grouping("hour").alias("_g_hour"),
        F.grouping("day").alias("_g_day"),
    )
    resolution = (
        F.when(F.col("_g_hour") == 0, "hour")
        .when(F.col("_g_day") == 0, "day")
        .otherwise("month")
    )
    bucket = (
        F.when(F.col("_g_hour") == 0, F.col("hour"))
        .when(F.col("_g_day") == 0, F.col("day"))
        .otherwise(F.col("month"))
    )
    return agg.select(
        resolution.alias("resolution"),
        bucket.alias("bucket"),
        "event_type",
        "n",
        "sum_value",
    )


@query(
    "q_events_approx_distinct",
    sql=None,  # HLL sketches differ across engines — exactness tested in-suite
    note="approx_count_distinct (HyperLogLog++) users per event type; "
    "mergeable sketch = one pass, no exact-distinct shuffle explosion",
)
def q_events_approx_distinct(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


@query(
    "q_events_json",
    sql="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
    note="semi-structured JSON extraction (get_json_object) + agg",
)
def q_events_json(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.get_json_object("props", "$.k").cast("int")).cast("bigint").alias("sum_k"),
    )


@query(
    "q_events_tumbling",
    sql=f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n, {sql_dsum('value')} AS sum_value
    FROM events GROUP BY 1, 2
    """,
    note="tumbling 1h window agg — streaming twin: streaming/events.py tumbling_counts",
    bench=True,
)
def q_events_tumbling(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@query(
    "q_events_sliding",
    sql="""
    SELECT window_start, COUNT(*) AS n FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' FROM events
    ) GROUP BY window_start
    """,
    note="sliding window (1h size / 30m slide): each event lands in 2 windows",
)
def q_events_sliding(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


@query(
    "q_events_sessionize",
    sql="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '15 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    note="session windows (15m gap) — streaming twin uses F.session_window",
)
def q_events_sessionize(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "15 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


@query(
    "q_events_dedup",
    sql="""
    SELECT user_id, event_type, MIN(event_id) AS first_event, COUNT(*) AS n_dups
    FROM events GROUP BY user_id, event_type
    """,
    note="keyed dedup keeping first arrival — streaming twin: dropDuplicates within watermark",
)
def q_events_dedup(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event"), F.count(F.lit(1)).alias("n_dups")
    )


@query(
    "q_events_late_data",
    sql=f"""
    SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n,
           {sql_dsum('value')} AS sum_value
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL '7 days'
    GROUP BY 1
    """,
    note="watermark analog: rows older than max(ts)-7d dropped before windowing",
)
def q_events_late_data(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    wm = ev.agg(F.max("ts").alias("m"))
    keep = ev.join(F.broadcast(wm)).filter(
        F.col("ts") >= F.col("m") - F.expr("INTERVAL 7 DAYS")
    )
    return (
        keep.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@query(
    "q_events_histogram",
    sql="""
    WITH s AS (SELECT CAST(MIN(value) AS DOUBLE) AS lo,
                      CAST(MAX(value) AS DOUBLE) AS hi FROM events)
    SELECT CAST(LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 20)) AS BIGINT), 19)
                AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events CROSS JOIN s
    GROUP BY 1 ORDER BY 1
    """,
    note="equi-width histogram (20 bins over the observed [min, max]): "
    "extrema aggregate broadcasts, binning is a narrow map, one "
    "map-side-combined count shuffle keyed on 20 bins",
)
def q_events_histogram(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    s = ev.groupBy().agg(
        F.min("value").cast("double").alias("lo"),
        F.max("value").cast("double").alias("hi"),
    )
    binc = F.least(
        F.floor((F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 20))
        .cast("bigint"),
        F.lit(19).cast("bigint"),
    )
    return (
        ev.crossJoin(F.broadcast(s))
        .groupBy(binc.alias("bin"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("bin")
    )


@query(
    "q_events_interpolate",
    sql="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS tsu,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      FROM events
    ),
    w AS (
      SELECT event_id, user_id, tsu, v,
             last_value(v IGNORE NULLS) OVER prevw AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN tsu END IGNORE NULLS)
               OVER prevw AS pt,
             first_value(v IGNORE NULLS) OVER nextw AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN tsu END IGNORE NULLS)
               OVER nextw AS nt
      FROM e
      WINDOW prevw AS (PARTITION BY user_id ORDER BY tsu, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             nextw AS (PARTITION BY user_id ORDER BY tsu, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id, (v IS NULL) AS was_gap,
           COALESCE(v,
                    CASE WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt > pt
                         THEN pv + (nv - pv) * ((tsu - pt) / (nt - pt))
                    END,
                    pv, nv) AS v_filled
    FROM w
    """,
    note="linear interpolation of planted gaps (every 7th reading NULLed): "
    "prev/next non-null anchors via IGNORE NULLS window frames, "
    "time-weighted fraction in microseconds; edges fall back to "
    "nearest-anchor fill. One shuffle on the partition key",
)
def q_events_interpolate(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("tsu"),
        F.when(F.col("event_id") % 7 == 0, None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    prevw = (
        Window.partitionBy("user_id")
        .orderBy("tsu", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nextw = (
        Window.partitionBy("user_id")
        .orderBy("tsu", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nn_ts = F.when(F.col("v").isNotNull(), F.col("tsu"))
    w = ev.select(
        "event_id",
        "user_id",
        "tsu",
        "v",
        F.last("v", ignorenulls=True).over(prevw).alias("pv"),
        F.last(nn_ts, ignorenulls=True).over(prevw).alias("pt"),
        F.first("v", ignorenulls=True).over(nextw).alias("nv"),
        F.first(nn_ts, ignorenulls=True).over(nextw).alias("nt"),
    )
    interp = F.when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull() & (F.col("nt") > F.col("pt")),
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * ((F.col("tsu") - F.col("pt")) / (F.col("nt") - F.col("pt"))),
    )
    return w.select(
        "event_id",
        "user_id",
        F.col("v").isNull().alias("was_gap"),
        F.coalesce(F.col("v"), interp, F.col("pv"), F.col("nv")).alias("v_filled"),
    )


@query(
    "q_stream_watermark",
    sql="""
    WITH b1 AS (SELECT event_id, ts FROM events WHERE event_id % 4 <> 0),
    wm1 AS (SELECT max(ts) - INTERVAL 12 HOURS AS w FROM b1),
    kept AS (
      SELECT event_id, ts FROM b1
      UNION ALL
      SELECT e.event_id, e.ts
      FROM events e, wm1
      WHERE e.event_id % 4 = 0
        AND date_trunc('hour', e.ts) + INTERVAL 1 HOUR > wm1.w
    )
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(event_id) AS BIGINT) AS sum_ids
    FROM kept GROUP BY 1
    """,
    note="REAL Structured Streaming watermark semantics, oracle-graded: "
    "the events table replays as three file micro-batches in a pinned "
    "mtime order — on-time ids, then a far-future sentinel, then the "
    "id%4==0 slice arriving LATE. Spark advances watermarks with a "
    "one-batch lag (batch N's late-row filter is batch N-1's eviction "
    "watermark, measured via numRowsDroppedByWatermark), so the "
    "sentinel batch between on-time and late data pins the late filter "
    "to exactly max(on_time.ts) - 12h: every late row whose 1h window "
    "end predates that is deterministically dropped (per-WINDOW rule, "
    "replayed relationally by the oracle), late rows for still-open "
    "windows merge, and the closing no-data micro-batch applies the "
    "sentinel-advanced watermark to emit every real window in append "
    "mode while the sentinel's own window (end > final watermark) is "
    "provably withheld — it self-excludes, no result filter. At 100 TB "
    "this is the contract that bounds streaming agg state: watermarks "
    "evict exactly the windows the oracle says are closed, and what "
    "the file sink holds equals the relational answer",
)
def q_stream_watermark(spark, sf_dir):
    import glob
    import os

    from flnr_wins_spark.plans.common import scratch_dir

    ev = t(spark, sf_dir, "events").select("event_id", "ts")
    root = scratch_dir("stream_wm")
    src = root + "/src"

    b1 = ev.filter(F.col("event_id") % 4 != 0)
    b2 = ev.filter(F.col("event_id") % 4 == 0)
    mx = ev.agg(F.max("ts").alias("m")).collect()[0]["m"]  # scalar
    from flnr_wins_spark.localrel import local_df

    sentinel = local_df(
        spark, [(-1, mx)], "event_id bigint, ts timestamp"
    ).select(F.col("event_id"), (F.col("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"))

    # three micro-batch files whose processing ORDER is pinned by mtime
    # (FileStreamSource orders by modification time): on-time, SENTINEL,
    # late — the sentinel batch sits between so that, under Spark's
    # one-batch watermark lag, the late batch is filtered against the
    # watermark the on-time batch established
    stamped: set[str] = set()
    t0 = 1_700_000_000  # any fixed epoch; only the relative order matters
    for i, batch in enumerate((b1, sentinel, b2)):
        batch.coalesce(1).write.mode("append").parquet(src)
        for f in glob.glob(src + "/*.parquet"):
            if f not in stamped:
                os.utime(f, (t0 + 100 * i, t0 + 100 * i))
                stamped.add(f)

    agg = (
        spark.readStream.schema("event_id bigint, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "12 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("event_id").cast("bigint").alias("sum_ids"),
        )
        .select(F.col("w.start").alias("win_start"), "n_events", "sum_ids")
    )
    _run_stream(
        spark,
        lambda: (
            agg.writeStream.format("parquet")
            .option("path", root + "/out")
            .option("checkpointLocation", root + "/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        ),
        what="watermark stream",
    )
    return spark.read.parquet(root + "/out").select(
        "win_start", "n_events", "sum_ids"
    )


@query(
    "q_stream_outer_join",
    sql="""
    WITH l AS (SELECT event_id, user_id, ts FROM events),
    r AS (
      SELECT event_id AS eid_r, user_id AS uid_r, ts AS ts_r
      FROM events WHERE user_id % 3 = 0
    )
    SELECT l.event_id, l.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(r.eid_r) AS BIGINT) AS n_matches,
           CAST(SUM(r.eid_r) AS BIGINT) AS sum_match_ids
    FROM l LEFT JOIN r
      ON l.user_id = r.uid_r
     AND r.ts_r >= l.ts - INTERVAL 5 MINUTE
     AND r.ts_r <= l.ts + INTERVAL 5 MINUTE
    GROUP BY 1, 2
    """,
    note="Stream-stream LEFT OUTER join with watermark-gated null "
    "emission, oracle-graded: two file-source streams (all events; the "
    "user_id%3==0 slice) join on user_id within +/-5 minutes. Outer "
    "results are DELAYED BY DESIGN — a left row null-pads only when "
    "the watermark proves no matching right row can still arrive — so "
    "determinism comes from a far-future sentinel appended to EACH "
    "side as its second mtime-ordered file: the final no-data "
    "micro-batch's watermark (min over both sides of max ts - 12h = "
    "sentinel - 12h) passes every real left row's eviction point "
    "(ts + 5min), forcing every unmatched row to emit null-padded, "
    "while each sentinel self-excludes (its own eviction point stays "
    "ahead of the watermark; the right sentinel additionally never "
    "null-pads — leftOuter). The appended result then equals the "
    "relational LEFT time-range join exactly — matched pairs once "
    "each, unmatched rows null once — which the oracle replays. At "
    "100 TB the time-range condition is what BOUNDS the join state "
    "(buffered rows evict as the opposing watermark passes); this "
    "grades that the eviction emits precisely the right rows",
)
def q_stream_outer_join(spark, sf_dir):
    import glob
    import os

    from flnr_wins_spark.plans.common import scratch_dir
    from flnr_wins_spark.streaming.events import join_streams_outer

    ev = t(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )
    root = scratch_dir("stream_ssoj")
    mx = ev.agg(F.max("ts").alias("m")).collect()[0]["m"]  # scalar

    from flnr_wins_spark.localrel import local_df

    def _sentinel(uid):
        return local_df(
            spark, [(-1, mx, uid)], "event_id bigint, ts timestamp, user_id bigint"
        ).select(
            "event_id",
            (F.col("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
            "user_id",
        )

    lsrc, rsrc = root + "/left", root + "/right"
    t0 = 1_700_000_000  # fixed epoch; only the relative order matters
    for src, batches in (
        (lsrc, (ev, _sentinel(-1))),
        (rsrc, (ev.filter(F.col("user_id") % 3 == 0), _sentinel(-2))),
    ):
        stamped: set[str] = set()
        for i, batch in enumerate(batches):
            batch.coalesce(1).write.mode("append").parquet(src)
            for f in glob.glob(src + "/*.parquet"):
                if f not in stamped:
                    os.utime(f, (t0 + 100 * i, t0 + 100 * i))
                    stamped.add(f)

    schema = "event_id bigint, ts timestamp, user_id bigint"
    ls = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(lsrc)
    )
    rs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(rsrc)
    )
    joined = join_streams_outer(
        ls, rs, key="user_id", within="5 minutes", watermark="12 hours"
    ).select("event_id", "user_id", "event_id_r")
    _run_stream(
        spark,
        lambda: (
            joined.writeStream.format("parquet")
            .option("path", root + "/out")
            .option("checkpointLocation", root + "/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        ),
        what="outer-join stream",
    )
    return (
        spark.read.parquet(root + "/out")
        .groupBy("event_id", "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("event_id_r").cast("bigint").alias("n_matches"),
            F.sum("event_id_r").cast("bigint").alias("sum_match_ids"),
        )
    )


@query(
    "q_stream_stateful_funnel",
    sql="""
    WITH e AS (
      SELECT user_id, event_type, ts + to_microseconds(event_id) AS ts2
      FROM events WHERE event_id % 17 = 0
    ),
    s1 AS (
      SELECT user_id, min(ts2) AS t1 FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts2) AS t2
      FROM e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts2 > s1.t1 GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts2) AS t3
      FROM e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts2 > s2.t2 GROUP BY e.user_id
    ),
    u AS (SELECT DISTINCT user_id FROM e),
    f AS (
      SELECT u.user_id,
             CASE WHEN t3 IS NOT NULL THEN 3
                  WHEN t2 IS NOT NULL THEN 2
                  WHEN t1 IS NOT NULL THEN 1
                  ELSE 0 END AS step
      FROM u
      LEFT JOIN s1 ON u.user_id = s1.user_id
      LEFT JOIN s2 ON u.user_id = s2.user_id
      LEFT JOIN s3 ON u.user_id = s3.user_id
    )
    SELECT CAST(step AS INT) AS step,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(user_id) AS BIGINT) AS sum_uid
    FROM f GROUP BY 1
    """,
    note="applyInPandasWithState graded end-to-end: the per-user "
    "view->click->purchase funnel runs as a CUSTOM STATEFUL streaming "
    "operator (keyed GroupState of (step, frontier_ts), Arrow-batched "
    "update function) over three mtime-ordered file micro-batches split "
    "by event-time thirds — the non-decreasing-batch contract under "
    "which the greedy earliest-completion frontier is exact across "
    "batches. Event times are uniquified (ts + event_id microseconds, "
    "identically on both sides) so 'strictly after the frontier' has no "
    "tie hazard, making the greedy scan equal the order-free min-time "
    "recursion the oracle unrolls (min ts of step-k events after the "
    "step-(k-1) time). Update-mode emissions accumulate in the sink; "
    "per-user state is monotone, so max(step) per user is the final "
    "state, graded as users-per-step with a sum_uid witness. At 100 TB "
    "state is (user -> 12 bytes) partitioned across executors — the "
    "extension point for semantics Spark's built-in windows cannot "
    "express, now oracle-checked, not just batch-twin-pinned",
)
def q_stream_stateful_funnel(spark, sf_dir):
    import glob
    import os

    from flnr_wins_spark.plans.common import scratch_dir
    from flnr_wins_spark.streaming.stateful import funnel_progress

    # thinned to ~4 events/user (every SF has ~67 events/user, so the
    # full stream converts EVERYONE — a vacuous distribution; %17 keeps
    # the per-step counts spread across 0..3)
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") % 17 == 0).select(
        "user_id", "event_type",
        F.expr(
            "timestampadd(MICROSECOND, event_id, cast(ts as timestamp))"
        ).alias("ts"),
    )
    root = scratch_dir("stream_funnel")
    src = root + "/src"
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]  # scalars
    span = hi - lo
    cut1 = lo + span / 3
    cut2 = lo + 2 * span / 3
    batches = (
        ev.filter(F.col("ts") < F.lit(cut1)),
        ev.filter((F.col("ts") >= F.lit(cut1)) & (F.col("ts") < F.lit(cut2))),
        ev.filter(F.col("ts") >= F.lit(cut2)),
    )
    stamped: set[str] = set()
    t0 = 1_700_000_000  # fixed epoch; only the relative order matters
    for i, batch in enumerate(batches):
        batch.coalesce(1).write.mode("append").parquet(src)
        for f in glob.glob(src + "/*.parquet"):
            if f not in stamped:
                os.utime(f, (t0 + 100 * i, t0 + 100 * i))
                stamped.add(f)

    stream = (
        spark.readStream
        .schema("user_id bigint, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    prog = funnel_progress(stream, ["view", "click", "purchase"])
    # update-mode output needs a memory sink; the table name carries the
    # scratch run suffix so re-invocations never collide with a previous
    # (stopped) query's registered table
    tname = "t_ssfunnel_" + os.path.basename(root).replace("-", "_")
    _run_stream(
        spark,
        lambda: (
            prog.writeStream.format("memory")
            .queryName(tname)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        ),
        what="stateful funnel",
    )
    # per-user state is monotone across update emissions: max(step) is
    # the final state
    return (
        spark.table(tname)
        .groupBy("user_id")
        .agg(F.max("step").alias("step"))
        .groupBy(F.col("step").cast("int").alias("step"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("user_id").cast("bigint").alias("sum_uid"),
        )
    )


@query(
    "q_stream_dedup_gate",
    sql="""
    WITH b0 AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    ),
    b1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
    b2 AS (
      SELECT doc_id + 2000000 AS doc_id, text FROM documents
      WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 3000000 AS doc_id, text || ' qq-new' AS text
      FROM documents WHERE doc_id % 20 = 0
    ),
    -- NULL doctrine mirrors exact_dedup_sink: NULL-text rows pass the
    -- gate undeduplicated (never join the seen-set), so each kN dedups
    -- only the non-NULL texts and UNION ALLs its batch's NULL rows back.
    -- The IS NOT NULL filters also keep NOT IN three-valued-logic-safe.
    k0 AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM b0 WHERE text IS NOT NULL
      ) WHERE rn = 1
      UNION ALL SELECT doc_id FROM b0 WHERE text IS NULL
    ),
    k1 AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM b1 WHERE text IS NOT NULL
          AND text NOT IN (SELECT text FROM b0 WHERE text IS NOT NULL)
      ) WHERE rn = 1
      UNION ALL SELECT doc_id FROM b1 WHERE text IS NULL
    ),
    k2 AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM b2 WHERE text IS NOT NULL
          AND text NOT IN (SELECT text FROM b0 WHERE text IS NOT NULL
                           UNION
                           SELECT text FROM b1 WHERE text IS NOT NULL)
      ) WHERE rn = 1
      UNION ALL SELECT doc_id FROM b2 WHERE text IS NULL
    ),
    kept AS (
      SELECT 0 AS batch, doc_id FROM k0
      UNION ALL SELECT 1, doc_id FROM k1
      UNION ALL SELECT 2, doc_id FROM k2
    )
    SELECT CAST(batch AS INT) AS batch,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM kept GROUP BY 1
    """,
    note="The streaming exact-dedup GATE graded end-to-end (was pytest "
    "batch-twin only): three mtime-ordered file micro-batches — evens "
    "plus same-batch exact copies (the within-batch lowest-id window "
    "must keep the originals), then odds, then cross-batch copies of "
    "both plus genuinely new perturbed texts — run through "
    "exact_dedup_sink's foreachBatch anti-join against the persisted "
    "per-batch seen-set deltas. The per-BATCH kept outputs (kept/vN) "
    "are graded, not just the union: batch 0 must shed its in-batch "
    "copies, batch 2 must shed every cross-batch copy while admitting "
    "the new texts — first-arrival-wins replayed relationally by the "
    "oracle batch by batch. At 100 TB this is the ingestion-time dedup "
    "path: the seen-set is delta-versioned (write cost follows the "
    "batch, never the accumulated corpus) and the gate's state is "
    "metadata on the stream, not a re-shuffle of history",
)
def q_stream_dedup_gate(spark, sf_dir):
    import glob
    import os
    from functools import reduce

    from flnr_wins_spark.plans.common import scratch_dir
    from flnr_wins_spark.streaming.sinks import exact_dedup_sink

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    _assert_offset_bands_free(docs)
    root = scratch_dir("stream_dedup")
    src = root + "/src"

    b0 = docs.filter(F.col("doc_id") % 2 == 0).unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    b2 = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 2000000).alias("doc_id"), "text")
        .unionByName(
            docs.filter(F.col("doc_id") % 20 == 0).select(
                (F.col("doc_id") + 3000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qq-new")).alias("text"),
            )
        )
    )

    # three micro-batch files whose processing ORDER is pinned by mtime
    # (FileStreamSource orders by modification time) — see
    # q_stream_watermark for the pattern
    stamped: set[str] = set()
    t0 = 1_700_000_000  # any fixed epoch; only the relative order matters
    for i, batch in enumerate((b0, b1, b2)):
        batch.coalesce(1).write.mode("append").parquet(src)
        for f in glob.glob(src + "/*.parquet"):
            if f not in stamped:
                os.utime(f, (t0 + 100 * i, t0 + 100 * i))
                stamped.add(f)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    _run_stream(
        spark,
        lambda: exact_dedup_sink(
            stream, root + "/state", "doc_id", "text",
            checkpoint_dir=root + "/ckpt",
        ),
        what="dedup gate",
    )
    parts = [
        spark.read.parquet(f"{root}/state_kept/v{b}").select(
            F.lit(b).cast("int").alias("batch"), "doc_id"
        )
        for b in range(3)
    ]
    return (
        reduce(lambda a, b: a.unionByName(b), parts)
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
        )
    )


def _minhash_gate_oracle(
    batch_ctes: str, allb: str, extra_select: str = ""
) -> str:
    """The relational replay of minhash_dedup_sink's md5-portable gate,
    parameterized over the micro-batch construction: ``batch_ctes``
    defines b0..bN, ``allb`` unions them with batch numbers, and the
    shared tail replays signatures (8 md5 tables, seed 42), >=1-of-8
    band agreement, exact Jaccard >= 0.8, and the ARRIVAL-order
    rejection rule batch by batch. ``extra_select`` appends literal
    evidence columns (e.g. the compacted entry's version count)."""
    return (
        f"""
    WITH {batch_ctes},
    allb AS ({allb}),
    tk AS (
      SELECT batch, doc_id AS id, string_split(text, ' ') AS tks FROM allb
    ),
    -- docs with < 3 tokens (or NULL text) never enter the signature
    -- table, so they can neither reject nor be rejected: always kept
    sh AS (
      SELECT batch, id, list_distinct(list_transform(range(1, len(tks) - 1),
             i -> tks[i] || ' ' || tks[i+1] || ' ' || tks[i+2])) AS shset
      FROM tk WHERE len(tks) >= 3
    ),
    sig AS (
      SELECT batch, id, shset,
"""
        + ",\n".join(
            f"         list_min(list_transform(shset, s -> md5(s || ':{42 + i}'))) AS mh_{i}"
            for i in range(8)
        )
        + """
      FROM sh
    ),
    -- the gate's ARRIVAL-order contract: a doc is a rejection CANDIDATE
    -- against any earlier-id doc of its own batch (kept or rejected) and
    -- against EVERY doc of earlier batches regardless of id
    cand AS (
      SELECT b.batch AS batch, b.id AS id, a.shset AS sh_a, b.shset AS sh_b
      FROM sig a JOIN sig b
        ON ((a.batch = b.batch AND a.id < b.id) OR a.batch < b.batch)
       AND ("""
        + " OR ".join(f"a.mh_{i} = b.mh_{i}" for i in range(8))
        + f""")
    ),
    rej AS (
      SELECT DISTINCT batch, id FROM cand
      WHERE CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
            / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)))
            >= 0.8
    ),
    kept AS (
      SELECT ab.batch, ab.doc_id FROM allb ab
      WHERE NOT EXISTS (
        SELECT 1 FROM rej r WHERE r.batch = ab.batch AND r.id = ab.doc_id)
    )
    SELECT CAST(batch AS INT) AS batch,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids{extra_select}
    FROM kept GROUP BY 1
    """
    )


_MINHASH_GATE_SQL = _minhash_gate_oracle(
    batch_ctes="""b0 AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id + 1000000, text || ' qq1 qq2'
      FROM documents WHERE doc_id % 10 = 0
    ),
    b1 AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
      UNION ALL
      SELECT doc_id + 2000000, text || ' qq3 qq4'
      FROM documents WHERE doc_id % 4 = 0
      UNION ALL
      SELECT doc_id + 3000000, text || ' qq5 qq6'
      FROM documents WHERE doc_id % 10 = 5
    )""",
    allb="""
      SELECT 0 AS batch, doc_id, text FROM b0
      UNION ALL SELECT 1, doc_id, text FROM b1
    """,
)


@query(
    "q_stream_minhash_gate",
    sql=_MINHASH_GATE_SQL,
    note="The streaming MinHash NEAR-dup gate graded end-to-end (the last "
    "batch-twin-only sink): two mtime-ordered file micro-batches — evens "
    "plus same-batch perturbed near-copies (within-batch earlier-id "
    "rejection), then odds plus cross-batch near-copies of seen evens "
    "(rejected against the persisted signature state regardless of id) "
    "plus within-batch near-copies of odds — run through "
    "minhash_dedup_sink's foreachBatch band-bucket join + exact-Jaccard "
    "verify with the engine-portable md5 signatures (hash_fn='md5'), so "
    "the oracle replays the EXACT candidate set and verify relationally "
    "batch by batch: signatures, >=1-of-8 band agreement, Jaccard >= 0.8, "
    "arrival-order rejection. Per-BATCH kept outputs are graded. At "
    "100 TB this is the ingestion-time near-dup path: per-batch write "
    "cost follows the batch (delta-versioned signature state), candidate "
    "discovery is the batch-bands x state-bands equi-join, exact verify "
    "touches candidates only",
)
def q_stream_minhash_gate(spark, sf_dir):
    import glob
    import os
    from functools import reduce

    from flnr_wins_spark.plans.common import scratch_dir
    from flnr_wins_spark.streaming.sinks import minhash_dedup_sink

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    _assert_offset_bands_free(docs)
    root = scratch_dir("stream_minhash")
    src = root + "/src"

    b0 = docs.filter(F.col("doc_id") % 2 == 0).unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" qq1 qq2")).alias("text"),
        )
    )
    b1 = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .unionByName(
            docs.filter(F.col("doc_id") % 4 == 0).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qq3 qq4")).alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 5).select(
                (F.col("doc_id") + 3000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qq5 qq6")).alias("text"),
            )
        )
    )

    # two micro-batch files whose processing ORDER is pinned by mtime
    # (FileStreamSource orders by modification time) — the minimum the
    # gate's semantics need: within-batch rejection shows in batch 0,
    # cross-batch state rejection in batch 1
    stamped: set[str] = set()
    t0 = 1_700_000_000  # any fixed epoch; only the relative order matters
    for i, batch in enumerate((b0, b1)):
        batch.coalesce(1).write.mode("append").parquet(src)
        for f in glob.glob(src + "/*.parquet"):
            if f not in stamped:
                os.utime(f, (t0 + 100 * i, t0 + 100 * i))
                stamped.add(f)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    _run_stream(
        spark,
        lambda: minhash_dedup_sink(
            stream, root + "/state", "doc_id", "text",
            checkpoint_dir=root + "/ckpt",
            threshold=0.8, num_hash_tables=8, shingle_n=3, seed=42,
            hash_fn="md5",
        ),
        what="minhash gate",
    )
    parts = [
        spark.read.parquet(f"{root}/state_kept/v{b}").select(
            F.lit(b).cast("int").alias("batch"), "doc_id"
        )
        for b in range(2)
    ]
    return (
        reduce(lambda a, b: a.unionByName(b), parts)
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
        )
    )


_MINHASH_GATE_COMPACT_SQL = _minhash_gate_oracle(
    batch_ctes="""b0 AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0
    ),
    b1 AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 20 = 5
    ),
    b2 AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 20 = 10
    ),
    b3 AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 20 = 15
      UNION ALL
      SELECT doc_id + 1000000, text || ' qq1 qq2'
      FROM documents WHERE doc_id % 40 = 0
      UNION ALL
      SELECT doc_id + 2000000, text || ' qq3 qq4'
      FROM documents WHERE doc_id % 40 = 10
    )""",
    allb="""
      SELECT 0 AS batch, doc_id, text FROM b0
      UNION ALL SELECT 1, doc_id, text FROM b1
      UNION ALL SELECT 2, doc_id, text FROM b2
      UNION ALL SELECT 3, doc_id, text FROM b3
    """,
    extra_select=""",
           CAST(2 AS INT) AS n_band_versions""",
)


@query(
    "q_stream_minhash_gate_compacted",
    sql=_MINHASH_GATE_COMPACT_SQL,
    note="The r14 state-compaction path of the streaming MinHash gate "
    "graded end-to-end: FOUR mtime-ordered micro-batches through "
    "minhash_dedup_sink with compact_every=2, so the band/shset delta "
    "versions compact TWICE mid-stream ([0,1,2]->[1,2] after batch 2, "
    "[1,2,3]->[2,3] after batch 3) and batch 3's cross-batch rejections "
    "— near-copies of batch-0 and batch-2 docs — are found by probing "
    "COMPACTED state, proving compaction preserves the band index "
    "exactly. The oracle replays the gate relationally (same md5 "
    "signatures, band agreement, Jaccard >= 0.8, arrival order) with "
    "no compaction concept, and the n_band_versions evidence column "
    "pins that the on-disk version count really collapsed to 2. At "
    "100 TB this is the unbounded-stream posture: per-batch probe "
    "overhead stays O(compact_every) however long the stream runs",
)
def q_stream_minhash_gate_compacted(spark, sf_dir):
    import glob
    import os
    from functools import reduce

    from flnr_wins_spark.plans.common import scratch_dir
    from flnr_wins_spark.streaming.sinks import (
        _state_versions,
        minhash_dedup_sink,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    _assert_offset_bands_free(docs, offsets=(1, 2))
    root = scratch_dir("stream_minhash_compact")
    src = root + "/src"

    batches = [
        docs.filter(F.col("doc_id") % 20 == 5 * k) for k in range(3)
    ]
    batches.append(
        docs.filter(F.col("doc_id") % 20 == 15)
        .unionByName(
            docs.filter(F.col("doc_id") % 40 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qq1 qq2")).alias("text"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 40 == 10).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qq3 qq4")).alias("text"),
            )
        )
    )

    stamped: set[str] = set()
    t0 = 1_700_000_000
    for i, batch in enumerate(batches):
        batch.coalesce(1).write.mode("append").parquet(src)
        for f in glob.glob(src + "/*.parquet"):
            if f not in stamped:
                os.utime(f, (t0 + 100 * i, t0 + 100 * i))
                stamped.add(f)

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    _run_stream(
        spark,
        lambda: minhash_dedup_sink(
            stream, root + "/state", "doc_id", "text",
            checkpoint_dir=root + "/ckpt",
            threshold=0.8, num_hash_tables=8, shingle_n=3, seed=42,
            hash_fn="md5", compact_every=2,
        ),
        what="compacted minhash gate",
    )
    n_versions = len(_state_versions(spark, root + "/state/bands"))
    parts = [
        spark.read.parquet(f"{root}/state_kept/v{b}").select(
            F.lit(b).cast("int").alias("batch"), "doc_id"
        )
        for b in range(4)
    ]
    return (
        reduce(lambda a, b: a.unionByName(b), parts)
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
        )
        .withColumn("n_band_versions", F.lit(n_versions).cast("int"))
    )


@query(
    "q_stream_incremental_agg",
    sql="""
    SELECT COALESCE(user_id % 100, -1) AS g,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(event_id) AS BIGINT) AS sid,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS mv
    FROM events GROUP BY 1
    """,
    note="The streaming MATERIALIZED VIEW sink graded end-to-end (was "
    "pytest batch-twin only): events fold through incremental_agg_sink "
    "over three file micro-batches — each batch merges its delta into "
    "the previous versioned aggregate state (batch N reads v<N, writes "
    "vN; replay-idempotent, reader-race-free), so refresh cost follows "
    "the batch, never the accumulated history. The newest state version "
    "is graded against the one-shot relational aggregate over the FULL "
    "history — the exact-fold contract (bigint sum columns, "
    "merge-order-independent) that makes the maintained view "
    "indistinguishable from a recompute. At 100 TB this is the "
    "always-fresh dashboard/feature-store path: per-batch cost O(batch "
    "+ touched groups) with provably batch-equal results",
)
def q_stream_incremental_agg(spark, sf_dir):
    import glob
    import os

    from flnr_wins_spark.plans.common import scratch_dir
    from flnr_wins_spark.streaming.sinks import incremental_agg_sink, read_agg_state

    ev = t(spark, sf_dir, "events").select(
        F.coalesce(F.pmod(F.col("user_id"), F.lit(100)), F.lit(-1))
        .cast("bigint").alias("g"),
        F.col("event_id").alias("sid"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("mv"),
        # NULL-safe split: the oracle aggregates EVERY row, so a NULL
        # event_id must still land in some batch (none exist in the
        # current testdata; this is contract hardening, not a bug fix)
        F.coalesce(F.pmod(F.col("event_id"), F.lit(3)), F.lit(0))
        .cast("bigint").alias("_split"),
    )

    root = scratch_dir("stream_iagg")
    src = root + "/src"
    stamped: set[str] = set()
    t0 = 1_700_000_000  # any fixed epoch; only the relative order matters
    for i in range(3):
        (
            ev.filter(F.col("_split") == i)
            .drop("_split")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        for f in glob.glob(src + "/*.parquet"):
            if f not in stamped:
                os.utime(f, (t0 + 100 * i, t0 + 100 * i))
                stamped.add(f)

    stream = (
        spark.readStream.schema("g bigint, sid bigint, mv bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    _run_stream(
        spark,
        lambda: incremental_agg_sink(
            stream, root + "/state", ["g"], ["sid", "mv"],
            checkpoint_dir=root + "/ckpt",
        ),
        what="incremental agg",
    )
    return read_agg_state(spark, root + "/state").select(
        "g",
        F.col("n").cast("bigint").alias("n"),
        F.col("sid").cast("bigint").alias("sid"),
        F.col("mv").cast("bigint").alias("mv"),
    )


@query(
    "q_stream_kmv_sketch",
    sql="""
    WITH d AS (
      SELECT DISTINCT event_type AS g,
             CAST(concat('0x', substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 12))
                  AS BIGINT) AS h
      FROM events
      WHERE user_id IS NOT NULL
    ), r AS (
      SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM d
    )
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CASE WHEN MAX(CASE WHEN rn = 64 THEN h END) IS NOT NULL
                THEN 17732923532771328.0
                     / CAST(MAX(CASE WHEN rn = 64 THEN h END) AS DOUBLE)
                ELSE CAST(COUNT(*) AS DOUBLE) END AS est_distinct
    FROM r WHERE rn <= 64 GROUP BY g
    """,
    note="The streaming KMV distinct-sketch sink graded end-to-end (was "
    "pytest batch-twin only): events stream through kmv_sketch_sink "
    "over three file micro-batches, each merging its per-group "
    "bottom-64 48-bit hash set into the previous versioned state "
    "(union, re-rank, keep k — the mergeability KMV guarantees "
    "EXACTLY, unlike most sketches' approximate merges). The newest "
    "state's estimates are graded against the one-shot relational "
    "bottom-k over the FULL history: identical n_kept and the "
    "identical (k-1)*2^48/h_k IEEE division, proving the maintained "
    "sketch is bit-equal to a recompute. At 100 TB this is the "
    "streaming cardinality dashboard: per-batch cost is O(batch + "
    "k*groups), state is k rows per group forever, history never "
    "rescanned",
)
def q_stream_kmv_sketch(spark, sf_dir):
    import glob
    import os

    from flnr_wins_spark.plans.common import scratch_dir
    from flnr_wins_spark.streaming.sinks import kmv_sketch_sink, read_kmv_estimates

    ev = t(spark, sf_dir, "events").select(
        "event_type", "user_id",
        # NULL-safe split: the oracle's distinct-user set has no event_id
        # condition, so a NULL event_id must still land in some batch
        # (none exist in the current testdata; contract hardening)
        F.coalesce(F.pmod(F.col("event_id"), F.lit(3)), F.lit(0))
        .cast("bigint").alias("_split"),
    )

    root = scratch_dir("stream_kmv")
    src = root + "/src"
    stamped: set[str] = set()
    t0 = 1_700_000_000  # any fixed epoch; only the relative order matters
    for i in range(3):
        (
            ev.filter(F.col("_split") == i)
            .drop("_split")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        for f in glob.glob(src + "/*.parquet"):
            if f not in stamped:
                os.utime(f, (t0 + 100 * i, t0 + 100 * i))
                stamped.add(f)

    stream = (
        spark.readStream.schema("event_type string, user_id bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    _run_stream(
        spark,
        lambda: kmv_sketch_sink(
            stream, root + "/state", "event_type", "user_id",
            checkpoint_dir=root + "/ckpt", k=64,
        ),
        what="KMV sketch",
    )
    return read_kmv_estimates(spark, root + "/state", k=64).select(
        "g", "n_kept", "est_distinct"
    )


@query(
    "q_stream_quantile_sketch",
    sql="""
    WITH d AS (
      SELECT event_type AS g, value AS v,
             md5('bq:' || CAST(event_id AS VARCHAR)) AS h
      FROM events
      WHERE value IS NOT NULL AND event_id IS NOT NULL
    ), sample AS (
      SELECT g, v, h FROM (
        SELECT g, v, h, row_number() OVER (PARTITION BY g ORDER BY h, v) AS rn
        FROM (SELECT DISTINCT g, v, h FROM d) dd) q WHERE rn <= 256
    ), ranked AS (
      SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v, h) AS vr,
             COUNT(*) OVER (PARTITION BY g) AS n_kept
      FROM sample
    )
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n_kept,
           MAX(CASE WHEN vr = CAST(ceil(0.5 * n_kept) AS INT) THEN v END) AS q50,
           MAX(CASE WHEN vr = CAST(ceil(0.9 * n_kept) AS INT) THEN v END) AS q90
    FROM ranked GROUP BY g
    """,
    note="The streaming bottom-k quantile-sample sink graded end-to-end "
    "(was pytest batch-twin only): events stream through "
    "quantile_sketch_sink over three file micro-batches, each merging "
    "its per-group 256 smallest-md5('bq:'||key) rows into the previous "
    "versioned state (union, re-rank, keep k — a pure function of the "
    "row-key SET, so the maintained sample is IDENTICAL to a "
    "full-history recompute, where t-digest/KLL compactions are "
    "arrival-order-dependent). The newest state's order-statistic "
    "estimates (value at rank ceil(q*n_kept) by (v,h)) are graded "
    "against the one-shot relational bottom-k — exact doubles, no "
    "tolerance. At 100 TB this is the streaming latency/percentile "
    "dashboard: k rows of state per group, per-batch cost O(batch + "
    "k*groups), history never rescanned",
)
def q_stream_quantile_sketch(spark, sf_dir):
    import glob
    import os

    from flnr_wins_spark.plans.common import scratch_dir
    from flnr_wins_spark.streaming.sinks import (
        quantile_sketch_sink,
        read_quantile_estimates,
    )

    ev = t(spark, sf_dir, "events").select(
        "event_type", "value", "event_id",
    )

    root = scratch_dir("stream_bq")
    src = root + "/src"
    stamped: set[str] = set()
    t0 = 1_700_000_000  # any fixed epoch; only the relative order matters
    for i in range(3):
        (
            ev.filter(F.pmod(F.col("event_id"), F.lit(3)) == i)
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        for f in glob.glob(src + "/*.parquet"):
            if f not in stamped:
                os.utime(f, (t0 + 100 * i, t0 + 100 * i))
                stamped.add(f)

    stream = (
        spark.readStream.schema(
            "event_type string, value double, event_id bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    _run_stream(
        spark,
        lambda: quantile_sketch_sink(
            stream, root + "/state", "event_type", "value", "event_id",
            checkpoint_dir=root + "/ckpt", k=256,
        ),
        what="quantile sketch",
    )
    return read_quantile_estimates(
        spark, root + "/state", quantiles=(0.5, 0.9)
    ).select("g", "n_kept", "q50", "q90")


@query(
    "q_stream_lakehouse_merge",
    sql="""
    WITH base AS (
      SELECT o_orderkey AS k, o_custkey AS v,
             CAST(o_orderkey % 4 AS VARCHAR) AS pb
      FROM orders
    ),
    kept AS (
      SELECT k,
             CASE WHEN k % 17 = 0 AND k % 13 <> 0 THEN v + 3000000
                  WHEN k % 11 = 0 THEN v + 2000000
                  WHEN k % 7  = 0 THEN v + 1000000
                  ELSE v END AS v,
             pb
      FROM base
      WHERE k % 13 <> 0
      UNION ALL
      SELECT k + 10000000, k + 5, pb FROM base WHERE k % 11 = 0
    )
    SELECT pb,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(v) AS BIGINT) AS sum_v,
           CAST(SUM(k) AS BIGINT) AS sum_k
    FROM kept GROUP BY 1
    """,
    note="The CDC stream -> lakehouse sink graded end-to-end (was pytest "
    "exactly-once/replay-pinned only): a table bootstrapped with "
    "write_ptable takes three mtime-ordered CDC micro-batches through "
    "ptable_merge_sink — updates (k%7), updates + inserts (k%11, new "
    "keys), then deletes (k%13) + updates (k%17 minus the deletes), "
    "each batch a keyed changeset MERGEd partition-pruned with the "
    "applied batch id committed atomically in the manifest meta. The "
    "final table is graded against the relational last-writer-wins "
    "replay (the CASE chain orders b2 > b1 > b0, deletes win last). "
    "At 100 TB this is the canonical stream-upserts-into-the-lake "
    "path: per-batch cost follows the partitions the changeset names "
    "(untouched partitions carry by manifest reference), and "
    "exactly-once holds across redelivery because the batch id rides "
    "the same atomic rename as the data",
)
def q_stream_lakehouse_merge(spark, sf_dir):
    import glob
    import os

    from flnr_wins_spark.plans.common import scratch_dir
    from flnr_wins_spark.sources.ptable import read_ptable, write_ptable
    from flnr_wins_spark.streaming.sinks import ptable_merge_sink

    base = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_custkey").alias("v"),
        F.pmod(F.col("o_orderkey"), F.lit(4)).cast("string").alias("pb"),
    )
    root = scratch_dir("stream_lake")
    table = root + "/table"
    write_ptable(base, table, "pb")

    no = F.lit(False).alias("is_del")
    b0 = base.filter(F.col("k") % 7 == 0).select(
        "k", (F.col("v") + 1000000).alias("v"), "pb", no
    )
    b1 = (
        base.filter(F.col("k") % 11 == 0)
        .select("k", (F.col("v") + 2000000).alias("v"), "pb", no)
        .unionByName(
            base.filter(F.col("k") % 11 == 0).select(
                (F.col("k") + 10000000).alias("k"),
                (F.col("k") + 5).cast("bigint").alias("v"),
                "pb", no,
            )
        )
    )
    b2 = (
        base.filter((F.col("k") % 17 == 0) & (F.col("k") % 13 != 0))
        .select("k", (F.col("v") + 3000000).alias("v"), "pb", no)
        .unionByName(
            base.filter(F.col("k") % 13 == 0).select(
                "k", F.lit(0).cast("bigint").alias("v"), "pb",
                F.lit(True).alias("is_del"),
            )
        )
    )

    src = root + "/src"
    stamped: set[str] = set()
    t0 = 1_700_000_000  # fixed epoch; the ORDER matters here — deletes
    for i, batch in enumerate((b0, b1, b2)):  # and updates are LAST-WINS
        batch.coalesce(1).write.mode("append").parquet(src)
        for f in glob.glob(src + "/*.parquet"):
            if f not in stamped:
                os.utime(f, (t0 + 100 * i, t0 + 100 * i))
                stamped.add(f)

    stream = (
        spark.readStream.schema("k bigint, v bigint, pb string, is_del boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    _run_stream(
        spark,
        lambda: ptable_merge_sink(
            stream, table, ["k"], checkpoint_dir=root + "/ckpt",
            delete_flag_col="is_del",
        ),
        what="lakehouse merge",
    )
    return (
        read_ptable(spark, table)
        .groupBy("pb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("v").cast("bigint").alias("sum_v"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
    )


@query(
    "q_stream_drift_psi",
    sql="""
    WITH curv AS (
      SELECT value + 25.0 AS v FROM events
      WHERE event_id % 2 = 1 AND value IS NOT NULL
    ),
    refv AS (
      SELECT value AS v FROM events
      WHERE event_id % 2 = 0 AND value IS NOT NULL
    ),
    cb AS (
      SELECT least(9, greatest(0, CAST(floor((v - 0.0) / 50.0) AS INTEGER)))
               AS bin, CAST(COUNT(*) AS BIGINT) AS n_cur
      FROM curv GROUP BY 1
    ),
    rb AS (
      SELECT least(9, greatest(0, CAST(floor((v - 0.0) / 50.0) AS INTEGER)))
               AS bin, CAST(COUNT(*) AS BIGINT) AS n_ref
      FROM refv GROUP BY 1
    ),
    grid AS (SELECT CAST(i AS INTEGER) AS bin FROM range(10) r(i)),
    counts AS (
      SELECT g.bin,
             CAST(COALESCE(cb.n_cur, 0) AS BIGINT) AS n_cur,
             CAST(COALESCE(rb.n_ref, 0) AS BIGINT) AS n_ref
      FROM grid g LEFT JOIN cb ON g.bin = cb.bin LEFT JOIN rb ON g.bin = rb.bin
    ),
    tot AS (
      SELECT CAST(SUM(n_cur) AS BIGINT) AS nt_cur,
             CAST(SUM(n_ref) AS BIGINT) AS nt_ref
      FROM counts
    )
    SELECT bin, n_cur, n_ref,
           ((CAST(n_cur + 1 AS DOUBLE) / CAST(nt_cur + 10 AS DOUBLE))
            - (CAST(n_ref + 1 AS DOUBLE) / CAST(nt_ref + 10 AS DOUBLE)))
           * CAST(CAST(ln(
               (CAST(n_cur + 1 AS DOUBLE) / CAST(nt_cur + 10 AS DOUBLE))
               / (CAST(n_ref + 1 AS DOUBLE) / CAST(nt_ref + 10 AS DOUBLE)))
             AS DECIMAL(20,9)) AS DOUBLE) AS psi_term
    FROM counts CROSS JOIN tot
    """,
    note="The streaming DRIFT MONITOR sink graded end-to-end (was pytest "
    "batch-twin only): the serving distribution (odd event_ids, shifted "
    "+25 — half a bin of REAL drift) streams through drift_psi_sink "
    "over three file micro-batches, each folding its fixed-grid bin "
    "histogram into the previous versioned state (exact BIGINT counts "
    "— order-free merge, so the maintained histogram is IDENTICAL to a "
    "one-shot batch pass); read_drift_psi then scores it against the "
    "even-id reference with the same additive-smoothed (p-q)*ln(p/q) "
    "terms as the batch operator, the one libm ln decimal-rounded. "
    "Oracle = the batch x_drift_psi arithmetic over the full history. "
    "At 100 TB this is the ML-ops serving alarm: state is bins rows of "
    "counts, per-batch cost one map-side-combine histogram, and the "
    "PSI read never rescans the stream",
)
def q_stream_drift_psi(spark, sf_dir):
    import glob
    import os

    from flnr_wins_spark.plans.common import scratch_dir
    from flnr_wins_spark.streaming.sinks import drift_psi_sink, read_drift_psi

    ev = t(spark, sf_dir, "events")
    cur = ev.filter(F.col("event_id") % 2 == 1).select(
        (F.col("value") + F.lit(25.0)).alias("value"),
        # NULL-safe split (contract hardening; no NULL event_ids exist)
        F.coalesce(F.pmod(F.col("event_id"), F.lit(3)), F.lit(0))
        .cast("bigint").alias("_split"),
    )
    ref = ev.filter(F.col("event_id") % 2 == 0).select("value")

    root = scratch_dir("stream_psi")
    src = root + "/src"
    stamped: set[str] = set()
    t0 = 1_700_000_000  # any fixed epoch; only the relative order matters
    for i in range(3):
        (
            cur.filter(F.col("_split") == i)
            .drop("_split")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        for f in glob.glob(src + "/*.parquet"):
            if f not in stamped:
                os.utime(f, (t0 + 100 * i, t0 + 100 * i))
                stamped.add(f)

    stream = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    _run_stream(
        spark,
        lambda: drift_psi_sink(
            stream, root + "/state", "value",
            checkpoint_dir=root + "/ckpt", lo=0.0, hi=500.0, bins=10,
        ),
        what="drift monitor",
    )
    return read_drift_psi(
        spark, root + "/state", ref, "value", lo=0.0, hi=500.0, bins=10
    )
