"""Streaming sinks via ``foreachBatch``.

Structured Streaming's file sink is append-only; production pipelines that
re-process (backfill, checkpoint reset, at-least-once sources) need an
IDEMPOTENT sink or they duplicate data. ``partitioned_overwrite_sink``
writes each micro-batch under its user partitions PLUS a ``_batch_id``
sub-partition, with dynamic partition overwrite scoped to the write:

  * replaying batch N (failure recovery, checkpoint reset over the same
    input) overwrites exactly batch N's own sub-partitions — idempotent;
  * a later batch touching the same user partition lands in a NEW
    ``_batch_id`` sub-partition — earlier batches' rows are never clobbered
    (plain per-partition dynamic overwrite gets this wrong: any partition
    value spanning two micro-batches would lose the earlier batch's rows).

Readers see an extra ``_batch_id`` column; drop it on read or treat it as
lineage metadata. (Delta/Iceberg MERGE is the transactional upgrade; this is
the vanilla-parquet equivalent.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def partitioned_overwrite_sink(
    stream: DataFrame,
    path: str,
    partition_cols: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Write a stream to partitioned parquet, idempotently per micro-batch.

    Scale notes: partition columns must be low-cardinality derivations of
    event time (date/hour), never raw keys — one directory per value. The
    overwrite mode is passed as a WRITE option, not session conf, so other
    writers in the session keep default static-overwrite semantics.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols, "_batch_id")
            .parquet(path)
        )

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _state_fs(spark, path: str):
    """(FileSystem, Path) via the shared ``fsutil.hadoop_fs`` — versioned
    state works on any Spark-writable scheme (file://, hdfs://, s3a://...),
    not only the driver's local disk."""
    from flnr_wins_spark.fsutil import hadoop_fs

    return hadoop_fs(spark, path)


def _state_versions(spark, state_path: str) -> list[int]:
    fs, jpath = _state_fs(spark, state_path)
    if not fs.exists(jpath):
        return []
    out = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.startswith("v") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def _state_delete(spark, path: str) -> None:
    fs, jpath = _state_fs(spark, path)
    fs.delete(jpath, True)


def _drop_superseded(spark, path: str, batch_id: int) -> None:
    """Delete versions NUMBERED ABOVE the current batch: they belong to an
    abandoned timeline (a checkpoint reset renumbers batches from 0, and a
    coarser re-batching writes fewer, lower-numbered versions). Left in
    place, readers — which always pick the HIGHEST version — would prefer
    the stale timeline's state forever."""
    for v in _state_versions(spark, path):
        if v > batch_id:
            _state_delete(spark, f"{path}/v{v}")


def _recover_compaction(spark, root: str) -> None:
    """Finish (or discard) an interrupted :func:`_compact_delta_versions`
    before any reader lists ``root``'s versions. Invariants that make
    every crash point recoverable: the merge set is always the OLDEST
    versions (every ``v <= target``), the tmp dir is ``_SUCCESS``-marked
    only once it holds the COMPLETE merged union, and originals are only
    renamed to ``compacted_v*`` side names (invisible to
    ``_state_versions``) until the tmp takes the target name."""
    import re

    fs, jroot = _state_fs(spark, root)
    if not fs.exists(jroot):
        return
    tmps: list[int] = []
    leftovers: list[str] = []
    for status in fs.listStatus(jroot):
        name = status.getPath().getName()
        m = re.fullmatch(r"compact_tmp_v(\d+)", name)
        if m:
            tmps.append(int(m.group(1)))
        elif re.fullmatch(r"compacted_v\d+", name):
            leftovers.append(name)
    for target in tmps:
        tmp = f"{root}/compact_tmp_v{target}"
        _, jmark = _state_fs(spark, f"{tmp}/_SUCCESS")
        if fs.exists(jmark):
            # the marked tmp contains every v <= target in full: drop any
            # original still visible, then promote the tmp
            for v in _state_versions(spark, root):
                if v <= target:
                    _state_delete(spark, f"{root}/v{v}")
            _, jsrc = _state_fs(spark, tmp)
            _, jdst = _state_fs(spark, f"{root}/v{target}")
            # Hadoop FileSystem.rename signals failure by returning false,
            # not raising — a silent false here would leave the recovered
            # target version missing
            if not fs.rename(jsrc, jdst):
                raise IOError(
                    f"compaction recovery: rename {tmp} -> {root}/v{target} failed"
                )
        else:  # incomplete merge write: originals are untouched
            _state_delete(spark, tmp)
    for name in leftovers:
        _state_delete(spark, f"{root}/{name}")


def _compact_delta_versions(spark, root: str, max_versions: int = 8) -> None:
    """Bound a DELTA-layout state's version count (union-of-versions ==
    the state): when more than ``max_versions`` deltas exist, merge the
    oldest into ONE parquet dir named after the newest merged version —
    per-batch probe overhead (FS listings, file opens, plan-union width)
    stays O(max_versions) however many micro-batches the stream has seen,
    while the state CONTENTS are unchanged (the r13 VERDICT's
    persisted-index-compaction task for the near-dup gate). The merge
    target is always < the newest retained version, so a replayed batch
    rewriting its own delta never clobbers compacted history, and a
    checkpoint-reset timeline (which restarts at batch 0) still wipes
    compacted state through ``_drop_superseded``. Crash-safe with
    :func:`_recover_compaction` via a _SUCCESS-marked tmp + side-renames."""
    versions = _state_versions(spark, root)
    if max_versions < 2 or len(versions) <= max_versions:
        return
    merge = versions[: len(versions) - max_versions + 1]
    target = merge[-1]
    tmp = f"{root}/compact_tmp_v{target}"
    spark.read.parquet(*[f"{root}/v{v}" for v in merge]).write.mode(
        "overwrite"
    ).parquet(tmp)
    fs, _ = _state_fs(spark, root)
    # rename returns false on failure instead of raising; a silent false
    # would leave duplicate rows (original v<N> plus the promoted merge)
    for v in merge:
        _, jsrc = _state_fs(spark, f"{root}/v{v}")
        _, jdst = _state_fs(spark, f"{root}/compacted_v{v}")
        if not fs.rename(jsrc, jdst):
            raise IOError(
                f"delta compaction: side-rename {root}/v{v} -> "
                f"compacted_v{v} failed"
            )
    _, jsrc = _state_fs(spark, tmp)
    _, jdst = _state_fs(spark, f"{root}/v{target}")
    if not fs.rename(jsrc, jdst):
        raise IOError(
            f"delta compaction: promoting {tmp} -> {root}/v{target} failed"
        )
    for v in merge:
        _state_delete(spark, f"{root}/compacted_v{v}")


def _prune_state_versions(spark, state_path: str, batch_id: int, keep: int = 3) -> None:
    """The one retention policy every snapshot-state sink shares: drop the
    superseded timeline (versions > batch_id), then all but the newest
    ``keep`` versions at/below it (in-flight readers finish on the
    retained ones). NOT for delta-layout state, whose union-of-versions IS
    the state."""
    _drop_superseded(spark, state_path, batch_id)
    versions = [v for v in _state_versions(spark, state_path) if v <= batch_id]
    for v in versions[:-keep]:
        if v != batch_id:
            _state_delete(spark, f"{state_path}/v{v}")


def incremental_agg_sink(
    stream: DataFrame,
    state_path: str,
    key_cols: list[str],
    sum_cols: list[str],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously-maintained aggregate table (streaming materialized
    view): each micro-batch folds into the previous aggregate state with
    ``operators.merge.incremental_agg`` — refresh cost follows the BATCH,
    never the accumulated history.

    State is versioned, never overwritten in place: batch N reads the
    newest ``v<id>`` directory with id < N and writes ``v<N>``. That makes
    replays idempotent (re-running batch N rebuilds ``v<N>`` from the same
    predecessor, not from its own output) and readers race-free
    (:func:`read_agg_state` always sees a complete version). Old versions
    are pruned after each successful write, keeping the last few for
    in-flight readers. Version discovery and pruning go through the Hadoop
    FileSystem API, so ``state_path`` may live on any filesystem Spark can
    write (local, HDFS, s3a, ...), not just the driver's local disk.
    ``sum_cols`` must be exact types (bigint/decimal) so the merged state is
    independent of merge order — the ``plans/common.py`` determinism rule.
    """
    from flnr_wins_spark.operators.merge import incremental_agg

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        delta = batch_df.withColumn("_sign", F.lit(1))
        prior = [v for v in _state_versions(spark, state_path) if v < batch_id]
        if prior:
            prev = spark.read.parquet(f"{state_path}/v{prior[-1]}")
        else:
            prev = (
                delta.limit(0)
                .groupBy(*key_cols)
                .agg(
                    F.sum("_sign").cast("bigint").alias("n"),
                    *[F.sum(F.col(c)).alias(c) for c in sum_cols],
                )
            )
        new = incremental_agg(prev, delta, key_cols, sum_cols, sign_col="_sign")
        new.write.mode("overwrite").parquet(f"{state_path}/v{batch_id}")
        _prune_state_versions(spark, state_path, batch_id)

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_agg_state(spark, state_path: str) -> DataFrame:
    """Read the newest complete aggregate-state version written by
    :func:`incremental_agg_sink` (any Spark-writable filesystem)."""
    versions = _state_versions(spark, state_path)
    if not versions:
        raise FileNotFoundError(f"no aggregate state under {state_path}")
    return spark.read.parquet(f"{state_path}/v{versions[-1]}")


def kmv_sketch_sink(
    stream: DataFrame,
    state_path: str,
    group_col: str,
    value_col: str,
    checkpoint_dir: str,
    k: int = 64,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously-maintained KMV distinct sketch (streaming cousin of
    ``functions.sketches.kmv_distinct``): each micro-batch's per-group
    bottom-k hash set merges with the previous state — union, re-rank, keep
    k — which is exactly the mergeability KMV guarantees, so the maintained
    sketch is IDENTICAL to one built from the full history in batch (the
    batch-twin test pins this). State versioning/idempotency follows
    :func:`incremental_agg_sink` (batch N reads v<N, writes vN; replays
    rebuild, readers never see partial writes).

    Per-batch cost follows the batch: the batch contributes at most
    k·groups candidate rows after its own bottom-k, and the merge touches
    only sketch rows — history is never rescanned.
    """
    from pyspark.sql import Window

    from flnr_wins_spark.functions.sketches import kmv_hash

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_sk = (
            batch_df.select(
                F.col(group_col).alias("g"), kmv_hash(F.col(value_col)).alias("h")
            )
            .filter(F.col("h").isNotNull())  # NULL rule: see sketches.kmv_distinct
            .distinct()
            .withColumn(
                "rn", F.row_number().over(Window.partitionBy("g").orderBy("h"))
            )
            .filter(F.col("rn") <= k)
            .select("g", "h")
        )
        prior = [v for v in _state_versions(spark, state_path) if v < batch_id]
        merged = batch_sk
        if prior:
            prev = spark.read.parquet(f"{state_path}/v{prior[-1]}")
            merged = prev.unionByName(batch_sk)
        new = (
            merged.distinct()
            .withColumn(
                "rn", F.row_number().over(Window.partitionBy("g").orderBy("h"))
            )
            .filter(F.col("rn") <= k)
            .select("g", "h")
        )
        new.write.mode("overwrite").parquet(f"{state_path}/v{batch_id}")
        _prune_state_versions(spark, state_path, batch_id)

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_kmv_estimates(spark, state_path: str, k: int = 64) -> DataFrame:
    """Distinct-count estimates from the newest sketch state written by
    :func:`kmv_sketch_sink` — same estimator as ``kmv_distinct`` minus the
    exact-truth column (the stream never stores raw values)."""
    from pyspark.sql import Window

    sk = read_agg_state(spark, state_path)  # same versioned layout
    r = sk.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("h"))
    )
    from flnr_wins_spark.functions.sketches import kmv_estimate

    agg = r.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
    )
    return agg.select("g", "n_kept", kmv_estimate(k).alias("est_distinct"))


def exact_dedup_sink(
    stream: DataFrame,
    state_path: str,
    id_col: str,
    text_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
    retention_batches: int | None = None,
) -> StreamingQuery:
    """Ingestion-time exact-dedup gate: each micro-batch drops rows whose
    content digest (md5 of the text) was already seen — in the persisted
    seen-set (FIRST ARRIVAL wins across batches) or earlier in the same
    batch (lower id wins within a batch). With id-ordered arrival — the
    normal ingestion case, and what the batch-twin test streams — the
    survivor set equals ``operators.dedup.exact_dedup``'s lowest-id
    policy; under out-of-order arrival the first-seen copy survives
    instead (a gate cannot un-keep an already-published row).
    Survivors append to
    ``kept/v<batch>``; the seen-set state is PER-BATCH DELTAS (the
    ``minhash_dedup_sink`` layout): version N holds only batch N's newly
    kept digests, the anti-join reads the union of prior deltas, and a
    replay rewrites only its own delta — so per-batch WRITE cost follows
    the batch, never the accumulated history (the previous full-snapshot
    layout re-shuffled and rewrote every digest ever seen, each batch).

    The batch-twin test pins: streaming the corpus in arrival order ==
    one-shot batch exact dedup — including NULL text, which has no
    content to compare: NULL-digest rows bypass deduplication entirely
    (all kept, never entering the seen-set), the same NULL doctrine as
    the batch operator. Without the split, the within-batch window would
    group NULL digests as "duplicates" while the cross-batch equi
    anti-join never matches NULL==NULL — two different wrong answers.

    ``retention_batches`` bounds the seen-set STATE (the TTL posture an
    unbounded stream needs: without it, state grows with every distinct
    document ever seen): the gate consults only the newest N delta
    versions and DELETES deltas that age out of the horizon, so state
    size follows the horizon's traffic, not stream lifetime. The trade
    is explicit and standard (Structured Streaming's own dedup-with-
    watermark makes the same one): a duplicate recurring AFTER the
    horizon is re-admitted. Default None = exact forever.
    """
    from pyspark.sql import Window

    kept_base = f"{state_path.rstrip('/')}_kept"
    if retention_batches is not None and retention_batches < 1:
        raise ValueError("retention_batches must be >= 1")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # a checkpoint reset renumbers batches: both the delta state and
        # the kept output must shed the abandoned timeline's versions
        _drop_superseded(spark, state_path, batch_id)
        _drop_superseded(spark, kept_base, batch_id)
        d = batch_df.withColumn(
            "_digest", F.md5(F.encode(F.col(text_col).cast("string"), "UTF-8"))
        )
        nulls = d.filter(F.col("_digest").isNull())
        nn = d.filter(F.col("_digest").isNotNull())
        w = Window.partitionBy("_digest").orderBy(F.col(id_col))
        in_batch_first = nn.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") == 1
        ).drop("_rn")
        prior = [v for v in _state_versions(spark, state_path) if v < batch_id]
        if retention_batches is not None:
            horizon = batch_id - retention_batches
            expired = [v for v in prior if v < horizon]
            prior = [v for v in prior if v >= horizon]
            # age out deltas past the horizon: state stays bounded by the
            # horizon's traffic (delete AFTER deciding what to consult —
            # an expired delta is never read again on any timeline)
            for v in expired:
                _state_delete(spark, f"{state_path}/v{v}")
        if prior:
            seen = spark.read.parquet(*[f"{state_path}/v{v}" for v in prior])
            deduped = in_batch_first.join(seen, "_digest", "left_anti")
        else:
            deduped = in_batch_first
        kept = deduped.unionByName(nulls)
        kept.drop("_digest").write.mode("overwrite").parquet(
            f"{kept_base}/v{batch_id}"
        )
        deduped.select("_digest").distinct().write.mode("overwrite").parquet(
            f"{state_path}/v{batch_id}"
        )

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_dedup_kept(spark, state_path: str) -> DataFrame:
    """Union every kept/v* batch output written by :func:`exact_dedup_sink`."""
    base = f"{state_path.rstrip('/')}_kept"
    return spark.read.parquet(f"{base}/v*")


def minhash_dedup_sink(
    stream: DataFrame,
    state_path: str,
    id_col: str,
    text_col: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    num_hash_tables: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    available_now: bool = True,
    compact_every: int = 8,
) -> StreamingQuery:
    """Ingestion-time NEAR-dup gate (the streaming face of
    ``operators.dedup.minhash_lsh_pairs``): a document is rejected when its
    exact Jaccard against ANY earlier-id seen document reaches
    ``threshold``, with candidates found through the same MinHash band
    buckets as the batch operator. The gate's contract is ARRIVAL order:
    a new doc is rejected when it matches any previously-seen doc
    (kept or rejected, regardless of id), plus any earlier-id doc within
    its own batch. When arrival order follows id order — the normal
    ingestion case, and what the batch-twin test streams — rejected ids
    == {later id of every verified minhash_lsh_pairs(corpus) pair};
    out-of-order arrivals still reject the newcomer (never both copies).

    State per seen doc (r14 layout): PRE-EXPLODED band-bucket rows at
    ``<state>/bands/v<N>`` (id, band, mhv) — the persisted index the
    candidate join probes directly, so history is never re-banded from
    signatures batch after batch — and shingle sets at
    ``<state>/shsets/v<N>`` (read ONLY by the exact-verify join), each
    written as PER-BATCH DELTA versions (replaying batch N rewrites only
    v<N>'s own deltas — idempotent; the read side unions prior deltas,
    so per-batch WRITE cost follows the batch, not the accumulated
    history). Once more than ``compact_every`` deltas accumulate, the
    oldest merge into one (``_compact_delta_versions``, crash-safe via
    ``_recover_compaction``) — per-batch version overhead (listings,
    file opens, plan-union width) stays bounded over a long-running
    stream while the state CONTENTS are unchanged. Per-batch compute:
    batch signatures are a narrow map; candidate discovery is the
    batch-bands x state-bands equi-join on (band, minhash); exact verify
    touches candidates only. At
    TB-scale states, swap the stored shingle sets for signature-estimated
    Jaccard (fraction of agreeing min-hashes) — same candidate join, 16
    ints of state per doc; the exact-verify default is what the batch twin
    checks. Survivors append to ``<state>_kept/v<batch>``.

    ``hash_fn="md5"`` selects the engine-portable signature (lexicographic
    min of fixed-width hex == unsigned numeric min), which makes the whole
    gate — signatures, band buckets, candidate set, exact verify —
    relationally replayable by a SQL oracle (see ``q_stream_minhash_gate``);
    the xxhash64 default stays the JVM fast path.
    """
    from flnr_wins_spark.operators.dedup import (
        exact_jaccard,
        minhash_bands,
        minhash_signature_table,
    )

    base = state_path.rstrip("/")
    bands_root, sh_root, kept_root = f"{base}/bands", f"{base}/shsets", f"{base}_kept"

    # Legacy-layout guard: before the r14 band-index layout, state lived as
    # flat signature deltas at <state>/v<N>. Restarting over such state with
    # this sink would silently see EMPTY prior history (bands/ missing) and
    # re-admit previously-seen near-dups. Detect and refuse loudly.
    _legacy_spark = stream.sparkSession
    if _state_versions(_legacy_spark, base) and not _state_versions(
        _legacy_spark, bands_root
    ):
        raise ValueError(
            f"minhash_dedup_sink: {base} holds a pre-band-index (flat v*) "
            "state layout; this sink reads <state>/bands + <state>/shsets "
            "and would silently treat the legacy history as empty. Migrate "
            "or point the sink at a fresh state_path."
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # finish any interrupted compaction, then shed an abandoned
        # timeline's deltas/outputs before reading priors
        for root in (bands_root, sh_root):
            _recover_compaction(spark, root)
            _drop_superseded(spark, root, batch_id)
        _drop_superseded(spark, kept_root, batch_id)
        sig_new = minhash_signature_table(
            batch_df, text_col, id_col,
            num_hash_tables=num_hash_tables, shingle_n=shingle_n, seed=seed,
            hash_fn=hash_fn,
        ).localCheckpoint()
        bands_new = minhash_bands(sig_new, num_hash_tables)
        # DELTA state: each version holds only ITS batch's rows; the read
        # side unions prior versions (bounded by _compact_delta_versions).
        prior = [v for v in _state_versions(spark, bands_root) if v < batch_id]
        if prior:
            # the persisted band index probes directly — no re-banding of
            # history, and the heavy shset column is never touched here
            bands_old = spark.read.parquet(
                *[f"{bands_root}/v{v}" for v in prior]
            )
            # NEW doc vs ANY seen doc — no id comparison: the gate's contract
            # is arrival order, so a later-arriving near-dup is rejected even
            # when it carries a lower id than its seen match
            cand_cross = (
                bands_new.alias("b")
                .join(
                    bands_old.alias("a"),
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.mhv") == F.col("b.mhv"))
                    & (F.col("a.id") != F.col("b.id")),
                )
                .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            )
            sh_prior = [v for v in _state_versions(spark, sh_root) if v < batch_id]
            if not sh_prior:
                # bands priors exist (we are in this branch) but shset
                # priors do not — external cleanup or layout skew; an empty
                # read would fail with an opaque path error
                raise ValueError(
                    f"minhash_dedup_sink: state skew — {bands_root} has "
                    f"prior versions {prior} but {sh_root} has none; the "
                    "two roots must hold the same version timeline"
                )
            all_sh = spark.read.parquet(
                *[f"{sh_root}/v{v}" for v in sh_prior]
            ).unionByName(sig_new.select("id", "shset"))
        else:
            cand_cross = None
            all_sh = sig_new.select("id", "shset")
        a, b = bands_new.alias("a"), bands_new.alias("b")
        cand_in = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.mhv") == F.col("b.mhv"))
            & (F.col("a.id") < F.col("b.id")),
        ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        cand = cand_in if cand_cross is None else cand_in.unionByName(cand_cross)
        cand = cand.distinct()
        sa = all_sh.select(F.col("id").alias("id_a"), F.col("shset").alias("sh_a"))
        sb = sig_new.select(F.col("id").alias("id_b"), F.col("shset").alias("sh_b"))
        dup_ids = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(exact_jaccard(F.col("sh_a"), F.col("sh_b")) >= threshold)
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        kept = batch_df.join(dup_ids, id_col, "left_anti")
        kept.write.mode("overwrite").parquet(f"{kept_root}/v{batch_id}")
        bands_new.write.mode("overwrite").parquet(f"{bands_root}/v{batch_id}")
        sig_new.select("id", "shset").write.mode("overwrite").parquet(
            f"{sh_root}/v{batch_id}"
        )
        for root in (bands_root, sh_root):
            _compact_delta_versions(spark, root, max_versions=compact_every)

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def quantile_sketch_sink(
    stream: DataFrame,
    state_path: str,
    group_col: str,
    value_col: str,
    key_col: str,
    checkpoint_dir: str,
    k: int = 256,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously-maintained bottom-k quantile sample (streaming cousin
    of ``functions.sketches.bottomk_quantiles``): each micro-batch keeps
    its per-group k rows with smallest ``md5('bq:' || key)`` and merges
    them with the previous state — union, re-rank by hash, keep k. The
    bottom-k sample is a pure function of the row-key SET, so the
    maintained state is IDENTICAL to one built from the full history in
    batch (the batch-twin test pins this), and replays dedup through the
    (g, h, v) distinct. State versioning/idempotency follows
    :func:`incremental_agg_sink`.

    Rows whose value or key is NULL are excluded (same rule as the batch
    operator: NULL hashes rank first in Spark, last in DuckDB)."""
    from pyspark.sql import Window

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        from flnr_wins_spark.functions.sketches import bq_hash

        h = bq_hash(F.col(key_col))
        batch_sk = (
            batch_df.select(
                F.col(group_col).alias("g"),
                F.col(value_col).alias("v"),
                h.alias("h"),
            )
            .filter(F.col("v").isNotNull() & F.col("h").isNotNull())
            # dedup BEFORE the cut (same order as kmv_sketch_sink): an
            # at-least-once redelivered row must not occupy two of the k
            # slots and evict a distinct row — that loss would be permanent
            .distinct()
            .withColumn(
                "rn",
                F.row_number().over(Window.partitionBy("g").orderBy("h", "v")),
            )
            .filter(F.col("rn") <= k)
            .select("g", "h", "v")
        )
        prior = [v for v in _state_versions(spark, state_path) if v < batch_id]
        merged = batch_sk
        if prior:
            prev = spark.read.parquet(f"{state_path}/v{prior[-1]}")
            merged = prev.unionByName(batch_sk)
        new = (
            merged.distinct()
            .withColumn(
                "rn",
                F.row_number().over(Window.partitionBy("g").orderBy("h", "v")),
            )
            .filter(F.col("rn") <= k)
            .select("g", "h", "v")
        )
        new.write.mode("overwrite").parquet(f"{state_path}/v{batch_id}")
        _prune_state_versions(spark, state_path, batch_id)

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_quantile_estimates(
    spark, state_path: str, quantiles: tuple[float, ...] = (0.5, 0.9)
) -> DataFrame:
    """Quantile estimates from the newest sample state written by
    :func:`quantile_sketch_sink` — delegates to the ONE estimator
    (``sketches.sample_quantiles``) the batch operator uses, so the two
    can never silently diverge."""
    from flnr_wins_spark.functions.sketches import sample_quantiles

    return sample_quantiles(read_agg_state(spark, state_path), quantiles)


def ptable_merge_sink(
    stream: DataFrame,
    table_path: str,
    key_cols: list[str],
    checkpoint_dir: str,
    delete_flag_col: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """CDC stream -> partitioned lakehouse table: each micro-batch MERGEs
    into a manifest-committed partition-level MVCC table
    (:func:`flnr_wins_spark.sources.ptable.merge_ptable`) — the canonical
    "stream upserts into the lake" pattern, with delta-proportional cost
    (only the partitions the batch touches are read or written; everything
    else carries into the new manifest by reference).

    Rows whose ``delete_flag_col`` is true are applied as deletes (their
    key + partition), the rest upsert; schema evolution flows through
    (a new column in the stream evolves the table). The table must be
    bootstrapped with ``write_ptable`` first — the sink takes the
    partition column from the committed manifest.

    Replay idempotency is EXACTLY-ONCE by construction: the applied batch
    id commits atomically WITH the data (it rides the manifest's ``meta``
    in the same rename), so after any crash/redelivery the sink compares
    the incoming batch id against the newest manifest and SKIPS batches
    already applied — no partial re-merge, no double-upsert, the same
    commit protocol Delta's idempotent ``txnVersion`` writes use. A
    crashed attempt's uncommitted stage dir is cleared by the retry."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        from flnr_wins_spark.sources.ptable import (
            _manifest_ids,
            _read_manifest,
            merge_ptable,
            read_manifest_meta,
        )

        last = read_manifest_meta(spark, table_path).get("batch_id")
        if last is not None and batch_id <= last:
            return  # redelivered batch: already committed atomically
        src = batch_df
        dels = None
        if delete_flag_col is not None:
            ids = _manifest_ids(spark, table_path)
            part_col = _read_manifest(spark, table_path, ids[-1])["part_col"]
            dels = (
                batch_df.filter(F.col(delete_flag_col))
                .select(*key_cols, part_col)
            )
            src = batch_df.filter(
                ~F.coalesce(F.col(delete_flag_col), F.lit(False))
            ).drop(delete_flag_col)
        merge_ptable(
            spark, table_path, src, key_cols,
            delete_keys=dels, meta={"batch_id": batch_id},
        )

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drift_psi_sink(
    stream: DataFrame,
    state_path: str,
    value_col: str,
    checkpoint_dir: str,
    lo: float,
    hi: float,
    bins: int = 10,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming DRIFT MONITOR: continuously maintain the serving
    distribution's bin histogram (same fixed [lo, hi) equal-width grid as
    the batch ``operators.dataquality.drift_psi``) so PSI against a
    training-time reference is always one tiny read away — the ML-ops
    "is production input drifting away from what the model saw" alarm,
    evaluated per micro-batch instead of per nightly job.

    State versioning/idempotency follows :func:`incremental_agg_sink`
    (batch N folds the previous v<id<N> state, writes v<N>; replays
    rebuild from the predecessor). The state is ``bins`` rows of exact
    BIGINT counts, so merging is order-free and the maintained histogram
    is IDENTICAL to one batch pass over the full history — the batch-twin
    contract; :func:`read_drift_psi` then scores it against the reference
    with the SAME per-bin term arithmetic as the batch operator."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        from flnr_wins_spark.operators.dataquality import psi_bin_counts

        delta = psi_bin_counts(batch_df, value_col, lo, hi, bins, "n_cur")
        prior = [v for v in _state_versions(spark, state_path) if v < batch_id]
        if prior:
            prev = spark.read.parquet(f"{state_path}/v{prior[-1]}")
            merged = (
                prev.unionByName(delta)
                .groupBy("bin")
                .agg(F.sum("n_cur").cast("bigint").alias("n_cur"))
            )
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(f"{state_path}/v{batch_id}")
        _prune_state_versions(spark, state_path, batch_id)

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_drift_psi(
    spark, state_path: str, ref: DataFrame, value_col: str,
    lo: float, hi: float, bins: int = 10,
) -> DataFrame:
    """PSI of the maintained streaming histogram against a static
    reference — the reference bins through the SAME ``psi_bin_counts``
    and the terms through the SAME ``psi_terms`` the batch operator uses
    (one binning definition, one term arithmetic), so streaming and
    batch scores can never silently diverge. Cost: the state is ``bins``
    rows; only the reference side scans data."""
    from flnr_wins_spark.operators.dataquality import psi_bin_counts, psi_terms

    state = read_agg_state(spark, state_path)  # (bin, n_cur)
    grid = spark.range(bins).select(F.col("id").cast("int").alias("bin"))
    counts = (
        grid.join(state, "bin", "left")
        .join(psi_bin_counts(ref, value_col, lo, hi, bins, "n_ref"), "bin", "left")
        .select(
            "bin",
            F.coalesce("n_cur", F.lit(0)).cast("bigint").alias("n_cur"),
            F.coalesce("n_ref", F.lit(0)).cast("bigint").alias("n_ref"),
        )
    )
    return psi_terms(counts, bins)
