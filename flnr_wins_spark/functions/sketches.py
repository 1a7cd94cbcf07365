"""Mergeable frequency/membership sketches: Count-Min and a Bloom-style
semi-join prefilter.

The reference has no sketch surface (SURVEY.md §2c); a 100 TB engine needs
sub-linear summaries for frequency estimation (heavy hitters without a full
vocabulary shuffle) and for runtime join pruning (ship a compact membership
filter to the big side instead of shuffling it). Spark's own runtime Bloom
filter (spark.sql.optimizer.runtime.bloomFilter.enabled) does the latter
inside the optimizer for eligible shapes; ``bloom_prefilter`` is the
explicit, composable version for shapes the rule misses (pre-aggregated
sides, multi-stage pipelines, stream-static joins).

Portability contract: bucket indexes are hex prefixes of md5(seed || key).
md5 is bit-identical in every engine (unlike xxhash64, which DuckDB lacks),
so a DuckDB oracle can rebuild the exact same sketch — the same trick
operators/sample.py uses for content-addressed sampling.

Both sketches are pure aggregations, hence mergeable across partitions,
days, or shards: CMS tables add cell-wise; Bloom bucket sets union.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, seed: int, hex_chars: int) -> Column:
    """16**hex_chars-way bucket of a key: hex prefix of md5(seed || key)."""
    return F.substring(
        F.md5(F.concat(F.lit(f"s{seed}:"), col.cast("string"))), 1, hex_chars
    )


def countmin_estimates(
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    hex_chars: int = 1,
) -> DataFrame:
    """Build a Count-Min sketch (depth × 16**hex_chars cells) over
    ``items`` and return, per distinct item, its true count next to the CMS
    point estimate: (item, true_cnt, est_cnt). est_cnt >= true_cnt always;
    equality iff no colliding item shares all ``depth`` buckets.

    Dataflow: one groupBy builds exact per-item counts (in production the
    sketch is built FROM the raw stream; summing pre-aggregated counts into
    cells is numerically identical and cheaper to express), a narrow explode
    fans each item to its ``depth`` (seed, bucket) cells, cell sums are a
    sketch-sized aggregate, and the estimate is a min over a broadcast join
    of item→cell against the tiny cell table. The corpus shuffles once.
    """
    counts = items.groupBy(F.col(item_col).alias("item")).agg(
        F.count("*").alias("true_cnt")
    )
    fanned = counts.select(
        "item",
        "true_cnt",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("seed"),
                    _bucket(F.col("item"), s, hex_chars).alias("bucket"),
                )
                for s in range(depth)
            ])
        ).alias("cell"),
    ).select("item", "true_cnt", "cell.seed", "cell.bucket")
    cells = fanned.groupBy("seed", "bucket").agg(F.sum("true_cnt").alias("cell_sum"))
    return (
        fanned.join(F.broadcast(cells), ["seed", "bucket"])
        .groupBy("item", "true_cnt")
        .agg(F.min("cell_sum").alias("est_cnt"))
    )


def bloom_prefilter(
    big: DataFrame,
    keys: DataFrame,
    on_big: str,
    on_key: str,
    depth: int = 3,
    hex_chars: int = 4,
) -> DataFrame:
    """Bloom-style pre-filter of ``big`` against the key set in ``keys``:
    keep rows of ``big`` whose ``on_big`` value lands in an occupied bucket
    for ALL ``depth`` hash functions. Superset of the exact semi-join (false
    positives only, rate ≈ (occupancy)^depth) — callers finish with an exact
    semi-join on the survivors; total semantics stay exact while the
    shuffle-bound side shrinks map-side first.

    Each round is a broadcast LEFT SEMI against a ≤16**hex_chars-row bucket
    list — no shuffle of ``big`` at any point.
    """
    out = big
    for s in range(depth):
        # bind the bucket column through the occ DataFrame reference (not a
        # bare F.col) so a same-named column on `big` can't capture it
        occ = keys.select(
            _bucket(F.col(on_key), s, hex_chars).alias("_bloom_bucket")
        ).distinct()
        out = out.join(
            F.broadcast(occ),
            _bucket(F.col(on_big), s, hex_chars) == occ["_bloom_bucket"],
            "left_semi",
        )
    return out


def kmv_hash(col: Column) -> Column:
    """Uniform 48-bit integer hash for the KMV family: first 12 hex chars of
    md5('kmv:' || value) parsed to a bigint. ONE definition shared by
    kmv_distinct, kmv_set_similarity, and the streaming kmv_sketch_sink —
    the batch-twin equivalence of the sink depends on all of them hashing
    identically."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit("kmv:"), col.cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("bigint")


KMV_HASH_SPACE = 16**12  # 2^48


def kmv_estimate(k: int) -> Column:
    """Distinct estimate from an aggregated sketch row carrying ``n_kept``
    and ``hk`` (k-th smallest hash, NULL when fewer than k):
    (k-1)*2^48/h_k, exact-count fallback."""
    scale = float((k - 1) * KMV_HASH_SPACE)
    return F.when(
        F.col("hk").isNotNull(), F.lit(scale) / F.col("hk").cast("double")
    ).otherwise(F.col("n_kept").cast("double"))


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    prefilter_bits: int = 0,
) -> DataFrame:
    """K-minimum-values distinct-count estimate per group (Bar-Yossef et al.
    2002): hash every value to a uniform 48-bit integer (md5 prefix —
    engine-portable, same contract as the sketches above), keep the k
    smallest distinct hashes per group, and estimate

        distinct ≈ (k-1) * 2^48 / h_k        (h_k = k-th smallest hash)

    falling back to the exact count when a group has fewer than k distinct
    hashes. Unlike HLL the whole construction is deterministic integer
    arithmetic + one IEEE division, so a SQL oracle rebuilds it bit-exactly —
    this is the hash-checkable witness for the rows-only HLL entry
    (q_events_approx_distinct), trading HLL's fixed 2^p registers for a
    k-row summary.

    Returns ``(group, n_kept, est_distinct, true_distinct)`` — true_distinct
    is an exact COUNT(DISTINCT) carried for estimate-quality inspection;
    drop it for production use at scale.

    Scale shape: one distinct shuffle on (group, hash), then a per-group
    rank window. A group with billions of distinct values sorts inside one
    task; for that regime pass ``prefilter_bits=b`` to keep only hashes in
    the lowest 1/2^b of hash space map-side (valid when every group's
    distinct count >> k * 2^b; the survivors still contain the true k
    minima with overwhelming probability). Bottom-k summaries are mergeable
    (union then re-rank), so incremental/daily sketches compose.
    """
    from pyspark.sql import Window

    # NULL values hash to NULL, and Spark's ascending window ranks NULLs
    # FIRST (DuckDB ranks them LAST) — an unfiltered NULL would both occupy
    # rank 1 (corrupting n_kept/hk) and break the engine-portable contract.
    # COUNT(DISTINCT) ignores NULLs, so dropping them matches true_distinct.
    d = df.select(
        F.col(group_col).alias("g"), kmv_hash(F.col(value_col)).alias("h")
    ).filter(F.col("h").isNotNull())
    if prefilter_bits > 0:
        d = d.filter(F.col("h") < F.lit(KMV_HASH_SPACE >> prefilter_bits))
    d = d.distinct()
    w = Window.partitionBy("g").orderBy("h")
    ranked = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = ranked.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
    )
    true_d = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count_distinct(F.col(value_col)).cast("bigint").alias("true_distinct")
    )
    return (
        agg.join(true_d, "g")
        .select(
            F.col("g").alias(group_col),
            "n_kept",
            kmv_estimate(k).alias("est_distinct"),
            "true_distinct",
        )
    )


def kmv_set_similarity(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """KMV set algebra (Beyer et al., SIGMOD 2007): for every pair of groups,
    estimate |A ∪ B|, |A ∩ B| and Jaccard from the groups' bottom-k hash
    sketches alone. Soundness of the membership test: if h ∈ bottom-k(A∪B)
    and h ∈ A then at most k-1 hashes of A lie below h, so h ∈ bottom-k(A) —
    the pairwise step never needs the full sets, which is why KMV sketches
    of per-shard / per-day sets compose into cross-set overlap estimates
    without rescanning data.

        union_est = (k'-1) * 2^48 / h_k'      (k' = kept rows, exact under k)
        jaccard   = |both-flagged ∩ bottom-k(A∪B)| / k'
        inter_est = jaccard * union_est

    Deterministic end-to-end (md5 hashes, integer counts, one IEEE
    division/multiplication chain) => SQL-oracle-checkable, same contract
    as :func:`kmv_distinct`. Returns per pair (ga, gb): n_kept, union_est,
    inter_est, jaccard_est, plus exact true_union/true_inter carried for
    estimate-quality inspection (drop at scale).

    Scale shape: sketches are per-group bottom-k windows over the distinct
    (group, hash) table; the pairwise stage touches only O(pairs * k) sketch
    rows — group count is assumed dimension-small (sources, languages,
    shards), the VALUES are the big side and are never pairwise-joined.
    """
    from pyspark.sql import Window

    d = (
        df.select(F.col(group_col).alias("g"), kmv_hash(F.col(value_col)).alias("h"))
        .filter(F.col("h").isNotNull())  # same NULL rule as kmv_distinct
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("h")
    sk = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("g", "h")
        .localCheckpoint()
    )
    groups = sk.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("ga"))
        .join(groups.select(F.col("g").alias("gb")))
        .filter(F.col("ga") < F.col("gb"))
    )
    tagged = (
        sk.withColumnRenamed("g", "ga")
        .join(pairs, "ga")
        .select("ga", "gb", "h", F.lit(1).alias("a"), F.lit(0).alias("b"))
        .unionByName(
            sk.withColumnRenamed("g", "gb")
            .join(pairs, "gb")
            .select("ga", "gb", "h", F.lit(0).alias("a"), F.lit(1).alias("b"))
        )
    )
    merged = tagged.groupBy("ga", "gb", "h").agg(
        F.max("a").alias("a"), F.max("b").alias("b")
    )
    w2 = Window.partitionBy("ga", "gb").orderBy("h")
    bk = merged.withColumn("rn", F.row_number().over(w2)).filter(F.col("rn") <= k)
    agg = bk.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("inter_num"),
    )
    union_est = kmv_estimate(k)
    jac = F.col("inter_num").cast("double") / F.col("n_kept").cast("double")
    est = agg.select(
        "ga",
        "gb",
        "n_kept",
        union_est.alias("union_est"),
        (jac * union_est).alias("inter_est"),
        jac.alias("jaccard_est"),
    )
    # exact truth (inspection only): same tag-merge shape on raw values;
    # same NULL rule as the sketch (COUNT(DISTINCT) semantics)
    dv = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
    )
    tv = (
        dv.withColumnRenamed("g", "ga")
        .join(pairs, "ga")
        .select("ga", "gb", "v", F.lit(1).alias("a"), F.lit(0).alias("b"))
        .unionByName(
            dv.withColumnRenamed("g", "gb")
            .join(pairs, "gb")
            .select("ga", "gb", "v", F.lit(0).alias("a"), F.lit(1).alias("b"))
        )
        .groupBy("ga", "gb", "v")
        .agg(F.max("a").alias("a"), F.max("b").alias("b"))
        .groupBy("ga", "gb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("true_union"),
            F.sum(F.col("a") * F.col("b")).cast("bigint").alias("true_inter"),
        )
    )
    return est.join(tv, ["ga", "gb"])


def cms_join_size(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    depth: int = 4,
    hex_chars: int = 2,
) -> DataFrame:
    """Equi-join cardinality estimation from Count-Min sketches alone
    (Alon-Matias-Szegedy inner-product estimator): |A ⋈ B| = Σ_k cA(k)·cB(k),
    estimated as min over seeds of Σ_bucket cmsA[s][b]·cmsB[s][b]. The
    estimate NEVER undershoots (hash collisions only add mass), so planners
    can use it as a safe upper bound without executing the join — the
    sketch is one aggregation pass per side, 16^hex_chars · depth cells,
    mergeable across partitions/days like every sketch here. md5 buckets
    keep it engine-portable/oracle-exact; the exact join size is carried
    for estimate-quality inspection (drop at scale).

    Returns one row: ``(est_size, true_size)``.
    """
    def cells(df: DataFrame, key: str, side: str) -> DataFrame:
        counts = df.groupBy(F.col(key).alias("item")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
        fanned = counts.select(
            "item",
            "n",
            F.explode(
                F.array(*[F.lit(s_) for s_ in range(depth)])
            ).alias("seed"),
        ).select(
            "seed",
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("s"),
                        F.col("seed").cast("string"),
                        F.lit(":"),
                        F.col("item").cast("string"),
                    )
                ),
                1,
                hex_chars,
            ).alias("bucket"),
            "n",
        )
        return fanned.groupBy("seed", "bucket").agg(
            F.sum("n").cast("bigint").alias(f"c_{side}")
        )
    ca = cells(left, left_key, "a")
    cb = cells(right, right_key, "b")
    per_seed = (
        ca.join(cb, ["seed", "bucket"])
        .groupBy("seed")
        .agg(F.sum(F.col("c_a") * F.col("c_b")).cast("bigint").alias("dot"))
    )
    # an empty side leaves per_seed with zero rows and MIN(dot) NULL; the
    # documented "safe upper bound, never undershoots" contract needs 0 then
    est = per_seed.agg(
        F.coalesce(F.min("dot"), F.lit(0)).cast("bigint").alias("est_size")
    )
    true_sz = (
        left.select(F.col(left_key).alias("k"))
        .join(right.select(F.col(right_key).alias("k")), "k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_size"))
    )
    return est.crossJoin(true_sz)


def bq_hash(col: Column) -> Column:
    """Row hash for the bottom-k quantile family: md5('bq:' || key). ONE
    definition shared by :func:`bottomk_quantiles` and the streaming
    quantile_sketch_sink — their batch-twin equivalence (and the SQL
    oracle) depends on both hashing identically, same contract as
    :func:`kmv_hash`."""
    return F.md5(F.concat(F.lit("bq:"), col.cast("string")))


def bottomk_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    k: int = 256,
    quantiles: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Quantile estimates per group from a BOTTOM-K UNIFORM SAMPLE: rows
    whose ``md5('bq:' || key)`` ranks in the group's k smallest form a
    uniform without-replacement sample (the same bottom-k device as the
    KMV sketch, applied to rows instead of distinct values); the q-th
    quantile estimate is the sample's exact order statistic at rank
    ``ceil(q * n_kept)`` (ordered by value, hash tiebreak). Standard error
    of the estimated rank is ~sqrt(q(1-q)/k) — k=256 gives ~3% rank error
    at the median.

    Why this instead of t-digest/KLL: those sketches' compactions depend
    on arrival order, so two engines (or two partitionings) build
    different summaries; the bottom-k sample is a pure function of the
    row keys — partition-invariant, engine-exact (the oracle hash-matches
    it), and mergeable exactly like :func:`kmv_distinct` (union sketches,
    re-rank, keep k smallest — the streaming-sink composition in
    streaming/sinks.py applies unchanged).

    Scale shape: one rank window per group over hash order. A group with
    billions of rows sorts inside one task; the ``prefilter_bits`` trick
    from kmv_distinct applies verbatim (keep only hashes below
    2^-b of hash space map-side) when groups are known-huge.

    Returns (group, n_total, n_kept, q_<pct> ... one column per quantile).
    """
    from pyspark.sql import Window

    h = bq_hash(F.col(key_col))
    d = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(value_col).alias("v"),
            h.alias("h"),
        )
        # same NULL rule as kmv_distinct: NULL hashes rank FIRST in Spark
        # but LAST in DuckDB, so they must never enter the bottom-k
        .filter(F.col("v").isNotNull() & F.col("h").isNotNull())
    )
    # (h, v) ordering: h alone leaves the cut nondeterministic when
    # duplicate keys produce tied hashes with different values — the value
    # tiebreak keeps the sample a pure function of the row SET on both
    # engines (Spark and the SQL twin order identically).
    # distinct BEFORE the cut: the streaming sink dedups (g, h, v) so an
    # at-least-once redelivery can't occupy two slots; the batch twin must
    # collapse genuinely-duplicated (key, value) rows the same way or
    # n_kept/quantiles diverge streaming vs batch (batch-twin contract)
    rn = F.row_number().over(Window.partitionBy("g").orderBy("h", "v"))
    sample = d.distinct().withColumn("rn", rn).filter(F.col("rn") <= k)
    est = sample_quantiles(sample, quantiles)
    totals = d.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return est.join(totals, "g").select(
        F.col("g").alias(group_col),
        "n_total",
        "n_kept",
        *[f"q{int(round(q * 100))}" for q in quantiles],
    )


def sample_quantiles(
    sample: DataFrame, quantiles: tuple[float, ...] = (0.5, 0.9)
) -> DataFrame:
    """Order-statistic quantile estimates from a (g, h, v) bottom-k sample:
    the q-th estimate is the value at rank ``ceil(q * n_kept)`` ordered by
    (v, h). ONE definition shared by :func:`bottomk_quantiles` and the
    streaming ``read_quantile_estimates`` — the batch-twin equivalence of
    the sink depends on both estimating identically. Returns
    (g, n_kept, q<pct>...)."""
    from pyspark.sql import Window

    ranked = sample.withColumn(
        "vr", F.row_number().over(Window.partitionBy("g").orderBy("v", "h"))
    ).withColumn("n_kept", F.count(F.lit(1)).over(Window.partitionBy("g")))
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_kept")]
    for q in quantiles:
        pct = int(round(q * 100))
        aggs.append(
            F.max(
                F.when(
                    F.col("vr") == F.ceil(F.lit(q) * F.col("n_kept")).cast("int"),
                    F.col("v"),
                )
            ).alias(f"q{pct}")
        )
    return ranked.groupBy("g").agg(*aggs)
