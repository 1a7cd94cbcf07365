"""Deduplication operators for large-scale text corpora (engine extension —
the reference's QA dedup, ``src/wins_transform_staging.py:243-257``, rejects
exact key duplicates; these generalize to content-level exact and near-dup
detection for LLM training-data pipelines).

All operators are partition-parallel with no driver-side collection:

  * exact:     content-hash groupBy — one shuffle on the 128-bit digest.
  * n-gram Jaccard: shingle explode -> inverted-index self-join -> count.
  * MinHash-LSH:    pyspark.ml MinHashLSH banding join (candidate pairs) with
                    exact Jaccard verification of candidates only.
  * SimHash:   64-bit signatures via JVM-side higher-order functions, banded
               Hamming join. Pigeonhole guarantee: b bands find ALL pairs
               within Hamming distance b-1 (<=3 at the default 4 bands);
               pairs between that and ``max_hamming`` are found only when
               their differing bits happen to concentrate outside one band
               — standard LSH recall, not a completeness guarantee.

Scale notes: the inverted-index join is the textbook blow-up risk — frequent
shingles create quadratic bucket sizes. ``jaccard_pairs`` therefore drops
shingles above ``max_shingle_freq`` (stop-shingles), the standard trick; at
100 TB you'd also salt the band join and cap bucket width. MinHash-LSH keeps
candidate generation subquadratic; exact verification touches only candidates.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_LOG = logging.getLogger(__name__)


def normalize_text(col):
    """Canonicalize for exact dedup: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str, normalize: bool = False
) -> DataFrame:
    """Keep the lowest-id row per identical content; adds ``n_copies``.

    One window shuffle on the content digest (md5 — 128 bits, collision-safe
    at any realistic corpus size).
    """
    content = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    fp = F.md5(F.encode(content, "UTF-8"))
    w = Window.partitionBy(fp)
    tagged = df.withColumn("_rn", F.row_number().over(w.orderBy(F.col(id_col)))).withColumn(
        "n_copies", F.count(F.lit(1)).over(w)
    )
    # NULL text has no content to compare: the window groups NULL digests
    # together, which would silently delete all but one of a million
    # failed-extraction rows as "duplicates" of each other. Rows with a
    # NULL digest are all KEPT (n_copies forced to 1) — same NULL doctrine
    # as reject_duplicates.
    is_dup_loser = fp.isNotNull() & (F.col("_rn") > 1)
    return (
        tagged.filter(~is_dup_loser)
        .withColumn(
            "n_copies",
            F.when(fp.isNull(), F.lit(1)).otherwise(F.col("n_copies")),
        )
        .drop("_rn")
    )


# one shared definition (see flnr_wins_spark/parallel.py); applied here
# before per-row tokenize/hash fold passes, which are per-row pure so
# placement cannot change results
from flnr_wins_spark.parallel import spread as _spread  # noqa: E402


def shingle_sets(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """Word n-gram shingles per document: (id, shingle) pairs, distinct by
    default (set semantics for Jaccard). ``distinct=False`` skips the dedup
    shuffle for consumers whose aggregation dedups anyway (min-hash,
    collect_set).

    Tokenization is a plain single-space split (deterministic, oracle-friendly);
    shingling uses JVM-side higher-order functions (transform/sequence) — no
    Python in the loop.
    """
    toks = F.split(F.col(text_col), " ")
    parts = " , ".join(f"element_at(_tk, CAST(i + {j} AS INT))" for j in range(n))
    shingles = F.expr(
        f"transform(sequence(1, size(_tk) - {n - 1}), i -> concat_ws(' ', {parts}))"
    )
    out = (
        _spread(df).select(F.col(id_col).alias("id"), toks.alias("_tk"))
        .filter(F.size("_tk") >= n)
        .select("id", F.explode(shingles).alias("shingle"))
    )
    return out.distinct() if distinct else out


def jaccard_pairs(
    shingles: DataFrame,
    threshold: float,
    max_shingle_freq: int | None = 256,
) -> DataFrame:
    """All-pairs Jaccard similarity >= threshold from an (id, shingle) set
    table. Returns (id_a, id_b, jaccard) with id_a < id_b.

    SCOPE: this is the *exact* baseline operator — the differential oracle
    for ``minhash_lsh_pairs`` and the right tool up to ~10^7 docs. Past its
    stop-shingle cap it is inherently quadratic per surviving hot shingle
    (a K-identical-doc cluster's OUTPUT alone is K^2/2 pairs); at web scale
    run MinHash-LSH, which meets this operator's answer with P[miss] ~1e-11
    at threshold 0.8, and keep this one for sampled verification.

    ``max_shingle_freq`` (default 256 — ON by default; the unbounded mode is
    opt-in via ``None``) drops shingles occurring in more than that many
    docs (stop-shingles) before the self-join, bounding the per-shingle pair
    contribution to ``cap^2/2``. They contribute little to Jaccard but
    dominate join cost. Exact results are preserved for pairs whose
    similarity comes from rarer shingles (at high thresholds, all of them);
    the capped semantics are themselves deterministic, so an oracle mirrors
    them with the same HAVING filter. Use ``stop_shingle_count`` to audit
    how many shingles the cap drops.
    """
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    sh = _cap_stop_shingles(shingles, max_shingle_freq, "jaccard_pairs")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _cap_stop_shingles(shingles: DataFrame, max_shingle_freq: int | None, op: str) -> DataFrame:
    """ONE stop-shingle cap shared by jaccard_pairs and containment_pairs:
    drop shingles occurring in more than ``max_shingle_freq`` docs before
    any pair join, logging that the cap is active. Make the capped
    semantics observable without forcing an action in a lazy operator —
    callers audit the actual drop volume with ``stop_shingle_count``
    (pass ``None`` for exact mode)."""
    if max_shingle_freq is None:
        return shingles
    _LOG.info(
        "%s: stop-shingle cap active (max_shingle_freq=%d); shingles shared "
        "by more docs are dropped before the pair join — audit with "
        "stop_shingle_count()", op, max_shingle_freq,
    )
    freq = shingles.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
    return shingles.join(
        freq.filter(F.col("_f") <= max_shingle_freq), "shingle"
    ).select("id", "shingle")


def containment_pairs(
    shingles: DataFrame,
    threshold: float,
    max_shingle_freq: int | None = 256,
) -> DataFrame:
    """Directed containment similarity |A∩B| / |A| >= threshold from an
    (id, shingle) set table: detects documents CONTAINED in other documents
    (quotes, page-in-page, boilerplate wrapping) that symmetric Jaccard
    misses — a small doc inside a huge one has low Jaccard but containment
    ~1. Returns (id_a, id_b, containment) where id_a's shingles are covered
    by id_b's (both directions are emitted when both clear the threshold;
    id_a != id_b).

    Same inverted-index + stop-shingle-cap shape (and the same scale scope)
    as :func:`jaccard_pairs`, sharing its determinism contract — an oracle
    mirrors the cap with a HAVING filter.
    """
    sizes = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    sh = _cap_stop_shingles(shingles, max_shingle_freq, "containment_pairs")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") != F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    cont = F.col("c").cast("double") / F.col("na")
    return (
        inter.join(sa, "id_a")
        .select("id_a", "id_b", cont.alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


def stop_shingle_count(shingles: DataFrame, max_shingle_freq: int) -> DataFrame:
    """Audit companion to ``jaccard_pairs``: one row
    (dropped_shingles, dropped_occurrences) counting what the stop-shingle
    cap removes — run it when tuning the cap so drops are accounted for, not
    silent."""
    return (
        shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_f"))
        .filter(F.col("_f") > max_shingle_freq)
        .agg(
            F.count(F.lit(1)).alias("dropped_shingles"),
            F.coalesce(F.sum("_f"), F.lit(0)).cast("bigint").alias("dropped_occurrences"),
        )
    )



def minhash_signature_table(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hash_tables: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    min_parallelism: int | None = None,
    max_shingles: int | None = None,
    band_width: int = 1,
) -> DataFrame:
    """(id, shset, sig array<...>[t]) per document — the shared signature
    construction behind :func:`minhash_lsh_pairs` and the streaming
    near-dup gate (streaming/sinks.py). Narrow map, zero shuffle; see
    minhash_lsh_pairs for the full design notes.

    ``band_width`` (r, the classic LSH rows-per-band dial) controls the
    AND-amplification inside each of the ``num_hash_tables`` bands: with
    r = 1 (default — the historical behavior, bit-identical signatures)
    ``sig[j]`` IS the j-th min-hash; with r > 1, ``num_hash_tables * r``
    independent min-hashes are folded (still one string-tier hash per
    shingle — the widening only adds cheap integer hashes) and ``sig[j]``
    is ``xxhash64`` of band j's r consecutive min-hashes. Two documents
    share band key j iff they agree on ALL r min-hashes of the band
    (modulo a 64-bit hash collision, which can only ADD a candidate —
    downstream exact verification drops it — never lose one). xxhash64
    only; the engine-portable md5 path keeps r = 1.

    ``max_shingles`` caps the per-document shingle set (a slice of the
    distinct shingles in document order) so one pathological multi-MB
    document cannot blow the per-row array: at web-crawl scale a cap of
    ~8192 keeps rows bounded while leaving typical documents untouched
    (their full set is far smaller). Capped documents compare by their
    prefix set — same guard style as the stop-shingle / bucket-width caps
    elsewhere in this module. Default None = exact (the oracle-checked
    construction)."""
    n = shingle_n
    parts = " , ".join(f"element_at(_tk, CAST(i + {j} AS INT))" for j in range(n))
    if min_parallelism is not None and df.rdd.getNumPartitions() < min_parallelism:
        df = df.repartition(min_parallelism)
    shexpr = (
        f"array_distinct(transform(sequence(1, size(_tk) - {n - 1}),"
        f" i -> concat_ws(' ', {parts})))"
    )
    if max_shingles is not None:
        shexpr = f"slice({shexpr}, 1, {int(max_shingles)})"
    staged = (
        df.select(F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("_tk"))
        .filter(F.size("_tk") >= n)
        .select("id", F.expr(shexpr).alias("shset"))
    )
    # The whole signature is ONE SQL-parsed array expression
    # (transform over the table indexes), for two reasons learned the hard
    # way:
    #  * 16 separate Column-API F.transform(lambda ...) columns in one
    #    select silently CORRUPT each other — their named lambda variables
    #    collide after optimization (found by the x_dedup_minhash_estimate
    #    differential; pinned by test_minhash_signatures_match_reference);
    #  * 16 separate SQL-parsed columns are value-correct but defeat
    #    common-subexpression elimination (each gets distinct lambda ids),
    #    so CollapseProject inlines the shingle construction 16x — a 3-4x
    #    slowdown at bench. One expression references ``shset`` once.
    # xxhash64 hashes its argument TUPLE, so the per-table seed can be a
    # lambda-bound value: xxhash64(s, 42 + i) == the old per-column
    # xxhash64(s, lit(42 + i)) fold, verified against a lambda-free
    # explode ground truth.
    if band_width < 1:
        raise ValueError(f"band_width must be >= 1, got {band_width}")
    if band_width > 1 and hash_fn != "xxhash64":
        raise ValueError("band_width > 1 requires hash_fn='xxhash64'")
    if hash_fn == "xxhash64":
        # Two-tier hashing, shingle-major: every shingle STRING hashes once
        # to a 64-bit base (the expensive part) and fans out to the
        # num_hash_tables * band_width per-table values with cheap integer
        # xxhash64(base, seed+i); the signature is the elementwise min of
        # those per-shingle rows (aggregate + zip_with/least). The earlier
        # table-major form — transform over tables, base hashes nested in
        # the per-table lambda — re-hashed every STRING once PER TABLE
        # (16x); this fold genuinely runs the string tier once per shingle
        # and measured ~3x faster at sf0.1 (3.2s -> 1.0s signature pass),
        # with bit-identical outputs (same multiset per table, same min;
        # pinned by test_minhash_signatures_match_reference).
        m = num_hash_tables * band_width
        fold = (
            "aggregate("
            f"transform(shset, s -> transform(sequence(0, {m - 1}),"
            f" i -> xxhash64(xxhash64(s), CAST({seed} + i AS INT)))), "
            f"array_repeat(CAST(9223372036854775807 AS BIGINT), {m}), "
            "(acc, x) -> zip_with(acc, x, (a, b) -> least(a, b))"
        )
        if band_width == 1:
            sig = F.expr(fold + ")")
        else:
            # AND-fold each band's r min-hashes into one 64-bit band key
            # inside aggregate()'s FINISH lambda, which binds the folded
            # array once — an outer transform over a staged column would
            # be re-inlined per element by CollapseProject (the same trap
            # the one-expression design above exists to avoid)
            combo = ", ".join(
                f"element_at(acc, j * {band_width} + {i + 1})"
                for i in range(band_width)
            )
            sig = F.expr(
                fold
                + f", acc -> transform(sequence(0, {num_hash_tables - 1}),"
                f" j -> xxhash64({combo})))"
            )
    elif hash_fn == "md5":
        sig = F.expr(
            f"transform(sequence(0, {num_hash_tables - 1}), "
            f"i -> array_min(transform(shset, "
            f"s -> md5(encode(concat(s, ':', CAST({seed} + i AS STRING)), 'UTF-8')))))"
        )
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    return staged.select("id", "shset", sig.alias("sig"))


def minhash_bands(agg: DataFrame, num_hash_tables: int = 16) -> DataFrame:
    """Explode a signature table to (id, band, mhv) band-bucket rows."""
    return agg.select("id", F.posexplode("sig").alias("band", "mhv"))


def exact_jaccard(sh_a, sh_b):
    """True Jaccard between two shingle-set array columns (verify step)."""
    inter = F.size(F.array_intersect(sh_a, sh_b))
    return inter.cast("double") / (F.size(sh_a) + F.size(sh_b) - inter)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hash_tables: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket_width: int | None = None,
    min_parallelism: int | None = None,
    unpersist: bool = False,
    hash_fn: str = "xxhash64",
    max_shingles: int | None = None,
    band_width: int = 1,
) -> DataFrame:
    """Near-dup pairs via MinHash-LSH candidate generation + exact Jaccard
    verification. Returns (id_a, id_b, jaccard), id_a < id_b.

    ``band_width`` (r): min-hashes AND-folded per band (see
    minhash_signature_table). r = 1 keeps the historical candidate rule
    "agree on >= 1 of b min-hashes" (P[miss] = (1-j)^b). r > 1 requires a
    band's r min-hashes to ALL agree, which collapses the false-candidate
    volume on small-vocabulary / high-collision corpora — at r = 2, b = 16
    P[miss] = (1-j^2)^16, ~8e-8 at j = 0.8 — while exact verification
    keeps the OUTPUT contract unchanged (verified pairs only; candidates
    are a superset either way).

    ``hash_fn``: ``"xxhash64"`` (default — fastest, JVM-only) or ``"md5"``
    (engine-portable: the per-table min-hash is the lexicographic min of the
    32-char hex digest, and fixed-width lowercase hex compares identically
    to the unsigned value, so a DuckDB twin computes the same signatures and
    therefore the same candidate set — what makes x_dedup_minhash_portable
    a fully hash-checked oracle entry while this default stays the 100 TB
    fast path).

    Pure DataFrame implementation (no pyspark.ml pipeline): per-document
    signatures are ``num_hash_tables`` independent min-hashes computed
    ENTIRELY PER ROW — the shingle array is materialized once in a staging
    projection and each table folds ``array_min(transform(shingles,
    s -> xxhash64(s, seed_i)))`` over it, all inside JVM expression eval.
    No explode, no groupBy: signature construction is a narrow map over the
    scan with ZERO shuffle (the previous design exploded (id, shingle) pairs
    and shuffled corpus-sized shingle sets through a groupBy). Candidates are
    pairs agreeing on at least one table — OR-amplified banding with
    P[miss] = (1-j)^tables, ~7e-12 at j=0.8 with 16 tables, so verified
    output equals the exact all-pairs result with overwhelming probability
    while never materializing the quadratic join.

    Scale notes: the only shuffles left are the band self-join on
    (table, minhash) and the id-keyed verify joins. Identical min-hash values
    cluster true near-dups, so bucket width stays small on organic corpora.
    ``max_bucket_width`` is the guard for pathological ones (a K-identical-doc
    cluster makes every one of its buckets K wide, and the band self-join
    K^2): buckets wider than the cap are dropped before the join, the same
    mitigation as ``jaccard_pairs``'s stop-shingles. Identical-content blobs
    are exact duplicates — run ``exact_dedup`` first and the cap only ever
    trims degenerate near-dup megaclusters. Per-doc shingle arrays are fine
    while documents are bounded; ``max_shingles`` (see
    minhash_signature_table) caps the per-row array against pathological
    multi-MB docs — the verify step then computes Jaccard over the capped
    prefix sets, consistently on both sides of each pair.
    """
    # Signature construction is a narrow map (see minhash_signature_table —
    # shared with the streaming near-dup gate); ``min_parallelism`` spreads
    # under-split single-file inputs before the CPU-heavy hash folds.
    agg = minhash_signature_table(
        df, text_col, id_col,
        num_hash_tables=num_hash_tables, shingle_n=shingle_n, seed=seed,
        hash_fn=hash_fn, min_parallelism=min_parallelism,
        max_shingles=max_shingles, band_width=band_width,
    )
    # The signature table feeds three consumers (banding + both verify sides);
    # without an explicit persist each consumer would recompute the shingle
    # projection from the source scan. MEMORY_AND_DISK: at cluster scale this
    # table is ~corpus-sized, so partitions spill rather than OOM. Lifecycle:
    # with the default lazy return the cache lives until the session ends
    # (the returned plan still references it); pass ``unpersist=True`` to
    # materialize the (tiny) verified-pairs result eagerly and release the
    # signature cache before returning — the right mode for multi-corpus
    # loops, which otherwise accumulate one cached corpus per call.
    agg = agg.persist(StorageLevel.MEMORY_AND_DISK)
    banded = minhash_bands(agg, num_hash_tables)
    if max_bucket_width is not None:
        width = banded.groupBy("band", "mhv").agg(F.count(F.lit(1)).alias("_w"))
        banded = (
            banded.join(width.filter(F.col("_w") <= max_bucket_width), ["band", "mhv"])
            .select("id", "band", "mhv")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.mhv") == F.col("b.mhv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # Exact verification on candidates only (banding admits false positives;
    # true Jaccard via array_intersect over the per-doc shingle sets).
    sa = agg.select(F.col("id").alias("id_a"), F.col("shset").alias("sh_a"))
    sb = agg.select(F.col("id").alias("id_b"), F.col("shset").alias("sh_b"))
    jac = exact_jaccard(F.col("sh_a"), F.col("sh_b"))
    out = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    if unpersist:
        # verified pairs are duplicate-count-sized (<< corpus); pin them,
        # then drop the corpus-sized signature cache
        out = out.localCheckpoint(eager=True)
        agg.unpersist()
    return out


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, seed: int = 42,
    hash_fn: str = "xxhash64", bits: int = 64,
) -> DataFrame:
    """``bits``-wide SimHash per document from token-level hashes.

    Entirely JVM-side and single-hash-pass: the distinct-token hash array is
    materialized ONCE in a staging projection, and the per-bit vote fold runs
    over that array — tokenization and hashing execute once per document,
    not once per bit (the corpus's hottest pass at 100 TB is this signature
    projection, so a 64x recompute here would dominate the job). No UDFs, no
    shuffle until the caller joins.

    ``hash_fn``: ``"xxhash64"`` (default, 64-bit JVM fast path) or ``"md5"``
    (engine-portable: the token hash is the first 15 hex chars of
    ``md5(token || ':seed')`` parsed as a 60-bit integer — identical in a
    DuckDB twin, so pass ``bits=60`` with it and the signature, bands, and
    Hamming pairs all become oracle-checkable)."""
    if hash_fn == "xxhash64":
        th_expr = f"transform(_tk, t -> xxhash64(t, {seed}))"
    elif hash_fn == "md5":
        # conv() parses hex; 15 hex chars = 60 bits, safely inside bigint
        th_expr = (
            f"transform(_tk, t -> CAST(conv(substring(md5(concat(t, ':{seed}')),"
            " 1, 15), 16, 10) AS BIGINT))"
        )
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    staged = _spread(df).filter(F.col(text_col).isNotNull()).select(
        # NULL text must not enter: it would fold to signature 0, making
        # every contentless doc a hamming-0 "near-dup" of every other (and
        # of any real all-zero-signature doc) and turning the shared band
        # bucket into a quadratic hot spot
        F.col(id_col).alias("id"),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("_tk"),
    ).select(
        "id",
        F.size("_tk").alias("n_tokens"),
        F.expr(th_expr).alias("_th"),
    )
    # bit b of signature = 1 iff #(token hashes with bit b set) > #tokens/2
    sig = F.expr(
        f"""
        aggregate(
          sequence(0, {bits - 1}),
          CAST(0 AS BIGINT),
          (acc, b) -> acc + IF(
            aggregate(_th, 0, (s, h) -> s + CAST(shiftright(h, b) & 1 AS INT)) * 2 > size(_th),
            shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))
        )
        """
    )
    # coalesce makes the column provably non-nullable, so downstream equi-joins
    # on band keys never infer an isnotnull(simhash) constraint — without it,
    # predicate pushdown inlines the whole 64-bit fold (including the token
    # re-hash) into a per-row Filter below this projection.
    sig = F.coalesce(sig, F.lit(0).cast("bigint"))
    return staged.select("id", "n_tokens", sig.alias("simhash"))


def simhash_pairs(
    signatures: DataFrame, max_hamming: int = 8, bands: int = 4, bits: int = 64
) -> DataFrame:
    """Candidate pairs within Hamming distance ``max_hamming`` via banded
    bucket join. Returns (id_a, id_b, hamming).

    Recall contract (be precise — the naive reading overpromises):
    pigeonhole over ``bands`` bands guarantees a shared band ONLY for
    distance <= bands-1 (<= 3 at the defaults), because each differing bit
    can spoil at most one band. Pairs with distance in (bands-1,
    max_hamming] are emitted only when their differing bits happen to
    leave one band untouched — near-dup bit flips cluster in practice, so
    recall there is high, but it is probabilistic LSH recall, NOT
    completeness. For a hard distance-d guarantee use ``bands >= d+1``.
    """
    width = bits // bands
    mask = (1 << width) - 1
    banded = signatures.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        (F.shiftright("simhash", i * width).bitwiseAND(F.lit(mask))).alias("key"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def span_dedup(
    df: DataFrame, text_col: str, id_col: str, k: int = 10
) -> DataFrame:
    """Duplicate-span removal: delete repeated k-word segments corpus-wide,
    keeping only the first occurrence (lowest ``(id, position)``).

    This is RefinedWeb/"exact substring" deduplication approximated at fixed
    segment boundaries: instead of a corpus-scale suffix array (not
    distributable), each document is cut into non-overlapping k-word segments
    and a segment survives only in the first document where it appears. The
    approximation finds every duplicated substring of >= 2k-1 words (any such
    substring covers a full aligned segment) and none shorter than k.

    Scale shape: segment explode is narrow; the winner-per-segment build is a
    map-side-combinable ``groupBy(min(struct(id, pos)))`` whose output is one
    row per *distinct* segment; the join back redistributes segments once and
    AQE skew-split handles hot segments (boilerplate); reconstruction is one
    ``groupBy(id)``. No window over the raw segment stream, so a single
    pathological segment (e.g. empty boilerplate repeated billions of times)
    never lands on one task during aggregation.

    Returns one row per input doc: (id, text_clean, n_segments, n_kept);
    fully-duplicated docs survive with ``text_clean = ''``.
    """
    segs_expr = F.expr(
        f"""
        transform(
          sequence(0, CAST(ceil(size(_tk) / {k}.0) AS INT) - 1),
          i -> array_join(slice(_tk, i * {k} + 1, {k}), ' '))
        """
    )
    exploded = (
        df.select(F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("_tk"))
        .filter(F.size("_tk") > 0)
        .select("id", F.posexplode(segs_expr).alias("seg_pos", "seg"))
    )
    winners = exploded.groupBy("seg").agg(
        F.min(F.struct(F.col("id").alias("wid"), F.col("seg_pos").alias("wpos"))).alias("w")
    )
    tagged = exploded.join(winners, "seg").withColumn(
        "_keep", (F.col("id") == F.col("w.wid")) & (F.col("seg_pos") == F.col("w.wpos"))
    )
    # collect_list skips NULLs, so non-winner segments drop out of the
    # reconstruction while still counting toward n_segments.
    kept_struct = F.when(F.col("_keep"), F.struct("seg_pos", "seg"))
    return (
        tagged.withColumn("_ks", kept_struct)
        .groupBy("id")
        .agg(
            F.coalesce(
                F.array_join(
                    F.expr("transform(array_sort(collect_list(_ks)), x -> x.seg)"), " "
                ),
                F.lit(""),
            ).alias("text_clean"),
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum(F.col("_keep").cast("long")).alias("n_kept"),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_cosine: float = 0.8,
    max_df: int = 256,
    unpersist: bool = False,
) -> DataFrame:
    """TF-IDF weighted cosine near-duplicate pairs: each document is a
    sparse tf·ln(N/df) vector; returns ``(a, b, cosine)`` for pairs with
    cosine >= ``min_cosine`` (a < b). The weighted complement to the set
    Jaccard entries — repeated rare terms dominate, boilerplate is
    down-weighted by idf.

    Scale contract (same family as ``jaccard_pairs``):

      * candidate pairs come from the term-postings self-join, and terms
        with document frequency > ``max_df`` are dropped from vectors AND
        norms first (sklearn's max_df pruning) — the hot-term fanout is
        bounded by max_df² per term, never corpus-quadratic;
      * weights round through DECIMAL(27,9) right after the ln() (absorbing
        sub-ulp libm differences) and the dot/norm sums route through
        DECIMAL(27,12) (order-insensitive) — plans/common.py discipline, so
        the cosine is engine-exact;
      * per-pair aggregation shuffles on (a, b), unique per candidate pair.
    """
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = df.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    dfreq = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
    )
    w = (
        toks.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "term",
            (
                F.col("tf")
                * F.log(F.col("n").cast("double") / F.col("df").cast("double"))
            )
            .cast("decimal(27,9)")
            .cast("double")
            .alias("w"),
        )
    )
    # the weight table feeds THREE consumers (norms + both sides of the
    # postings self-join); without a persist each re-runs the full corpus
    # tokenize + tf shuffle — the same multi-consumer rule as
    # minhash_lsh_pairs' signature persist. MEMORY_AND_DISK: corpus-sized,
    # spills rather than OOMs.
    w = w.persist(StorageLevel.MEMORY_AND_DISK)
    norms = w.groupBy("id").agg(
        F.sqrt(
            F.sum((F.col("w") * F.col("w")).cast("decimal(27,12)")).cast("double")
        ).alias("norm")
    )
    a = w.select(F.col("id").alias("a"), "term", F.col("w").alias("wa"))
    b = w.select(F.col("id").alias("b"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.sum((F.col("wa") * F.col("wb")).cast("decimal(27,12)"))
            .cast("double")
            .alias("dot")
        )
    )
    out = (
        dots.join(norms.select(F.col("id").alias("a"), F.col("norm").alias("na")), "a")
        .join(norms.select(F.col("id").alias("b"), F.col("norm").alias("nb")), "b")
        .select(
            "a",
            "b",
            (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )
    if unpersist:
        # same lifecycle contract as minhash_lsh_pairs: the verified-pairs
        # result is duplicate-count-sized (<< corpus) — pin it eagerly,
        # then release the corpus-sized weight cache so multi-corpus loops
        # don't accumulate one cached corpus per call
        out = out.localCheckpoint(eager=True)
        w.unpersist()
    return out
