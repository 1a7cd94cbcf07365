"""Partition-level MVCC tables: manifest-committed partitioned snapshots
with DELTA-PROPORTIONAL merge.

``sources/snapshots.py`` gives whole-table MVCC — correct, but every merge
rewrites the entire table, which at 100 TB is the wrong physical plan when
a changeset touches a handful of partitions. This module adds the
mini-manifest construction the table formats (Delta/Iceberg) use, on plain
parquet with zero extra jars:

  * data lives in immutable STAGE directories,
    ``<table>/stage/m<K>/<part_col>=<value>/`` (one hive-partitioned write
    job per commit — only the partitions that commit touches);
  * a MANIFEST ``<table>/manifests/m<K>.json`` maps every partition value
    to the stage directory that holds its current data. Untouched
    partitions keep pointing at their OLD stage dirs — no rewrite, no
    copy;
  * a commit is one atomic manifest rename (Hadoop ``rename``, atomic on
    HDFS/local; on S3 use a rename-consistent layer, same caveat as every
    manifest-based format). Readers resolve the newest manifest and read
    exactly the directories it names — never a half-written commit;
  * ``merge_ptable`` reads ONLY the partitions the changeset touches,
    merges with full schema evolution (``merge_upsert_evolve``), writes
    only those partitions, and commits a manifest that reuses every other
    partition as-is — merge cost is O(touched data), not O(table);
  * time travel = read an older manifest; ``vacuum_ptable`` deletes stage
    dirs no retained manifest references.

Schema evolution across partitions: evolved columns exist only in
partitions written after the evolution; reads merge schemas
(``mergeSchema``) and null-fill older partitions — the same read-time
semantics Delta gives.

Single-writer-per-table, like snapshots.py (manifest allocation is
max+1); multi-writer needs a coordination layer this engine deliberately
does not fake.

When to use which (measured, SURVEY §8): at small scale the
manifest/FS fixed overheads make whole-table ``merge_snapshot`` FASTER
(0.80 s vs 1.49 s on a 100k-row 30-partition fixture) — this layout's
advantage is the IO asymptotics (a one-partition changeset reads and
rewrites 1/30 of the data; at 100 TB that is ~3 TB of IO instead of
~100 TB). Prefer merge_snapshot for small tables, merge_ptable once
partition data dwarfs the per-commit constant.

The reference's publish step is whole-table drop-and-replace
(``/root/reference/src/wins_transform_staging.py:280-286``); this module is
the incremental-at-scale posture, extension surface per SURVEY §2c.
"""

from __future__ import annotations

import json
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fs(spark: SparkSession, path: str):
    from flnr_wins_spark.fsutil import hadoop_fs

    return hadoop_fs(spark, path)


def _enc(val) -> str:
    return quote(str(val), safe="")


def _manifest_ids(spark: SparkSession, table_path: str) -> list[int]:
    fs, jpath = _fs(spark, f"{table_path}/manifests")
    if not fs.exists(jpath):
        return []
    out = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.startswith("m") and name.endswith(".json"):
            stem = name[1:-5]
            if stem.isdigit():
                out.append(int(stem))
    return sorted(out)


def _read_manifest(spark: SparkSession, table_path: str, k: int) -> dict:
    fs, jpath = _fs(spark, f"{table_path}/manifests/m{k}.json")
    stream = fs.open(jpath)
    try:
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def _write_manifest(spark: SparkSession, table_path: str, k: int, m: dict) -> None:
    """Atomic commit: write to a temp name, then Hadoop-rename into place
    (atomic on HDFS and local FS — the manifest-format commit protocol)."""
    fs, jdir = _fs(spark, f"{table_path}/manifests")
    fs.mkdirs(jdir)
    tmp = f"{table_path}/manifests/.tmp-m{k}.json"
    final = f"{table_path}/manifests/m{k}.json"
    fs_t, jtmp = _fs(spark, tmp)
    out = fs_t.create(jtmp, True)
    try:
        out.write(bytearray(json.dumps(m, sort_keys=True).encode("utf-8")))
    finally:
        out.close()
    _, jfinal = _fs(spark, final)
    if not fs_t.rename(jtmp, jfinal):
        raise IOError(f"manifest commit failed: rename {tmp} -> {final}")


def _stage_schema_json(df, part_col: str) -> str:
    """JSON of the DATA schema a stage's parquet files carry (the written
    frame minus the partition column, which partitionBy hoists into the
    directory name). Recorded in the manifest at commit time so reads can
    pass an EXPLICIT schema to the parquet scan — without it every
    read_ptable pays a per-directory mergeSchema footer-inference job
    before any data moves (driver-side, serial; guide §5/§6)."""
    return df.drop(part_col).schema.json()


def _carry_stage_schemas(prev: dict, mapping: dict) -> dict:
    """Stage-schema entries of ``prev`` still referenced by ``mapping``
    (untouched partitions carry their stage's schema by reference, exactly
    like the data they describe)."""
    referenced = {rel.split("/")[1] for rel in mapping.values()}
    return {
        s: j
        for s, j in prev.get("stage_schemas", {}).items()
        if s in referenced
    }


_HIVE_NULL_DIR = "__HIVE_DEFAULT_PARTITION__"


def _stage_partitions(spark: SparkSession, stage_path: str, part_col: str) -> list[str]:
    fs, jpath = _fs(spark, stage_path)
    vals = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.startswith(f"{part_col}="):
            raw = unquote(name[len(part_col) + 1 :])
            if raw == _HIVE_NULL_DIR:
                # a NULL partition value would round-trip as the literal
                # sentinel STRING on read — delete the uncommitted stage
                # and fail loudly before any manifest references it
                fs.delete(jpath, True)
                raise ValueError(
                    f"partition column '{part_col}' contains NULL values — "
                    "partition keys must be non-null (derive a sentinel "
                    "value upstream if NULL is a real level)"
                )
            if any(ord(ch) < 0x20 or ch in "\"#%'*/:=?\\\x7f{[]^" for ch in raw):
                # Spark's hive writer percent-escapes these on disk, so the
                # manifest's encode/decode round-trip would point reads at a
                # path that does not exist — fail the commit loudly instead
                # of committing a partition nobody can read back
                fs.delete(jpath, True)
                # char set = Spark ExternalCatalogUtils.needsEscaping:
                # control chars, DEL, and " # % ' * / : = ? \\ { [ ] ^
                raise ValueError(
                    f"partition value {raw!r} contains a character the hive "
                    "path layer escapes — derive a path-safe partition key "
                    "upstream (letters/digits/space/dash/dot are safe)"
                )
            vals.append(raw)
    return sorted(vals)


def _clear_crashed_stage(spark: SparkSession, table_path: str, k: int) -> None:
    """A stage dir with no committed manifest is a crashed earlier attempt
    at this same commit id (the manifest rename is the commit point, so an
    uncommitted stage is unreferenced by definition) — delete it so the
    retry's ``mode("error")`` write can proceed. Never touches a stage a
    manifest references: committed manifests advance ``k`` past it."""
    fs, jpath = _fs(spark, f"{table_path}/stage/m{k}")
    if fs.exists(jpath):
        fs.delete(jpath, True)


def _json_scalar(v):
    """Manifest-storable form of a min/max value. Numbers/strings/bools
    pass through; dates/datetimes/Decimals stringify (ISO order-preserving
    for dates, so pruning comparisons stay valid on the string form)."""
    import datetime
    import decimal

    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    raise TypeError(
        f"zone-map stats cannot store a {type(v).__name__} min/max — "
        "restrict stats_cols to numeric/string/date/timestamp columns"
    )


def _read_stage_raw(spark: SparkSession, stage_path: str) -> DataFrame:
    """Read a stage dir with partition-value TYPE INFERENCE disabled, so
    the partition column carries the raw directory string. The sidecar
    builders key their manifest entries by str(partition value); with
    inference on, a numeric-looking STRING partition value ('07',
    '1e2', '0.50') re-types to a number and str() lands on a DIFFERENT
    key ('7') than the manifest's ('07') — the sketch/stats would be
    stored under a key no reader ever looks up, silently disabling the
    sidecar for that partition. Conf toggle is try/finally-scoped; the
    layer is single-writer by contract so no concurrent reader races it."""
    conf = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        return spark.read.parquet(stage_path)
    finally:
        spark.conf.set(conf, prev)


def _compute_stats(
    spark: SparkSession, stage_path: str, part_col: str, stats_cols: list[str]
) -> tuple[dict, dict]:
    """Per-partition [min, max] zone maps for ``stats_cols`` PLUS exact
    per-partition row counts, computed in ONE column-pruned scan of the
    just-written stage (the scan reads only the stats columns of data
    already in page cache; the collect is partition-count-sized). Missing
    columns (pre-evolution partitions) simply contribute no entry —
    readers treat absence as 'cannot prune'. Returns ``(stats, rows)``;
    row counts ride the same scan for free and let
    :func:`partition_rows` answer ``COUNT(*) GROUP BY part`` from
    metadata alone."""
    df = _read_stage_raw(spark, stage_path)
    cols = [c for c in stats_cols if c in df.columns]
    aggs = [F.count(F.lit(1)).alias("_nrows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"_mn_{c}"))
        aggs.append(F.max(c).alias(f"_mx_{c}"))
    out: dict[str, dict] = {}
    rows: dict[str, int] = {}
    for r in df.groupBy(part_col).agg(*aggs).collect():
        d = r.asDict()
        v = str(d[part_col])
        rows[v] = int(d["_nrows"])
        out[v] = {
            c: [_json_scalar(d[f"_mn_{c}"]), _json_scalar(d[f"_mx_{c}"])]
            for c in cols
            if d[f"_mn_{c}"] is not None
        }
    return out, rows


# Bloom sidecars: types whose Spark CAST(col AS STRING) form is reproduced
# exactly by _bloom_canon below — the portability contract that lets the
# Python-side prober hash the SAME bytes the JVM-side builder hashed.
# Float/double/decimal/binary render differently across the boundary and
# are rejected at write time.
_BLOOM_OK_TYPES = {"string", "tinyint", "smallint", "int", "bigint", "date",
                   "boolean"}


def _bloom_canon(value) -> str:
    """Canonical string for a bloom probe value — must match Spark's
    ``CAST(col AS STRING)`` for every type in ``_BLOOM_OK_TYPES``."""
    import datetime

    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (datetime.datetime, datetime.date)):
        return value.isoformat()
    return str(value)


def _bloom_bits_py(value, m_bits: int, k_hashes: int) -> list[int]:
    """The k bit positions of ``value`` — double hashing over md5, the
    exact mirror of the JVM expression in :func:`_compute_blooms`:
    h1 = hex[0:15], h2 = hex[16:31], bit_i = (h1 + i*h2) mod m."""
    import hashlib

    h = hashlib.md5(_bloom_canon(value).encode("utf-8")).hexdigest()
    h1 = int(h[0:15], 16)
    h2 = int(h[16:31], 16)
    return [(h1 + i * h2) % m_bits for i in range(k_hashes)]


def _compute_blooms(
    spark: SparkSession,
    stage_path: str,
    part_col: str,
    bloom_cols: list[str],
    m_bits: int,
    k_hashes: int,
) -> dict:
    """Per-partition bloom filters for ``bloom_cols``: one m-bit filter
    per (partition, column), built JVM-side (md5 + double hashing, whole
    stage codegen — no Python in the scan) in ONE pass over the stage —
    all columns' probe bits ride a single exploded array, one scan + one
    shuffle regardless of column count, the same one-scan discipline as
    ``_compute_stats``. The collect is (partitions x columns)-sized with
    <= m distinct bit positions per filter. NULLs are not indexed. The
    manifest stores each filter as a hex bitmap (m/8 bytes), so a
    2048-bit filter costs 512 chars per partition per column —
    metadata-sized at any table scale. Columns missing from the stage
    (schema evolution: the column arrived after these partitions were
    written) contribute no filter — readers keep those partitions."""
    df = _read_stage_raw(spark, stage_path)
    cols = [c for c in bloom_cols if c in df.columns]
    if not cols:
        return {}
    probes = []
    for c in cols:
        md = F.md5(F.col(c).cast("string"))
        # 15 hex chars = 60 bits; k_hashes <= 8 is enforced at write time,
        # so h1 + 7*h2 < 2^63: no long overflow, '%' stays non-negative
        h1 = F.conv(F.substring(md, 1, 15), 16, 10).cast("long")
        h2 = F.conv(F.substring(md, 17, 15), 16, 10).cast("long")
        for i in range(k_hashes):
            probes.append(
                F.when(
                    F.col(c).isNotNull(),
                    F.struct(
                        F.lit(c).alias("c"),
                        ((h1 + F.lit(i) * h2) % F.lit(m_bits)).alias("b"),
                    ),
                )
            )
    rows = (
        df.select(F.col(part_col), F.explode(F.array(*probes)).alias("_p"))
        .filter(F.col("_p").isNotNull())
        .groupBy(part_col, F.col("_p.c").alias("_c"))
        .agg(F.collect_set("_p.b").alias("_bits"))
        .collect()
    )
    out: dict[str, dict] = {}
    for r in rows:
        bm = bytearray(m_bits // 8)
        for b in r["_bits"]:
            bm[b // 8] |= 1 << (b % 8)
        out.setdefault(str(r[part_col]), {})[r["_c"]] = bm.hex()
    return out


def _compute_ndv(
    spark: SparkSession,
    stage_path: str,
    part_col: str,
    ndv_cols: list[str],
    k: int,
) -> dict:
    """Per-partition KMV (k-minimum-values) distinct-count sketches: the
    k smallest 60-bit md5 hashes of each column's distinct values, in ONE
    pass over the stage for all columns (exploded (col, hash) pairs →
    distinct → per-(partition, column) rank ≤ k). The sketch is
    MERGEABLE — the k smallest of a union of per-partition sketches are
    exactly the k smallest overall — so a table-wide NDV estimate needs
    only the manifests. Each sketch is ≤ k JSON integers; NULLs are not
    hashed."""
    from pyspark.sql import Window

    df = _read_stage_raw(spark, stage_path)
    cols = [c for c in ndv_cols if c in df.columns]
    if not cols:
        return {}
    pairs = []
    for c in cols:
        h = F.conv(
            F.substring(F.md5(F.col(c).cast("string")), 1, 15), 16, 10
        ).cast("long")
        pairs.append(
            F.when(
                F.col(c).isNotNull(),
                F.struct(F.lit(c).alias("c"), h.alias("h")),
            )
        )
    w = Window.partitionBy(part_col, "_c").orderBy("_h")
    rows = (
        df.select(F.col(part_col), F.explode(F.array(*pairs)).alias("_p"))
        .filter(F.col("_p").isNotNull())
        .select(F.col(part_col), F.col("_p.c").alias("_c"), F.col("_p.h").alias("_h"))
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(part_col, "_c")
        .agg(F.sort_array(F.collect_list("_h")).alias("_hs"))
        .collect()
    )
    out: dict[str, dict] = {}
    for r in rows:
        out.setdefault(str(r[part_col]), {})[r["_c"]] = [int(x) for x in r["_hs"]]
    return out


def _kmv_estimate(hashes: list[int], k: int) -> float:
    """KMV estimator over a sorted sketch: exact count when the sketch
    never filled (fewer than k distinct values seen), else
    (k-1) * 2^60 / h_(k) — one correctly-rounded int->double conversion
    and one IEEE division, so the value is engine-portable."""
    if len(hashes) < k:
        return float(len(hashes))
    return (k - 1) * 2.0**60 / float(hashes[k - 1])


def _compute_sample(
    spark: SparkSession,
    stage_path: str,
    part_col: str,
    sample_cols: list[str],
    k: int,
) -> dict:
    """Per-partition CONTENT-ADDRESSED VALUE SAMPLES: for each column,
    the k distinct values with the smallest 60-bit md5 hashes, stored as
    sorted ``[hash, value]`` pairs. Like the KMV sketch this is exactly
    MERGEABLE (the k hash-smallest of a union of per-partition
    hash-smallest sets are the k hash-smallest overall), but it carries
    the VALUES — a deterministic uniform sample of the column's value
    domain that any engine reproduces bit-for-bit from the same data.
    This is the statistic a range-partition planner reads to propose
    balanced split bounds (see ``sources/advisor.py
    propose_range_bounds``). The one-scan sidecar discipline of
    ``_compute_ndv``/``_compute_blooms`` applies per VALUE TYPE: columns
    sharing a dtype ride one exploded (col, hash, value) pass (a struct
    field must hold one type, so mixed-type opt-ins cost one pass per
    distinct dtype — usually one). Each sketch is ≤ k JSON pairs; NULLs
    not sampled."""
    from pyspark.sql import Window

    df = _read_stage_raw(spark, stage_path)
    dtypes = dict(df.dtypes)
    by_type: dict[str, list[str]] = {}
    for c in sample_cols:
        if c in df.columns:
            by_type.setdefault(dtypes[c], []).append(c)
    out: dict[str, dict] = {}
    w = Window.partitionBy(part_col, "_c").orderBy("_h", "_v")
    for cols in by_type.values():
        pairs = []
        for c in cols:
            h = F.conv(
                F.substring(F.md5(F.col(c).cast("string")), 1, 15), 16, 10
            ).cast("long")
            pairs.append(
                F.when(
                    F.col(c).isNotNull(),
                    F.struct(
                        F.lit(c).alias("c"), h.alias("h"), F.col(c).alias("v")
                    ),
                )
            )
        rows = (
            df.select(F.col(part_col), F.explode(F.array(*pairs)).alias("_p"))
            .filter(F.col("_p").isNotNull())
            .select(
                F.col(part_col),
                F.col("_p.c").alias("_c"),
                F.col("_p.h").alias("_h"),
                F.col("_p.v").alias("_v"),
            )
            .distinct()
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .groupBy(part_col, "_c")
            .agg(
                F.sort_array(F.collect_list(F.struct("_h", "_v"))).alias("_ps")
            )
            .collect()
        )
        for r in rows:
            out.setdefault(str(r[part_col]), {})[r["_c"]] = [
                [int(p["_h"]), _json_scalar(p["_v"])] for p in r["_ps"]
            ]
    return out


def _check_sample_spec(
    df: DataFrame, part_col: str, sample_cols: list[str], k: int
) -> None:
    """Sample sidecars share the bloom portability contract: the hash is
    md5 over Spark's CAST(col AS STRING), so only types whose string
    form is reproduced exactly on the Python/DuckDB side are allowed —
    a float column's engine-varying rendering would make the 'same'
    sample differ across engines."""
    if k < 2:
        raise ValueError(f"sample_k must be >= 2, got {k}")
    dtypes = dict(df.dtypes)
    for c in sample_cols:
        if c == part_col:
            raise ValueError(
                f"sample_cols may not name the partition column '{c}' — "
                "its values are the manifest's partition map itself"
            )
        t = dtypes.get(c)
        if t is None:
            raise ValueError(
                f"sample_cols column '{c}' is not in the DataFrame — a "
                "misspelled column would commit a table whose layout "
                "planner silently has no sample to read"
            )
        if t not in _BLOOM_OK_TYPES:
            raise TypeError(
                f"sample_cols column '{c}' has type {t}; value samples "
                f"support only {sorted(_BLOOM_OK_TYPES)} (engine-portable "
                "string forms)"
            )


def sample_values(
    spark: SparkSession, table_path: str, col: str, manifest: int | None = None
) -> list:
    """The MERGED table-wide content-addressed sample of ``col`` from
    manifest metadata alone: union the per-partition ``[hash, value]``
    sketches, dedupe, and keep the k hash-smallest — exactly the sample
    a single pass over the whole table would produce. Returned as the
    list of values sorted by (hash, value); zero data files touched."""
    ids = _manifest_ids(spark, table_path)
    if not ids:
        raise FileNotFoundError(f"no committed manifest under {table_path}")
    km = manifest if manifest is not None else ids[-1]
    m = _read_manifest(spark, table_path, km)
    if col not in m.get("sample_cols", []):
        raise FileNotFoundError(
            f"manifest m{km} of {table_path} has no value sample for "
            f"'{col}' — write the table with sample_cols to opt in"
        )
    k = m["sample_k"]
    merged: set[tuple] = set()
    for v in m["partitions"]:
        for h, val in m.get("sample", {}).get(v, {}).get(col, []):
            merged.add((int(h), val))
    return [val for _h, val in sorted(merged)[:k]]


def _compute_heavy(
    spark: SparkSession,
    stage_path: str,
    part_col: str,
    heavy_cols: list[str],
    k: int,
    threshold: int,
) -> dict:
    """Per-partition VALUE-LEVEL HEAVY-HITTER sidecars: exact counts for
    (a) the k distinct values with the smallest 60-bit md5 hashes
    ("kmin" — a content-addressed uniform sample of the value domain
    WITH its exact frequency) and (b) every value whose count in the
    partition reaches ``threshold`` ("hot"). Both are EXACTLY mergeable
    by addition, never sketched:

      * a value whose hash ranks <= k GLOBALLY ranks <= k inside every
        partition that contains it (fewer than k smaller hashes exist
        anywhere), so summing its per-partition kmin counts is the exact
        table-wide count — unlike Misra-Gries there is no decrement
        error;
      * a "hot" sum is an exact LOWER BOUND whose error is < threshold
        per non-reporting partition (a partition not listing the value
        holds < threshold copies of it by construction) — the bound the
        skew detector reports alongside the count.

    This is the statistic partition-granular row counts cannot give: a
    single join KEY hot inside otherwise-balanced partitions (the
    classic shuffle straggler) is invisible to ``detect_partition_skew``
    but sits in every partition's hot list here, so the skew decision
    (``sources.advisor.detect_key_skew`` ->
    ``operators.skew.salted_join``) reads the manifest alone. One scan per distinct value
    dtype (struct fields are monotyped, same discipline as
    ``_compute_sample``); the aggregation is a map-side-combining
    groupBy, never a collect of raw rows. Metadata size per (partition,
    column) is <= k + rows/threshold entries; a partition whose hot list
    exceeds 10_000 entries fails LOUDLY at commit (the threshold is too
    low for the data — silent metadata blow-up at 100 TB is the worse
    failure). NULLs are neither counted nor sampled."""
    from pyspark.sql import Window

    df = _read_stage_raw(spark, stage_path)
    dtypes = dict(df.dtypes)
    by_type: dict[str, list[str]] = {}
    for c in heavy_cols:
        if c in df.columns:
            by_type.setdefault(dtypes[c], []).append(c)
    out: dict[str, dict] = {}
    w = Window.partitionBy(part_col, "_c").orderBy("_h", "_v")
    for cols in by_type.values():
        pairs = []
        for c in cols:
            pairs.append(
                F.when(
                    F.col(c).isNotNull(),
                    F.struct(F.lit(c).alias("c"), F.col(c).alias("v")),
                )
            )
        rows = (
            df.select(F.col(part_col), F.explode(F.array(*pairs)).alias("_p"))
            .filter(F.col("_p").isNotNull())
            .groupBy(
                F.col(part_col),
                F.col("_p.c").alias("_c"),
                F.col("_p.v").alias("_v"),
            )
            .agg(F.count(F.lit(1)).alias("_n"))
            .withColumn(
                "_h",
                F.conv(
                    F.substring(F.md5(F.col("_v").cast("string")), 1, 15),
                    16, 10,
                ).cast("long"),
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") <= k) | (F.col("_n") >= threshold))
            .groupBy(part_col, "_c")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("_h", "_v", "_n", "_rn"))
                ).alias("_ps")
            )
            .collect()
        )
        for r in rows:
            d = out.setdefault(str(r[part_col]), {}).setdefault(
                r["_c"], {"kmin": [], "hot": []}
            )
            for p in r["_ps"]:
                if p["_rn"] <= k:
                    d["kmin"].append(
                        [int(p["_h"]), _json_scalar(p["_v"]), int(p["_n"])]
                    )
                if p["_n"] >= threshold:
                    d["hot"].append([_json_scalar(p["_v"]), int(p["_n"])])
            if len(d["hot"]) > 10_000:
                raise ValueError(
                    f"heavy sidecar for column '{r['_c']}' in partition "
                    f"'{r[part_col]}' lists {len(d['hot'])} values at or "
                    f"above heavy_threshold={threshold} — raise the "
                    "threshold; a manifest is metadata, not a histogram "
                    "of the whole column"
                )
            d["hot"].sort(key=lambda e: (-e[1], str(e[0])))
    return out


def _check_heavy_spec(
    df: DataFrame, part_col: str, heavy_cols: list[str], k: int, threshold: int
) -> None:
    """Heavy sidecars share the bloom/sample portability contract (md5
    over Spark's CAST(col AS STRING)) plus a floor on the hot threshold:
    ``threshold=1`` would record every distinct value's count — that is
    the table, not metadata."""
    if k < 2:
        raise ValueError(f"heavy_k must be >= 2, got {k}")
    if threshold < 2:
        raise ValueError(
            f"heavy_threshold must be >= 2, got {threshold} — a threshold "
            "of 1 stores every distinct value's count in the manifest"
        )
    dtypes = dict(df.dtypes)
    for c in heavy_cols:
        if c == part_col:
            raise ValueError(
                f"heavy_cols may not name the partition column '{c}' — "
                "per-partition row counts (stats_cols) already give its "
                "value frequencies exactly"
            )
        t = dtypes.get(c)
        if t is None:
            raise ValueError(
                f"heavy_cols column '{c}' is not in the DataFrame — a "
                "misspelled column would commit a table whose skew "
                "detector silently has no counts to read"
            )
        if t not in _BLOOM_OK_TYPES:
            raise TypeError(
                f"heavy_cols column '{c}' has type {t}; heavy-hitter "
                f"sidecars support only {sorted(_BLOOM_OK_TYPES)} "
                "(engine-portable string forms)"
            )


def merged_heavy_m(m: dict, col: str) -> tuple[list, dict]:
    """Merge the per-partition heavy sidecars of an already-parsed
    manifest into table-wide statistics for ``col``. Returns
    ``(kmin, hot)``:

      * ``kmin`` — ``[[value, exact_count], ...]`` for the k distinct
        values with the globally smallest hashes, counts EXACT by the
        mergeability argument in :func:`_compute_heavy` (sorted by
        hash — i.e. a uniform sample order, not by count);
      * ``hot`` — ``{value_json: [count_lower_bound, error_bound]}`` for
        every value any partition reported hot, where the true count is
        in ``[lb, lb + err)``: per partition the count is exact when
        reported (hot or kmin list), else provably < threshold, and
        ``err = threshold * n_partitions_not_reporting``.

    Zero data files touched — this is the merge rule
    ``sources.advisor.detect_key_skew`` builds on."""
    if col not in m.get("heavy_cols", []):
        raise FileNotFoundError(
            f"manifest has no heavy-hitter sidecar for '{col}' — write "
            "the table with heavy_cols to opt in"
        )
    k = m["heavy_k"]
    threshold = m["heavy_threshold"]
    parts = sorted(m["partitions"])
    # per-partition exact count map (kmin ∪ hot agree on shared values)
    per_part: list[dict] = []
    all_kmin: set[tuple] = set()
    for v in parts:
        side = m.get("heavy", {}).get(v, {}).get(col, {})
        exact: dict = {}
        for h, val, n in side.get("kmin", []):
            key = _json_key(val)
            exact[key] = int(n)
            all_kmin.add((int(h), key, val if not isinstance(val, list) else tuple(val)))
        for val, n in side.get("hot", []):
            exact[_json_key(val)] = int(n)
        per_part.append(exact)
    # global kmin: k hash-smallest distinct values; counts sum exactly
    kmin_sorted = sorted({(h, key) for h, key, _v in all_kmin})[:k]
    key_to_val = {key: val for _h, key, val in all_kmin}
    kmin = [
        [key_to_val[key], sum(p.get(key, 0) for p in per_part)]
        for _h, key in kmin_sorted
    ]
    # hot: lower-bound sums with explicit error bounds
    hot_keys: set = set()
    for v in parts:
        side = m.get("heavy", {}).get(v, {}).get(col, {})
        hot_keys.update(_json_key(val) for val, _n in side.get("hot", []))
    hot: dict = {}
    for key in hot_keys:
        lb = sum(p.get(key, 0) for p in per_part)
        missing = sum(1 for p in per_part if key not in p)
        hot[key] = [lb, missing * (threshold - 1)]
    return kmin, hot


def _json_key(val):
    """Hashable identity for a JSON-decoded sidecar value (lists from
    JSON arrays become tuples)."""
    return tuple(val) if isinstance(val, list) else val


def heavy_hitters(
    spark: SparkSession, table_path: str, col: str, manifest: int | None = None
) -> tuple[list, dict]:
    """Table-wide merged heavy-hitter statistics for ``col`` from
    MANIFEST METADATA alone — see :func:`merged_heavy_m` for the return
    shape. Raises loudly if the table was not written with
    ``heavy_cols`` including ``col``."""
    ids = _manifest_ids(spark, table_path)
    if not ids:
        raise FileNotFoundError(f"no committed manifest under {table_path}")
    km = manifest if manifest is not None else ids[-1]
    return merged_heavy_m(_read_manifest(spark, table_path, km), col)


def ndv_partitions(
    spark: SparkSession, table_path: str, col: str, manifest: int | None = None
) -> dict[str, tuple[int, float]]:
    """Per-partition (sketch_size, NDV estimate) for ``col`` from
    MANIFEST METADATA alone — the approximate-distinct analog of
    :func:`partition_rows`. Raises loudly if the table was not written
    with ``ndv_cols`` including ``col``."""
    ids = _manifest_ids(spark, table_path)
    if not ids:
        raise FileNotFoundError(f"no committed manifest under {table_path}")
    km = manifest if manifest is not None else ids[-1]
    m = _read_manifest(spark, table_path, km)
    if col not in m.get("ndv_cols", []):
        raise FileNotFoundError(
            f"manifest m{km} of {table_path} has no NDV sketch for '{col}' — "
            "write the table with ndv_cols to opt in"
        )
    k = m["ndv_k"]
    out: dict[str, tuple[int, float]] = {}
    for v in sorted(m["partitions"]):
        hs = m.get("ndv", {}).get(v, {}).get(col, [])
        out[v] = (len(hs), _kmv_estimate(hs, k))
    return out


def ndv_table(
    spark: SparkSession, table_path: str, col: str, manifest: int | None = None
) -> tuple[int, float]:
    """Table-wide (merged sketch size, NDV estimate) for ``col`` by KMV
    sketch merge across every partition's manifest entry — zero data
    files read. Mergeability is exact: the k smallest hashes of the
    union of per-partition k-smallest sets ARE the k smallest overall."""
    ids = _manifest_ids(spark, table_path)
    if not ids:
        raise FileNotFoundError(f"no committed manifest under {table_path}")
    km = manifest if manifest is not None else ids[-1]
    m = _read_manifest(spark, table_path, km)
    if col not in m.get("ndv_cols", []):
        raise FileNotFoundError(
            f"manifest m{km} of {table_path} has no NDV sketch for '{col}' — "
            "write the table with ndv_cols to opt in"
        )
    return merged_ndv_m(m, col)


def merged_ndv_m(m: dict, col: str) -> tuple[int, float]:
    """Table-wide (merged sketch size, NDV estimate) from an already-
    PARSED manifest — the ONE copy of the KMV merge rule, shared by
    :func:`ndv_table` and the advisor's ``table_stats``."""
    k = m["ndv_k"]
    merged: set[int] = set()
    for v in m["partitions"]:
        merged.update(m.get("ndv", {}).get(v, {}).get(col, []))
    hs = sorted(merged)[:k]
    return (len(hs), _kmv_estimate(hs, k))


def _check_ndv_spec(
    df: DataFrame, part_col: str, ndv_cols: list[str], k: int
) -> None:
    """Loud validation of the NDV opt-in, write-time not read-time.
    Unlike blooms (where an absent filter is fail-SAFE: the partition is
    kept), an absent NDV sketch is fail-WRONG — ndv_partitions would
    report an exact-looking (0, 0.0) for a column that was merely
    misspelled, and a cost-based planner would act on it."""
    if k < 2:
        raise ValueError(f"ndv_k must be >= 2, got {k}")
    cols = set(df.columns)
    for c in ndv_cols:
        if c == part_col:
            raise ValueError(
                f"ndv_cols may not name the partition column '{c}' — its "
                "distinct values are the manifest's partition map itself"
            )
        if c not in cols:
            raise ValueError(
                f"ndv_cols column '{c}' is not in the DataFrame — a "
                "misspelled column would commit a manifest whose NDV "
                "reads return a fabricated exact zero"
            )


def _check_bloom_spec(
    df: DataFrame, part_col: str, bloom_cols: list[str],
    m_bits: int, k_hashes: int,
) -> dict[str, str]:
    """Loud validation of the bloom opt-in, write-time not probe-time.
    Returns ``{col: spark_dtype}`` for the manifest's ``bloom_dtypes``
    record, which lets :func:`prune_partitions_eq` type-check probes.

    k is capped at 8 because the JVM builder computes h1 + i*h2 with
    h1, h2 < 2^60 in long arithmetic: i <= 7 keeps the sum under 2^63;
    a larger i would wrap negative, set aliased bits, and make pruning
    silently LOSSY (the Python prober computes exact positions, finds a
    clear bit for a present value, and drops the true partition)."""
    if m_bits < 8 or m_bits % 8 != 0:
        raise ValueError(f"bloom_bits must be a positive multiple of 8, got {m_bits}")
    if not 1 <= k_hashes <= 8:
        raise ValueError(f"bloom_hashes must be in [1, 8], got {k_hashes}")
    dtypes = dict(df.dtypes)
    for c in bloom_cols:
        if c == part_col:
            raise ValueError(
                f"bloom_cols may not name the partition column '{c}' — "
                "partition values are pruned directly by the manifest map"
            )
        t = dtypes.get(c)
        if t is None:
            raise ValueError(
                f"bloom_cols column '{c}' is not in the DataFrame — a "
                "misspelled column would commit a table whose point-lookup "
                "pruning silently never engages"
            )
        if t not in _BLOOM_OK_TYPES:
            raise TypeError(
                f"bloom_cols column '{c}' has type {t}; bloom sidecars "
                f"support only {sorted(_BLOOM_OK_TYPES)} (types whose "
                "string form is identical JVM-side and Python-side)"
            )
    return {c: dtypes[c] for c in bloom_cols}


def _coerce_bloom_probe(value, dtype: str):
    """Validate/coerce a point-lookup probe against the bloom column's
    RECORDED Spark dtype before hashing. A probe whose Python ``str()``
    differs from Spark's ``CAST(col AS STRING)`` of the stored values
    (``5.0`` against a bigint column, ``True`` against an int, a
    ``datetime`` whose isoformat carries 'T' against a date column) would
    otherwise produce a definitive-looking bloom NEGATIVE and silently
    prune the true partition — lossy. Equal-under-SQL probes coerce
    (``5.0`` -> ``5``, midnight datetime -> date, ISO string -> date);
    anything else raises loudly."""
    import datetime

    def _bad(why: str):
        return TypeError(
            f"bloom probe {value!r} is incompatible with the indexed "
            f"column's type {dtype}: {why} — coerce the probe yourself "
            "or filter without metadata pruning"
        )

    if dtype in ("tinyint", "smallint", "int", "bigint"):
        if isinstance(value, bool):
            raise _bad("bool hashes as 'true'/'false', never equal to an int")
        if isinstance(value, int):
            return value
        if isinstance(value, float):
            if value.is_integer():
                return int(value)
            raise _bad("a non-integral float can never equal an integer")
        raise _bad("expected an int")
    if dtype == "boolean":
        if isinstance(value, bool):
            return value
        raise _bad("expected a bool")
    if dtype == "string":
        if isinstance(value, str):
            return value
        raise _bad("expected a str")
    if dtype == "date":
        if isinstance(value, datetime.datetime):
            if value.time() == datetime.time(0) and value.tzinfo is None:
                return value.date()
            raise _bad(
                "a datetime with a nonzero time/tz can never equal a DATE, "
                "and its isoformat ('T' separator) mis-hashes"
            )
        if isinstance(value, datetime.date):
            return value
        if isinstance(value, str):
            try:
                return datetime.date.fromisoformat(value)
            except ValueError:
                raise _bad("expected a date or an ISO 'YYYY-MM-DD' string") from None
        raise _bad("expected a date")
    raise _bad("unrecognized recorded dtype")


def write_ptable(
    df: DataFrame,
    table_path: str,
    part_col: str,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 2048,
    bloom_hashes: int = 5,
    ndv_cols: list[str] | None = None,
    ndv_k: int = 64,
    sample_cols: list[str] | None = None,
    sample_k: int = 256,
    heavy_cols: list[str] | None = None,
    heavy_k: int = 64,
    heavy_threshold: int = 1000,
) -> int:
    """Write ``df`` as a new FULL commit of the partitioned table (every
    partition staged fresh); returns the manifest id. The partition column
    stays a real column on read (recovered from the directory name).

    ``stats_cols`` opts the table into partition-level ZONE MAPS: per
    partition, [min, max] of each named column rides the manifest (plus
    exact per-partition row counts on the same scan — see
    :func:`partition_rows`), and :func:`prune_partitions` answers range
    predicates from metadata alone — the file-skipping layer the table
    formats give, at manifest granularity.

    ``bloom_cols`` opts into per-partition BLOOM FILTERS (``bloom_bits``
    bits, ``bloom_hashes`` probes, md5 double-hashing) — the
    high-cardinality EQUALITY complement to zone maps:
    :func:`prune_partitions_eq` answers point lookups from the manifest,
    pruning every partition whose filter provably excludes the value.

    ``ndv_cols`` opts into per-partition KMV DISTINCT-COUNT SKETCHES
    (``ndv_k`` minimum hashes): :func:`ndv_partitions` /
    :func:`ndv_table` answer approximate COUNT(DISTINCT col) per
    partition and table-wide (mergeable) from the manifest alone — the
    NDV statistics a cost-based planner reads before picking a join
    strategy. Later merges re-derive every sidecar for the partitions
    they rewrite and carry the rest by reference."""
    spark = df.sparkSession
    ids = _manifest_ids(spark, table_path)
    k = (ids[-1] + 1) if ids else 1
    stage = f"{table_path}/stage/m{k}"
    _clear_crashed_stage(spark, table_path, k)
    bloom_dtypes: dict[str, str] = {}
    if bloom_cols:
        bloom_dtypes = _check_bloom_spec(
            df, part_col, list(bloom_cols), bloom_bits, bloom_hashes
        )
    df.write.mode("error").partitionBy(part_col).parquet(stage)
    part_type = dict(df.dtypes)[part_col]
    mapping = {
        v: f"stage/m{k}/{part_col}={_enc(v)}"
        for v in _stage_partitions(spark, stage, part_col)
    }
    manifest = {
        "part_col": part_col,
        "part_type": part_type,
        "partitions": mapping,
        "stage_schemas": {f"m{k}": _stage_schema_json(df, part_col)},
    }
    if stats_cols:
        stats, rows = _compute_stats(spark, stage, part_col, list(stats_cols))
        manifest["stats_cols"] = list(stats_cols)
        manifest["stats"] = stats
        manifest["rows"] = rows
    if bloom_cols:
        manifest["bloom_cols"] = list(bloom_cols)
        manifest["bloom_m"] = int(bloom_bits)
        manifest["bloom_k"] = int(bloom_hashes)
        manifest["bloom_dtypes"] = bloom_dtypes
        manifest["blooms"] = _compute_blooms(
            spark, stage, part_col, list(bloom_cols), bloom_bits, bloom_hashes
        )
    if ndv_cols:
        _check_ndv_spec(df, part_col, list(ndv_cols), ndv_k)
        manifest["ndv_cols"] = list(ndv_cols)
        manifest["ndv_k"] = int(ndv_k)
        manifest["ndv"] = _compute_ndv(
            spark, stage, part_col, list(ndv_cols), ndv_k
        )
    if sample_cols:
        _check_sample_spec(df, part_col, list(sample_cols), sample_k)
        manifest["sample_cols"] = list(sample_cols)
        manifest["sample_k"] = int(sample_k)
        manifest["sample"] = _compute_sample(
            spark, stage, part_col, list(sample_cols), sample_k
        )
    if heavy_cols:
        _check_heavy_spec(
            df, part_col, list(heavy_cols), heavy_k, heavy_threshold
        )
        manifest["heavy_cols"] = list(heavy_cols)
        manifest["heavy_k"] = int(heavy_k)
        manifest["heavy_threshold"] = int(heavy_threshold)
        manifest["heavy"] = _compute_heavy(
            spark, stage, part_col, list(heavy_cols), heavy_k,
            heavy_threshold,
        )
    _write_manifest(spark, table_path, k, manifest)
    return k


def read_ptable(
    spark: SparkSession,
    table_path: str,
    manifest: int | None = None,
    partitions: list | None = None,
) -> DataFrame:
    """Read the table at the newest manifest (default) or an explicit one
    (time travel). ``partitions`` prunes to the named partition VALUES
    without touching any other directory — manifest-level pruning, the
    pushdown this layout exists for. Schemas merge across stage dirs
    (evolved columns null-fill partitions written before the evolution)."""
    ids = _manifest_ids(spark, table_path)
    if not ids:
        raise FileNotFoundError(f"no committed manifest under {table_path}")
    k = manifest if manifest is not None else ids[-1]
    if k not in ids:
        raise FileNotFoundError(f"manifest m{k} of {table_path} does not exist")
    m = _read_manifest(spark, table_path, k)
    part_col, part_type = m["part_col"], m["part_type"]
    items = sorted(m["partitions"].items())
    if partitions is not None:
        want = {str(p) for p in partitions}
        items = [(v, d) for v, d in items if v in want]
    if not items:
        raise FileNotFoundError(f"no matching partitions in manifest m{k}")
    stage_schemas = m.get("stage_schemas", {})
    schema_cache: dict[str, object] = {}
    parts = []
    for val, rel in items:
        # manifest rel paths are fully percent-encoded; the disk name is
        # Spark's hive form (spaces literal) — decode before the read
        stage_id = rel.split("/")[1]
        sj = stage_schemas.get(stage_id)
        if sj is not None:
            # the commit recorded this stage's data schema: hand it to the
            # scan EXPLICITLY — plan construction runs zero jobs instead of
            # a per-directory mergeSchema footer-inference pass (a table
            # read was paying one serial driver job per partition dir)
            if stage_id not in schema_cache:
                from pyspark.sql.types import StructType

                schema_cache[stage_id] = StructType.fromJson(json.loads(sj))
            df = spark.read.schema(schema_cache[stage_id]).parquet(
                f"{table_path}/{unquote(rel)}"
            )
        else:  # pre-schema manifest: legacy inference read
            df = spark.read.option("mergeSchema", "true").parquet(
                f"{table_path}/{unquote(rel)}"
            )
        parts.append(df.withColumn(part_col, F.lit(val).cast(part_type)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def ptable_history(spark: SparkSession, table_path: str) -> list[int]:
    return _manifest_ids(spark, table_path)


def merge_ptable(
    spark: SparkSession,
    table_path: str,
    source: DataFrame,
    key_cols: list[str],
    delete_keys: DataFrame | None = None,
    meta: dict | None = None,
) -> int:
    """MERGE a changeset into the partitioned table, touching ONLY the
    partitions the changeset names — the delta-proportional upsert. The
    source must carry the table's partition column; ``delete_keys`` must
    carry it too (keys + partition), so deletes never force a full-table
    scan. Untouched partitions are carried into the new manifest by
    REFERENCE (their bytes are never read or rewritten).

    Contract (the standard one for partition-pruned upserts): the source
    is a KEYED changeset (one row per key), and a row that MOVES a key to
    a different partition must be accompanied by a delete_keys row for the
    old (key, partition) — the merge only reads the partitions named by
    the changeset, so it cannot see (and will not remove) the key's old
    copy elsewhere. Detecting moves automatically would force a full-table
    scan, which is exactly what this layout exists to avoid."""
    from flnr_wins_spark.operators.merge import merge_upsert_evolve

    ids = _manifest_ids(spark, table_path)
    if not ids:
        raise FileNotFoundError(
            "bootstrap a partitioned table with write_ptable(df, path, part_col) "
            "first — merge_ptable takes the partition column from the committed "
            "manifest"
        )
    prev = _read_manifest(spark, table_path, ids[-1])
    part_col = prev["part_col"]
    if part_col not in source.columns:
        raise ValueError(f"source must carry partition column '{part_col}'")
    if delete_keys is not None and part_col not in delete_keys.columns:
        raise ValueError(f"delete_keys must carry partition column '{part_col}'")

    # ONE distinct-collect job over both changeset sides (was two serial
    # jobs — source partitions, then delete partitions)
    tp = source.select(F.col(part_col).alias("_p"))
    if delete_keys is not None:
        tp = tp.unionByName(delete_keys.select(F.col(part_col).alias("_p")))
    touched = {str(r[0]) for r in tp.distinct().collect()}
    existing = set(prev["partitions"])
    read_vals = sorted(touched & existing)
    k = ids[-1] + 1
    stage = f"{table_path}/stage/m{k}"
    _clear_crashed_stage(spark, table_path, k)
    if read_vals:
        target = read_ptable(spark, table_path, partitions=read_vals)
        merged = merge_upsert_evolve(target, source, key_cols, delete_keys=delete_keys)
    else:
        merged = source
        if delete_keys is not None:
            merged = merged.join(
                delete_keys.select(*key_cols), list(key_cols), "left_anti"
            )
    merged.write.mode("error").partitionBy(part_col).parquet(stage)
    written = set(_stage_partitions(spark, stage, part_col))
    mapping = dict(prev["partitions"])
    for v in touched:
        mapping.pop(v, None)  # an all-deleted partition leaves the manifest
    for v in written:
        mapping[v] = f"stage/m{k}/{part_col}={_enc(v)}"
    stage_schemas = _carry_stage_schemas(prev, mapping)
    if written:
        stage_schemas[f"m{k}"] = _stage_schema_json(merged, part_col)
    manifest = {
        "part_col": part_col,
        "part_type": prev["part_type"],
        "partitions": mapping,
        "stage_schemas": stage_schemas,
    }
    if prev.get("stats_cols"):
        # zone maps + row counts: untouched partitions keep their entries
        # by reference; rewritten partitions re-derive from the fresh
        # stage (one pruned scan of just-written data)
        stats = {
            v: s for v, s in prev.get("stats", {}).items() if v in mapping
        }
        rows = {
            v: n for v, n in prev.get("rows", {}).items() if v in mapping
        }
        for v in written:
            stats.pop(v, None)
            rows.pop(v, None)
        if written:  # a delete-only merge leaves an empty stage: no scan
            new_stats, new_rows = _compute_stats(
                spark, stage, part_col, prev["stats_cols"]
            )
            stats.update(new_stats)
            rows.update(new_rows)
        manifest["stats_cols"] = prev["stats_cols"]
        manifest["stats"] = stats
        if "rows" in prev:
            # a pre-row-count manifest (older writer) has no baseline for
            # untouched partitions — omitting 'rows' keeps partition_rows
            # failing LOUDLY instead of returning a partial count map
            manifest["rows"] = rows
    if prev.get("bloom_cols"):
        # bloom sidecars follow the same carry-by-reference rule
        blooms = {
            v: b for v, b in prev.get("blooms", {}).items() if v in mapping
        }
        for v in written:
            blooms.pop(v, None)
        if written:
            blooms.update(
                _compute_blooms(
                    spark, stage, part_col, prev["bloom_cols"],
                    prev["bloom_m"], prev["bloom_k"],
                )
            )
        manifest["bloom_cols"] = prev["bloom_cols"]
        manifest["bloom_m"] = prev["bloom_m"]
        manifest["bloom_k"] = prev["bloom_k"]
        if "bloom_dtypes" in prev:  # absent in pre-r8 manifests
            manifest["bloom_dtypes"] = prev["bloom_dtypes"]
        manifest["blooms"] = blooms
    if prev.get("ndv_cols"):
        # NDV sketches follow the same carry-by-reference rule
        ndv = {v: s for v, s in prev.get("ndv", {}).items() if v in mapping}
        for v in written:
            ndv.pop(v, None)
        if written:
            ndv.update(
                _compute_ndv(
                    spark, stage, part_col, prev["ndv_cols"], prev["ndv_k"]
                )
            )
        manifest["ndv_cols"] = prev["ndv_cols"]
        manifest["ndv_k"] = prev["ndv_k"]
        manifest["ndv"] = ndv
    if prev.get("sample_cols"):
        # value samples follow the same carry-by-reference rule
        samp = {
            v: p for v, p in prev.get("sample", {}).items() if v in mapping
        }
        for v in written:
            samp.pop(v, None)
        if written:
            samp.update(
                _compute_sample(
                    spark, stage, part_col, prev["sample_cols"],
                    prev["sample_k"],
                )
            )
        manifest["sample_cols"] = prev["sample_cols"]
        manifest["sample_k"] = prev["sample_k"]
        manifest["sample"] = samp
    if prev.get("heavy_cols"):
        # heavy-hitter sidecars follow the same carry-by-reference rule
        heavy = {
            v: h for v, h in prev.get("heavy", {}).items() if v in mapping
        }
        for v in written:
            heavy.pop(v, None)
        if written:
            heavy.update(
                _compute_heavy(
                    spark, stage, part_col, prev["heavy_cols"],
                    prev["heavy_k"], prev["heavy_threshold"],
                )
            )
        manifest["heavy_cols"] = prev["heavy_cols"]
        manifest["heavy_k"] = prev["heavy_k"]
        manifest["heavy_threshold"] = prev["heavy_threshold"]
        manifest["heavy"] = heavy
    if meta:
        # caller-owned metadata rides the atomic commit (e.g. the streaming
        # sink's applied-batch-id for exactly-once replay skipping); the
        # reserved structural keys stay ours
        bad = set(meta) & set(manifest)
        if bad:
            raise ValueError(f"meta may not shadow manifest keys: {sorted(bad)}")
        manifest["meta"] = dict(meta)
    _write_manifest(spark, table_path, k, manifest)
    return k


def read_manifest_meta(spark: SparkSession, table_path: str) -> dict:
    """The ``meta`` dict of the newest committed manifest ({} if none) —
    how the streaming sink recovers its last applied batch id."""
    ids = _manifest_ids(spark, table_path)
    if not ids:
        return {}
    return _read_manifest(spark, table_path, ids[-1]).get("meta", {})


def vacuum_ptable(spark: SparkSession, table_path: str, keep_last: int = 2) -> list[str]:
    """Delete stage directories referenced by NO retained manifest, and the
    manifests older than the newest ``keep_last``. Returns deleted paths."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    ids = _manifest_ids(spark, table_path)
    if not ids:
        return []
    keep_ids = ids[-keep_last:]
    referenced: set[str] = set()
    for k in keep_ids:
        m = _read_manifest(spark, table_path, k)
        for rel in m["partitions"].values():
            referenced.add(rel.split("/")[1])  # stage/m<K>/... -> m<K>
    deleted = []
    fs, jstage = _fs(spark, f"{table_path}/stage")
    if fs.exists(jstage):
        for status in fs.listStatus(jstage):
            name = status.getPath().getName()
            if name not in referenced:
                fs.delete(status.getPath(), True)
                deleted.append(f"{table_path}/stage/{name}")
    for k in ids:
        if k not in keep_ids:
            fs_m, jm = _fs(spark, f"{table_path}/manifests/m{k}.json")
            fs_m.delete(jm, False)
            deleted.append(f"{table_path}/manifests/m{k}.json")
    return deleted


def prune_partitions(
    spark: SparkSession,
    table_path: str,
    col: str,
    lo=None,
    hi=None,
    manifest: int | None = None,
) -> list[str]:
    """Zone-map pruning: the partition values that COULD hold rows with
    ``lo <= col <= hi``, answered from manifest metadata alone — zero data
    files touched. A partition is pruned only when its recorded [min, max]
    provably excludes the range; partitions without stats for ``col``
    (table not opted in, column evolved in later, or all-NULL) are KEPT —
    pruning is conservative, never lossy. Compose with
    ``read_ptable(..., partitions=...)`` for the manifest-level analog of
    parquet row-group skipping: at 100 TB a keyed range probe reads the
    handful of partitions whose zone intersects, not the table.

    ``lo``/``hi`` (either may be None for a half-open range) must be in
    the column's stored domain — numbers for numeric columns, ISO strings
    for date/timestamp columns (stats store those as ISO strings, which
    order identically)."""
    ids = _manifest_ids(spark, table_path)
    if not ids:
        raise FileNotFoundError(f"no committed manifest under {table_path}")
    k = manifest if manifest is not None else ids[-1]
    m = _read_manifest(spark, table_path, k)
    return prune_range_m(m, col, lo, hi)


def prune_range_m(m: dict, col: str, lo=None, hi=None) -> list[str]:
    """Zone-map range pruning against an already-PARSED manifest — the
    core of :func:`prune_partitions`, exposed so multi-predicate callers
    (``sources/advisor.py``) evaluate every probe against ONE manifest
    read (and therefore one consistent version)."""
    stats = m.get("stats", {})
    keep = []
    for v in sorted(m["partitions"]):
        rng = stats.get(v, {}).get(col)
        if rng is None:
            keep.append(v)  # no evidence -> cannot prune
            continue
        mn, mx = rng
        if lo is not None and mx < lo:
            continue
        if hi is not None and mn > hi:
            continue
        keep.append(v)
    return keep


def prune_partitions_eq(
    spark: SparkSession,
    table_path: str,
    col: str,
    value,
    manifest: int | None = None,
) -> list[str]:
    """POINT-LOOKUP pruning: the partition values that COULD hold rows
    with ``col = value``, answered from manifest metadata alone. Uses the
    per-partition bloom filter when the table was written with
    ``bloom_cols`` (prunes when any of the k probe bits is clear — a
    definitive negative; bloom positives may be false, so the data read
    still applies the real filter) AND the zone map when present (prunes
    when value falls outside [min, max]). Partitions with neither sidecar
    for ``col`` are KEPT — pruning is conservative, never lossy.

    This is the high-cardinality-equality complement to
    :func:`prune_partitions`: zone maps prune range probes on clustered
    columns, blooms prune ``key = x`` probes on columns with no
    partition-local ordering at all. At 100 TB a point lookup touches the
    handful of partitions whose filter fires, not the table."""
    if value is None:
        raise ValueError(
            "bloom sidecars index non-NULL values only — prune IS NULL "
            "probes with an explicit filter instead"
        )
    ids = _manifest_ids(spark, table_path)
    if not ids:
        raise FileNotFoundError(f"no committed manifest under {table_path}")
    k = manifest if manifest is not None else ids[-1]
    m = _read_manifest(spark, table_path, k)
    return prune_eq_m(m, col, value)


def prune_eq_m(m: dict, col: str, value) -> list[str]:
    """Bloom + zone point-lookup pruning against an already-PARSED
    manifest — the core of :func:`prune_partitions_eq`, exposed so
    multi-key callers (DPP key lists, ``sources/advisor.py``) probe ONE
    manifest read (one consistent version) instead of re-reading per
    key."""
    if value is None:
        raise ValueError(
            "bloom sidecars index non-NULL values only — prune IS NULL "
            "probes with an explicit filter instead"
        )
    blooms = m.get("blooms", {})
    stats = m.get("stats", {})
    m_bits, k_hashes = m.get("bloom_m"), m.get("bloom_k")
    # probe-type guard: hash ONLY a probe proven compatible with the
    # column's recorded dtype (pre-r8 manifests lack the record — those
    # fall back to trusting the caller, as before)
    dtype = m.get("bloom_dtypes", {}).get(col)
    if dtype is not None:
        value = _coerce_bloom_probe(value, dtype)
    probe_bits = (
        _bloom_bits_py(value, m_bits, k_hashes) if m_bits else None
    )
    keep = []
    for v in sorted(m["partitions"]):
        bm_hex = blooms.get(v, {}).get(col)
        if bm_hex is not None and probe_bits is not None:
            raw = bytes.fromhex(bm_hex)
            if not all((raw[b // 8] >> (b % 8)) & 1 for b in probe_bits):
                continue  # definitive: value cannot be in this partition
        rng = stats.get(v, {}).get(col)
        if rng is not None:
            mn, mx = rng
            try:
                probe = _json_scalar(value)
                if probe < mn or probe > mx:
                    continue
            except TypeError:
                pass  # incomparable domain -> no zone evidence -> keep
        keep.append(v)
    return keep


def partition_rows(
    spark: SparkSession, table_path: str, manifest: int | None = None
) -> dict[str, int]:
    """Exact per-partition row counts at a manifest, answered from
    METADATA ALONE — zero data files touched. Recorded whenever the table
    opts into ``stats_cols`` (counts ride the zone-map scan for free) and
    maintained through merge (carry untouched / re-derive rewritten),
    compaction (carry verbatim — physical rewrite, logically invisible)
    and partition evolution (re-derive). ``COUNT(*) GROUP BY part_col``
    over a 100 TB table becomes a manifest read — the metadata-table
    posture of the lakehouse formats."""
    ids = _manifest_ids(spark, table_path)
    if not ids:
        raise FileNotFoundError(f"no committed manifest under {table_path}")
    k = manifest if manifest is not None else ids[-1]
    m = _read_manifest(spark, table_path, k)
    rows = m.get("rows")
    if rows is None:
        raise FileNotFoundError(
            f"manifest m{k} of {table_path} records no row counts — "
            "write the table with stats_cols to opt in"
        )
    return {v: int(n) for v, n in sorted(rows.items())}


def partition_file_stats(
    spark: SparkSession, table_path: str, m: dict
) -> dict[str, tuple[int, int]]:
    """(data-file count, bytes) per partition of a PARSED manifest — the
    ONE copy of the data-file-name convention (parquet files only,
    crc/_SUCCESS markers excluded) and of the decoded-rel path rule (the
    manifest stores the dir component fully percent-encoded via ``_enc``;
    the DISK name is Spark's hive form, which keeps chars like spaces
    literal — spark.read URI-decodes so data reads work either way, but
    a raw FS listing needs the decoded path). One FS listing per
    partition directory, never a data read."""
    out: dict[str, tuple[int, int]] = {}
    for val, rel in sorted(m["partitions"].items()):
        fs, jpath = _fs(spark, f"{table_path}/{unquote(rel)}")
        n = total = 0
        for status in fs.listStatus(jpath):
            name = status.getPath().getName()
            if name.endswith(".parquet") and not name.startswith((".", "_")):
                n += 1
                total += int(status.getLen())
        out[val] = (n, total)
    return out


def list_partition_files(
    spark: SparkSession, table_path: str, manifest: int | None = None
) -> dict[str, int]:
    """Data-file count per partition value at a manifest — the signal the
    compaction planner reads. See :func:`partition_file_stats`."""
    ids = _manifest_ids(spark, table_path)
    if not ids:
        raise FileNotFoundError(f"no committed manifest under {table_path}")
    k = manifest if manifest is not None else ids[-1]
    m = _read_manifest(spark, table_path, k)
    return {v: n for v, (n, _b) in partition_file_stats(spark, table_path, m).items()}


def partition_bytes(
    spark: SparkSession, table_path: str, manifest: int | None = None
) -> dict[str, int]:
    """On-disk parquet bytes per partition value at a manifest — the size
    statistic a cost-based planner reads before picking a join strategy
    (Spark's own ``autoBroadcastJoinThreshold`` is bytes-denominated).
    See :func:`partition_file_stats`."""
    ids = _manifest_ids(spark, table_path)
    if not ids:
        raise FileNotFoundError(f"no committed manifest under {table_path}")
    k = manifest if manifest is not None else ids[-1]
    m = _read_manifest(spark, table_path, k)
    return {v: b for v, (_n, b) in partition_file_stats(spark, table_path, m).items()}


def compact_ptable(
    spark: SparkSession,
    table_path: str,
    partitions: list | None = None,
    min_files: int = 2,
    sort_cols: list[str] | None = None,
) -> int | None:
    """OPTIMIZE: rewrite the named partitions (default: every partition
    holding >= ``min_files`` data files) into one file each inside a fresh
    stage dir, and commit a manifest that points the compacted partitions
    at the new stage while carrying every other partition by reference —
    the small-file compaction half of the mini-Iceberg, same atomic-rename
    commit as :func:`merge_ptable`.

    Data is bit-identical before/after (compaction is a physical rewrite,
    not a logical change); older manifests still reference the old stage
    dirs, so time travel to pre-compaction versions keeps working until
    :func:`vacuum_ptable` reclaims them.

    Scale posture: ``repartition(part_col)`` routes each partition's rows
    to exactly one task (one output file per hive dir), and the tasks run
    in parallel across partitions — compaction cost is O(touched
    partitions' data), never O(table). Returns the new manifest id, or
    ``None`` when nothing needed compacting (no empty commits).

    ``sort_cols`` is the ``OPTIMIZE ... ZORDER BY`` half: rows sort
    WITHIN each partition's task before writing (a per-task sort, no
    extra exchange), so every rewritten file's parquet row-group min/max
    stats become tight on those columns and range scans skip row groups.
    Pass a single derived column (e.g. ``operators.layout.zorder_key``'s
    bit interleave, materialized upstream) for true multi-dimensional
    clustering. Logical content is unchanged either way.
    """
    ids = _manifest_ids(spark, table_path)
    if not ids:
        raise FileNotFoundError(f"no committed manifest under {table_path}")
    prev = _read_manifest(spark, table_path, ids[-1])
    part_col = prev["part_col"]
    if partitions is not None:
        want = {str(p) for p in partitions}
        missing = want - set(prev["partitions"])
        if missing:
            raise FileNotFoundError(
                f"partitions not in manifest m{ids[-1]}: {sorted(missing)}"
            )
        todo = sorted(want)
    else:
        counts = list_partition_files(spark, table_path, ids[-1])
        todo = sorted(v for v, n in counts.items() if n >= min_files)
    if not todo:
        return None
    k = ids[-1] + 1
    stage = f"{table_path}/stage/m{k}"
    _clear_crashed_stage(spark, table_path, k)
    df = read_ptable(spark, table_path, partitions=todo).repartition(
        F.col(part_col)
    )
    if sort_cols:
        # lead with the partition column: the dynamic-partition writer
        # requires task rows ordered by partition cols and would insert
        # its own (unstable) sort otherwise, destroying the clustering
        df = df.sortWithinPartitions(part_col, *sort_cols)
    df.write.mode("error").partitionBy(part_col).parquet(stage)
    written = set(_stage_partitions(spark, stage, part_col))
    mapping = dict(prev["partitions"])
    for v in written:
        mapping[v] = f"stage/m{k}/{part_col}={_enc(v)}"
    # carry the previous meta FORWARD (merged with our marker): table
    # maintenance must be invisible to consumers of caller-owned meta —
    # clobbering it would break the streaming sink's exactly-once replay
    # skipping (its applied-batch-id rides the newest manifest's meta)
    manifest = {
        "part_col": part_col,
        "part_type": prev["part_type"],
        "partitions": mapping,
        "stage_schemas": {
            **_carry_stage_schemas(prev, mapping),
            f"m{k}": _stage_schema_json(df, part_col),
        },
        "meta": {**prev.get("meta", {}), "compacted": sorted(written)},
    }
    if prev.get("stats_cols"):
        # compaction is logically invisible: zone maps, row counts and
        # bloom sidecars all carry verbatim (rows only if the previous
        # writer recorded them — never fabricate a partial map)
        manifest["stats_cols"] = prev["stats_cols"]
        manifest["stats"] = prev.get("stats", {})
        if "rows" in prev:
            manifest["rows"] = prev["rows"]
    if prev.get("bloom_cols"):
        manifest["bloom_cols"] = prev["bloom_cols"]
        manifest["bloom_m"] = prev["bloom_m"]
        manifest["bloom_k"] = prev["bloom_k"]
        if "bloom_dtypes" in prev:  # absent in pre-r8 manifests
            manifest["bloom_dtypes"] = prev["bloom_dtypes"]
        manifest["blooms"] = prev.get("blooms", {})
    if prev.get("ndv_cols"):
        manifest["ndv_cols"] = prev["ndv_cols"]
        manifest["ndv_k"] = prev["ndv_k"]
        manifest["ndv"] = prev.get("ndv", {})
    if prev.get("sample_cols"):
        manifest["sample_cols"] = prev["sample_cols"]
        manifest["sample_k"] = prev["sample_k"]
        manifest["sample"] = prev.get("sample", {})
    if prev.get("heavy_cols"):
        manifest["heavy_cols"] = prev["heavy_cols"]
        manifest["heavy_k"] = prev["heavy_k"]
        manifest["heavy_threshold"] = prev["heavy_threshold"]
        manifest["heavy"] = prev.get("heavy", {})
    _write_manifest(spark, table_path, k, manifest)
    return k


def repartition_ptable(
    spark: SparkSession, table_path: str, new_part_col: str
) -> int:
    """Partition evolution: one full rewrite under a NEW partition column,
    committed as the next manifest. Each manifest carries its own
    ``part_col``/``part_type``, so time travel to pre-evolution manifests
    keeps reading under the OLD spec, while :func:`merge_ptable` (which
    takes the partition column from the newest manifest) immediately
    operates under the new one. The old partition column survives as a
    regular data column.

    This is the one deliberately O(table) operation in the layer — spec
    changes rewrite data once, exactly like Iceberg's
    ``REPLACE PARTITION FIELD`` followed by a rewrite; every subsequent
    merge is delta-proportional under the new spec."""
    ids = _manifest_ids(spark, table_path)
    if not ids:
        raise FileNotFoundError(f"no committed manifest under {table_path}")
    prev = _read_manifest(spark, table_path, ids[-1])
    df = read_ptable(spark, table_path)
    if new_part_col not in df.columns:
        raise ValueError(f"new partition column '{new_part_col}' not in table")
    k = ids[-1] + 1
    stage = f"{table_path}/stage/m{k}"
    _clear_crashed_stage(spark, table_path, k)
    df.write.mode("error").partitionBy(new_part_col).parquet(stage)
    part_type = dict(df.dtypes)[new_part_col]
    mapping = {
        v: f"stage/m{k}/{new_part_col}={_enc(v)}"
        for v in _stage_partitions(spark, stage, new_part_col)
    }
    # same meta-carry rule as compact_ptable: partition evolution must not
    # clobber caller-owned meta (streaming exactly-once batch id)
    manifest = {
        "part_col": new_part_col,
        "part_type": part_type,
        "partitions": mapping,
        "stage_schemas": {f"m{k}": _stage_schema_json(df, new_part_col)},
        "meta": {**prev.get("meta", {}), "evolved_from": prev["part_col"]},
    }
    if prev.get("stats_cols"):
        # zone maps / row counts re-derive under the new spec (old
        # per-partition entries are meaningless once rows regroup)
        stats, rows = _compute_stats(
            spark, stage, new_part_col, prev["stats_cols"]
        )
        manifest["stats_cols"] = prev["stats_cols"]
        manifest["stats"] = stats
        manifest["rows"] = rows
    if prev.get("bloom_cols"):
        manifest["bloom_cols"] = prev["bloom_cols"]
        manifest["bloom_m"] = prev["bloom_m"]
        manifest["bloom_k"] = prev["bloom_k"]
        if "bloom_dtypes" in prev:  # absent in pre-r8 manifests
            manifest["bloom_dtypes"] = prev["bloom_dtypes"]
        manifest["blooms"] = _compute_blooms(
            spark, stage, new_part_col, prev["bloom_cols"],
            prev["bloom_m"], prev["bloom_k"],
        )
    if prev.get("ndv_cols"):
        manifest["ndv_cols"] = prev["ndv_cols"]
        manifest["ndv_k"] = prev["ndv_k"]
        manifest["ndv"] = _compute_ndv(
            spark, stage, new_part_col, prev["ndv_cols"], prev["ndv_k"]
        )
    if prev.get("sample_cols"):
        manifest["sample_cols"] = prev["sample_cols"]
        manifest["sample_k"] = prev["sample_k"]
        manifest["sample"] = _compute_sample(
            spark, stage, new_part_col, prev["sample_cols"],
            prev["sample_k"],
        )
    if prev.get("heavy_cols"):
        manifest["heavy_cols"] = prev["heavy_cols"]
        manifest["heavy_k"] = prev["heavy_k"]
        manifest["heavy_threshold"] = prev["heavy_threshold"]
        manifest["heavy"] = _compute_heavy(
            spark, stage, new_part_col, prev["heavy_cols"],
            prev["heavy_k"], prev["heavy_threshold"],
        )
    _write_manifest(spark, table_path, k, manifest)
    return k


def ptable_delta(
    spark: SparkSession,
    table_path: str,
    from_manifest: int,
    to_manifest: int,
    sign_col: str = "sign",
) -> DataFrame:
    """SIGNED changeset between two committed manifests, for linear
    aggregate maintenance (``operators.merge.incremental_agg``): every
    row of a changed partition at ``to_manifest`` with ``sign_col`` = +1,
    every row of that partition at ``from_manifest`` with -1. Partitions
    whose stage directory is identical in both manifests are provably
    unchanged (stages are immutable) and are NEVER READ — cost is
    O(changed partitions), the same manifest pruning as
    :func:`ptable_diff`.

    Deliberately NO key join: under any linear aggregate (COUNT, SUM over
    exact types) an unchanged row in a rewritten partition contributes +x
    and -x and cancels exactly, so the delta rule needs only the union —
    one narrow scan per side, one shuffle at the consumer's groupBy. This
    is how a 100 TB fact table's materialized aggregate refreshes at the
    cost of the partitions a merge touched, never a full recompute.
    Schema evolution between the manifests null-fills the missing side
    (SUM ignores NULL — an evolved column simply contributes nothing
    from rows written before it existed)."""
    ids = _manifest_ids(spark, table_path)
    for k in (from_manifest, to_manifest):
        if k not in ids:
            raise FileNotFoundError(f"manifest m{k} of {table_path} does not exist")
    a = _read_manifest(spark, table_path, from_manifest)
    b = _read_manifest(spark, table_path, to_manifest)
    pa, pb = a["partitions"], b["partitions"]
    old_vals = sorted(v for v in pa if pa[v] != pb.get(v))
    new_vals = sorted(v for v in pb if pb[v] != pa.get(v))
    frames = []
    if new_vals:
        frames.append(
            read_ptable(spark, table_path, manifest=to_manifest, partitions=new_vals)
            .withColumn(sign_col, F.lit(1))
        )
    if old_vals:
        frames.append(
            read_ptable(spark, table_path, manifest=from_manifest, partitions=old_vals)
            .withColumn(sign_col, F.lit(-1))
        )
    if not frames:
        return (
            read_ptable(spark, table_path, manifest=to_manifest)
            .limit(0)
            .withColumn(sign_col, F.lit(1))
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def ptable_diff(
    spark: SparkSession,
    table_path: str,
    from_manifest: int,
    to_manifest: int,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level CDC between two committed manifests — what changed
    between version ``from_manifest`` and ``to_manifest`` — PRUNED by the
    manifest metadata: partitions whose stage directory is IDENTICAL in
    both manifests are provably unchanged (stages are immutable) and are
    never read. Cost is O(partitions that actually changed), the same
    delta-proportionality as :func:`merge_ptable` — a naive diff of two
    table reads would scan both versions in full.

    Delegates the row comparison to the ONE diff implementation
    (``operators.merge.snapshot_diff``: full-outer key join over content
    digests), so snapshot-level and manifest-level CDC can never
    disagree. Returns ``key_cols + [change_type]`` with change_type in
    ('insert', 'update', 'delete'). Partitions present in only one
    manifest contribute pure inserts/deletes through the same join (the
    missing side is simply empty).
    """
    from flnr_wins_spark.operators.merge import snapshot_diff

    ids = _manifest_ids(spark, table_path)
    for k in (from_manifest, to_manifest):
        if k not in ids:
            raise FileNotFoundError(f"manifest m{k} of {table_path} does not exist")
    a = _read_manifest(spark, table_path, from_manifest)
    b = _read_manifest(spark, table_path, to_manifest)
    pa, pb = a["partitions"], b["partitions"]
    changed = sorted(
        v for v in (set(pa) | set(pb)) if pa.get(v) != pb.get(v)
    )
    if not changed:
        # nothing moved: an empty, correctly-typed diff without reading data
        empty = read_ptable(spark, table_path, manifest=to_manifest).limit(0)
        return snapshot_diff(empty, empty, key_cols, compare_cols=compare_cols)
    old_vals = [v for v in changed if v in pa]
    new_vals = [v for v in changed if v in pb]
    base = read_ptable(spark, table_path, manifest=to_manifest).limit(0)
    old = (
        read_ptable(spark, table_path, manifest=from_manifest, partitions=old_vals)
        if old_vals else base
    )
    new = (
        read_ptable(spark, table_path, manifest=to_manifest, partitions=new_vals)
        if new_vals else base
    )
    return snapshot_diff(old, new, key_cols, compare_cols=compare_cols)
