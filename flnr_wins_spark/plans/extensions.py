"""LLM-data-pipeline extension queries (SURVEY.md §7 Phase E): dedup,
similarity search, text analysis, multimodal plumbing — over the
``documents`` and ``embeddings`` fixture tables.

The fixture corpus has no planted duplicates, so dedup entries synthesize
them deterministically (union a modified copy of every 10th doc) — the same
construction on the oracle side — so the operators produce non-trivial,
checkable output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flnr_wins_spark.plans.common import query, scratch_dir, t

_DUP_SQL_DOCS = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' qq1 qq2' FROM documents WHERE doc_id % 10 = 0
"""


def _docs_with_dups(spark, sf_dir, exact: bool = False):
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    extra = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        (F.col("text") if exact else F.concat(F.col("text"), F.lit(" qq1 qq2"))).alias("text"),
    )
    return docs.unionByName(extra)


@query(
    "x_dedup_exact",
    sql="""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
    ), w AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies
      FROM docs
    )
    SELECT doc_id, n_copies FROM w WHERE rn = 1
    """,
    note="exact dedup: content-hash window, keep lowest id (one shuffle)",
    bench=True,
)
def x_dedup_exact(spark, sf_dir):
    from flnr_wins_spark.operators.dedup import exact_dedup

    docs = _docs_with_dups(spark, sf_dir, exact=True)
    return exact_dedup(docs, "text", "doc_id").select("doc_id", "n_copies")


@query(
    "x_dedup_ngram_jaccard",
    sql=f"""
    WITH docs AS ({_DUP_SQL_DOCS}),
    toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM docs),
    sh AS (
      SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
      FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(i)
      WHERE len(tk) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    live AS (
      SELECT doc_id, shingle FROM sh
      WHERE shingle IN (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 256)
    ),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM live a JOIN live b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
    """,
    note="3-gram shingle Jaccard near-dup via inverted-index self-join; "
    "stop-shingle cap (<=256 docs) mirrored in the oracle — capped "
    "semantics are deterministic on both engines",
)
def x_dedup_ngram_jaccard(spark, sf_dir):
    from flnr_wins_spark.operators.dedup import jaccard_pairs, shingle_sets

    docs = _docs_with_dups(spark, sf_dir)
    sh = shingle_sets(docs, "text", "doc_id", n=3)
    return jaccard_pairs(sh, threshold=0.8, max_shingle_freq=256).select(
        F.col("id_a").alias("id_a"), F.col("id_b").alias("id_b"), "jaccard"
    )


@query(
    "x_dedup_spans",
    sql=f"""
    WITH docs AS ({_DUP_SQL_DOCS}),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM docs
      WHERE len(string_split(text, ' ')) > 0
    ),
    segs AS (
      SELECT doc_id, CAST(i AS INT) AS seg_pos,
             array_to_string(list_slice(tk, i * 10 + 1, i * 10 + 10), ' ') AS seg
      FROM toks, UNNEST(range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT))) u(i)
    ),
    ranked AS (
      SELECT doc_id, seg_pos, seg,
             ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, seg_pos) AS rn
      FROM segs
    )
    SELECT doc_id,
           COALESCE(string_agg(seg, ' ' ORDER BY seg_pos) FILTER (WHERE rn = 1), '')
             AS text_clean,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(COUNT(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept
    FROM ranked
    GROUP BY doc_id
    """,
    note="duplicate-span removal (RefinedWeb exact-substring dedup at fixed "
    "10-word segment boundaries): repeated segments survive only in the "
    "first (doc_id, pos); winner build is a combinable groupBy-min, join "
    "back AQE-skew-splittable — no suffix array, no raw-stream window",
    bench=True,
)
def x_dedup_spans(spark, sf_dir):
    from flnr_wins_spark.operators.dedup import span_dedup

    docs = _docs_with_dups(spark, sf_dir)
    out = span_dedup(docs, "text", "doc_id", k=10)
    return out.select(
        F.col("id").alias("doc_id"), "text_clean", "n_segments", "n_kept"
    )


@query(
    "x_url_filter",
    sql="""
    WITH urls AS (
      SELECT doc_id,
             'https://www.' || source || '-media.org'
               || CASE WHEN doc_id % 3 = 0 THEN ':8443' ELSE '' END
               || '/doc/' || CAST(doc_id AS VARCHAR) || '?ref=r' AS url
      FROM documents
    ),
    hosts AS (
      SELECT doc_id, url,
             lower(regexp_extract(url,
               '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)) AS host
      FROM urls
    ),
    doms AS (
      SELECT doc_id, host,
             CASE WHEN len(string_split(host, '.')) >= 2
                  THEN string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
                  ELSE host END AS domain
      FROM hosts
    )
    SELECT doc_id, host, domain FROM doms
    WHERE domain NOT IN ('src3-media.org', 'src7-media.org', 'src15-media.org')
    """,
    note="URL host/registered-domain extraction (JVM regexp, codegen) + "
    "domain-blocklist broadcast anti join; URLs synthesized "
    "deterministically from (source, doc_id) — the documents fixture "
    "carries no URL column",
)
def x_url_filter(spark, sf_dir):
    from flnr_wins_spark.functions.urls import domain_blocklist_filter

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://www."),
            F.col("source"),
            F.lit("-media.org"),
            F.when(F.col("doc_id") % 3 == 0, ":8443").otherwise(""),
            F.lit("/doc/"),
            F.col("doc_id").cast("string"),
            F.lit("?ref=r"),
        ).alias("url"),
    )
    kept = domain_blocklist_filter(
        docs, "url", ["src3-media.org", "src7-media.org", "src15-media.org"]
    )
    return kept.select("doc_id", "host", "domain")


# Incremental-snapshot fixtures: two deterministic "runs" of the orders
# table — the new snapshot drops every 89th key (deletes), gains every 97th-
# mod-3 key the old one lacked (inserts), and bumps totalprice on every 31st
# key (updates). Both engines construct the identical pair.
_SNAP_SQL = """
    old AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 97 <> 3
    ),
    new AS (
      SELECT o_orderkey, o_custkey,
             o_totalprice + CASE WHEN o_orderkey % 31 = 0 THEN 10.0 ELSE 0.0 END
               AS o_totalprice
      FROM orders WHERE o_orderkey % 89 <> 5
    )
"""


def _snapshots(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    old = orders.filter(F.col("o_orderkey") % 97 != 3)
    new = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 89 != 5).select(
        "o_orderkey",
        "o_custkey",
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 31 == 0, 10.0).otherwise(0.0)
        ).alias("o_totalprice"),
    )
    return old, new


@query(
    "x_cdc_diff",
    sql=f"""
    WITH {_SNAP_SQL}
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
                  OR o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'update'
           END AS change_type
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_custkey IS DISTINCT FROM n.o_custkey
       OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
    """,
    note="CDC snapshot diff: one full-outer join on the key, content change "
    "detected via map-side xxhash64(struct) digest so wide rows never "
    "compare column-by-column across the shuffle",
)
def x_cdc_diff(spark, sf_dir):
    from flnr_wins_spark.operators.merge import snapshot_diff

    old, new = _snapshots(spark, sf_dir)
    return snapshot_diff(old, new, ["o_orderkey"])


@query(
    "x_incremental_agg",
    sql="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderkey % 7 = 0 OR o_orderkey % 5 <> 0
    GROUP BY o_custkey
    """,
    note="incremental aggregate maintenance (materialized-view delta rule): "
    "prev state + signed changeset agg merged on the key; the oracle "
    "recomputes the same final state from scratch, proving merge == rebuild. "
    "Exact decimal sums make the merge order-independent",
)
def x_incremental_agg(spark, sf_dir):
    from flnr_wins_spark.operators.merge import incremental_agg

    od = t(spark, sf_dir, "orders")
    base = od.filter(F.col("o_orderkey") % 7 != 0)
    prev = base.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(27,2)")).alias("sum_price"),
    )
    inserts = od.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_custkey", F.lit(1).alias("sign"),
        F.col("o_totalprice").cast("decimal(27,2)").alias("sum_price"),
    )
    deletes = od.filter((F.col("o_orderkey") % 7 != 0) & (F.col("o_orderkey") % 5 == 0)).select(
        "o_custkey", F.lit(-1).alias("sign"),
        F.col("o_totalprice").cast("decimal(27,2)").alias("sum_price"),
    )
    merged = incremental_agg(
        prev, inserts.unionByName(deletes), ["o_custkey"], ["sum_price"]
    )
    return merged.select(
        "o_custkey", F.col("n"), F.col("sum_price").cast("double").alias("sum_price")
    )


@query(
    "x_merge_upsert",
    sql=f"""
    WITH {_SNAP_SQL},
    source AS (
      SELECT n.* FROM new n LEFT JOIN old o ON n.o_orderkey = o.o_orderkey
      WHERE o.o_orderkey IS NULL OR n.o_totalprice IS DISTINCT FROM o.o_totalprice
    ),
    deletes AS (
      SELECT o.o_orderkey FROM old o LEFT JOIN new n ON o.o_orderkey = n.o_orderkey
      WHERE n.o_orderkey IS NULL
    ),
    merged AS (
      SELECT * FROM old WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source)
      UNION ALL
      SELECT * FROM source
    )
    SELECT o_orderkey, o_custkey, o_totalprice FROM merged
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM deletes)
    """,
    note="MERGE INTO (SCD1): changeset replaces matched rows, inserts new, "
    "applies deletes — anti join + union, untouched target majority flows "
    "through with zero comparison work",
)
def x_merge_upsert(spark, sf_dir):
    from flnr_wins_spark.operators.merge import merge_upsert, snapshot_diff

    old, new = _snapshots(spark, sf_dir)
    diff = snapshot_diff(old, new, ["o_orderkey"])
    source = new.join(
        diff.filter(F.col("change_type").isin("insert", "update")).select("o_orderkey"),
        "o_orderkey",
        "left_semi",
    )
    deletes = diff.filter(F.col("change_type") == "delete").select("o_orderkey")
    return merge_upsert(old, source, ["o_orderkey"], delete_keys=deletes)


@query(
    "x_merge_evolve",
    sql="""
    WITH t AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 97 <> 3
    ),
    s AS (
      SELECT o_orderkey, CAST(o_custkey AS INTEGER) AS o_custkey,
             o_totalprice + 5.0 AS o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           CAST(CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
                     ELSE t.o_custkey END AS BIGINT) AS o_custkey,
           CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice,
           t.o_orderstatus AS o_orderstatus,
           s.o_orderpriority AS o_orderpriority
    FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
    """,
    note="MERGE with SCHEMA EVOLUTION (Delta withSchemaEvolution / "
    "Iceberg safe promotion): UPDATE SET * / INSERT * over one full-outer "
    "key join; the changeset ADDS a column (o_orderpriority, NULL for unmatched "
    "target rows), OMITS a target column (o_orderstatus, preserved on "
    "matched rows, NULL on inserts), and NARROWS a key-adjacent type "
    "(int o_custkey widens back to the target's bigint through the safe "
    "lattice). Column-wise projection, no per-column joins; "
    "merge_snapshot composes this with the versioned snapshot layer "
    "(old versions keep their old schema — time travel is evolution-safe)",
    bench=True,
)
def x_merge_evolve(spark, sf_dir):
    from flnr_wins_spark.operators.merge import merge_upsert_evolve

    orders = t(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 97 != 3).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    source = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.col("o_custkey").cast("int").alias("o_custkey"),
        (F.col("o_totalprice") + F.lit(5.0)).alias("o_totalprice"),
        "o_orderpriority",
    )
    return merge_upsert_evolve(target, source, ["o_orderkey"])


@query(
    "x_scd2_history",
    sql=f"""
    WITH {_SNAP_SQL}
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           1 AS valid_from, CAST(2 AS INTEGER) AS valid_to, FALSE AS is_current
    FROM old o LEFT JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE n.o_orderkey IS NULL OR n.o_totalprice IS DISTINCT FROM o.o_totalprice
         OR n.o_custkey IS DISTINCT FROM o.o_custkey
    UNION ALL
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           1 AS valid_from, CAST(NULL AS INTEGER) AS valid_to, TRUE AS is_current
    FROM old o JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE n.o_totalprice = o.o_totalprice AND n.o_custkey = o.o_custkey
    UNION ALL
    SELECT n.o_orderkey, n.o_custkey, n.o_totalprice,
           2 AS valid_from, CAST(NULL AS INTEGER) AS valid_to, TRUE AS is_current
    FROM new n LEFT JOIN old o ON n.o_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_totalprice IS DISTINCT FROM o.o_totalprice
         OR n.o_custkey IS DISTINCT FROM o.o_custkey
    """,
    note="SCD type 2 history: batch 1 seeds from empty, batch 2 closes "
    "changed/deleted rows (valid_to=2) and opens new versions; only the "
    "current slice of history ever joins the source",
)
def x_scd2_history(spark, sf_dir):
    from flnr_wins_spark.operators.merge import scd2_apply

    old, new = _snapshots(spark, sf_dir)
    empty_history = (
        old.withColumn("valid_from", F.lit(1))
        .withColumn("valid_to", F.lit(None).cast("int"))
        .withColumn("is_current", F.lit(True))
        .limit(0)
    )
    h1 = scd2_apply(empty_history, old, ["o_orderkey"], batch_id=1)
    h2 = scd2_apply(h1, new, ["o_orderkey"], batch_id=2)
    return h2.select(
        "o_orderkey", "o_custkey", "o_totalprice", "valid_from", "valid_to", "is_current"
    )


@query(
    "x_train_test_split",
    sql="""
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(doc_id) AS BIGINT) AS min_id
    FROM (
      SELECT doc_id,
             CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
                  THEN 'test' ELSE 'train' END AS split
      FROM documents
    ) tagged
    GROUP BY split
    """,
    note="deterministic content-addressed train/test split (md5-prefix "
    "buckets — stable across runs/engines/partitionings, unlike rand())",
)
def x_train_test_split(spark, sf_dir):
    from flnr_wins_spark.operators.split import train_test_split

    docs = t(spark, sf_dir, "documents")
    # 0.1 * 256 = 25.6 -> threshold 0x1a, matching the oracle literal
    tagged = train_test_split(docs, "doc_id", test_fraction=0.1)
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("doc_id").cast("bigint").alias("min_id"),
    )


@query(
    "x_kfold_split",
    sql="""
    SELECT doc_id,
           CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                     AS INTEGER) % 5 AS INTEGER) AS fold
    FROM documents
    """,
    note="content-addressed k-fold cross-validation assignment (md5-bucket "
    "mod k — stable across runs/engines/partitionings; narrow, no shuffle)",
)
def x_kfold_split(spark, sf_dir):
    from flnr_wins_spark.operators.split import kfold_split

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return kfold_split(docs, "doc_id", k=5)


@query(
    "x_vocab_topk",
    sql="""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 100
    """,
    note="vocabulary induction: corpus token frequencies, top-k by count "
    "with lexical tiebreak. explode -> count (map-side combine) -> "
    "TakeOrdered top-k; the full vocab never sorts globally",
)
def x_vocab_topk(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token"))
        .limit(100)
    )


@query(
    "x_dedup_clusters",
    sql=f"""
    WITH RECURSIVE docs AS ({_DUP_SQL_DOCS}),
    toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM docs),
    sh AS (
      SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
      FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(i)
      WHERE len(tk) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    live AS (
      SELECT doc_id, shingle FROM sh
      WHERE shingle IN (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 256)
    ),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM live a JOIN live b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
    )
    SELECT id, MIN(r) AS cluster_id, id = MIN(r) AS is_survivor
    FROM reach GROUP BY id
    """,
    note="near-dup clustering: connected components (min-label propagation, "
    "localCheckpoint per round) over Jaccard>=0.8 pairs; oracle = recursive CTE",
)
def x_dedup_clusters(spark, sf_dir):
    from flnr_wins_spark.operators.dedup import jaccard_pairs, shingle_sets
    from flnr_wins_spark.operators.graph import dedup_clusters

    docs = _docs_with_dups(spark, sf_dir)
    pairs = jaccard_pairs(shingle_sets(docs, "text", "doc_id", n=3), threshold=0.8)
    return dedup_clusters(pairs)


def _pagerank_oracle_sql(n_iter: int) -> str:
    """Unrolled fixed-iteration integer-PageRank SQL for the DuckDB oracle.

    Mirrors ``pagerank_integer`` step for step: same scaled-bigint ranks,
    same integer (floor) division, so the values are bit-exact. DuckDB's
    SUM(BIGINT) widens to HUGEINT — cast back down inside each round.
    """
    head = """
    WITH pr_edges AS (
      SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                      'c' || CAST(o_custkey AS VARCHAR) AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      UNION
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR),
                      's' || CAST(l_suppkey AS VARCHAR)
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    verts AS (SELECT DISTINCT src AS id FROM pr_edges
              UNION SELECT DISTINCT dst FROM pr_edges),
    deg AS (SELECT src, COUNT(*) AS outd FROM pr_edges GROUP BY src),
    nv AS (SELECT COUNT(*) AS n FROM verts),
    r0 AS (SELECT id, 1000000000000 // (SELECT n FROM nv) AS rank FROM verts)"""
    rounds = "".join(
        f""",
    r{i} AS (
      SELECT v.id,
             (15 * 1000000000000) // (100 * (SELECT n FROM nv))
             + (85 * COALESCE(s.contrib, 0)) // 100 AS rank
      FROM verts v LEFT JOIN (
        SELECT e.dst AS id, CAST(SUM(r.rank // d.outd) AS BIGINT) AS contrib
        FROM pr_edges e
        JOIN r{i - 1} r ON e.src = r.id
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
      ) s ON s.id = v.id
    )"""
        for i in range(1, n_iter + 1)
    )
    return f"{head}{rounds}\n    SELECT id, CAST(rank AS BIGINT) AS rank FROM r{n_iter}"


@query(
    "x_pagerank",
    sql=_pagerank_oracle_sql(5),
    note="fixed-iteration integer PageRank over the supplier<->customer "
    "trade graph; scaled-bigint ranks + floor division make every round "
    "bit-exact across engines and partitionings (oracle = unrolled SQL)",
)
def x_pagerank(spark, sf_dir):
    from flnr_wins_spark.operators.graph import pagerank_integer

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    od = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = li.join(od, li.l_orderkey == od.o_orderkey).select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("sup"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("cust"),
    )
    edges = pairs.select(F.col("sup").alias("src"), F.col("cust").alias("dst")).union(
        pairs.select(F.col("cust").alias("src"), F.col("sup").alias("dst"))
    )
    return pagerank_integer(edges, n_iter=5)


def _bfs_oracle_sql(max_hops: int = 4) -> str:
    """Fixed-unroll BFS twin: round CTEs reach = one-join expansions; a
    vertex's distance is the MIN round that reaches it (no visited-pruning
    needed — same equivalence argument as the optimal-segmentation oracle)."""
    ctes = [
        """pairs AS MATERIALIZED (
          SELECT 's' || CAST(l_suppkey AS VARCHAR) AS sup,
                 'c' || CAST(o_custkey AS VARCHAR) AS cust
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey)""",
        """e AS MATERIALIZED (
          SELECT DISTINCT a, b FROM (
            SELECT sup AS a, cust AS b FROM pairs
            UNION ALL SELECT cust AS a, sup AS b FROM pairs))""",
        "r0 AS (SELECT * FROM (VALUES ('s1'), ('s2'), ('s3')) v(id))",
    ]
    for i in range(1, max_hops + 1):
        ctes.append(
            f"""r{i} AS MATERIALIZED (
              SELECT DISTINCT e.b AS id FROM r{i - 1} r JOIN e ON r.id = e.a)"""
        )
    fins = " UNION ALL ".join(
        f"SELECT id, {i} AS d FROM r{i}" for i in range(0, max_hops + 1)
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + f""", fin AS ({fins})
        SELECT id, CAST(MIN(d) AS INT) AS dist FROM fin GROUP BY id"""
    )


@query(
    "x_graph_bfs",
    sql=_bfs_oracle_sql(),
    note="multi-source BFS distances over the supplier-customer bipartite "
    "graph (frontier expansion join + visited anti-join per round, "
    "lineage checkpointed — the reachability primitive next to the "
    "CC/PageRank/k-core family); oracle = fixed-unroll rounds with "
    "MIN(first-reaching round)",
)
def x_graph_bfs(spark, sf_dir):
    from flnr_wins_spark.operators.graph import bfs_distances

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    od = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = li.join(od, li.l_orderkey == od.o_orderkey).select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("id_a"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("id_b"),
    )
    from flnr_wins_spark.localrel import local_df

    sources = local_df(pairs.sparkSession, [("s1",), ("s2",), ("s3",)], "id string")
    return bfs_distances(pairs, sources, max_hops=4)


@query(
    "x_dedup_minhash_lsh",
    sql=None,  # probabilistic candidate generation; exact-verified but not SQL-expressible
    note="MinHash-LSH banding candidates + exact Jaccard verify (pure DataFrame); "
    "band_width=2 AND-amplification (r15: 67x fewer false candidates on this "
    "small-vocab corpus, output verified bit-identical at every SF)",
    bench=True,
)
def x_dedup_minhash_lsh(spark, sf_dir):
    from flnr_wins_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs_with_dups(spark, sf_dir)
    return minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.8,
        min_parallelism=spark.sparkContext.defaultParallelism,
        band_width=2,
    )


@query(
    "x_dedup_minhash_r2_equiv",
    # Oracle = EMPTY relation with the pair schema: the Spark side returns
    # the symmetric difference between the r=2 and r=1 verified pair sets,
    # so the entry is green iff band_width=2 AND-amplification produces
    # EXACTLY the r=1 output on this corpus — the driver-graded witness the
    # r15 verdict asked for (the recall-contract change was previously
    # proven only by a builder-side exceptAll check nothing graded).
    sql="""
    SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b,
           CAST(NULL AS DOUBLE) AS jaccard
    WHERE 1 = 0
    """,
    note="graded equivalence witness for x_dedup_minhash_lsh's r=2 banding: "
    "symmetric difference of verified pair sets (band_width 2 vs 1) must be "
    "empty — exact verification makes the OUTPUT contract band-independent "
    "whenever no true pair is missed, and this entry pins that no pair is "
    "missed on the fixture corpus at every graded SF",
)
def x_dedup_minhash_r2_equiv(spark, sf_dir):
    from flnr_wins_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs_with_dups(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    # unpersist=True: each call eagerly pins its (tiny) verified-pairs result
    # and releases its corpus-sized signature cache — two live caches would
    # otherwise stack per invocation
    r1 = minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.8, min_parallelism=par,
        band_width=1, unpersist=True,
    )
    r2 = minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.8, min_parallelism=par,
        band_width=2, unpersist=True,
    )
    return r1.exceptAll(r2).unionByName(r2.exceptAll(r1))


# x_dedup_minhash_portable oracle: with md5 min-hashes (lexicographic min of
# fixed-width hex == unsigned numeric min) the signature table, the banded
# candidate rule ("agree on >= 1 table" == the 8-way OR join), and the exact
# Jaccard verify are all engine-portable — the twin reproduces the EXACT
# candidate set, so approximation error never enters the comparison.
_MINHASH_PORTABLE_SQL = (
    f"""
    WITH docs AS ({_DUP_SQL_DOCS}),
    tk AS (
      SELECT doc_id AS id, string_split(text, ' ') AS tks FROM docs
    ),
    sh AS (
      SELECT id, list_distinct(list_transform(range(1, len(tks) - 1),
             i -> tks[i] || ' ' || tks[i+1] || ' ' || tks[i+2])) AS shset
      FROM tk WHERE len(tks) >= 3
    ),
    sig AS (
      SELECT id, shset,
    """
    + ",\n".join(
        f"         list_min(list_transform(shset, s -> md5(s || ':{42 + i}'))) AS mh_{i}"
        for i in range(8)
    )
    + """
      FROM sh
    ),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b, a.shset AS sh_a, b.shset AS sh_b
      FROM sig a JOIN sig b ON a.id < b.id
       AND ("""
    + " OR ".join(f"a.mh_{i} = b.mh_{i}" for i in range(8))
    + """)
    ),
    j AS (
      SELECT id_a, id_b,
             CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
               / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)))
               AS jaccard
      FROM cand
    )
    SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.8
    """
)


@query(
    "x_dedup_minhash_portable",
    sql=_MINHASH_PORTABLE_SQL,
    note="MinHash-LSH with engine-portable md5 min-hashes: identical "
    "signatures, identical banded candidate set, exact Jaccard verify — the "
    "probabilistic dedup family's fully hash-checked witness (the xxhash64 "
    "entry stays the JVM fast path)",
)
def x_dedup_minhash_portable(spark, sf_dir):
    from flnr_wins_spark.operators.dedup import minhash_lsh_pairs

    docs = _docs_with_dups(spark, sf_dir)
    return minhash_lsh_pairs(
        docs, "text", "doc_id", threshold=0.8, num_hash_tables=8,
        hash_fn="md5",
        min_parallelism=spark.sparkContext.defaultParallelism,
    )


@query(
    "x_dedup_simhash",
    sql=None,  # xxhash64-based signature has no DuckDB twin
    note="64-bit SimHash signatures + banded Hamming<=8 pair join",
)
def x_dedup_simhash(spark, sf_dir):
    from flnr_wins_spark.operators.dedup import simhash_pairs, simhash_signatures

    docs = _docs_with_dups(spark, sf_dir)
    sigs = simhash_signatures(docs, "text", "doc_id")
    # tiny-vocab corpus => similar bags collide often; tight radius keeps the
    # pair set near-dup-only (radius 2 over 4 bands still pigeonholes exactly)
    return simhash_pairs(sigs, max_hamming=2)


# x_dedup_simhash_portable oracle: a 60-bit signature built from md5 token
# hashes (15 hex chars parsed to a bigint — Spark conv(h,16,10), DuckDB a
# shift-accumulate over hex digits) makes the bit votes, band keys, and
# Hamming distances bit-identical across engines.
_SIMHASH_PORTABLE_SQL = (
    f"""
    WITH docs AS ({_DUP_SQL_DOCS}),
    tk AS (
      SELECT doc_id AS id, list_distinct(string_split(text, ' ')) AS tks
      FROM docs
    ),
    th AS (
      SELECT id, len(tks) AS n_tokens,
             list_transform(tks, t -> CAST(list_sum(list_transform(range(0, 15),
               i -> CAST(strpos('0123456789abcdef',
                                substr(md5(t || ':42'), CAST(i + 1 AS INT), 1)) - 1
                    AS BIGINT) << CAST(4 * (14 - i) AS INT))) AS BIGINT)) AS hs
      FROM tk
    ),
    sig AS (
      SELECT id,
             CAST(list_sum(list_transform(range(0, 60),
               b -> CASE WHEN 2 * len(list_filter(hs,
                            h -> ((h >> CAST(b AS INT)) & 1) = 1)) > len(hs)
                         THEN CAST(1 AS BIGINT) << CAST(b AS INT)
                         ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS simhash
      FROM th
    ),
    banded AS (
      SELECT id, simhash, u.b AS band,
             (simhash >> CAST(u.b * 15 AS INT)) & 32767 AS key
      FROM sig, UNNEST(range(0, 4)) AS u(b)
    ),
    pairs AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.key = b.key AND a.id < b.id
    )
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 2
    """
)


@query(
    "x_dedup_simhash_portable",
    sql=_SIMHASH_PORTABLE_SQL,
    note="SimHash near-dup with engine-portable 60-bit md5 token hashes: "
    "identical bit votes, band buckets, and Hamming pairs on both engines — "
    "the SimHash family's fully hash-checked witness (the xxhash64 entry "
    "stays the JVM fast path)",
)
def x_dedup_simhash_portable(spark, sf_dir):
    from flnr_wins_spark.operators.dedup import simhash_pairs, simhash_signatures

    docs = _docs_with_dups(spark, sf_dir)
    sigs = simhash_signatures(docs, "text", "doc_id", hash_fn="md5", bits=60)
    return simhash_pairs(sigs, max_hamming=2, bands=4, bits=60).select(
        "id_a", "id_b", "hamming"
    )


@query(
    "x_similarity_topk",
    sql="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv FROM embeddings),
    scored AS (
      SELECT query_id, cand_id,
             list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
      FROM q, c WHERE query_id <> cand_id
    )
    SELECT query_id, cand_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
    note="exact cosine top-k: broadcast queries, JVM-side fold dot product",
    bench=True,
)
def x_similarity_topk(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import brute_force_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(queries, emb, k=5)


@query(
    "x_similarity_int8",
    sql="""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             CASE WHEN list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) = 0
                  THEN 1.0
                  ELSE list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0
             END AS s
      FROM embeddings
    ),
    coded AS (
      SELECT vec_id, s,
             list_transform(v, x -> CAST(floor(x / s + 0.5) AS DOUBLE)) AS codes
      FROM base
    ),
    q AS (SELECT vec_id AS query_id, s AS qs, codes AS qc FROM coded WHERE vec_id < 10),
    c AS (SELECT vec_id AS cand_id, s AS cs, codes AS cc FROM coded),
    scored AS (
      SELECT query_id, cand_id,
             CAST(list_dot_product(qc, cc) AS DOUBLE) * qs * cs AS score
      FROM q, c WHERE query_id <> cand_id
    )
    SELECT query_id, cand_id, score, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, cand_id) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
    note="int8-quantized top-k: symmetric floor-rounded quantization (bit-"
    "deterministic across engines), integer dot product (exact), dequantized "
    "score — the 4-8x bandwidth-cut similarity path, fully oracle-checked",
)
def x_similarity_int8(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import quantized_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return quantized_topk(queries, emb, k=5)


@query(
    "x_similarity_binary",
    sql="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    b AS (
      SELECT vec_id, v,
             CAST(list_sum(list_transform(range(0, 32),
               d -> CASE WHEN v[d + 1] > 0 THEN (CAST(1 AS BIGINT) << d)
                         ELSE 0 END)) AS BIGINT) AS lo,
             CAST(list_sum(list_transform(range(0, 32),
               d -> CASE WHEN v[d + 33] > 0 THEN (CAST(1 AS BIGINT) << d)
                         ELSE 0 END)) AS BIGINT) AS hi
      FROM e
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, lo AS qlo, hi AS qhi
          FROM b WHERE vec_id < 10),
    c AS (SELECT vec_id AS cand_id, v AS cv, lo AS clo, hi AS chi FROM b),
    ham AS (
      SELECT query_id, cand_id, qv, cv,
             CAST(bit_count(xor(qlo, clo)) + bit_count(xor(qhi, chi)) AS INT)
               AS hamming
      FROM q, c WHERE query_id <> cand_id
    ),
    survivors AS (
      SELECT query_id, cand_id, qv, cv, hamming FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY hamming, cand_id) AS hrn
        FROM ham) h
      WHERE hrn <= 20
    ),
    rescored AS (
      SELECT query_id, cand_id, hamming,
             list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
               AS cosine
      FROM survivors
    )
    SELECT query_id, cand_id, hamming, cosine, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rn
      FROM rescored)
    WHERE rn <= 5
    """,
    note="1-BIT (sign) quantized top-k with exact cosine re-rank — the "
    "32x memory-reduction end of the quantization family (int8 is 4x): "
    "each 64-dim vector collapses to two packed 32-bit halves "
    "(sign-trap-free on both engines), candidate scoring is two "
    "XOR+popcounts, the 20 hamming-nearest re-score with exact cosine, "
    "final top-5 by (cosine desc, id). Fully deterministic end-to-end "
    "— sign bits, integer hamming, one IEEE division — so BOTH stages "
    "of the real binary-ANN pipeline are value-checked, unlike "
    "recall-bounded ANN entries. At 100 TB: a billion float32 vectors "
    "are 256 GB, their sign bits 8 GB — memory-scannable, with the "
    "exact re-rank touching only 20 full vectors per query",
)
def x_similarity_binary(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import binary_hamming_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return binary_hamming_topk(queries, emb, k=5, rerank=20)


@query(
    "x_similarity_ann_lsh",
    sql=None,  # approximate-recall ANN — no exact SQL twin
    note="ANN top-k via random-hyperplane LSH buckets + exact re-rank",
)
def x_similarity_ann_lsh(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import ann_lsh_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ann_lsh_topk(queries, emb, dim=64, k=5)


# x_similarity_ann_portable oracle: with md5-parity hyperplanes the signature
# bits, band buckets, candidate set, and exact cosine re-rank are all
# engine-portable — the twin reproduces the EXACT ANN result (same recall,
# same ranks), so the LSH family gains a fully hash-checked witness.
_ANN_PORTABLE_SQL = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    hp AS (
      SELECT j, list_transform(range(0, 64),
               d -> CASE WHEN substr(md5(CAST(j * 64 + d AS VARCHAR) || ':42'), 32, 1)
                          IN ('1','3','5','7','9','b','d','f')
                    THEN 1.0 ELSE -1.0 END) AS h
      FROM UNNEST(range(0, 16)) AS t(j)
    ),
    sig AS (
      SELECT e.vec_id,
             CAST(SUM(CASE WHEN list_dot_product(e.v, hp.h) >= 0
                           THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS s
      FROM e CROSS JOIN hp GROUP BY e.vec_id
    ),
    banded AS (
      SELECT vec_id,
             CAST(b AS VARCHAR) || ':' || CAST((s >> CAST(b * 4 AS INT)) & 15 AS VARCHAR)
               AS bucket
      FROM sig, UNNEST(range(0, 4)) AS u(b)
    ),
    qb AS (SELECT vec_id AS query_id, bucket FROM banded WHERE vec_id < 10),
    cp AS (
      SELECT DISTINCT q.query_id, c.vec_id AS cand_id
      FROM qb q JOIN banded c USING (bucket) WHERE q.query_id <> c.vec_id
    ),
    scored AS (
      SELECT cp.query_id, cp.cand_id,
             list_dot_product(qv.v, cv.v)
               / (sqrt(list_dot_product(qv.v, qv.v))
                  * sqrt(list_dot_product(cv.v, cv.v))) AS cosine
      FROM cp
      JOIN e qv ON qv.vec_id = cp.query_id
      JOIN e cv ON cv.vec_id = cp.cand_id
    )
    SELECT query_id, cand_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rn
      FROM scored)
    WHERE rn <= 5
    """


@query(
    "x_similarity_ann_portable",
    sql=_ANN_PORTABLE_SQL,
    note="hyperplane-LSH ANN with engine-portable md5-parity hyperplanes: "
    "identical signatures, buckets, candidate set, and exact cosine re-rank "
    "on both engines — the LSH similarity family's fully hash-checked "
    "witness (the xxhash64 entry stays the JVM fast path)",
)
def x_similarity_ann_portable(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import ann_lsh_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ann_lsh_topk(queries, emb, dim=64, k=5, hash_fn="md5")


@query(
    "x_similarity_ivf",
    sql=None,  # approximate-recall ANN — no exact SQL twin
    note="IVF ANN: coarse-quantize to cells, probe nprobe cells, exact re-rank",
)
def x_similarity_ivf(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(queries, emb, nlist=16, nprobe=4, k=5)


# x_similarity_ivf_kmeans oracle: Lloyd's k-means IS SQL-expressible once the
# per-dim mean routes through decimal (order-insensitive) — the iteration
# count is fixed, so the loop unrolls to 3 assign/update CTE pairs (the
# x_pagerank pattern). Every float op is a left fold (list_dot_product ==
# Spark's aggregate(zip_with)), so centroids and cosines are bit-identical.
# The Spark side trains on a content-addressed sample (fit_sample=100k),
# which covers the whole corpus at every oracle SF (N<=2000), so the SQL
# trains on everything.
_KM_SQDIST = (
    "list_dot_product("
    "list_transform(list_zip(e.v, c.centroid), s -> s[1] - s[2]), "
    "list_transform(list_zip(e.v, c.centroid), s -> s[1] - s[2]))"
)

_KM_ITER = """
    a{i} AS (
      SELECT vec_id, cell, v FROM (
        SELECT e.vec_id, c.cent_id AS cell, e.v,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {sqdist}, c.cent_id) AS rn
        FROM h e CROSS JOIN c{prev} c) WHERE rn = 1
    ),
    m{i} AS (
      SELECT cell, list(m ORDER BY d) AS centroid FROM (
        SELECT cell, u.i AS d,
               CAST(SUM(CAST(v[u.i + 1] AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*) AS m
        FROM a{i}, UNNEST(range(0, len(v))) AS u(i)
        GROUP BY cell, u.i)
      GROUP BY cell
    ),
    c{i} AS (
      SELECT p.cent_id, COALESCE(n.centroid, p.centroid) AS centroid
      FROM c{prev} p LEFT JOIN m{i} n ON p.cent_id = n.cell
    )"""

_IVF_KMEANS_SQL = (
    """
    WITH h AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             md5(CAST(vec_id AS VARCHAR) || ':42') AS _h
      FROM embeddings
    ),
    c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY _h) AS BIGINT) AS cent_id,
             v AS centroid
      FROM (SELECT _h, v FROM h ORDER BY _h LIMIT 8)
    ),"""
    + ",".join(
        _KM_ITER.format(i=i, prev=i - 1, sqdist=_KM_SQDIST) for i in (1, 2, 3)
    )
    + """,
    cn AS (
      SELECT cent_id,
             list_transform(centroid,
               x -> x / sqrt(list_dot_product(centroid, centroid))) AS centv
      FROM c3
    ),
    cu AS (
      SELECT vec_id AS cand_id,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv
      FROM h
    ),
    qu AS (SELECT cand_id AS query_id, cv AS qv FROM cu WHERE cand_id < 10),
    assigned AS (
      SELECT cand_id, cell, cv FROM (
        SELECT u.cand_id, c.cent_id AS cell, u.cv,
               ROW_NUMBER() OVER (PARTITION BY u.cand_id
                 ORDER BY list_dot_product(u.cv, c.centv) DESC, c.cent_id) AS rn
        FROM cu u CROSS JOIN cn c) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, c.cent_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY list_dot_product(q.qv, c.centv) DESC, c.cent_id) AS pr
        FROM qu q CROSS JOIN cn c) WHERE pr <= 3
    ),
    scored AS (
      SELECT p.query_id, a.cand_id, list_dot_product(p.qv, a.cv) AS cosine
      FROM probes p JOIN assigned a USING (cell)
      WHERE p.query_id <> a.cand_id
    )
    SELECT query_id, cand_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rn
      FROM scored)
    WHERE rn <= 5
    """
)


@query(
    "x_similarity_ivf_kmeans",
    sql=_IVF_KMEANS_SQL,
    note="IVF ANN over TRAINED centroids: distributed Lloyd's k-means "
    "(content-addressed sampled fit, broadcast-assign, decimal-routed "
    "per-dim means, localCheckpoint rounds) feeds the probe/re-rank "
    "dataflow. Decimal means make the trained model — and therefore the "
    "whole ANN result — exactly reproducible in a fixed unrolled-iteration "
    "SQL twin",
)
def x_similarity_ivf_kmeans(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import ivf_topk, kmeans_fit

    emb = t(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=8, iters=3)
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(queries, emb, nlist=8, nprobe=3, k=5, centroids=cents)


# x_similarity_pq oracle: the entire PQ pipeline — per-subspace k-means fit,
# code assignment, ADC top-k — is exactly reproducible in SQL now that
# pq_fit's per-dim means route through decimal (same rule as kmeans_fit) and
# the ADC partial distances already did. Fixed iteration count (2) unrolls to
# assign/update CTE pairs keyed by (sub, cell); the sampled fit covers the
# whole corpus at oracle SF, so the SQL trains on everything.
_PQ_SQDIST = (
    "list_dot_product("
    "list_transform(list_zip(s.subvec, c.centroid), z -> z[1] - z[2]), "
    "list_transform(list_zip(s.subvec, c.centroid), z -> z[1] - z[2]))"
)

_PQ_ITER = """
    p{i} AS (
      SELECT id, sub, cell, subvec FROM (
        SELECT s.id, s.sub, c.cent_id AS cell, s.subvec,
               ROW_NUMBER() OVER (PARTITION BY s.id, s.sub
                 ORDER BY {sqdist}, c.cent_id) AS rn
        FROM sl s JOIN b{prev} c ON s.sub = c.sub) WHERE rn = 1
    ),
    m{i} AS (
      SELECT sub, cell, list(m ORDER BY d) AS centroid FROM (
        SELECT sub, cell, u.i AS d,
               CAST(SUM(CAST(subvec[u.i + 1] AS DECIMAL(27,12))) AS DOUBLE)
                 / COUNT(*) AS m
        FROM p{i}, UNNEST(range(0, len(subvec))) AS u(i)
        GROUP BY sub, cell, u.i)
      GROUP BY sub, cell
    ),
    b{i} AS (
      SELECT p.sub, p.cent_id, COALESCE(n.centroid, p.centroid) AS centroid
      FROM b{prev} p LEFT JOIN m{i} n
        ON p.sub = n.sub AND p.cent_id = n.cell
    )"""

_PQ_SQL = (
    """
    WITH base AS (
      SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    sl AS (
      SELECT id, u.s AS sub, v[u.s * 16 + 1 : u.s * 16 + 16] AS subvec
      FROM base, UNNEST(range(0, 4)) AS u(s)
    ),
    b0 AS (
      SELECT sub, CAST(rn AS BIGINT) AS cent_id, subvec AS centroid FROM (
        SELECT sub, subvec,
               ROW_NUMBER() OVER (PARTITION BY sub
                 ORDER BY md5(CAST(id AS VARCHAR) || ':'
                              || CAST(42 + sub AS VARCHAR))) AS rn
        FROM sl) WHERE rn <= 16
    ),"""
    + ",".join(
        _PQ_ITER.format(i=i, prev=i - 1, sqdist=_PQ_SQDIST) for i in (1, 2)
    )
    + """,
    enc AS (
      SELECT id, sub, cell AS code FROM (
        SELECT s.id, s.sub, c.cent_id AS cell,
               ROW_NUMBER() OVER (PARTITION BY s.id, s.sub
                 ORDER BY """
    + _PQ_SQDIST
    + """, c.cent_id) AS rn
        FROM sl s JOIN b2 c ON s.sub = c.sub) WHERE rn = 1
    ),
    qtab AS (
      SELECT s.id AS query_id, s.sub, c.cent_id AS code,
             CAST("""
    + _PQ_SQDIST
    + """ AS DECIMAL(27,12)) AS pdist
      FROM sl s JOIN b2 c ON s.sub = c.sub
      WHERE s.id < 10
    ),
    scored AS (
      SELECT q.query_id, e.id AS cand_id,
             CAST(SUM(q.pdist) AS DOUBLE) AS approx_sqdist
      FROM enc e JOIN qtab q ON e.sub = q.sub AND e.code = q.code
      WHERE q.query_id <> e.id
      GROUP BY q.query_id, e.id
    )
    SELECT query_id, cand_id, approx_sqdist, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY approx_sqdist ASC, cand_id) AS rn
      FROM scored)
    WHERE rn <= 5
    """
)


@query(
    "x_similarity_pq",
    sql=_PQ_SQL,
    note="Product-quantization ANN (Jegou et al. 2011): per-subspace k-means "
    "codebooks (content-addressed sampled fit, decimal-routed means), m-byte "
    "codes, asymmetric-distance top-k via broadcast query lookup tables — "
    "the corpus never shuffles a full vector. Decimal-exact training + ADC "
    "sums make the whole pipeline hash-checkable against a fixed "
    "unrolled-iteration SQL twin",
    bench=True,
)
def x_similarity_pq(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import pq_encode, pq_fit, pq_topk

    emb = t(spark, sf_dir, "embeddings")
    books = pq_fit(emb, dim=64, m=4, ksub=16, iters=2)
    enc = pq_encode(emb, books, dim=64, m=4)
    queries = emb.filter(F.col("vec_id") < 10)
    return pq_topk(queries, enc, books, dim=64, m=4, k=5)


_BM25_SQL = """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM doclen
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term IN ('spark', 'merge', 'window')
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(SUM(CAST(
               ln((CAST(stats.n_docs - df.df AS DOUBLE) + 0.5)
                  / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
               * ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                  / (CAST(tf.tf AS DOUBLE)
                     + 1.2 * ((1.0 - 0.75)
                              + (0.75 * (CAST(dl.dl AS DOUBLE) / stats.avgdl)))))
             AS DECIMAL(27,9))) AS DOUBLE) AS score
      FROM tf
      JOIN df USING (term)
      JOIN doclen dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, score, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
      FROM scored)
    WHERE rn <= 10
    """


@query(
    "x_search_bm25",
    sql=_BM25_SQL,
    note="BM25 keyword retrieval: postings filtered to query terms before any "
    "shuffle, df/corpus stats broadcast, TakeOrdered top-k; per-term scores "
    "decimal-routed so ln() ulp differences can't break the oracle hash",
    bench=True,
)
def x_search_bm25(spark, sf_dir):
    from flnr_wins_spark.functions.search import bm25_topk

    docs = t(spark, sf_dir, "documents")
    return bm25_topk(docs, ["spark", "merge", "window"], k=10)


# x_semdedup oracle: the whole pipeline is exactly reproducible in SQL — the
# k-means CTEs (decimal means, see x_similarity_ivf_kmeans) feed a within-cell
# pair join and the recursive-CTE connected components from x_dedup_clusters.
# The output carries no floats at all (id, cluster_id, is_survivor), so the
# only cross-engine hazard is the pair set itself, and that is pinned by
# bit-identical fold dots.
_SEMDEDUP_SQL = (
    """
    WITH RECURSIVE raw AS (
      SELECT vec_id, embedding::DOUBLE[] AS r FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, list_transform(embedding::DOUBLE[], x -> x * 2.0)
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    h AS (
      SELECT vec_id,
             list_transform(r, x -> x / sqrt(list_dot_product(r, r))) AS v,
             md5(CAST(vec_id AS VARCHAR) || ':42') AS _h
      FROM raw
    ),
    c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY _h) AS BIGINT) AS cent_id,
             v AS centroid
      FROM (SELECT _h, v FROM h ORDER BY _h LIMIT 8)
    ),"""
    + ",".join(
        _KM_ITER.format(i=i, prev=i - 1, sqdist=_KM_SQDIST) for i in (1, 2)
    )
    + """,
    af AS (
      SELECT vec_id, cell, v FROM (
        SELECT e.vec_id, c.cent_id AS cell, e.v,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY """
    + _KM_SQDIST
    + """, c.cent_id) AS rn
        FROM h e CROSS JOIN c2 c) WHERE rn = 1
    ),
    paired AS (
      SELECT vec_id, cell, v FROM af
      WHERE cell IN (SELECT cell FROM af GROUP BY cell HAVING COUNT(*) <= 100000)
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM paired a JOIN paired b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v) >= 0.999
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
    ),
    cc AS (
      SELECT id, MIN(r) AS cluster_id, id = MIN(r) AS is_survivor
      FROM reach GROUP BY id
    )
    SELECT h.vec_id AS id,
           COALESCE(cc.cluster_id, h.vec_id) AS cluster_id,
           COALESCE(cc.is_survivor, TRUE) AS is_survivor
    FROM h LEFT JOIN cc ON cc.id = h.vec_id
    """
)


@query(
    "x_semdedup",
    sql=_SEMDEDUP_SQL,
    note="SemDeDup semantic dedup: k-means cells -> within-cell cosine pairs "
    "-> connected components -> lowest-id survivor. Planted scaled clones "
    "(identical unit vectors) are guaranteed to share a cell and link. "
    "Decimal-routed centroid means make the cell structure — and so the "
    "full verdict table — exactly reproducible in the unrolled SQL twin",
    bench=True,
)
def x_semdedup(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import semantic_dedup

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    clones = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * 2.0).alias("embedding"),
    )
    base = emb.unionByName(clones)
    return semantic_dedup(base, k=8, iters=2, threshold=0.999)


@query(
    "x_text_tokenize_bpe",
    sql="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS BIGINT)
             AS n_pretokens,
           -- outer CAST matters: DuckDB list_sum(BIGINT) yields HUGEINT, which
           -- pandas canonicalizers render as float64 (55.0 != 55) — keep the
           -- column BIGINT end-to-end so value hashes agree with Spark
           CAST(CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+')) AS BIGINT)
             + coalesce(list_sum(list_transform(
                 regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'),
                 s -> CASE WHEN length(s) > 4
                           THEN CAST(ceil((length(s) - 4) / 4.0) AS BIGINT)
                           ELSE 0 END)), 0) AS BIGINT) AS est_tokens
    FROM documents
    """,
    note="BPE-style pre-tokenization (regexp_extract_all, JVM-side) + "
    "merge-density token estimate",
)
def x_text_tokenize_bpe(spark, sf_dir):
    from flnr_wins_spark.functions.text import bpe_pretokens, bpe_token_estimate

    docs = t(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        F.size(bpe_pretokens(c)).cast("bigint").alias("n_pretokens"),
        bpe_token_estimate(c).alias("est_tokens"),
    )


@query(
    "x_text_stats",
    sql="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS ttr,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
    FROM documents
    """,
    note="token counting + lexical stats, all JVM-side",
)
def x_text_stats(spark, sf_dir):
    from flnr_wins_spark.functions.text import char_token_estimate, token_count, tokens, uniq_token_ratio

    docs = t(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        token_count(c).alias("n_tokens"),
        F.size(F.array_distinct(tokens(c))).cast("bigint").alias("n_uniq"),
        uniq_token_ratio(c).alias("ttr"),
        char_token_estimate(c).alias("est_bpe_tokens"),
    )


@query(
    "x_text_quality",
    sql="""
    SELECT doc_id,
           0.4 * least(1.0, len(string_split(text, ' ')) / 100.0)
         + 0.4 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                    / len(string_split(text, ' ')))
         + 0.2 * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                                 x -> x IN ('the','a','of','and','to'))) AS DOUBLE)
                    / len(string_split(text, ' '))) AS quality
    FROM documents
    """,
    note="deterministic quality score: length saturation + diversity + stopword mass",
)
def x_text_quality(spark, sf_dir):
    from flnr_wins_spark.functions.text import quality_score

    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score(F.col("text")).alias("quality"))


@query(
    "x_text_fingerprint",
    sql="""
    SELECT doc_id,
           md5(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')) AS prefix_fp
    FROM documents
    """,
    note="prefix fingerprint (md5 of first 8 tokens)",
)
def x_text_fingerprint(spark, sf_dir):
    from flnr_wins_spark.functions.text import prefix_fingerprint

    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", prefix_fingerprint(F.col("text")).alias("prefix_fp"))


@query(
    "x_quality_rules",
    sql="""
    WITH s AS (
      SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
    ), m AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
               / len(toks) AS mean_word_len,
             CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
               / len(toks) AS alpha_word_ratio,
             CAST(len(regexp_extract_all(text, '#'))
                  + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
               / len(toks) AS symbol_word_ratio,
             CASE WHEN len(toks) >= 3 THEN
               1.0 - CAST(len(list_distinct(list_transform(
                       range(1, len(toks) - 1),
                       i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS DOUBLE)
                     / (len(toks) - 2)
             ELSE 0.0 END AS dup_trigram_ratio,
             CAST(len(list_intersect(
                    list_distinct(list_transform(toks, w -> lower(w))),
                    ['the','be','to','of','and','that','have','with'])) AS BIGINT)
               AS stopword_hits
      FROM s
    )
    SELECT *,
           (n_words BETWEEN 50 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND alpha_word_ratio >= 0.80
            AND symbol_word_ratio <= 0.10
            AND dup_trigram_ratio <= 0.30
            AND stopword_hits >= 2) AS passes
    FROM m
    """,
    note="Gopher/C4-style corpus quality rules: word-count bounds, mean word "
    "length, alphabetic-word ratio, symbol ratio, duplicated-trigram ratio, "
    "stopword presence — one narrow JVM pass per doc, each rule value "
    "emitted alongside the conjunctive verdict",
)
def x_quality_rules(spark, sf_dir):
    from flnr_wins_spark.functions.text import quality_rules

    return quality_rules(t(spark, sf_dir, "documents"))


@query(
    "x_repetition_stats",
    sql="""
    WITH toks AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS total_chars,
             string_split(text, ' ') AS tk
      FROM documents
    ),
    g2 AS (
      SELECT doc_id, total_chars, 'top' AS tag,
             unnest(list_transform(generate_series(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i+1])) AS gram
      FROM toks WHERE len(tk) >= 2
    ),
    g5 AS (
      SELECT doc_id, total_chars, 'dup' AS tag,
             unnest(list_transform(generate_series(1, len(tk) - 4),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' '
                         || tk[i+3] || ' ' || tk[i+4])) AS gram
      FROM toks WHERE len(tk) >= 5
    ),
    cnts AS (
      SELECT doc_id, total_chars, tag, gram, COUNT(*) AS cnt
      FROM (SELECT * FROM g2 UNION ALL SELECT * FROM g5)
      GROUP BY 1, 2, 3, 4
    ),
    per_doc AS (
      SELECT doc_id, MAX(total_chars) AS total_chars,
             MAX(CASE WHEN tag = 'top' THEN cnt * length(gram) END) AS top_chars,
             SUM(CASE WHEN tag = 'dup' AND cnt > 1 THEN cnt * length(gram)
                      ELSE 0 END) AS dup_chars
      FROM cnts GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(top_chars AS DOUBLE) / total_chars AS top_ngram_frac,
           CAST(dup_chars AS DOUBLE) / total_chars AS dup_ngram_frac,
           (CAST(top_chars AS DOUBLE) / total_chars <= 0.20
            AND CAST(dup_chars AS DOUBLE) / total_chars <= 0.15)
             AS passes_repetition
    FROM per_doc
    """,
    note="Gopher repetition rules: char-fraction of the most frequent 2-gram "
    "and of all duplicated 5-grams. Distributed shape (explode -> count per "
    "(doc, gram) -> per-doc re-agg); both gram sizes share one tagged shuffle",
)
def x_repetition_stats(spark, sf_dir):
    from flnr_wins_spark.functions.text import repetition_stats

    return repetition_stats(t(spark, sf_dir, "documents"))


@query(
    "x_corpus_stats",
    sql="""
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
    FROM documents
    GROUP BY source, lang
    """,
    note="corpus-mix accounting per (source, lang): doc/token/char totals — "
    "the curation dashboard aggregate; map-side partial agg, one shuffle on "
    "the (source, lang) key",
)
def x_corpus_stats(spark, sf_dir):
    from flnr_wins_spark.functions.text import token_count

    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("mean_chars"),
        )
    )


@query(
    "x_doc_chunking",
    sql="""
    WITH s AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ), c AS (
      SELECT doc_id, tk,
             CAST(1 + ceil(greatest(len(tk) - 64, 0) / 48.0) AS INT) AS nc
      FROM s
    )
    SELECT doc_id,
           CAST(k AS INTEGER) AS chunk_idx,
           CAST(len(list_slice(tk, k * 48 + 1, k * 48 + 64)) AS BIGINT) AS chunk_n_tokens,
           array_to_string(list_slice(tk, k * 48 + 1, k * 48 + 64), ' ') AS chunk_text
    FROM c, UNNEST(range(0, nc)) u(k)
    """,
    note="context-window chunking: long docs split into overlapping "
    "64-token windows (overlap 16, step 48) via posexplode over a JVM "
    "sequence — the 1->k complement of sequence packing; narrow map + "
    "generate, no shuffle",
)
def x_doc_chunking(spark, sf_dir):
    from flnr_wins_spark.operators.packing import chunk_documents

    docs = t(spark, sf_dir, "documents")
    return chunk_documents(docs, "text", "doc_id", chunk_tokens=64, overlap=16)


@query(
    "x_text_langid",
    sql="""
    WITH d AS (
      SELECT doc_id, lang AS lang_given, COALESCE(text, '') AS text
      FROM documents
    ),
    tk AS (
      SELECT doc_id, lang_given, text,
             list_filter(string_split(text, ' '), t -> t <> '') AS toks,
             list_distinct(list_filter(string_split(lower(text), ' '),
                                       t -> t <> '')) AS dtoks
      FROM d
    ),
    th AS (
      SELECT doc_id, lang_given, text, dtoks,
             list_transform(toks, tok ->
               list_reduce(
                 list_prepend(CAST(0 AS HUGEINT),
                   list_transform(string_split(tok, ''),
                                  c -> CAST(unicode(c) AS HUGEINT))),
                 (acc, x) -> (acc * 131 + x) % 2305843009213693951)) AS tokh
      FROM tk
    ),
    fp AS (
      SELECT doc_id, lang_given, text, dtoks,
             CAST(list_reduce(
               list_prepend(CAST(0 AS HUGEINT), tokh),
               (acc, x) -> (acc * 1000003 + x) % 2305843009213693951)
               AS BIGINT) AS rolling_fp
      FROM th
    ),
    sc AS (
      SELECT doc_id, lang_given, rolling_fp,
             CASE WHEN text = '' THEN 'und'
                  WHEN regexp_matches(substr(text, 1, 400), '[一-鿿]') THEN 'zh'
                  ELSE NULL END AS pre,
             len(list_intersect(dtoks, ['the','of','and','to','in','is','a'])) AS s_en,
             len(list_intersect(dtoks, ['der','die','das','und','ist','ein'])) AS s_de,
             len(list_intersect(dtoks, ['le','la','les','et','est','un'])) AS s_fr,
             len(list_intersect(dtoks, ['el','la','los','y','es','un'])) AS s_es
      FROM fp
    )
    SELECT doc_id, lang_given,
           COALESCE(pre,
             CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'en'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                  WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                  WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                  ELSE 'es' END) AS lang_pred,
           rolling_fp
    FROM sc
    """,
    note="language-ID heuristic (Arrow-batched pandas UDF: CJK script "
    "check then stopword-profile vote, first-language tie priority) + "
    "rolling Rabin-Karp fingerprint (base 1000003 over per-token "
    "char-hashes, mod 2^61-1). ORACLE-GRADED since r6: the twin "
    "reimplements both in pure SQL — the vote as list_intersect argmax, "
    "the fingerprint as nested HUGEINT list_reduce folds — a true "
    "cross-engine differential of the Python UDF (the x_text_nfc "
    "pattern), retiring this entry from the rows-only set",
)
def x_text_langid(spark, sf_dir):
    from flnr_wins_spark.functions.text import lang_id, rolling_fingerprint
    from flnr_wins_spark.parallel import spread

    # spread before the Arrow boundary: a single-file corpus scan would run
    # both pandas UDFs in ONE Python worker (r15 deferral list item 1)
    docs = spread(t(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_given"),
        lang_id(F.col("text")).alias("lang_pred"),
        rolling_fingerprint(F.col("text")).alias("rolling_fp"),
    )


@query(
    "x_multimodal_bytes",
    sql="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_hash
    FROM documents
    """,
    note="binary-column plumbing: encode -> byte length + sha256 content hash",
)
def x_multimodal_bytes(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(content).cast("bigint").alias("n_bytes"),
        F.sha2(content, 256).alias("content_hash"),
    )


@query(
    "x_multimodal_decode",
    sql="""
    WITH b AS (
      SELECT doc_id, p,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':px' || CAST(p // 16 AS VARCHAR)),
                                 2 * (p % 16) + 1, 2) AS INT) AS byte
      FROM documents, range(48) t(p)
    )
    SELECT doc_id AS media_id,
           CAST(CASE WHEN doc_id % 2 = 1 THEN 109 ELSE 59 END AS BIGINT) AS n_bytes,
           CAST(3 AS INTEGER) AS channels,
           CAST(4 AS INTEGER) AS width,
           CAST(4 AS INTEGER) AS height,
           CAST(SUM(CASE WHEN p % 3 = 0 THEN byte ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(SUM(CASE WHEN p % 3 = 1 THEN byte ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN p % 3 = 2 THEN byte ELSE 0 END) AS BIGINT) AS sum_b,
           CAST(MIN(byte) AS INTEGER) AS min_byte,
           CAST(MAX(byte) AS INTEGER) AS max_byte
    FROM b GROUP BY doc_id
    """,
    note="REAL image decode (no fake path): even ids become a genuine "
    "binary P6 PPM (11-byte header + 4x4 RGB raster from md5 bytes); odd "
    "ids ship the SAME pixels as a 16-BIT PPM (maxval 65535, 2-byte "
    "big-endian samples, r14: previously an honest NotImplementedError) "
    "with each sample byte-doubled (s*257), which the decoder's exact "
    "round(s*255/65535) maps back to s — decode output is identical by "
    "construction, so one oracle value-checks the 8-bit header/raster "
    "path AND the 16-bit downconversion (only n_bytes differs: 109 vs "
    "59). Reference analog: the opaque-binary carry at wts.py:132,155, "
    "upgraded from carry-only to decode",
)
def x_multimodal_decode(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import extract_features

    docs = t(spark, sf_dir, "documents")
    hexes = [
        F.md5(
            F.encode(
                F.concat(F.col("doc_id").cast("string"), F.lit(f":px{j}")),
                "UTF-8",
            )
        )
        for j in range(3)
    ]
    pix8 = F.concat(*[F.unhex(h) for h in hexes])
    # byte-doubled 16-bit raster: sample s8 ships as big-endian s8*257
    # (hi == lo == s8), which exact rounding at maxval 65535 maps back
    # to s8 — the hex-pair duplication IS the byte doubling
    pix16 = F.concat(
        *[F.unhex(F.regexp_replace(h, "(..)", "$1$1")) for h in hexes]
    )
    content = F.when(
        F.col("doc_id") % 2 == 1,
        F.concat(F.encode(F.lit("P6\n4 4\n65535\n"), "UTF-8"), pix16),
    ).otherwise(F.concat(F.encode(F.lit("P6\n4 4\n255\n"), "UTF-8"), pix8))
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.lit(4).alias("width"),
            F.lit(4).alias("height"),
            F.length(content).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )
    feats = extract_features(media, fake=False)
    f = F.col("feature")
    return feats.select(
        "media_id",
        "n_bytes",
        f[0].cast("int").alias("channels"),
        f[1].cast("int").alias("width"),
        f[2].cast("int").alias("height"),
        f[3].cast("bigint").alias("sum_r"),
        f[4].cast("bigint").alias("sum_g"),
        f[5].cast("bigint").alias("sum_b"),
        f[6].cast("int").alias("min_byte"),
        f[7].cast("int").alias("max_byte"),
    )


# 44-byte RIFF/WAVE header for PCM16 mono 8 kHz with a 32-byte data chunk —
# constant because every synthesized clip shares the format; only the
# payload (two md5 digests of doc_id) varies.
_WAV_HDR_HEX = (
    "524946464400000057415645666d7420100000000100"
    "0100401f0000803e0000020010006461746120000000"
)


@query(
    "x_multimodal_audio_decode",
    sql="""
    WITH s AS (
      SELECT doc_id, i,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':au' || CAST(i // 8 AS VARCHAR)),
                                 2 * ((2 * i) % 16) + 1, 2) AS INT)
             + 256 * CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':au' || CAST(i // 8 AS VARCHAR)),
                                         2 * ((2 * i + 1) % 16) + 1, 2) AS INT) AS uv
      FROM documents, range(16) t(i)
    ),
    sv AS (
      SELECT doc_id, i,
             CASE WHEN uv >= 32768 THEN uv - 65536 ELSE uv END AS v
      FROM s
    ),
    lagged AS (
      SELECT doc_id, v,
             LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM sv
    )
    SELECT doc_id AS media_id,
           CAST(76 AS BIGINT) AS n_bytes,
           CAST(1 AS INTEGER) AS channels,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(16 AS INTEGER) AS n_samples,
           CAST(SUM(v) AS BIGINT) AS sum_s,
           CAST(MIN(v) AS INTEGER) AS min_s,
           CAST(MAX(v) AS INTEGER) AS max_s,
           CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
           CAST(SUM(CASE WHEN v * pv < 0 THEN 1 ELSE 0 END) AS INTEGER)
             AS zero_crossings
    FROM lagged GROUP BY doc_id
    """,
    note="REAL audio decode (no fake path): each doc becomes a genuine "
    "RIFF/WAVE PCM16 clip (44-byte header + 16 samples from md5 bytes); "
    "extract_audio_features parses the chunk walk, fmt fields, and "
    "little-endian signed samples with the stdlib decoder and emits "
    "integer-exact sums/extrema/zero-crossings. The oracle recomputes the "
    "expected samples from the construction — header layout, byte order, "
    "and sign handling are all value-checked. Audio twin of "
    "x_multimodal_decode; reference analog wts.py:132,155",
)
def x_multimodal_audio_decode(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import extract_audio_features

    docs = t(spark, sf_dir, "documents")
    payload = F.concat(
        *[
            F.unhex(
                F.md5(
                    F.encode(
                        F.concat(F.col("doc_id").cast("string"), F.lit(f":au{j}")),
                        "UTF-8",
                    )
                )
            )
            for j in range(2)
        ]
    )
    content = F.concat(F.unhex(F.lit(_WAV_HDR_HEX)), payload)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.lit(8000).alias("sample_rate"),
            F.lit(16).cast("bigint").alias("n_samples"),
            F.length(content).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )
    feats = extract_audio_features(media)
    f = F.col("feature")
    return feats.select(
        "media_id",
        "n_bytes",
        f[0].cast("int").alias("channels"),
        f[1].cast("int").alias("sample_rate"),
        f[2].cast("int").alias("n_samples"),
        f[3].cast("bigint").alias("sum_s"),
        f[4].cast("int").alias("min_s"),
        f[5].cast("int").alias("max_s"),
        f[6].cast("bigint").alias("sum_abs"),
        f[7].cast("int").alias("zero_crossings"),
    )


@query(
    "x_multimodal_frames",
    sql="""
    SELECT doc_id AS media_id,
           CAST(i AS INTEGER) AS frame_idx,
           sha256(substring(text,
                            CAST(i * length(text) // 4 AS INT) + 1,
                            CAST((i + 1) * length(text) // 4 AS INT)
                              - CAST(i * length(text) // 4 AS INT))) AS frame_hash,
           CAST(CAST((i + 1) * length(text) // 4 AS INT)
                  - CAST(i * length(text) // 4 AS INT) AS BIGINT) AS n_bytes
    FROM documents, range(4) t(i)
    """,
    note="video frame-sampling plumbing: mapInPandas 1->4 fan-out with "
    "deterministic byte-slice frames, hash-verified against the oracle. "
    "Oracle equivalence holds for ASCII corpora (Spark slices BYTES, the "
    "SQL slices CHARACTERS; fixtures are ASCII so they coincide — real "
    "media content is raw bytes and has no SQL twin at all)",
)
def x_multimodal_frames(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import sample_frames, to_media_table

    docs = t(spark, sf_dir, "documents")
    media = to_media_table(docs, "text", "doc_id")
    return sample_frames(media, n_frames=4)


@query(
    "x_multimodal_features",
    sql="""
    SELECT doc_id AS media_id,
           sha256(text) AS content_hash,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(8 AS INTEGER) AS feature_dim,
           CAST(coalesce(list_sum(list_transform(range(8),
                 i -> CAST('0x' || substr(sha256(text), 2 * CAST(i AS INT) + 1, 2) AS INT))), 0)
                AS BIGINT) AS feature_bytes_sum
    FROM documents
    """,
    note="media table -> mapInPandas feature extraction (stubbed decoder). "
    "The array<double> feature vector is projected to exact scalar columns "
    "here (the driver's row canonicalizer cannot hash list cells): the fake "
    "decoder emits digest_byte[i % 32] / 255.0, so round(x*255) recovers the "
    "byte exactly and the oracle recomputes the same bytes from sha256 hex — "
    "an integer-exact check of the full feature content. The vector API "
    "itself stays array-valued.",
)
def x_multimodal_features(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import extract_features, to_media_table

    docs = t(spark, sf_dir, "documents")
    media = to_media_table(docs, "text", "doc_id")
    feats = extract_features(media, dim=8, fake=True)
    return feats.select(
        "media_id",
        "content_hash",
        "n_bytes",
        F.size("feature").alias("feature_dim"),
        F.aggregate(
            "feature", F.lit(0).cast("bigint"), lambda a, x: a + F.round(x * 255).cast("bigint")
        ).alias("feature_bytes_sum"),
    )


@query(
    "x_embedding_neardup",
    sql="""
    WITH base AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, list_transform(embedding::DOUBLE[], x -> x * 2)
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    probes AS (SELECT vec_id, v FROM base WHERE vec_id >= 100000)
    SELECT p.vec_id AS id_a, b.vec_id AS id_b
    FROM probes p JOIN base b ON p.vec_id > b.vec_id
    WHERE list_dot_product(p.v, b.v)
            / (sqrt(list_dot_product(p.v, p.v)) * sqrt(list_dot_product(b.v, b.v)))
          >= 0.999
    """,
    note="embedding-cosine near-dup pairs (synthesized scaled clones)",
)
def x_embedding_neardup(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import cosine

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    clones = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("v", lambda x: x * 2.0).alias("v"),
    )
    base = emb.unionByName(clones)
    probes = base.filter(F.col("vec_id") >= 100000).select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va")
    )
    return (
        base.join(F.broadcast(probes), F.col("id_a") > F.col("vec_id"))
        .filter(cosine(F.col("va"), F.col("v")) >= 0.999)
        .select("id_a", F.col("vec_id").alias("id_b"))
    )


@query(
    "x_decontam",
    sql="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS tk
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(list_slice(tk, i, i + 7), ' ') AS g
      FROM toks, UNNEST(range(1, len(tk) - 6)) u(i)
      WHERE len(tk) >= 8
    ),
    ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 100 = 0)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_grams
    FROM grams JOIN ev USING (g)
    GROUP BY doc_id
    """,
    note="benchmark decontamination (GPT-3/PaLM-style 8-gram overlap): "
    "eval grams deduped + broadcast, so the train corpus is matched map-side "
    "and never shuffled; grams are JVM higher-order expressions, no UDF. "
    "Eval set synthesized as every 100th doc",
    bench=True,
)
def x_decontam(spark, sf_dir):
    from flnr_wins_spark.operators.decontam import contamination

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    eval_df = docs.filter(F.col("doc_id") % 100 == 0)
    return contamination(
        docs, eval_df, text_col="text", id_col="doc_id", n=8,
        min_parallelism=spark.sparkContext.defaultParallelism,
    )


# ---------------------------------------------------------------------------
# Corpus curation: PII scrub, stratified source mixing, sequence packing
# ---------------------------------------------------------------------------

# The fixture corpus is synthetic word salad with no PII, so the query plants
# deterministic PII derived from doc_id (same expression on both engines) and
# the operator must find and scrub exactly that. DuckDB's regexp_replace
# needs the 'g' flag for replace-all; Spark's is always global.
_PII_AUG_T = (
    "text || ' mail user' || CAST(doc_id AS {t}) || '@mail.example.com"
    " tel 604-555-' || lpad(CAST(doc_id % 10000 AS {t}), 4, '0')"
    " || ' ip 10.0.' || CAST(doc_id % 256 AS {t}) || '.'"
    " || CAST((doc_id * 7) % 256 AS {t})"
)
_PII_AUG = _PII_AUG_T.format(t="VARCHAR")  # DuckDB oracle side
_PII_AUG_SPARK = _PII_AUG_T.format(t="STRING")


@query(
    "x_pii_redact",
    sql=f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG} AS raw FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(raw, '\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}')) AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(raw, '\\d{{3}}-\\d{{3}}-\\d{{4}}')) AS BIGINT) AS n_phone,
           regexp_replace(
             regexp_replace(
               regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
               '\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}', '[IP]', 'g'),
             '\\d{{3}}-\\d{{3}}-\\d{{4}}', '[PHONE]', 'g') AS clean
    FROM aug
    """,
    note="PII scrub (email/IPv4/phone -> class tokens): pure JVM "
    "regexp_replace chain, no UDF; patterns restricted to Java-regex/RE2 "
    "common semantics so the oracle runs the identical expressions",
)
def x_pii_redact(spark, sf_dir):
    from flnr_wins_spark.functions.text import pii_counts, redact_pii

    docs = t(spark, sf_dir, "documents")
    raw = F.expr(_PII_AUG_SPARK)
    n_email, n_ip, n_phone = pii_counts(raw)
    return docs.select(
        "doc_id",
        n_email.alias("n_email"),
        n_ip.alias("n_ip"),
        n_phone.alias("n_phone"),
        redact_pii(raw).alias("clean"),
    )


@query(
    "x_sample_stratified",
    sql="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2) <
          CASE c_mktsegment WHEN 'AUTOMOBILE' THEN '66'
                            WHEN 'MACHINERY'  THEN '1a'
                            ELSE '0d' END
    """,
    note="deterministic stratified sampling (per-stratum md5-bucket "
    "thresholds: 40% AUTOMOBILE, 10% MACHINERY, 5% rest) — content-"
    "addressed like train_test_split, so re-runs and incremental data keep "
    "identical membership; narrow map over the scan, no shuffle",
)
def x_sample_stratified(spark, sf_dir):
    from flnr_wins_spark.operators.sample import stratified_sample

    cust = t(spark, sf_dir, "customer")
    # 0.40*256=102.4->0x66, 0.10*256=25.6->0x1a, 0.05*256=12.8->0x0d
    return stratified_sample(
        cust,
        key_col="c_custkey",
        strata_col="c_mktsegment",
        fractions={"AUTOMOBILE": 0.40, "MACHINERY": 0.10},
        default_fraction=0.05,
    ).select("c_custkey", "c_mktsegment")


@query(
    "x_corpus_resample",
    sql="""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_stratum
      FROM documents GROUP BY source
    ),
    mn AS (SELECT MIN(n_stratum) AS n_min FROM counts),
    rates AS (
      SELECT source, n_stratum,
             CAST(floor(256 * sqrt(CAST(n_min AS DOUBLE) / n_stratum)) AS BIGINT)
               AS rate_q
      FROM counts, mn
    )
    SELECT r.source, r.n_stratum, r.rate_q, CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM documents d JOIN rates r USING (source)
    WHERE r.rate_q >= 256
       OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2) < printf('%02x', r.rate_q)
    GROUP BY r.source, r.n_stratum, r.rate_q
    """,
    note="temperature resampling (tau=0.5): keep-rate sqrt(n_min/n) per "
    "source, rates computed in-plan (agg -> scalar broadcast -> join), "
    "content-addressed membership; sqrt is IEEE-exact cross-engine so the "
    "oracle hash-matches",
)
def x_corpus_resample(spark, sf_dir):
    from flnr_wins_spark.operators.sample import temperature_resample

    docs = t(spark, sf_dir, "documents")
    kept = temperature_resample(docs, key_col="doc_id", strata_col="source", tau=0.5)
    return kept.groupBy("source", "n_stratum", "rate_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )


@query(
    "x_seq_packing",
    sql="""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) % 16 AS shard
      FROM documents
    ),
    pos AS (
      SELECT shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard
                                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS pack_offset
      FROM d
    )
    SELECT CAST(shard * 1099511627776 + FLOOR(pack_offset / 512) AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total
    FROM pos
    GROUP BY 1
    """,
    note="sharded concat-and-chunk sequence packing (budget 512 tokens, 16 "
    "hash shards): running-sum window partitioned by content-hash shard — "
    "parallel at any scale, no global sort; pack_id = (shard << 40) | "
    "local_pack (1099511627776 = 2^40 in the oracle's arithmetic form)",
)
def x_seq_packing(spark, sf_dir):
    from flnr_wins_spark.functions.text import token_count
    from flnr_wins_spark.operators.packing import pack_manifest, pack_sequences

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(docs, "doc_id", "n_tokens", budget=512, shards=16)
    return pack_manifest(packed)


@query(
    "x_dedup_containment",
    sql=f"""
    WITH docs AS ({_DUP_SQL_DOCS}),
    toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM docs),
    sh AS (
      SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
      FROM toks, UNNEST(range(1, len(tk) - 1)) AS u(i)
      WHERE len(tk) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    live AS (
      SELECT doc_id, shingle FROM sh
      WHERE shingle IN (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 256)
    ),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM live a JOIN live b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(c AS DOUBLE) / sa.n AS containment
    FROM inter JOIN sizes sa ON sa.doc_id = id_a
    WHERE CAST(c AS DOUBLE) / sa.n >= 0.9
    """,
    note="asymmetric containment |A∩B|/|A| — catches doc-inside-doc "
    "(quotes, boilerplate wrapping) that symmetric Jaccard misses; planted "
    "dup construction guarantees original ⊂ extended at containment 1.0",
)
def x_dedup_containment(spark, sf_dir):
    from flnr_wins_spark.operators.dedup import containment_pairs, shingle_sets

    docs = _docs_with_dups(spark, sf_dir)
    sh = shingle_sets(docs, "text", "doc_id", n=3)
    return containment_pairs(sh, threshold=0.9, max_shingle_freq=256).select(
        "id_a", "id_b", "containment"
    )


@query(
    "x_unigram_quality",
    sql="""
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
      FROM documents
    ),
    vocab AS (SELECT term, COUNT(*) AS tf FROM toks GROUP BY term),
    total AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM vocab)
    SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(ln(CAST(total.total AS DOUBLE) / CAST(vocab.tf AS DOUBLE))
                          AS DECIMAL(27,9))) AS DOUBLE) / COUNT(*) AS avg_nll
    FROM toks JOIN vocab USING (term) CROSS JOIN total
    GROUP BY id
    """,
    note="unigram-LM quality proxy (KenLM-style filtering with a one-pass "
    "in-corpus model): mean negative log-prob per doc; per-token ln routed "
    "through DECIMAL(27,9) so the sum is order-insensitive and engine-exact",
    bench=True,
)
def x_unigram_quality(spark, sf_dir):
    from flnr_wins_spark.functions.text import unigram_quality

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return unigram_quality(docs)


@query(
    "x_token_bigrams",
    sql="""
    WITH toks AS (SELECT string_split(text, ' ') AS tk FROM documents),
    bg AS (
      SELECT tk[i] || ' ' || tk[i+1] AS bigram
      FROM toks, UNNEST(range(1, len(tk))) u(i)
      WHERE len(tk) >= 2
    )
    SELECT bigram, COUNT(*) AS cnt
    FROM bg GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 50
    """,
    note="adjacent-token pair counts, top-50 — the merge-candidate statistic "
    "of one BPE training round, JVM transform/sequence (no explode of "
    "per-token rows until the single count shuffle); TakeOrdered top-k",
)
def x_token_bigrams(spark, sf_dir):
    from flnr_wins_spark.functions.text import bigram_pairs

    docs = t(spark, sf_dir, "documents")
    bg = bigram_pairs(docs).select(
        F.concat_ws(" ", F.col("a"), F.col("b")).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(50)
    )


@query(
    "x_outlier_events",
    sql="""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sv,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS svv
      FROM events GROUP BY event_type
    ), st AS (
      SELECT event_type, n, sv / n AS mu,
             sqrt((svv - sv * sv / n) / (n - 1)) AS sigma
      FROM s
    )
    SELECT e.event_id, e.event_type, e.value,
           (e.value - st.mu) / st.sigma AS z
    FROM events e JOIN st USING (event_type)
    WHERE abs(e.value - st.mu) > 3 * st.sigma
    """,
    note="per-group 3-sigma outlier flagging: moments via exact decimal "
    "sums (order-insensitive), tiny stats table broadcast back onto the "
    "stream — two scans, one group shuffle, no window",
)
def x_outlier_events(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    dv = F.col("value").cast("decimal(18,2)")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dv).cast("double").alias("sv"),
        F.sum(dv * dv).cast("double").alias("svv"),
    )
    st = s.select(
        "event_type",
        (F.col("sv") / F.col("n")).alias("mu"),
        F.sqrt((F.col("svv") - F.col("sv") * F.col("sv") / F.col("n")) / (F.col("n") - 1)).alias("sigma"),
    )
    return (
        ev.join(F.broadcast(st), "event_type")
        .filter(F.abs(F.col("value") - F.col("mu")) > 3 * F.col("sigma"))
        .select(
            "event_id",
            "event_type",
            "value",
            ((F.col("value") - F.col("mu")) / F.col("sigma")).alias("z"),
        )
    )


@query(
    "x_embedding_stats",
    sql="""
    SELECT label, CAST(u.i AS INT) AS pos,
           CAST(SUM(CAST(CAST(embedding[u.i + 1] AS DOUBLE) AS DECIMAL(27,9))) AS DOUBLE)
             / COUNT(*) AS mean_val,
           COUNT(*) AS n
    FROM embeddings, UNNEST(range(0, len(embedding))) AS u(i)
    GROUP BY 1, 2
    """,
    note="per-label element-wise centroid over the embedding column "
    "(posexplode -> decimal-exact mean per (label, dim)); the building "
    "block of centroid drift monitoring and class prototypes",
)
def x_embedding_stats(spark, sf_dir):
    emb = t(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "x")
    )
    return flat.groupBy("label", "pos").agg(
        (
            F.sum(F.col("x").cast("double").cast("decimal(27,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_val"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "x_packed_sequences",
    sql="""
    WITH d AS (
      SELECT doc_id, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INTEGER) % 16 AS shard
      FROM documents
    ),
    pos AS (
      SELECT shard, doc_id, text, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard
                                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS pack_offset
      FROM d
    )
    SELECT CAST(shard * 1099511627776 + FLOOR(pack_offset / 512) AS BIGINT) AS pack_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           string_agg(text, '<|eos|>' ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
             AS seq_text
    FROM pos
    GROUP BY 1
    """,
    note="training-sequence materialization: pack members concatenated with "
    "an EOS separator in the exact deterministic pack order; per-group "
    "collection is budget-bounded by construction (the safe collect_list)",
    bench=True,
)
def x_packed_sequences(spark, sf_dir):
    from flnr_wins_spark.functions.text import token_count
    from flnr_wins_spark.operators.packing import pack_sequences, pack_texts

    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "text", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(docs, "doc_id", "n_tokens", budget=512, shards=16)
    return pack_texts(packed, "doc_id", "text")


@query(
    "x_multimodal_audio_chunks",
    sql="""
    WITH audio AS (
      SELECT doc_id AS media_id,
             CASE WHEN doc_id % 4 = 0 THEN 44100 ELSE 16000 END AS sample_rate,
             CAST(length(text) AS BIGINT) * 400 + 37 AS n_samples
      FROM documents
    ),
    dims AS (
      SELECT media_id, n_samples,
             CAST(sample_rate AS BIGINT) * 10 AS spc,
             (n_samples + CAST(sample_rate AS BIGINT) * 10 - 1)
               // (CAST(sample_rate AS BIGINT) * 10) AS nc
      FROM audio
    )
    SELECT media_id, CAST(u.k AS INT) AS chunk_idx,
           u.k * spc AS start_sample,
           least(spc, n_samples - u.k * spc) AS chunk_samples,
           u.k * spc * 2 AS start_byte,
           least(spc, n_samples - u.k * spc) * 2 AS chunk_bytes
    FROM dims, UNNEST(range(0, nc)) AS u(k)
    """,
    note="audio chunk manifest from typed metadata alone (10 s windows, "
    "16/44.1 kHz mix): exact sample/byte ranges per chunk so a loader "
    "schedules range reads before any decode — integer-exact, no UDF",
)
def x_multimodal_audio_chunks(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import (
        audio_chunk_manifest,
        to_audio_table,
    )

    docs = t(spark, sf_dir, "documents")
    audio = to_audio_table(docs, "text", "doc_id")
    return audio_chunk_manifest(audio, chunk_seconds=10, bytes_per_sample=2)


# Same oracle as x_dedup_clusters — the star algorithm must produce the
# IDENTICAL min-id labeling, so grading both against one SQL twin is the
# strongest equivalence evidence the driver can record.
from flnr_wins_spark.plans.common import _REGISTRY as _REG  # noqa: E402


@query(
    "x_dedup_clusters_star",
    sql=_REG["x_dedup_clusters"].sql,
    note="near-dup clustering via alternating large/small-star connected "
    "components (Kiveris et al. SoCC'14, O(log^2 n) rounds regardless of "
    "diameter) — same recursive-CTE oracle as the label-propagation entry",
)
def x_dedup_clusters_star(spark, sf_dir):
    from flnr_wins_spark.operators.dedup import jaccard_pairs, shingle_sets
    from flnr_wins_spark.operators.graph import connected_components

    docs = _docs_with_dups(spark, sf_dir)
    pairs = jaccard_pairs(shingle_sets(docs, "text", "doc_id", n=3), threshold=0.8)
    cc = connected_components(pairs, algorithm="star")
    return cc.withColumn("is_survivor", F.col("id") == F.col("cluster_id"))


@query(
    "x_url_canonicalize",
    sql="""
    WITH urls AS (
      SELECT doc_id,
             'HTTP://WWW.' || source || '-Site.org'
               || CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END
               || '/Doc/' || CAST(doc_id AS VARCHAR)
               || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
               || '?utm_source=x&b=2&a=1'
               || CASE WHEN doc_id % 3 = 0 THEN '&gclid=zz' ELSE '' END
               || '#frag' AS url
      FROM documents
    ),
    parts AS (
      SELECT doc_id, url,
             lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
             regexp_replace(lower(regexp_extract(url,
               '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)', 1)),
               '^www\\.', '') AS host_c,
             regexp_extract(url,
               '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?[^/:?#]+:([0-9]+)', 1) AS port,
             regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
             regexp_extract(url, '\\?([^#]*)', 1) AS query
      FROM urls
    ),
    canon AS (
      SELECT doc_id, url, scheme, host_c,
             CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                                           OR (scheme = 'https' AND port = '443'))
                  THEN ':' || port ELSE '' END AS port_c,
             CASE WHEN path = '' THEN '/'
                  WHEN length(path) > 1 AND path LIKE '%/'
                  THEN substr(path, 1, length(path) - 1)
                  ELSE path END AS path_c,
             array_to_string(list_sort(list_filter(string_split(query, '&'),
               p -> p <> ''
                    AND NOT starts_with(regexp_extract(p, '^([^=]*)', 1), 'utm_')
                    AND regexp_extract(p, '^([^=]*)', 1)
                        NOT IN ('gclid', 'fbclid', 'ref', 'mc_cid', 'mc_eid'))),
               '&') AS query_c
      FROM parts
    )
    SELECT doc_id,
           scheme || '://' || host_c || port_c || path_c
             || CASE WHEN query_c <> '' THEN '?' || query_c ELSE '' END AS canonical
    FROM canon
    """,
    note="URL canonicalization for crawl dedup: lower-cased scheme/host, "
    "www. + default ports + fragments + tracking params stripped, "
    "surviving params sorted, trailing slash normalized — all "
    "RE2-compatible regex/array expressions, oracle-mirrored rule by rule",
)
def x_url_canonicalize(spark, sf_dir):
    from flnr_wins_spark.functions.urls import canonical_url

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("HTTP://WWW."),
            F.col("source"),
            F.lit("-Site.org"),
            F.when(F.col("doc_id") % 5 == 0, ":80").otherwise(""),
            F.lit("/Doc/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 2 == 0, "/").otherwise(""),
            F.lit("?utm_source=x&b=2&a=1"),
            F.when(F.col("doc_id") % 3 == 0, "&gclid=zz").otherwise(""),
            F.lit("#frag"),
        ).alias("url"),
    )
    return docs.select("doc_id", canonical_url(F.col("url")).alias("canonical"))


_URL_VARIANTS_SQL = """
      SELECT doc_id,
             CASE doc_id % 5
               WHEN 0 THEN 'http://www.ex-' || CAST(doc_id // 5 AS VARCHAR)
                           || '.org/page/' || CAST(doc_id // 5 AS VARCHAR)
               WHEN 1 THEN 'HTTP://EX-' || CAST(doc_id // 5 AS VARCHAR)
                           || '.ORG/page/' || CAST(doc_id // 5 AS VARCHAR)
               WHEN 2 THEN 'http://ex-' || CAST(doc_id // 5 AS VARCHAR)
                           || '.org/page/' || CAST(doc_id // 5 AS VARCHAR) || '/'
               WHEN 3 THEN 'http://ex-' || CAST(doc_id // 5 AS VARCHAR)
                           || '.org/page/' || CAST(doc_id // 5 AS VARCHAR)
                           || '?utm_source=a'
               ELSE 'http://ex-' || CAST(doc_id // 5 AS VARCHAR)
                    || '.org:80/page/' || CAST(doc_id // 5 AS VARCHAR) || '#x'
             END AS url
      FROM documents
"""


@query(
    "x_dedup_url",
    sql=f"""
    WITH urls AS ({_URL_VARIANTS_SQL})
    SELECT 'http://ex-' || CAST(doc_id // 5 AS VARCHAR)
             || '.org/page/' || CAST(doc_id // 5 AS VARCHAR) AS canonical,
           MIN(doc_id) AS keeper,
           COUNT(*) AS n_copies
    FROM urls
    GROUP BY 1
    """,
    note="URL-level dedup through canonicalization: five superficial "
    "variants per page (case, www, trailing slash, tracking param, default "
    "port + fragment) collapse to one canonical key — raw-URL grouping "
    "would find zero duplicates; the oracle derives the expected canonical "
    "directly, so a canonicalization regression hash-fails",
)
def x_dedup_url(spark, sf_dir):
    from flnr_wins_spark.functions.urls import canonical_url

    g = (F.col("doc_id") / 5).cast("long").cast("string")
    base = F.concat(F.lit("ex-"), g, F.lit(".org"))
    page = F.concat(F.lit("/page/"), g)
    m = F.col("doc_id") % 5
    url = (
        F.when(m == 0, F.concat(F.lit("http://www."), base, page))
        .when(m == 1, F.concat(F.lit("HTTP://"), F.upper(base), page))
        .when(m == 2, F.concat(F.lit("http://"), base, page, F.lit("/")))
        .when(m == 3, F.concat(F.lit("http://"), base, page, F.lit("?utm_source=a")))
        .otherwise(F.concat(F.lit("http://"), base, F.lit(":80"), page, F.lit("#x")))
    )
    docs = t(spark, sf_dir, "documents").select("doc_id", url.alias("url"))
    return (
        docs.select("doc_id", canonical_url(F.col("url")).alias("canonical"))
        .groupBy("canonical")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# Learned corpus classifiers (round 4): batch perceptron + Naive Bayes —
# fastText-style quality/language filtering reduced to engine-native
# aggregations (see functions/classify.py scale notes).
# ---------------------------------------------------------------------------

_PCT_FEATS_SQL = """
      SELECT doc_id AS id,
             CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
             CAST(len(list_filter(string_split(text, ' '), t -> t = 'the')) AS BIGINT) AS f_the,
             CAST(len(list_filter(string_split(text, ' '), t -> t = 'a')) AS BIGINT) AS f_a,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS f_len
      FROM documents
"""

_PCT_MARGIN = "b + w1*f_the + w2*f_a + w3*f_len"


def _pct_round(i: int) -> str:
    """One unrolled batch-perceptron round: margin vs w{i-1}, summed update."""
    return f"""
    m{i} AS (SELECT f.*, b, w1, w2, w3, y * ({_PCT_MARGIN}) AS m
             FROM feats f CROSS JOIN w{i - 1}),
    w{i} AS (SELECT
               CAST(MAX(b)  + SUM(CASE WHEN m <= 0 THEN y         ELSE 0 END) AS BIGINT) AS b,
               CAST(MAX(w1) + SUM(CASE WHEN m <= 0 THEN y * f_the ELSE 0 END) AS BIGINT) AS w1,
               CAST(MAX(w2) + SUM(CASE WHEN m <= 0 THEN y * f_a   ELSE 0 END) AS BIGINT) AS w2,
               CAST(MAX(w3) + SUM(CASE WHEN m <= 0 THEN y * f_len ELSE 0 END) AS BIGINT) AS w3
             FROM m{i})"""


@query(
    "x_classify_perceptron",
    sql=f"""
    WITH feats AS ({_PCT_FEATS_SQL}),
    w0 AS (SELECT CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS w1,
                  CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3),
    {_pct_round(1)},
    {_pct_round(2)},
    {_pct_round(3)}
    SELECT id, CAST({_PCT_MARGIN} AS BIGINT) AS margin,
           CASE WHEN {_PCT_MARGIN} > 0 THEN 1 ELSE -1 END AS pred
    FROM feats CROSS JOIN w3
    """,
    note="batch perceptron (3 unrolled rounds, integer weights): is-English "
    "classifier over stopword-count features; one scalar-agg scan per round, "
    "model rides a broadcast — bit-exact under any partitioning",
)
def x_classify_perceptron(spark, sf_dir):
    from flnr_wins_spark.functions.classify import perceptron_fit, perceptron_score

    docs = t(spark, sf_dir, "documents")
    tok = F.split(F.col("text"), " ")
    feats = docs.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("lang") == "en", 1).otherwise(-1).cast("bigint").alias("y"),
        F.size(F.filter(tok, lambda x: x == F.lit("the"))).cast("bigint").alias("f_the"),
        F.size(F.filter(tok, lambda x: x == F.lit("a"))).cast("bigint").alias("f_a"),
        F.size(F.filter(tok, lambda x: x != F.lit(""))).cast("bigint").alias("f_len"),
    )
    cols = ["f_the", "f_a", "f_len"]
    w = perceptron_fit(feats, cols, label_col="y", iters=3)
    return perceptron_score(feats, w, cols, id_col="id")


@query(
    "x_classify_nb_langid",
    sql="""
    WITH train AS (SELECT lang AS cls, text FROM documents WHERE doc_id % 5 <> 0),
    test AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 5 = 0),
    ttoks AS (SELECT cls,
                     unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
              FROM train),
    tc AS (SELECT cls, term, COUNT(*) AS n FROM ttoks GROUP BY 1, 2),
    ctot AS (SELECT cls, CAST(SUM(n) AS BIGINT) AS tok_c FROM tc GROUP BY 1),
    vocab AS (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) AS v FROM tc),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM train),
    cd AS (SELECT cls, CAST(COUNT(*) AS BIGINT) AS dc FROM train GROUP BY 1),
    term_lp AS (
      SELECT term, tc.cls,
             CAST(ln((n + 1) / CAST(tok_c + v AS DOUBLE)) AS DECIMAL(27,9)) AS lp
      FROM tc JOIN ctot ON tc.cls = ctot.cls CROSS JOIN vocab),
    class_lp AS (
      SELECT cd.cls,
             CAST(ln(dc / CAST(nd AS DOUBLE)) AS DECIMAL(27,9)) AS prior_lp,
             CAST(ln(1.0 / CAST(tok_c + v AS DOUBLE)) AS DECIMAL(27,9)) AS floor_lp
      FROM cd CROSS JOIN nd JOIN ctot ON cd.cls = ctot.cls CROSS JOIN vocab),
    dtoks AS (SELECT id,
                     unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
              FROM test),
    scored AS (
      SELECT id, c.cls, MAX(c.prior_lp) + SUM(COALESCE(t.lp, c.floor_lp)) AS score
      FROM dtoks d CROSS JOIN class_lp c
      LEFT JOIN term_lp t ON t.term = d.term AND t.cls = c.cls
      GROUP BY id, c.cls),
    r AS (SELECT id, cls, score,
                 ROW_NUMBER() OVER (PARTITION BY id ORDER BY score DESC, cls) AS rn
          FROM scored)
    SELECT id, cls AS pred_cls, CAST(score AS DOUBLE) AS score FROM r WHERE rn = 1
    """,
    note="multinomial Naive Bayes language-ID: count-trained on an 80% "
    "content-addressed split, add-1 smoothing, decimal-routed ln sums, "
    "deterministic argmax tie-break; model is vocab-sized and broadcast",
)
def x_classify_nb_langid(spark, sf_dir):
    from flnr_wins_spark.functions.classify import naive_bayes_fit, naive_bayes_score

    docs = t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0).select(
        F.col("lang").alias("cls"), "text"
    )
    test = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    term_lp, class_lp = naive_bayes_fit(train, text_col="text", class_col="cls")
    return naive_bayes_score(test, term_lp, class_lp)


_BG_SQL = """
      SELECT tk[i] AS a, tk[i + 1] AS b{extra}
      FROM (SELECT {id_sel}string_split(text, ' ') AS tk FROM documents) s,
           UNNEST(range(1, greatest(len(tk), 1))) u(i)
"""


@query(
    "x_cooccur_pmi",
    sql=f"""
    WITH bg AS ({_BG_SQL.format(extra='', id_sel='')}),
    uni AS (
      SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
      FROM documents
    ),
    unic AS (SELECT term, COUNT(*) AS n_t FROM uni GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n_uni FROM unic),
    pairs AS (SELECT a, b, COUNT(*) AS n_ab FROM bg GROUP BY 1, 2),
    btot AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n_bg FROM pairs)
    SELECT a, b, n_ab,
           CAST((n_ab::HUGEINT * n_uni::HUGEINT * n_uni::HUGEINT * 1000000)
                // (n_bg::HUGEINT * na.n_t::HUGEINT * nb.n_t::HUGEINT)
                AS BIGINT) AS lift_q6
    FROM pairs
    JOIN unic na ON na.term = pairs.a
    JOIN unic nb ON nb.term = pairs.b
    CROSS JOIN tot CROSS JOIN btot
    WHERE n_ab >= 5
    ORDER BY lift_q6 DESC, a, b LIMIT 50
    """,
    note="adjacent-pair PMI collocations (phrase-mining statistic): "
    "pre-aggregated count tables before any join so Zipf-hot terms attach "
    "one lookup row; TakeOrdered top-k. Ranking + graded value is the "
    "ENGINE-EXACT integer lift key floor(1e6*n_ab*N^2/(B*n_a*n_b)) — "
    "CORRECTNESS_r04 showed a DECIMAL(27,9)-of-double-ln key is inside "
    "libm ulp territory and flips at rounding/rank boundaries; the "
    "display pmi (= ln(lift)) stays out of the graded projection",
)
def x_cooccur_pmi(spark, sf_dir):
    from flnr_wins_spark.functions.text import cooccurrence_pmi

    return cooccurrence_pmi(
        t(spark, sf_dir, "documents"), min_count=5, top_k=50
    ).select("a", "b", "n_ab", "lift_q6")


@query(
    "x_bigram_lm_quality",
    sql=f"""
    WITH bg AS ({_BG_SQL.format(extra=', id', id_sel='doc_id AS id, ')}),
    bgc AS (SELECT a, b, COUNT(*) AS c_ab FROM bg GROUP BY 1, 2),
    uni AS (
      SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
      FROM documents
    ),
    unic AS (SELECT term, COUNT(*) AS c_a FROM uni GROUP BY 1),
    voc AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM unic)
    SELECT id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(ln(CAST(c_a + v AS DOUBLE) / CAST(c_ab + 1 AS DOUBLE))
                         AS DECIMAL(27,9))) AS DOUBLE) / COUNT(*) AS avg_nll
    FROM bg JOIN bgc USING (a, b) JOIN unic ON unic.term = bg.a CROSS JOIN voc
    GROUP BY id
    """,
    note="bigram-LM (add-1) perplexity proxy, one Markov order above "
    "x_unigram_quality; decimal-routed per-pair ln, count-table joins only",
    bench=True,
)
def x_bigram_lm_quality(spark, sf_dir):
    from flnr_wins_spark.functions.text import bigram_quality

    return bigram_quality(t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Entity resolution + phrase retrieval (round 4)
# ---------------------------------------------------------------------------

# Dirty entity table for linkage: document "titles" (leading text slice of
# varying length — high-entropy strings, unlike the 8-adjective part names);
# every 3rd title loses its 5th character, every 7th also gains a trailing
# 'x' — 1- and 2-edit variants with the 2-char blocking prefix intact (the
# operator's documented recall contract).
_TITLES_SQL = """
      SELECT doc_id AS t_id, substr(text, 1, 20 + doc_id % 10) AS title
      FROM documents
"""

_DIRTY_TITLES_SQL = f"""
      SELECT t_id + 1000000 AS v_id,
             CASE WHEN t_id % 7 = 0
                  THEN substr(title, 1, 4) || substr(title, 6) || 'x'
                  ELSE substr(title, 1, 4) || substr(title, 6)
             END AS v_name
      FROM ({_TITLES_SQL}) WHERE t_id % 3 = 0
"""

def _titles_and_variants(spark, sf_dir):
    """Spark twin of _TITLES_SQL/_DIRTY_TITLES_SQL — ONE construction shared
    by every linkage entry (fuzzy join, sorted neighborhood, golden record);
    the oracle strings above must mirror exactly this."""
    docs = t(spark, sf_dir, "documents")
    titles = docs.select(
        F.col("doc_id").alias("t_id"),
        F.expr("substr(text, 1, 20 + doc_id % 10)").alias("title"),
    )
    variants = titles.filter(F.col("t_id") % 3 == 0).select(
        (F.col("t_id") + 1000000).alias("v_id"),
        F.when(
            F.col("t_id") % 7 == 0,
            F.concat(
                F.substring("title", 1, 4), F.expr("substr(title, 6)"), F.lit("x")
            ),
        )
        .otherwise(F.concat(F.substring("title", 1, 4), F.expr("substr(title, 6)")))
        .alias("v_name"),
    )
    return titles, variants




@query(
    "x_fuzzy_join",
    sql=f"""
    WITH titles AS ({_TITLES_SQL}),
    variants AS ({_DIRTY_TITLES_SQL})
    SELECT t_id, title, v_id, v_name,
           CAST(levenshtein(title, v_name) AS BIGINT) AS dist
    FROM titles JOIN variants
      ON lower(substr(title, 1, 2)) = lower(substr(v_name, 1, 2))
     AND abs(len(title) - len(v_name)) <= 2
    WHERE levenshtein(title, v_name) <= 2
    """,
    note="entity resolution via blocked fuzzy join: (2-char prefix, length "
    "band +-1) blocking with a hot-block width guard, then JVM levenshtein "
    "verify on candidates only — never |L|x|R|. The oracle's quadratic "
    "in-block form is equivalent because <=2 edits move length <=2 < band "
    "width, so the band predicate reduces to the length filter",
    bench=True,
)
def x_fuzzy_join(spark, sf_dir):
    from flnr_wins_spark.operators.linkage import fuzzy_join

    titles, variants = _titles_and_variants(spark, sf_dir)
    return fuzzy_join(titles, variants, "title", "v_name", max_dist=2)


@query(
    "x_search_phrase",
    sql="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM t, UNNEST(range(1, len(tk) - 1)) u(i)
    WHERE tk[i] = 'slow' AND tk[i + 1] = 'hash' AND tk[i + 2] = 'batch'
    GROUP BY doc_id
    """,
    note="exact-phrase retrieval over positional postings: terms filtered "
    "while narrow (pushdown before every exchange), k-way join on "
    "(doc, pos-i) occurrence-unique keys, map-side-combined per-doc count",
)
def x_search_phrase(spark, sf_dir):
    from flnr_wins_spark.functions.search import phrase_search

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return phrase_search(docs, ["slow", "hash", "batch"])


@query(
    "x_random_projection",
    sql="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (
      SELECT vec_id AS id,
             list_transform(range(0, 8), j ->
               list_dot_product(v,
                 list_transform(range(0, 64), d ->
                   CASE WHEN substr(md5(CAST(j * 64 + d AS VARCHAR) || ':42'), 32, 1)
                          IN ('1','3','5','7','9','b','d','f')
                   THEN 1.0 ELSE -1.0 END))) AS rp
      FROM e)
    SELECT id, rp[1] AS rp0, rp[2] AS rp1, rp[3] AS rp2, rp[4] AS rp3,
               rp[5] AS rp4, rp[6] AS rp5, rp[7] AS rp6, rp[8] AS rp7
    FROM p
    """,
    note="Johnson-Lindenstrauss random projection 64->8 dims with "
    "md5-parity sign matrix (stored nowhere, engine-identical): narrow "
    "JVM map, zero shuffles — the cheap distance-preserving pre-filter "
    "before exact re-rank. Graded projection flattens the array into 8 "
    "scalar doubles: the driver's canonicalizer cannot hash list values "
    "(CORRECTNESS_r04 x_random_projection err), so graded outputs never "
    "emit ARRAY columns — same doctrine as the binary lower(hex()) rule.",
)
def x_random_projection(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import random_projection

    emb = t(spark, sf_dir, "embeddings")
    rp = random_projection(emb, dim=64, out_dim=8, hash_fn="md5")
    return rp.select(
        "id", *[F.col("rp")[j].alias(f"rp{j}") for j in range(8)]
    )


@query(
    "x_dedup_tfidf",
    sql=f"""
    WITH docs AS ({_DUP_SQL_DOCS}),
    toks AS (
      SELECT id, term, COUNT(*) AS tf
      FROM (SELECT doc_id AS id,
                   unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
            FROM docs)
      GROUP BY 1, 2),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM docs),
    dfreq AS (SELECT term, COUNT(*) AS df FROM toks GROUP BY 1
              HAVING COUNT(*) <= 256),
    w AS (
      SELECT id, term,
             CAST(CAST(tf * ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE))
                       AS DECIMAL(27,9)) AS DOUBLE) AS w
      FROM toks JOIN dfreq USING (term) CROSS JOIN nd),
    norms AS (
      SELECT id, sqrt(CAST(SUM(CAST(w * w AS DECIMAL(27,12))) AS DOUBLE)) AS norm
      FROM w GROUP BY id),
    dots AS (
      SELECT wa.id AS a, wb.id AS b,
             CAST(SUM(CAST(wa.w * wb.w AS DECIMAL(27,12))) AS DOUBLE) AS dot
      FROM w wa JOIN w wb USING (term) WHERE wa.id < wb.id GROUP BY 1, 2)
    SELECT a, b, dot / (na.norm * nb.norm) AS cosine
    FROM dots JOIN norms na ON na.id = dots.a JOIN norms nb ON nb.id = dots.b
    WHERE dot / (na.norm * nb.norm) >= 0.8
    """,
    note="TF-IDF weighted cosine near-dup pairs: idf down-weights "
    "boilerplate (the weighted complement of set Jaccard), max_df prunes "
    "hot terms before the postings self-join (fanout <= max_df^2 per "
    "term), decimal-routed ln/dot/norm make the cosine engine-exact",
)
def x_dedup_tfidf(spark, sf_dir):
    from flnr_wins_spark.operators.dedup import tfidf_cosine_pairs

    docs = _docs_with_dups(spark, sf_dir)
    return tfidf_cosine_pairs(docs, min_cosine=0.8, max_df=256)


@query(
    "x_search_hybrid_rrf",
    sql="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM doclen
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term IN ('spark', 'merge', 'window')
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    bm AS (
      SELECT tf.doc_id,
             CAST(SUM(CAST(
               ln((CAST(stats.n_docs - df.df AS DOUBLE) + 0.5)
                  / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
               * ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                  / (CAST(tf.tf AS DOUBLE)
                     + 1.2 * ((1.0 - 0.75)
                              + (0.75 * (CAST(dl.dl AS DOUBLE) / stats.avgdl)))))
             AS DECIMAL(27,9))) AS DOUBLE) AS score
      FROM tf JOIN df USING (term) JOIN doclen dl USING (doc_id)
      CROSS JOIN stats GROUP BY tf.doc_id
    ),
    lex AS (
      SELECT doc_id, rn AS rank FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
        FROM bm) WHERE rn <= 50
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
    dense AS (
      SELECT doc_id, rn AS rank FROM (
        SELECT c.vec_id AS doc_id,
               ROW_NUMBER() OVER (ORDER BY
                 list_dot_product(c.v, q.qv)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(c.v, c.v))) DESC,
                 c.vec_id) AS rn
        FROM e c CROSS JOIN q WHERE c.vec_id <> 0)
      WHERE rn <= 50
    ),
    fused AS (
      SELECT doc_id,
             CAST(SUM(CAST(1.0 / (60 + rank) AS DECIMAL(27,12))) AS DOUBLE) AS rrf,
             CAST(COUNT(*) AS BIGINT) AS n_systems
      FROM (SELECT * FROM lex UNION ALL SELECT * FROM dense)
      GROUP BY doc_id
    )
    SELECT doc_id, rrf, n_systems, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rn FROM fused)
    WHERE rn <= 10
    """,
    note="hybrid retrieval: BM25 lexical top-50 + exact-cosine dense top-50 "
    "(vec_id as the doc surrogate key) fused by reciprocal-rank fusion "
    "1/(60+rank) — rank-only fusion needs no score calibration; "
    "contributions decimal-routed, fuse is result-sized",
)
def x_search_hybrid_rrf(spark, sf_dir):
    from flnr_wins_spark.functions.search import bm25_topk, rrf_fuse
    from flnr_wins_spark.functions.vectors import brute_force_topk

    docs = t(spark, sf_dir, "documents")
    emb = t(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, ["spark", "merge", "window"], k=50).select("doc_id", "rank")
    dense = brute_force_topk(
        emb.filter(F.col("vec_id") == 0), emb, k=50
    ).select(F.col("cand_id").alias("doc_id"), "rank")
    return rrf_fuse([lex, dense], k=10)


@query(
    "x_knn_classify",
    sql="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < 50),
    tr AS (SELECT * FROM e WHERE vec_id >= 50),
    knn AS (
      SELECT query_id, cand_id, lbl FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.label AS lbl,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 list_dot_product(q.v, c.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(c.v, c.v))) DESC,
                 c.vec_id) AS rn
        FROM tr c CROSS JOIN q)
      WHERE rn <= 5
    ),
    votes AS (
      SELECT query_id, lbl, CAST(COUNT(*) AS BIGINT) AS votes
      FROM knn GROUP BY 1, 2
    )
    SELECT query_id AS id, lbl AS pred_label, votes FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY votes DESC, lbl) AS rn FROM votes)
    WHERE rn = 1
    """,
    note="exact-cosine k-NN classification (broadcast query batch, "
    "majority vote, deterministic tie-break); corpus-scale path swaps the "
    "exact scan for ivf/pq ANN with the same vote tail",
)
def x_knn_classify(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import knn_classify

    emb = t(spark, sf_dir, "embeddings")
    return knn_classify(emb.filter(F.col("vec_id") < 50), emb.filter(F.col("vec_id") >= 50), k=5)


@query(
    "x_hard_negatives",
    sql="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < 10)
    SELECT query_id, cand_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
               list_dot_product(q.v, c.v)
                 / (sqrt(list_dot_product(q.v, q.v))
                    * sqrt(list_dot_product(c.v, c.v))) DESC,
               c.vec_id) AS rn
      FROM e c CROSS JOIN q
      WHERE q.label <> c.label)
    WHERE rn <= 5
    """,
    note="hard-negative mining for contrastive training: per query, top-k "
    "most-similar candidates with a DIFFERENT label; label filter precedes "
    "the window so per-query state stays k-bounded",
)
def x_hard_negatives(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import hard_negative_topk

    emb = t(spark, sf_dir, "embeddings")
    return hard_negative_topk(emb.filter(F.col("vec_id") < 10), emb, k=5)


@query(
    "x_weighted_sample",
    sql=f"""
    WITH s AS (
      SELECT doc_id, n_chars,
             (n_chars::HUGEINT * {2**37} * 1000)
               // (2 * CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'),
                            1, 9) AS BIGINT) + 1) AS pri_q
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, CAST(pri_q AS BIGINT) AS pri_q
    FROM s ORDER BY pri_q DESC, doc_id LIMIT 100
    """,
    note="priority sampling (Duffield-Lund-Thorup) weighted sample "
    "without replacement, n_chars-proportional: md5-derived rational "
    "uniforms, ENGINE-EXACT integer priority key w*2^37*1000 div (2h+1) "
    "(CORRECTNESS_r04 showed the A-ES double-ln key flips inside libm "
    "ulp at the top-k cut), one TakeOrdered pass — reproducible across "
    "engines and partitionings",
)
def x_weighted_sample(spark, sf_dir):
    from flnr_wins_spark.operators.sample import weighted_sample

    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(docs, "n_chars", n=100)


@query(
    "x_multimodal_png_decode",
    sql="""
    WITH b AS (
      SELECT doc_id, p,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':px' || CAST(p // 16 AS VARCHAR)),
                                 2 * (p % 16) + 1, 2) AS INT) AS byte
      FROM documents, range(192) t(p)
    )
    SELECT doc_id AS media_id,
           CAST(3 AS INTEGER) AS channels,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(SUM(CASE WHEN p % 3 = 0 THEN byte ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(SUM(CASE WHEN p % 3 = 1 THEN byte ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN p % 3 = 2 THEN byte ELSE 0 END) AS BIGINT) AS sum_b,
           CAST(MIN(byte) AS INTEGER) AS min_byte,
           CAST(MAX(byte) AS INTEGER) AS max_byte
    FROM b GROUP BY doc_id
    """,
    note="REAL PNG round-trip: known md5-derived 8x8 RGB pixels are "
    "zlib-compressed into a genuine PNG (row filters cycling 0-4: None/Sub/"
    "Up/Average/Paeth), then the stdlib chunk-walk decoder inflates and "
    "unfilters them back; the oracle recomputes the expected pixels from "
    "the construction, so compression, filtering, and unfiltering are all "
    "value-checked end-to-end",
)
def x_multimodal_png_decode(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import extract_features, wrap_png

    docs = t(spark, sf_dir, "documents")
    pix = F.concat(
        *[
            F.unhex(
                F.md5(
                    F.encode(
                        F.concat(F.col("doc_id").cast("string"), F.lit(f":px{j}")),
                        "UTF-8",
                    )
                )
            )
            for j in range(12)
        ]
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        pix.alias("content"),
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(192).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )
    feats = extract_features(wrap_png(media, 3, 8, 8), fake=False)
    f = F.col("feature")
    return feats.select(
        "media_id",
        f[0].cast("int").alias("channels"),
        f[1].cast("int").alias("width"),
        f[2].cast("int").alias("height"),
        f[3].cast("bigint").alias("sum_r"),
        f[4].cast("bigint").alias("sum_g"),
        f[5].cast("bigint").alias("sum_b"),
        f[6].cast("int").alias("min_byte"),
        f[7].cast("int").alias("max_byte"),
    )


def _geo_points(spark, sf_dir, id_alias="point_id", x="lon_u", y="lat_u"):
    """md5 -> microdegree customer points — ONE construction shared by the
    three geo entries (their SQL twins repeat it with the '0x' hex cast);
    lat from md5 chars 1-12, lon from 13-24."""
    return t(spark, sf_dir, "customer").selectExpr(
        f"c_custkey AS {id_alias}",
        "CAST(conv(substring(md5(concat('geo:', CAST(c_custkey AS STRING))), 1, 12),"
        f" 16, 10) AS BIGINT) % 180000001 AS {y}",
        "CAST(conv(substring(md5(concat('geo:', CAST(c_custkey AS STRING))), 13, 12),"
        f" 16, 10) AS BIGINT) % 360000001 AS {x}",
    )


def _geohash_oracle_sql() -> str:
    from flnr_wins_spark.functions.geo import geohash_expr_sql

    return f"""
    WITH pts AS (
      SELECT c_custkey AS point_id,
             CAST('0x' || substr(md5('geo:' || CAST(c_custkey AS VARCHAR)), 1, 12)
                  AS BIGINT) % 180000001 AS lat_u,
             CAST('0x' || substr(md5('geo:' || CAST(c_custkey AS VARCHAR)), 13, 12)
                  AS BIGINT) % 360000001 AS lon_u
      FROM customer)
    SELECT point_id, lat_u, lon_u,
           {geohash_expr_sql('lat_u', 'lon_u', 8, div='//')} AS gh8
    FROM pts
    """


@query(
    "x_geo_geohash",
    sql=_geohash_oracle_sql(),
    note="geohash spatial bucketing key (public-domain encoding) over "
    "md5-derived microdegree points: quantize, bit-interleave lon/lat, "
    "base32 — ONE fully unrolled JVM integer expression, no UDF, no "
    "floats (pinned against canonical geohash values in pytest); the "
    "spatial analog of the S11 secondary index (equal prefix = nearby "
    "cell, so spatial neighborhood joins become equi-joins). Oracle runs "
    "the same unrolled arithmetic with DuckDB's // integer division",
)
def x_geo_geohash(spark, sf_dir):
    from flnr_wins_spark.functions.geo import geohash_encode

    points = _geo_points(spark, sf_dir)
    return points.select(
        "point_id",
        "lat_u",
        "lon_u",
        geohash_encode("lat_u", "lon_u", precision=8).alias("gh8"),
    )


@query(
    "x_geo_knn",
    sql="""
    WITH pts AS (
      SELECT c_custkey AS id,
             CAST('0x' || substr(md5('geo:' || CAST(c_custkey AS VARCHAR)), 13, 12)
                  AS BIGINT) % 360000001 AS x_u,
             CAST('0x' || substr(md5('geo:' || CAST(c_custkey AS VARCHAR)), 1, 12)
                  AS BIGINT) % 180000001 AS y_u
      FROM customer)
    SELECT query_id, cand_id, dist2, CAST(rn AS INT) AS rank FROM (
      SELECT q.id AS query_id, c.id AS cand_id,
             (c.x_u - q.x_u) * (c.x_u - q.x_u)
               + (c.y_u - q.y_u) * (c.y_u - q.y_u) AS dist2,
             ROW_NUMBER() OVER (PARTITION BY q.id ORDER BY
               (c.x_u - q.x_u) * (c.x_u - q.x_u)
                 + (c.y_u - q.y_u) * (c.y_u - q.y_u), c.id) AS rn
      FROM pts q JOIN pts c ON q.id <= 20 AND q.id <> c.id) r
    WHERE rn <= 3
    """,
    note="exact spatial k-nearest-neighbors by planar squared distance in "
    "integer microdegrees (engine-exact BIGINT keys — no trig in graded "
    "values): broadcast query side, single candidate scan, k-bounded "
    "window; the scale path buckets by geohash prefix + neighbor rings "
    "before this exact re-rank (the coarse-then-verify posture of the "
    "ANN family, spatially)",
)
def x_geo_knn(spark, sf_dir):
    from flnr_wins_spark.functions.geo import planar_knn

    pts = _geo_points(spark, sf_dir, id_alias="id", x="x_u", y="y_u")
    return planar_knn(
        pts.filter(F.col("id") <= 20),
        pts,
        k=3,
        query_cols=("id", "x_u", "y_u"),
        cand_cols=("id", "x_u", "y_u"),
    )


@query(
    "x_geo_grid_join",
    sql="""
    WITH pts AS (
      SELECT c_custkey AS point_id,
             CAST('0x' || substr(md5('geo:' || CAST(c_custkey AS VARCHAR)), 13, 12)
                  AS BIGINT) % 360000001 AS x_u,
             CAST('0x' || substr(md5('geo:' || CAST(c_custkey AS VARCHAR)), 1, 12)
                  AS BIGINT) % 180000001 AS y_u
      FROM customer),
    ctr AS (
      SELECT n_nationkey AS box_id,
             CAST('0x' || substr(md5('box:' || CAST(n_nationkey AS VARCHAR)), 13, 12)
                  AS BIGINT) % 360000001 AS cx,
             CAST('0x' || substr(md5('box:' || CAST(n_nationkey AS VARCHAR)), 1, 12)
                  AS BIGINT) % 180000001 AS cy,
             2000000 + CAST('0x' || substr(md5('box:' || CAST(n_nationkey AS VARCHAR)), 25, 6)
                           AS BIGINT) % 8000001 AS hx,
             2000000 + CAST('0x' || substr(md5('ext:' || CAST(n_nationkey AS VARCHAR)), 25, 6)
                           AS BIGINT) % 8000001 AS hy
      FROM nation),
    boxes AS (
      SELECT box_id,
             GREATEST(cx - hx, 0) AS xmin_u, LEAST(cx + hx, 360000000) AS xmax_u,
             GREATEST(cy - hy, 0) AS ymin_u, LEAST(cy + hy, 180000000) AS ymax_u
      FROM ctr)
    SELECT point_id, box_id, x_u, y_u
    FROM pts JOIN boxes
      ON x_u >= xmin_u AND x_u <= xmax_u AND y_u >= ymin_u AND y_u <= ymax_u
    """,
    note="points-in-rectangles spatial join WITHOUT a cartesian product "
    "(the SpatialHadoop/GeoSpark grid-partition shape): rectangles "
    "explode to the 1-degree grid cells they cover, points map to their "
    "single cell, candidates meet in an equi-join on cell, exact integer "
    "containment finishes; a point lives in one cell so no dedup pass. "
    "Oracle is the brute-force containment join — the grid is pure "
    "execution strategy, contract-tested to produce no CartesianProduct. "
    "Box half-widths are 2-10M microdeg so the graded differential is "
    "non-vacuous (tens of real matches) at every sf, incl. sf0.001",
)
def x_geo_grid_join(spark, sf_dir):
    from flnr_wins_spark.functions.geo import grid_bbox_join

    points = _geo_points(spark, sf_dir, x="x_u", y="y_u")
    boxes = t(spark, sf_dir, "nation").selectExpr(
        "n_nationkey AS box_id",
        "CAST(conv(substring(md5(concat('box:', CAST(n_nationkey AS STRING))), 13, 12),"
        " 16, 10) AS BIGINT) % 360000001 AS cx",
        "CAST(conv(substring(md5(concat('box:', CAST(n_nationkey AS STRING))), 1, 12),"
        " 16, 10) AS BIGINT) % 180000001 AS cy",
        "2000000 + CAST(conv(substring(md5(concat('box:', CAST(n_nationkey AS STRING))), 25, 6),"
        " 16, 10) AS BIGINT) % 8000001 AS hx",
        "2000000 + CAST(conv(substring(md5(concat('ext:', CAST(n_nationkey AS STRING))), 25, 6),"
        " 16, 10) AS BIGINT) % 8000001 AS hy",
    ).selectExpr(
        "box_id",
        "GREATEST(cx - hx, CAST(0 AS BIGINT)) AS xmin_u",
        "LEAST(cx + hx, CAST(360000000 AS BIGINT)) AS xmax_u",
        "GREATEST(cy - hy, CAST(0 AS BIGINT)) AS ymin_u",
        "LEAST(cy + hy, CAST(180000000 AS BIGINT)) AS ymax_u",
    )
    return grid_bbox_join(points, boxes, cell_u=1_000_000)


@query(
    "x_quantile_bottomk",
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
    ), est AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_kept,
             MAX(CASE WHEN vr = CAST(ceil(0.5 * n_kept) AS INT) THEN v END) AS q50,
             MAX(CASE WHEN vr = CAST(ceil(0.9 * n_kept) AS INT) THEN v END) AS q90
      FROM ranked GROUP BY g
    ), tot AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_total FROM d GROUP BY g
    )
    SELECT est.g AS event_type, n_total, n_kept, q50, q90
    FROM est JOIN tot USING (g)
    """,
    note="quantile estimation from a bottom-k uniform row sample (the KMV "
    "bottom-k device on rows): partition-invariant and engine-exact where "
    "t-digest/KLL compactions are arrival-order-dependent; estimate = "
    "exact order statistic of the 256-row md5-selected sample, rank "
    "stderr ~ sqrt(q(1-q)/k); sketches merge like KMV (union, re-rank)",
)
def x_quantile_bottomk(spark, sf_dir):
    from flnr_wins_spark.functions.sketches import bottomk_quantiles

    ev = t(spark, sf_dir, "events")
    return bottomk_quantiles(
        ev, "event_type", "value", "event_id", k=256, quantiles=(0.5, 0.9)
    )


@query(
    "x_corpus_mixture",
    sql="""
    WITH stats AS (SELECT lang AS s, COUNT(*) AS c FROM documents GROUP BY 1),
    q AS (SELECT s, CAST(floor(sqrt(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS q
          FROM stats),
    tot AS (SELECT CAST(SUM(q) AS BIGINT) AS bigq FROM q),
    alloc AS (SELECT s, (300 * q) // bigq AS base, (300 * q) % bigq AS rem
              FROM q CROSS JOIN tot),
    lo AS (SELECT 300 - CAST(SUM(base) AS BIGINT) AS lo FROM alloc),
    quotas AS (
      SELECT s, base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, s) <= lo
                            THEN 1 ELSE 0 END AS quota
      FROM alloc CROSS JOIN lo),
    ranked AS (
      SELECT doc_id AS id, lang AS s,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':mix42'), doc_id)
               AS mix_rank
      FROM documents)
    SELECT id, s AS lang, CAST(mix_rank AS INTEGER) AS mix_rank
    FROM ranked JOIN quotas USING (s) WHERE mix_rank <= quota
    """,
    note="temperature-2 corpus mixture (Pile/ROOTS square-root sampling): "
    "a fixed n=300 budget allocated across languages by count^(1/2) — "
    "engine-exact because sqrt is THE correctly-rounded IEEE power, and "
    "the allocation itself is pure integers (q=floor(sqrt(c)*1e6), "
    "quota=(n*q) div Q, largest-remainder leftovers with name tiebreak); "
    "per-source fill is the content-addressed md5 rank. Complements "
    "x_corpus_resample (rate-based tempering) with budgeted allocation",
)
def x_corpus_mixture(spark, sf_dir):
    from flnr_wins_spark.operators.sample import corpus_mixture

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return corpus_mixture(docs, "lang", n=300, temperature=2.0)


# x_llm_corpus_e2e: the end-to-end corpus-curation composition an LLM data
# pipeline runs — quality-rule filtering, exact deduplication, temperature
# mixture sampling, and a training-manifest projection — every stage an
# existing oracle-checked operator, composed and hash-checked as ONE entry
# (the LLM-side sibling of the wins_e2e reference pipeline pair).
@query(
    "x_llm_corpus_e2e",
    sql="""
    WITH s AS (
      SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents
    ), m AS (
      SELECT doc_id, lang, text,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
               / len(toks) AS mwl,
             CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
               / len(toks) AS awr,
             CAST(len(regexp_extract_all(text, '#'))
                  + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE)
               / len(toks) AS swr,
             CASE WHEN len(toks) >= 3 THEN
               1.0 - CAST(len(list_distinct(list_transform(
                       range(1, len(toks) - 1),
                       i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS DOUBLE)
                     / (len(toks) - 2)
             ELSE 0.0 END AS dtr
      FROM s
    ), passed AS (
      SELECT doc_id, lang, text FROM m
      WHERE n_words BETWEEN 30 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
        AND awr >= 0.80 AND swr <= 0.10 AND dtr <= 0.30
    ), kept AS (
      SELECT p.doc_id, p.lang, p.text
      FROM passed p
      JOIN (SELECT text, MIN(doc_id) AS doc_id FROM passed GROUP BY text) k
        ON p.doc_id = k.doc_id
    ), stats AS (SELECT lang AS s, COUNT(*) AS c FROM kept GROUP BY 1),
    q AS (SELECT s, CAST(floor(sqrt(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS q
          FROM stats),
    tot AS (SELECT CAST(SUM(q) AS BIGINT) AS bigq FROM q),
    alloc AS (SELECT s, (120 * q) // bigq AS base, (120 * q) % bigq AS rem
              FROM q CROSS JOIN tot),
    lo AS (SELECT 120 - CAST(SUM(base) AS BIGINT) AS lo FROM alloc),
    quotas AS (
      SELECT s, base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, s) <= lo
                            THEN 1 ELSE 0 END AS quota
      FROM alloc CROSS JOIN lo),
    ranked AS (
      SELECT doc_id, lang AS s, text,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':mix42'), doc_id)
               AS mix_rank
      FROM kept)
    SELECT doc_id, s AS lang, CAST(mix_rank AS INT) AS mix_rank,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM ranked JOIN quotas USING (s) WHERE mix_rank <= quota
    """,
    note="END-TO-END LLM corpus curation, hash-checked as one pipeline "
    "(the LLM-side sibling of wins_e2e): Gopher/C4 quality rules "
    "(fixture-tuned thresholds: min 30 words, stopword rule off — the "
    "synthetic corpus has no English stopwords) -> exact dedup (min-id "
    "survivor per distinct text) -> sqrt-temperature mixture (budget "
    "120) -> training-manifest projection (doc, source, rank, token and "
    "char counts). Every stage is an already-graded operator; this entry "
    "grades their COMPOSITION",
    bench=True,
)
def x_llm_corpus_e2e(spark, sf_dir):
    from flnr_wins_spark.functions.text import quality_rules, token_count
    from flnr_wins_spark.operators.sample import corpus_mixture

    # spread the under-split single-file input BEFORE the rule projection:
    # higher-order array expressions run interpreted (outside whole-stage
    # codegen), so per-core parallelism is the lever. keep=('lang','text')
    # carries the payload THROUGH the per-row rule projection — the r15 form
    # re-joined passed doc_ids back to the corpus, paying a corpus self-join
    # (2 exchanges); the rules are per-row, so passthrough removes the join.
    # The persist on the spread frame is a PUSHDOWN BARRIER, not (any more) a
    # multi-consumer cache: PushDownPredicates sinks the `passes` filter —
    # with the whole interpreted rule chain inlined — below the round-robin
    # exchange onto the single-partition scan (measured 3.0 s -> 13.5 s when
    # the barrier was dropped, the filter evaluating on ONE core). Both the
    # repartition and the persist are skipped on already-parallel inputs,
    # where filter-pushdown-to-scan is exactly what we want at 100 TB.
    from pyspark import StorageLevel

    docs = t(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par).persist(StorageLevel.MEMORY_AND_DISK)
    passed = (
        quality_rules(docs, min_words=30, min_stopword_hits=0, keep=("lang", "text"))
        .filter(F.col("passes"))
        .select("doc_id", "lang", "text")
    )
    # exact dedup as ONE window pass: min(doc_id) over partitionBy(text)
    # equals the groupBy(text).min + re-join form (doc_id is the PK), and
    # consumes `passed` once. One text-keyed exchange carries the curated
    # rows straight into the localCheckpoint; the checkpointed `kept` then
    # feeds the three downstream consumers (mixture stats, mixture ranking,
    # payload join) without re-running scan+rules+window per consumer.
    from pyspark.sql import Window

    w = Window.partitionBy("text")
    kept = (
        passed.withColumn("_surv", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_surv"))
        .drop("_surv")
        .localCheckpoint()
    )
    mix = corpus_mixture(kept.select("doc_id", "lang"), "lang", n=120).select(
        F.col("id").alias("doc_id"), F.col("mix_rank").cast("int").alias("mix_rank")
    )
    return mix.join(kept, "doc_id").select(
        "doc_id",
        "lang",
        "mix_rank",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


@query(
    "x_text_nfc",
    sql="""
    WITH c AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':nfc') AS h
      FROM documents
    ), built AS (
      SELECT doc_id,
             decode(unhex(
               '6' || substr(h, 1, 1) || 'cc8' || substr(h, 2, 1) ||
               '6' || substr(h, 3, 1) || 'cc8' || substr(h, 4, 1) ||
               '6' || substr(h, 5, 1) || 'cc8' || substr(h, 6, 1) ||
               '6' || substr(h, 7, 1) || 'cc8' || substr(h, 8, 1) ||
               '6' || substr(h, 9, 1) || 'cc8' || substr(h, 10, 1) ||
               '6' || substr(h, 11, 1) || 'cc8' || substr(h, 12, 1) ||
               '6' || substr(h, 13, 1) || 'cc8' || substr(h, 14, 1) ||
               '6' || substr(h, 15, 1) || 'cc8' || substr(h, 16, 1))) AS raw
      FROM c
    )
    SELECT doc_id, nfc_normalize(raw) AS nfc_text,
           CAST(length(raw) AS BIGINT) AS len_raw,
           CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc
    FROM built
    """,
    note="Unicode NFC normalization (UAX#15 canonical composition) — the "
    "first text-cleaning step of a web-crawl pipeline, making visually "
    "identical combining-mark encodings hash-identical for downstream "
    "dedup. Construction builds md5-derived base+combining-mark sequences "
    "(raw UTF-8 bytes, engine-identical); Spark normalizes via an "
    "Arrow-batched unicodedata UDF, the oracle via DuckDB's "
    "nfc_normalize() — two INDEPENDENT UAX#15 implementations must agree "
    "codepoint-for-codepoint for the hash check to pass",
)
def x_text_nfc(spark, sf_dir):
    from flnr_wins_spark.functions.text import nfc_normalize
    from flnr_wins_spark.parallel import spread

    # spread before the Arrow boundary (same rationale as x_text_langid)
    docs = spread(t(spark, sf_dir, "documents"))
    h = F.md5(
        F.encode(F.concat(F.col("doc_id").cast("string"), F.lit(":nfc")), "UTF-8")
    )
    hexpairs = F.concat(
        *[
            F.concat(
                F.lit("6"), F.substring(h, 2 * j + 1, 1),
                F.lit("cc8"), F.substring(h, 2 * j + 2, 1),
            )
            for j in range(8)
        ]
    )
    raw = F.decode(F.unhex(hexpairs), "UTF-8")
    return docs.select(
        "doc_id",
        nfc_normalize(raw).alias("nfc_text"),
        F.length(raw).cast("bigint").alias("len_raw"),
        F.length(nfc_normalize(raw)).cast("bigint").alias("len_nfc"),
    )


@query(
    "x_html_strip",
    sql="""
    WITH wrapped AS (
      SELECT doc_id,
             '<div class="x"><p>' || text ||
             '</p> <br/> <span>&amp;co &lt;tag&gt; &quot;q&quot;</span></div>'
               AS html
      FROM documents
    ), stripped AS (
      SELECT doc_id, html,
             trim(regexp_replace(
               replace(replace(replace(replace(replace(
                 regexp_replace(html, '<[^>]*>', ' ', 'g'),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&apos;', ''''), '&amp;', '&'),
               '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')) AS clean
      FROM wrapped
    )
    SELECT doc_id, clean,
           CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT) AS n_tags,
           CAST(length(clean) AS BIGINT) AS len_clean
    FROM stripped
    """,
    note="HTML boilerplate removal (tag strip, predefined-entity decode "
    "with &amp; last so double-escapes survive, whitespace collapse) — "
    "entirely JVM regexp/replace, no UDF; patterns restricted to "
    "constructs with identical Java-regex/RE2 semantics so the oracle "
    "reproduces every byte",
)
def x_html_strip(spark, sf_dir):
    from flnr_wins_spark.functions.text import html_strip

    docs = t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<div class="x"><p>'),
        F.col("text"),
        F.lit('</p> <br/> <span>&amp;co &lt;tag&gt; &quot;q&quot;</span></div>'),
    )
    return docs.select(
        "doc_id",
        html_strip(html).alias("clean"),
        F.size(F.regexp_extract_all(html, F.lit("<[^>]*>"), F.lit(0)))
        .cast("bigint")
        .alias("n_tags"),
        F.length(html_strip(html)).cast("bigint").alias("len_clean"),
    )


@query(
    "x_embedding_covariance",
    sql="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (
      SELECT vec_id, CAST(i AS INTEGER) AS i,
             CAST(floor(v[i + 1] * 10000 + 0.5) AS BIGINT) AS x
      FROM e, range(64) r(i)
    ),
    cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
    lin AS (SELECT i, CAST(SUM(x) AS BIGINT) AS s FROM q GROUP BY i),
    cr AS (
      SELECT a.i AS i, b.i AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS sxy
      FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    )
    SELECT cr.i, cr.j, n,
           CAST(CAST(la.s AS DECIMAL(38,0)) AS VARCHAR) AS sx,
           CAST(CAST(lb.s AS DECIMAL(38,0)) AS VARCHAR) AS sy,
           CAST(CAST(sxy AS DECIMAL(38,0)) AS VARCHAR) AS sxy,
           CAST(CAST(n::HUGEINT * sxy - la.s::HUGEINT * lb.s AS DECIMAL(38,0))
                AS VARCHAR) AS cov_num
    FROM cr JOIN lin la ON la.i = cr.i JOIN lin lb ON lb.i = cr.j
    CROSS JOIN cnt
    """,
    note="exact integer covariance numerators over the embedding corpus "
    "(cov = cov_num / (n^2 * 10^8) of the 1e-4-quantized vectors): ONE "
    "mapInPandas pass emits dim x dim int64 partial outer products per "
    "Arrow batch (numpy matmul), so the shuffle carries 2,146 partial "
    "rows per batch instead of n*dim^2 — the fit half of PCA whitening / "
    "decorrelation at 100 TB; integer partials make the merged result "
    "bit-identical across partitionings and engines. GRADED projection "
    "stringifies the DECIMAL(38,0) columns on both sides (r03 hex-"
    "projection pattern): values exceed int64/exact-f64, and the driver's "
    "pandas-factorize canonicalizer can surface Decimal vs float64 "
    "differently per engine (the r05 hash_match=false root cause)",
)
def x_embedding_covariance(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import embedding_covariance

    emb = t(spark, sf_dir, "embeddings")
    cov = embedding_covariance(emb, dim=64, scale=4)
    # graded entry only: DECIMAL(38,0) -> string so the driver harness
    # factorizes identical keys from both engines; pca_project keeps the
    # decimal-typed internals
    return cov.select(
        "i",
        "j",
        "n",
        F.col("sx").cast("string").alias("sx"),
        F.col("sy").cast("string").alias("sy"),
        F.col("sxy").cast("string").alias("sxy"),
        F.col("cov_num").cast("string").alias("cov_num"),
    )


# x_embedding_pca oracle: the production eigensolve (pca_project: numpy QR
# subspace iteration at dim=64, k=2) uses numpy's pairwise-summation matmul,
# which no SQL fold reproduces bit-for-bit — it stays pytest-pinned against
# numpy.linalg.eigh (tests/test_pca.py). The GRADED entry instead runs the
# fold-exact power-iteration witness (pca_power_project): scale=2 integer
# covariance (every sum < 2^53, int->double exact), pure-Python left-fold
# eigensolve mirroring list_dot_product, and a fold projection — so the
# fixed-unroll SQL twin below lands on the identical 64-bit doubles
# (the x_similarity_ivf_kmeans / x_similarity_pq unrolled-CTE house pattern).
_PCA_ITER = """
    u{i} AS (
      SELECT list(ud ORDER BY ri) AS uv FROM (
        SELECT r.i AS ri, list_dot_product(r.row, w.w) AS ud
        FROM crow r CROSS JOIN w{prev} w)
    ),
    w{i} AS (
      SELECT list_transform(uv, x -> x / sqrt(list_dot_product(uv, uv))) AS w
      FROM u{i}
    )"""

_PCA_SQL = (
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS fv FROM embeddings),
    s AS (SELECT vec_id, list_slice(fv, 1, 8) AS v FROM e),
    q AS (
      SELECT vec_id, CAST(i AS INTEGER) AS i,
             CAST(floor(v[i + 1] * 100 + 0.5) AS BIGINT) AS x
      FROM s, range(8) r(i)
    ),
    cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
    lin AS (SELECT i, CAST(SUM(x) AS BIGINT) AS sx FROM q GROUP BY i),
    cr AS (
      SELECT a.i AS i, b.i AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS sxy
      FROM q a JOIN q b ON a.vec_id = b.vec_id
      GROUP BY 1, 2
    ),
    cm AS (
      SELECT cr.i, cr.j,
             CAST(n * sxy - la.sx * lb.sx AS DOUBLE)
               / CAST(n * n * 10000 AS DOUBLE) AS c
      FROM cr JOIN lin la ON la.i = cr.i JOIN lin lb ON lb.i = cr.j
      CROSS JOIN cnt
    ),
    crow AS (SELECT i, list(c ORDER BY j) AS row FROM cm GROUP BY i),
    w0 AS (SELECT list_transform(range(8), x -> 1.0 / sqrt(8.0)) AS w),"""
    + ",".join(_PCA_ITER.format(i=i, prev=i - 1) for i in range(1, 9))
    + """,
    ws AS (
      SELECT CASE WHEN list_dot_product(w, list_transform(range(8), x -> 1.0)) < 0
             THEN list_transform(w, x -> -x) ELSE w END AS w
      FROM w8
    ),
    mn AS (
      SELECT list(md ORDER BY i) AS m FROM (
        SELECT i, CAST(sx AS DOUBLE) / CAST(n * 100 AS DOUBLE) AS md
        FROM lin CROSS JOIN cnt)
    ),
    off AS (SELECT list_dot_product(mn.m, ws.w) AS o FROM mn CROSS JOIN ws)
    SELECT s.vec_id, list_dot_product(s.v, ws.w) - off.o AS pc0
    FROM s CROSS JOIN ws CROSS JOIN off
    """
)


@query(
    "x_embedding_pca",
    sql=_PCA_SQL,
    note="PCA projection, hash-checked end to end: exact-integer "
    "covariance fit (one distributed mapInPandas pass) -> driver-side "
    "power iteration written as explicit index-ordered left folds "
    "(bit-identical to the SQL twin's unrolled list_dot_product CTEs) "
    "-> broadcast component, narrow JVM fold projection. The production "
    "dim=64/k=2 QR path (pca_project) stays pytest-pinned against "
    "numpy.linalg.eigh; this graded witness proves the distributed fit "
    "and projection halves across engines",
)
def x_embedding_pca(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import pca_power_project

    emb = t(spark, sf_dir, "embeddings")
    return pca_power_project(emb, dim=8, n_iter=8)


@query(
    "x_multimodal_palette_png_decode",
    sql="""
    WITH px AS (
      SELECT doc_id, p,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':pix'
                                     || CAST(p // 32 AS VARCHAR)),
                                 (p % 32) + 1, 1) AS INT) AS idx
      FROM documents, range(256) t(p)
    ), pc AS (
      SELECT doc_id, p, c,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':plt'
                                     || CAST((3 * idx + c) // 16 AS VARCHAR)),
                                 2 * ((3 * idx + c) % 16) + 1, 2) AS INT) AS b
      FROM px, range(3) u(c)
    )
    SELECT doc_id AS media_id,
           CAST(3 AS INTEGER) AS channels,
           CAST(16 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height,
           CAST(SUM(CASE WHEN c = 0 THEN b ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(SUM(CASE WHEN c = 1 THEN b ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN c = 2 THEN b ELSE 0 END) AS BIGINT) AS sum_b,
           CAST(MIN(b) AS INTEGER) AS min_byte,
           CAST(MAX(b) AS INTEGER) AS max_byte
    FROM pc GROUP BY doc_id
    """,
    note="REAL indexed-color PNG round-trip: md5-derived 4-bit indices and "
    "a 16-entry md5-derived RGB palette encode into a genuine PLTE+packed-"
    "IDAT PNG (filters cycling 0-4 over the PACKED bytes, bpp=1), the "
    "chunk-walk decoder unfilters, unpacks nibbles MSB-first, and expands "
    "through the palette; the oracle recomputes every palette-mapped byte "
    "from the construction — closes the palette-PNG guard the r4 verdict "
    "flagged",
)
def x_multimodal_palette_png_decode(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import extract_features, wrap_png_palette

    docs = t(spark, sf_dir, "documents")

    def md5hex(tag):
        return F.md5(
            F.encode(F.concat(F.col("doc_id").cast("string"), F.lit(tag)), "UTF-8")
        )

    pixhex = F.concat(*[md5hex(f":pix{j}") for j in range(8)])  # 256 nibbles
    idx_bytes = F.unhex(F.regexp_replace(pixhex, "(.)", "0$1"))  # 1 byte/idx
    palette = F.unhex(F.concat(*[md5hex(f":plt{j}") for j in range(3)]))  # 48 B
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(idx_bytes, palette).alias("content"),
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit(16).alias("width"),
            F.lit(16).alias("height"),
            F.lit(304).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )
    feats = extract_features(wrap_png_palette(media, 16, 16, depth=4), fake=False)
    f = F.col("feature")
    return feats.select(
        "media_id",
        f[0].cast("int").alias("channels"),
        f[1].cast("int").alias("width"),
        f[2].cast("int").alias("height"),
        f[3].cast("bigint").alias("sum_r"),
        f[4].cast("bigint").alias("sum_g"),
        f[5].cast("bigint").alias("sum_b"),
        f[6].cast("int").alias("min_byte"),
        f[7].cast("int").alias("max_byte"),
    )


_JPEG_DC_SQL = """
    WITH g AS (
      SELECT doc_id, t,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':jpg'),
                                 2 * t + 1, 2) AS INT) AS gv
      FROM documents, range(4) r(t)
    ), v AS (
      SELECT doc_id,
             LEAST(255, GREATEST(0,
               2 * (CASE WHEN gv >= 128 THEN (gv - 128 + 1) // 2
                         ELSE -((128 - gv + 1) // 2) END) + 128)) AS pv
      FROM g
    )
    SELECT doc_id AS media_id,
           CAST(1 AS INTEGER) AS channels,
           CAST(16 AS INTEGER) AS width,
           CAST(16 AS INTEGER) AS height,
           CAST(64 * SUM(pv) AS BIGINT) AS sum_pix,
           CAST(MIN(pv) AS INTEGER) AS min_pix,
           CAST(MAX(pv) AS INTEGER) AS max_pix
    FROM v GROUP BY doc_id
    """


def _jpeg_tile_media(spark, sf_dir):
    """Shared 16x16 four-flat-tile construction for the JPEG entries."""
    docs = t(spark, sf_dir, "documents")
    md5hex = F.md5(
        F.encode(F.concat(F.col("doc_id").cast("string"), F.lit(":jpg")), "UTF-8")
    )
    tiles = [F.unhex(F.substring(md5hex, 2 * i + 1, 2)) for i in range(4)]
    row_top = F.concat(*([tiles[0]] * 8 + [tiles[1]] * 8))
    row_bot = F.concat(*([tiles[2]] * 8 + [tiles[3]] * 8))
    pix = F.concat(*([row_top] * 8 + [row_bot] * 8))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        pix.alias("content"),
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            F.lit(16).alias("width"),
            F.lit(16).alias("height"),
            F.lit(256).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _jpeg_features_projection(feats):
    f = F.col("feature")
    return feats.select(
        "media_id",
        f[0].cast("int").alias("channels"),
        f[1].cast("int").alias("width"),
        f[2].cast("int").alias("height"),
        f[3].cast("bigint").alias("sum_pix"),
        f[6].cast("int").alias("min_pix"),
        f[7].cast("int").alias("max_pix"),
    )


@query(
    "x_multimodal_jpeg_decode",
    sql=_JPEG_DC_SQL,
    note="REAL baseline-JPEG round-trip: four md5-derived flat 8x8 gray "
    "tiles encode into a genuine JFIF stream (Annex K tables, Huffman DC "
    "diff coding across tiles, EOB-coded AC) and the stdlib+numpy decoder "
    "parses markers, entropy-decodes, dequantizes, and runs the real IDCT "
    "back to pixels. Flat tiles quantize to DC-only blocks, whose decode "
    "is EXACT integer math — v = clamp(2*rha((g-128)/2) + 128) with q00=16 "
    "— so the oracle reproduces the lossy codec's output bit-for-bit; "
    "gradient/color/subsampled/restart paths are pinned by pytest "
    "(tests/test_multimodal_jpeg.py)",
)
def x_multimodal_jpeg_decode(spark, sf_dir):
    from flnr_wins_spark.functions.jpeg import wrap_jpeg
    from flnr_wins_spark.functions.multimodal import extract_features

    media = _jpeg_tile_media(spark, sf_dir)
    return _jpeg_features_projection(
        extract_features(wrap_jpeg(media, 1, 16, 16), fake=False)
    )


@query(
    "x_multimodal_jpeg_progressive",
    sql=_JPEG_DC_SQL,
    note="PROGRESSIVE (SOF2) JPEG round-trip on the same DC-only "
    "construction as x_multimodal_jpeg_decode: the multi-scan stream "
    "(interleaved DC first at Al=1, DC refinement bits, spectral AC "
    "bands with cross-block EOB runs, AC refinement walk) must "
    "reconstruct the very coefficients the integer oracle predicts — "
    "driver-graded evidence for the progressive decode path, not just "
    "pytest's baseline-equality pins",
)
def x_multimodal_jpeg_progressive(spark, sf_dir):
    from flnr_wins_spark.functions.jpeg import wrap_jpeg_progressive
    from flnr_wins_spark.functions.multimodal import extract_features

    media = _jpeg_tile_media(spark, sf_dir)
    return _jpeg_features_projection(
        extract_features(wrap_jpeg_progressive(media, 1, 16, 16), fake=False)
    )


# x_rag_retrieve: the end-to-end retrieval composition a RAG corpus build
# runs — chunk the corpus into overlapping context windows, embed every
# chunk with the vocabulary-free hashing trick, embed the query the same
# way, retrieve top-k chunks by exact cosine. Every stage is an existing
# registry operator (chunk_documents + feature_hash_embed +
# brute_force_topk); the oracle reproduces chunking, token signs, integer
# component sums, and the cosine ranking — so the whole pipeline, not just
# its pieces, is hash-checked.
_RAG_SQL = """
    WITH s AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    c AS (SELECT doc_id, tk,
                 CAST(1 + ceil(greatest(len(tk) - 64, 0) / 48.0) AS INT) AS nc
          FROM s),
    chunks AS (
      SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(k AS VARCHAR) AS cid,
             list_slice(tk, k * 48 + 1, k * 48 + 64) AS ctk
      FROM c, UNNEST(range(0, nc)) u(k)
    ),
    ctoks AS (
      SELECT cid, t FROM (SELECT cid, unnest(ctk) AS t FROM chunks) WHERE t <> ''
    ),
    cvec AS (
      SELECT cid, d, CAST(SUM(CASE WHEN substr(md5(t || ':fh42:' || CAST(d AS VARCHAR)), 32, 1)
                                    IN ('1','3','5','7','9','b','d','f')
                               THEN 1 ELSE -1 END) AS BIGINT) AS v
      FROM ctoks, UNNEST(range(0, 8)) u(d) GROUP BY cid, d
    ),
    qtoks AS (SELECT unnest(['slow', 'hash', 'batch', 'merge']) AS t),
    qvec AS (
      SELECT d, CAST(SUM(CASE WHEN substr(md5(t || ':fh42:' || CAST(d AS VARCHAR)), 32, 1)
                               IN ('1','3','5','7','9','b','d','f')
                          THEN 1 ELSE -1 END) AS BIGINT) AS s
      FROM qtoks, UNNEST(range(0, 8)) u(d) GROUP BY d
    ),
    dots AS (
      SELECT cid,
             CAST(SUM(v * s) AS DOUBLE) AS dot,
             sqrt(CAST(SUM(v * v) AS DOUBLE)) AS nc
      FROM cvec JOIN qvec USING (d) GROUP BY cid
    ),
    nq AS (SELECT sqrt(CAST(SUM(s * s) AS DOUBLE)) AS nq FROM qvec)
    SELECT cid AS cand_id, cosine, CAST(rn AS BIGINT) AS rank FROM (
      SELECT cid, dot / (nq.nq * nc) AS cosine,
             ROW_NUMBER() OVER (ORDER BY dot / (nq.nq * nc) DESC, cid) AS rn
      FROM dots CROSS JOIN nq)
    WHERE rn <= 5
"""


@query(
    "x_rag_retrieve",
    sql=_RAG_SQL,
    note="RAG retrieval composition, hash-checked end-to-end: 64-token "
    "overlap-16 chunking -> hashing-trick embedding (vocab-free ±1 md5 "
    "signs, integer components) -> exact cosine top-5 for the query. "
    "Chunk/embed are narrow+id-keyed; the query vector broadcasts",
)
def x_rag_retrieve(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import brute_force_topk, feature_hash_embed
    from flnr_wins_spark.operators.packing import chunk_documents

    docs = t(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, "text", "doc_id", chunk_tokens=64, overlap=16).select(
        F.concat_ws(":", F.col("doc_id"), F.col("chunk_idx")).alias("cid"),
        F.col("chunk_text"),
    )
    cemb = feature_hash_embed(chunks, text_col="chunk_text", id_col="cid")
    from flnr_wins_spark.localrel import local_df

    qdf = local_df(spark, [("q", "slow hash batch merge")], "cid string, chunk_text string")
    qemb = feature_hash_embed(qdf, text_col="chunk_text", id_col="cid")
    top = brute_force_topk(qemb, cemb, k=5, query_id="id", cand_id="id", vec_col="emb")
    return top.select("cand_id", "cosine", "rank")


# x_bpe_train oracle: each unrolled round recounts pairs from the previous
# symbol table, picks the argmax (cnt DESC, a, b), and applies the merge
# with the IDENTICAL delimited-string left fold (DuckDB list_reduce ==
# Spark aggregate), so counts, argmax AND merge application are all
# hash-checked.
def _bpe_round_sql(i: int) -> str:
    p = i - 1
    return f"""
    p{i} AS (
      SELECT tk[i] AS a, tk[i + 1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(sy, '_') AS tk FROM s{p}),
           UNNEST(range(1, greatest(len(tk), 1))) u(i)
      GROUP BY 1, 2
    ),
    t{i} AS (SELECT {i} AS round, a, b, cnt FROM p{i}
             ORDER BY cnt DESC, a, b LIMIT 1),
    s{i} AS (
      SELECT freq,
             list_reduce(string_split(sy, '_'), (acc, s) ->
               CASE WHEN (acc = t{i}.a OR ends_with(acc, '_' || t{i}.a))
                         AND s = t{i}.b
                    THEN substr(acc, 1, len(acc) - len(t{i}.a)) || t{i}.a || t{i}.b
                    ELSE acc || '_' || s END) AS sy
      FROM s{p} CROSS JOIN t{i}
    )"""


@query(
    "x_bpe_train",
    sql=f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '),
                                t -> t <> '' AND NOT contains(t, '_'))) AS w
      FROM documents
    ),
    words AS (SELECT w, COUNT(*) AS freq FROM toks GROUP BY w),
    s0 AS (
      SELECT freq,
             array_to_string(list_transform(range(1, len(w) + 1),
                                            i -> substr(w, i, 1)), '_') AS sy
      FROM words
    ),
    {_bpe_round_sql(1)},
    {_bpe_round_sql(2)},
    {_bpe_round_sql(3)}
    SELECT CAST(round AS INTEGER) AS round, a, b, cnt FROM (
      SELECT * FROM t1 UNION ALL SELECT * FROM t2 UNION ALL SELECT * FROM t3)
    """,
    note="distributed BPE tokenizer training (3 unrolled merge rounds, "
    "Sennrich et al.): corpus collapses to the (word, freq) vocabulary "
    "first, then each round is a map-side pair count, a 1-row TakeOrdered "
    "argmax, and a broadcast merge applied by a delimited-string left fold "
    "— counts, argmax and merge application all hash-checked",
)
def x_bpe_train(spark, sf_dir):
    from flnr_wins_spark.functions.text import bpe_train

    return bpe_train(t(spark, sf_dir, "documents"), rounds=3)


@query(
    "x_pit_join",
    sql="""
    SELECT event_id, user_id,
           CAST((user_id + least((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01'))
                                 // CAST(604800000000 AS BIGINT), 3)) % 3
                AS INTEGER) AS tier_at_event
    FROM events
    """,
    note="point-in-time (feature-store) join: events attach the SCD2 "
    "dimension version valid AT event time via the as-of operator (weekly "
    "tier versions per user). The oracle re-derives the expected tier "
    "arithmetically from the version schedule — an independent witness of "
    "temporal-correctness (no lookahead, no stale match)",
)
def x_pit_join(spark, sf_dir):
    from flnr_wins_spark.operators.asof import asof_join

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    dim = (
        ev.select("user_id")
        .distinct()
        .select("user_id", F.explode(F.expr("sequence(0, 3)")).alias("k"))
        .select(
            "user_id",
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("k") * 7).cast("int"))
            .cast("timestamp_ntz")
            .alias("valid_from"),
            ((F.col("user_id") + F.col("k")) % 3).cast("int").alias("tier"),
        )
    )
    out = asof_join(
        ev,
        dim,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="valid_from",
        value_col="tier",
        out_col="tier_at_event",
    )
    return out.select("event_id", "user_id", "tier_at_event")


@query(
    "x_compaction_plan",
    sql="""
    WITH files AS (
      SELECT l_returnflag AS dir, CAST(l_orderkey % 100 AS BIGINT) AS file_id,
             CAST(SUM(CAST(l_quantity AS INTEGER)) AS BIGINT) AS bytes
      FROM lineitem GROUP BY 1, 2
    )
    SELECT dir, file_id, bytes,
           CAST((SUM(bytes) OVER (PARTITION BY dir ORDER BY file_id
                                  ROWS UNBOUNDED PRECEDING) - bytes) // 500
                AS BIGINT) AS task
    FROM files
    """,
    note="small-file compaction planning (the table-maintenance op a "
    "100 TB lakehouse runs nightly): per partition directory, files pack "
    "into ~target-sized merge tasks by running-size binning — window keyed "
    "on the directory, never a single-partition global sort",
)
def x_compaction_plan(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    files = li.groupBy(
        F.col("l_returnflag").alias("dir"),
        (F.col("l_orderkey") % 100).cast("bigint").alias("file_id"),
    ).agg(F.sum(F.col("l_quantity").cast("int")).cast("bigint").alias("bytes"))
    w = (
        Window.partitionBy("dir")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    task = ((F.sum("bytes").over(w) - F.col("bytes")) / 500).cast("bigint")
    return files.select("dir", "file_id", "bytes", task.alias("task"))


@query(
    "x_multimodal_gif_decode",
    sql="""
    WITH b AS (
      SELECT doc_id, p,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':gx' || CAST(p // 16 AS VARCHAR)),
                                 2 * (p % 16) + 1, 2) AS INT) AS idx
      FROM documents, range(64) t(p)
    ),
    px AS (
      SELECT doc_id, idx AS r, (idx * 7) % 256 AS g, (idx * 13) % 256 AS bl
      FROM b
    )
    SELECT doc_id AS media_id,
           CAST(3 AS INTEGER) AS channels,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(SUM(r) AS BIGINT) AS sum_r,
           CAST(SUM(g) AS BIGINT) AS sum_g,
           CAST(SUM(bl) AS BIGINT) AS sum_b,
           CAST(MIN(LEAST(r, g, bl)) AS INTEGER) AS min_byte,
           CAST(MAX(GREATEST(r, g, bl)) AS INTEGER) AS max_byte
    FROM px GROUP BY doc_id
    """,
    note="REAL GIF round-trip: known md5-derived 8x8 palette indices are "
    "LZW-compressed (genuine dictionary-building encoder) into a GIF89a — "
    "odd ids additionally INTERLACED (four-pass appendix-E stream order) "
    "with a LOCAL color table, even ids progressive/global — then the "
    "stdlib decoder walks blocks, inflates the variable-width LZW stream, "
    "deinterleaves where flagged, and maps the arithmetic (i, 7i, 13i) "
    "palette; the oracle recomputes expected RGB sums from the "
    "construction — compression, width growth, interlace scatter, "
    "local-table override, and palette mapping all value-checked",
)
def x_multimodal_gif_decode(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import extract_features, wrap_gif

    docs = t(spark, sf_dir, "documents")
    idx = F.concat(
        *[
            F.unhex(
                F.md5(
                    F.encode(
                        F.concat(F.col("doc_id").cast("string"), F.lit(f":gx{j}")),
                        "UTF-8",
                    )
                )
            )
            for j in range(4)
        ]
    )
    palette = b"".join(bytes([i, (i * 7) % 256, (i * 13) % 256]) for i in range(256))
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        idx.alias("content"),
        F.struct(
            F.lit("image/gif").alias("mime"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(64).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )
    # odd ids ship INTERLACED with a LOCAL color table (no global), even
    # ids progressive with the global table — decode output is identical
    # by construction, so one unchanged oracle value-checks the
    # deinterleave scatter and the local-table override (r13: these were
    # honest NotImplementedError guards; now real decode paths)
    plain = wrap_gif(media.filter(F.col("media_id") % 2 == 0), 8, 8, palette)
    fancy = wrap_gif(
        media.filter(F.col("media_id") % 2 == 1), 8, 8, palette,
        interlace=True, local_palette=True,
    )
    feats = extract_features(plain.unionByName(fancy), fake=False)
    f = F.col("feature")
    return feats.select(
        "media_id",
        f[0].cast("int").alias("channels"),
        f[1].cast("int").alias("width"),
        f[2].cast("int").alias("height"),
        f[3].cast("bigint").alias("sum_r"),
        f[4].cast("bigint").alias("sum_g"),
        f[5].cast("bigint").alias("sum_b"),
        f[6].cast("int").alias("min_byte"),
        f[7].cast("int").alias("max_byte"),
    )


# 44-byte RIFF/WAVE header for G.711 mu-law mono 8 kHz (format code 7,
# 8 bits/sample) with a 32-byte data chunk.
_MULAW_HDR_HEX = (
    "524946463c00000057415645666d7420100000000700"
    "0100401f0000401f0000010008006461746120000000"
)


@query(
    "x_multimodal_adpcm_decode",
    sql="""
    WITH v AS (
      SELECT doc_id, b,
             CAST(CASE WHEN lo + 256 * hi >= 32768
                       THEN lo + 256 * hi - 65536
                       ELSE lo + 256 * hi END AS INT) AS val
      FROM (
        SELECT doc_id, b,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ad'),
                                   4 * b + 1, 2) AS INT) AS lo,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ad'),
                                   4 * b + 3, 2) AS INT) AS hi
        FROM documents, range(8) t(b))
    ), lagged AS (
      SELECT doc_id, val, LAG(val) OVER (PARTITION BY doc_id ORDER BY b) AS pv
      FROM v
    )
    SELECT doc_id AS media_id,
           CAST(1 AS INTEGER) AS channels,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(72 AS INTEGER) AS n_samples,
           CAST(9 * SUM(val) AS BIGINT) AS sum_s,
           CAST(MIN(val) AS INTEGER) AS min_s,
           CAST(MAX(val) AS INTEGER) AS max_s,
           CAST(9 * SUM(ABS(val)) AS BIGINT) AS sum_abs,
           CAST(SUM(CASE WHEN val * pv < 0 THEN 1 ELSE 0 END) AS INTEGER)
             AS zero_crossings
    FROM lagged GROUP BY doc_id
    """,
    note="REAL IMA-ADPCM (DVI 4-bit) audio round-trip: md5-derived int16 "
    "block constants encode through the genuine nibble-quantizer state "
    "machine and decode back through the full table-driven expansion; "
    "constant blocks decode BIT-EXACTLY (zero nibbles at step index 0 "
    "have diff 7>>3 = 0), so the oracle predicts every sample — the "
    "adaptive-codec twin of the mu-law entry; sloped-signal behavior is "
    "pinned by pytest bounds",
)
def x_multimodal_adpcm_decode(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import (
        extract_audio_features,
        wrap_wav_adpcm,
    )

    docs = t(spark, sf_dir, "documents")
    payload = F.unhex(
        F.md5(
            F.encode(F.concat(F.col("doc_id").cast("string"), F.lit(":ad")), "UTF-8")
        )
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("content"),
        F.struct(
            F.lit("audio/adpcm").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )
    feats = extract_audio_features(wrap_wav_adpcm(media, samples_per_block=9))
    f = F.col("feature")
    return feats.select(
        "media_id",
        f[0].cast("int").alias("channels"),
        f[1].cast("int").alias("sample_rate"),
        f[2].cast("int").alias("n_samples"),
        f[3].cast("bigint").alias("sum_s"),
        f[4].cast("int").alias("min_s"),
        f[5].cast("int").alias("max_s"),
        f[6].cast("bigint").alias("sum_abs"),
        f[7].cast("int").alias("zero_crossings"),
    )


@query(
    "x_multimodal_mulaw_decode",
    sql="""
    WITH b AS (
      SELECT doc_id, p,
             255 - CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mu' || CAST(p // 16 AS VARCHAR)),
                                       2 * (p % 16) + 1, 2) AS INT) AS u
      FROM documents, range(32) t(p)
    ),
    sv AS (
      SELECT doc_id, p,
             CASE WHEN u >= 128 THEN -1 ELSE 1 END
               * ((((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132) AS v
      FROM b
    ),
    lagged AS (
      SELECT doc_id, v, LAG(v) OVER (PARTITION BY doc_id ORDER BY p) AS pv
      FROM sv
    )
    SELECT doc_id AS media_id,
           CAST(1 AS INTEGER) AS channels,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(32 AS INTEGER) AS n_samples,
           CAST(SUM(v) AS BIGINT) AS sum_s,
           CAST(MIN(v) AS INTEGER) AS min_s,
           CAST(MAX(v) AS INTEGER) AS max_s,
           CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
           CAST(SUM(CASE WHEN v * pv < 0 THEN 1 ELSE 0 END) AS INTEGER)
             AS zero_crossings
    FROM lagged GROUP BY doc_id
    """,
    note="REAL G.711 mu-law audio decode: format-7 RIFF/WAVE with md5-derived "
    "mu-law bytes, expanded to linear PCM16 by the ITU integer formula "
    "(complement, sign/exponent/mantissa reconstruct); the oracle recomputes "
    "expected samples arithmetically — the compressed-audio twin of the "
    "PCM16 entry",
)
def x_multimodal_mulaw_decode(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import extract_audio_features

    docs = t(spark, sf_dir, "documents")
    payload = F.concat(
        *[
            F.unhex(
                F.md5(
                    F.encode(
                        F.concat(F.col("doc_id").cast("string"), F.lit(f":mu{j}")),
                        "UTF-8",
                    )
                )
            )
            for j in range(2)
        ]
    )
    content = F.concat(F.unhex(F.lit(_MULAW_HDR_HEX.replace("\n", ""))), payload)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit("audio/basic").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(content).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )
    feats = extract_audio_features(media)
    f = F.col("feature")
    return feats.select(
        "media_id",
        f[0].cast("int").alias("channels"),
        f[1].cast("int").alias("sample_rate"),
        f[2].cast("int").alias("n_samples"),
        f[3].cast("bigint").alias("sum_s"),
        f[4].cast("int").alias("min_s"),
        f[5].cast("int").alias("max_s"),
        f[6].cast("bigint").alias("sum_abs"),
        f[7].cast("int").alias("zero_crossings"),
    )


@query(
    "x_multimodal_video_frames",
    sql="""
    WITH f AS (SELECT doc_id, k FROM documents, UNNEST([0, 2]) t(k)),
    b AS (
      SELECT doc_id, k, p,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':vf' || CAST(k AS VARCHAR)),
                                 2 * (p % 16) + 1, 2) AS INT) AS idx
      FROM f, range(16) u(p)
    )
    SELECT doc_id AS media_id,
           CAST(k AS INTEGER) AS frame_idx,
           CAST(4 AS INTEGER) AS n_frames,
           CAST(SUM(idx) AS BIGINT) AS sum_r,
           CAST(SUM((idx * 7) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((idx * 13) % 256) AS BIGINT) AS sum_b
    FROM b GROUP BY doc_id, k
    """,
    note="REAL video-style frame sampling: a genuine 4-frame animated GIF "
    "(NETSCAPE loop + per-frame LZW) is decoded frame-by-frame and frames "
    "0 and 2 emit integer-exact channel sums — upgrades the fake "
    "frame-sampler fan-out to a real multi-frame container; odd ids ship "
    "partial-update delta frames (bounding rect + transparency, disposal "
    "1) composed over the canvas, output-identical by construction; "
    "oracle recomputes expected pixels from the construction",
)
def x_multimodal_video_frames(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import (
        gif_frame_features,
        wrap_gif_animated,
    )

    docs = t(spark, sf_dir, "documents")
    idx = F.concat(
        *[
            F.unhex(
                F.md5(
                    F.encode(
                        F.concat(F.col("doc_id").cast("string"), F.lit(f":vf{k}")),
                        "UTF-8",
                    )
                )
            )
            for k in range(4)
        ]
    )
    palette = b"".join(bytes([i, (i * 7) % 256, (i * 13) % 256]) for i in range(256))
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        idx.alias("content"),
        F.struct(
            F.lit("image/gif").alias("mime"),
            F.lit(4).alias("width"),
            F.lit(4).alias("height"),
            F.lit(64).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )
    # odd ids ship frames 1..3 as PARTIAL-UPDATE bounding-rect deltas with
    # transparency (disposal 1) — the composition canvas reproduces the
    # full frames exactly by construction, so the UNCHANGED oracle
    # value-checks the r14 composition paths; even ids stay full-frame
    full = wrap_gif_animated(
        media.filter(F.col("media_id") % 2 == 0), 4, 4, 4, palette
    )
    deltas = wrap_gif_animated(
        media.filter(F.col("media_id") % 2 == 1), 4, 4, 4, palette, delta=True
    )
    return gif_frame_features(full.unionByName(deltas), sample=[0, 2])


@query(
    "x_pandas_udaf_median",
    sql="""
    WITH r AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n
      FROM events
    )
    SELECT user_id, value AS med_low
    FROM r WHERE rn = (n - 1) // 2 + 1
    """,
    note="custom UDAF surface (the one §2c gap Spark fills natively): an "
    "Arrow-batched GROUPED_AGG pandas UDF computing the exact lower median "
    "— selection, not interpolation, so the value is a real data point and "
    "the oracle reproduces it by rank. Plans as AggregateInPandas (Arrow "
    "transfer, partial-agg shuffle on the group key); the sanctioned "
    "Python escape hatch, never row-at-a-time",
)
def x_pandas_udaf_median(spark, sf_dir):
    from flnr_wins_spark.functions.text import median_low_udaf

    median_low = median_low_udaf()
    ev = t(spark, sf_dir, "events")
    # NB: Spark disallows mixing a GROUPED_AGG pandas UDF with JVM
    # aggregates in one agg() — the UDAF stands alone
    return ev.groupBy("user_id").agg(median_low(F.col("value")).alias("med_low"))


@query(
    "x_sorted_neighborhood",
    sql=f"""
    WITH titles AS ({_TITLES_SQL}),
    variants AS ({_DIRTY_TITLES_SQL}),
    u AS (
      SELECT 0 AS src, t_id AS id, title AS k FROM titles
      UNION ALL
      SELECT 1 AS src, v_id AS id, v_name AS k FROM variants
    ),
    r AS (SELECT src, id, k, row_number() OVER (ORDER BY k, src, id) AS rn FROM u)
    SELECT a.id AS t_id, b.id AS v_id,
           CAST(abs(a.rn - b.rn) AS BIGINT) AS pos_gap,
           CAST(levenshtein(a.k, b.k) AS BIGINT) AS dist
    FROM r a JOIN r b ON a.src = 0 AND b.src = 1 AND abs(a.rn - b.rn) <= 5
    WHERE levenshtein(a.k, b.k) <= 2
    """,
    note="sorted-neighborhood linkage (Hernandez-Stolfo): global sort rank "
    "via range-shard global_row_number (NO single-partition window), "
    "neighbors meet through an equi-join on rn div w with ±1 block "
    "replication — the complementary blocking pass to x_fuzzy_join's "
    "prefix blocks; the oracle's quadratic |rn diff|<=w form is equivalent "
    "by construction",
)
def x_sorted_neighborhood(spark, sf_dir):
    from flnr_wins_spark.operators.linkage import sorted_neighborhood

    titles, variants = _titles_and_variants(spark, sf_dir)
    return sorted_neighborhood(
        titles, variants, "t_id", "title", "v_id", "v_name", window=5, max_dist=2
    )


@query(
    "x_keywords_tfidf",
    sql="""
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    w AS (
      SELECT id, term,
             CAST(CAST(tf * ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE))
                       AS DECIMAL(27,9)) AS DOUBLE) AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN nd
    )
    SELECT id AS doc_id, term, score, CAST(rn AS INT) AS kw_rank FROM (
      SELECT id, term, score,
             row_number() OVER (PARTITION BY id ORDER BY score DESC, term) AS rn
      FROM w WHERE score > 0
    ) q WHERE rn <= 3
    """,
    note="per-document top-3 TF-IDF keywords: df over the pre-aggregated "
    "(doc, term) table, decimal-rounded ln for engine-exact scores, per-doc "
    "rank window bounded by document vocabulary "
    "(functions/text.py tfidf_keywords)",
)
def x_keywords_tfidf(spark, sf_dir):
    from flnr_wins_spark.functions.text import tfidf_keywords

    return tfidf_keywords(t(spark, sf_dir, "documents"), k=3)


def _maxmatch_oracle_sql(
    top_words: int = 200,
    max_token_len: int = 8,
    max_word_len: int = 16,
    top_k: int = 50,
) -> str:
    """Fixed-unroll SQL twin of functions/text.py maxmatch_token_counts:
    max_word_len greedy rounds, each MATERIALIZED (the kcore lesson — the
    round CTEs reference their predecessor multiple times and would inline
    exponentially)."""
    rounds = max_word_len
    ctes = [
        """occ AS MATERIALIZED (
          SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    t -> t <> '')) AS w0
          FROM documents)""",
        f"""wc AS MATERIALIZED (
          SELECT substr(w0, 1, {max_word_len}) AS w, CAST(COUNT(*) AS BIGINT) AS n
          FROM occ GROUP BY 1)""",
        f"""top AS MATERIALIZED (
          SELECT w AS tok FROM (
            SELECT w, row_number() OVER (ORDER BY n DESC, w) AS rn
            FROM wc WHERE len(w) <= {max_token_len}) q
          WHERE rn <= {top_words})""",
        """chars AS MATERIALIZED (
          SELECT DISTINCT substr(w, CAST(i AS INT), 1) AS tok
          FROM wc, UNNEST(range(1, len(w) + 1)) u(i))""",
        "vocab AS MATERIALIZED (SELECT tok FROM top UNION SELECT tok FROM chars)",
        "s0 AS MATERIALIZED (SELECT w, 0 AS pos FROM wc)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"""b{i} AS MATERIALIZED (
              SELECT s.w, s.pos, CAST(MAX(u.L) AS INT) AS best
              FROM s{p} s, range(1, {max_token_len + 1}) u(L)
              WHERE s.pos + u.L <= len(s.w)
                AND substr(s.w, s.pos + 1, CAST(u.L AS INT)) IN (SELECT tok FROM vocab)
              GROUP BY s.w, s.pos)"""
        )
        ctes.append(
            f"t{i} AS MATERIALIZED (SELECT w, substr(w, pos + 1, best) AS tok FROM b{i})"
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT w, pos + best AS pos FROM b{i} "
            f"WHERE pos + best < len(w))"
        )
    union = " UNION ALL ".join(f"SELECT w, tok FROM t{i}" for i in range(1, rounds + 1))
    return (
        "WITH "
        + ", ".join(ctes)
        + f""", wt AS ({union})
        SELECT tok, total FROM (
          SELECT wt.tok, CAST(SUM(wc.n) AS BIGINT) AS total,
                 row_number() OVER (ORDER BY SUM(wc.n) DESC, wt.tok) AS rn
          FROM wt JOIN wc USING (w) GROUP BY wt.tok) q
        WHERE rn <= {top_k}"""
    )


@query(
    "x_tokenize_maxmatch",
    sql=_maxmatch_oracle_sql(),
    note="greedy longest-match-first (MaxMatch/WordPiece-core) subword "
    "tokenization with a corpus-derived deterministic vocab (top-200 words "
    "+ char fallback): tokenizes the DISTINCT-word table (global "
    "memoization — a 100 TB corpus has a bounded word vocabulary), each "
    "round explodes <=8 candidate prefix lengths against a broadcast "
    "vocab and keeps MAX(len); per-corpus counts return via one join to "
    "the word-count table. Oracle = 16 fixed-unroll greedy rounds",
    bench=True,
)
def x_tokenize_maxmatch(spark, sf_dir):
    from flnr_wins_spark.functions.text import maxmatch_token_counts

    return maxmatch_token_counts(t(spark, sf_dir, "documents"))


def _optseg_oracle_sql(
    top_words: int = 200,
    max_token_len: int = 8,
    max_word_len: int = 16,
    top_k: int = 200,
) -> str:
    """Fixed-unroll SQL twin of functions/text.py optimal_segment_stats:
    BFS over (word, pos) in max_word_len materialized rounds; a word's
    n_pieces is the FIRST (minimum) round that reaches pos == len(w).
    Unlike the Spark side there is no visited-pruning — re-reached states
    just add redundant rows (positions are bounded by word length) and
    MIN(round) restores the identical BFS answer."""
    rounds = max_word_len
    ctes = [
        """occ AS MATERIALIZED (
          SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                    t -> t <> '')) AS w0
          FROM documents)""",
        f"""wc AS MATERIALIZED (
          SELECT substr(w0, 1, {max_word_len}) AS w, CAST(COUNT(*) AS BIGINT) AS n
          FROM occ GROUP BY 1)""",
        f"""top AS MATERIALIZED (
          SELECT w AS tok FROM (
            SELECT w, row_number() OVER (ORDER BY n DESC, w) AS rn
            FROM wc WHERE len(w) <= {max_token_len}) q
          WHERE rn <= {top_words})""",
        """chars AS MATERIALIZED (
          SELECT DISTINCT substr(w, CAST(i AS INT), 1) AS tok
          FROM wc, UNNEST(range(1, len(w) + 1)) u(i))""",
        "vocab AS MATERIALIZED (SELECT tok FROM top UNION SELECT tok FROM chars)",
        "r0 AS MATERIALIZED (SELECT w, 0 AS pos FROM wc)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"""r{i} AS MATERIALIZED (
              SELECT DISTINCT s.w, s.pos + CAST(u.L AS INT) AS pos
              FROM r{p} s, range(1, {max_token_len + 1}) u(L)
              WHERE s.pos < len(s.w) AND s.pos + u.L <= len(s.w)
                AND substr(s.w, s.pos + 1, CAST(u.L AS INT)) IN (SELECT tok FROM vocab))"""
        )
    fins = " UNION ALL ".join(
        f"SELECT w, {i} AS s FROM r{i} WHERE pos = len(w)"
        for i in range(1, rounds + 1)
    )
    return (
        "WITH "
        + ", ".join(ctes)
        + f""", fin AS ({fins}),
        np AS (SELECT w, CAST(MIN(s) AS INT) AS n_pieces FROM fin GROUP BY w)
        SELECT w, n_chars, n_pieces, n_occ FROM (
          SELECT np.w, CAST(len(np.w) AS INT) AS n_chars, np.n_pieces,
                 wc.n AS n_occ,
                 row_number() OVER (ORDER BY wc.n DESC, np.w) AS rn
          FROM np JOIN wc USING (w)) q
        WHERE rn <= {top_k}"""
    )


@query(
    "x_tokenize_optimal",
    sql=_optseg_oracle_sql(),
    note="OPTIMAL (minimal-piece) subword segmentation — the DP objective "
    "of unigram/WordPiece tokenizers beside x_tokenize_maxmatch's greedy "
    "heuristic, same corpus-derived vocab (top-200 words + char "
    "fallback). BFS shortest path over (word, pos) run as pure DataFrame "
    "rounds (frontier explode -> broadcast vocab join -> anti-join "
    "visited), memoized by distinct word; oracle = 16 fixed-unroll BFS "
    "rounds with MIN(first-finishing round)",
)
def x_tokenize_optimal(spark, sf_dir):
    from flnr_wins_spark.functions.text import optimal_segment_stats

    return optimal_segment_stats(t(spark, sf_dir, "documents"))


def _qoi_test_media(docs, tag_limit=None):
    """md5-derived 8x8 RGB pixels in EQUAL PAIRS, wrapped as media rows —
    ONE construction shared by the QOI round-trip and binaryFile-ingest
    entries; both oracles recompute bytes from exactly this rule."""
    h = F.concat(
        *[
            F.unhex(
                F.md5(
                    F.encode(
                        F.concat(F.col("doc_id").cast("string"), F.lit(f":qoi{j}")),
                        "UTF-8",
                    )
                )
            )
            for j in range(12)
        ]
    )
    pix = F.concat(*[F.substring(h, (i - i % 2) * 3 + 1, 3) for i in range(64)])
    return docs.select(
        F.col("doc_id").alias("media_id"),
        pix.alias("content"),
        F.struct(
            F.lit("image/qoi").alias("mime"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(192).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )



@query(
    "x_multimodal_qoi_decode",
    sql="""
    WITH b AS (
      SELECT doc_id, p,
             CAST('0x' || substr(
                    md5(CAST(doc_id AS VARCHAR) || ':qoi'
                        || CAST(((p // 3 - (p // 3) % 2) * 3 + p % 3) // 16 AS VARCHAR)),
                    2 * (((p // 3 - (p // 3) % 2) * 3 + p % 3) % 16) + 1, 2) AS INT)
               AS byte
      FROM documents, range(192) t(p)
    )
    SELECT doc_id AS media_id,
           CAST(3 AS INTEGER) AS channels,
           CAST(8 AS INTEGER) AS width,
           CAST(8 AS INTEGER) AS height,
           CAST(SUM(CASE WHEN p % 3 = 0 THEN byte ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(SUM(CASE WHEN p % 3 = 1 THEN byte ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN p % 3 = 2 THEN byte ELSE 0 END) AS BIGINT) AS sum_b,
           CAST(MIN(byte) AS INTEGER) AS min_byte,
           CAST(MAX(byte) AS INTEGER) AS max_byte
    FROM b GROUP BY doc_id
    """,
    note="REAL QOI round-trip (qoiformat.org spec): md5-derived 8x8 RGB "
    "pixels laid out in EQUAL PAIRS (so RUN ops genuinely trigger alongside "
    "RGB literals and incidental INDEX hits) are encoded into a real QOI "
    "stream and decoded back by the stdlib op-walk decoder; the oracle "
    "recomputes expected pixels from the construction — unit fuzz covers "
    "the DIFF/LUMA paths",
)
def x_multimodal_qoi_decode(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import extract_features, wrap_qoi

    docs = t(spark, sf_dir, "documents")
    media = _qoi_test_media(docs)
    feats = extract_features(wrap_qoi(media, 8, 8), fake=False)
    f = F.col("feature")
    return feats.select(
        "media_id",
        f[0].cast("int").alias("channels"),
        f[1].cast("int").alias("width"),
        f[2].cast("int").alias("height"),
        f[3].cast("bigint").alias("sum_r"),
        f[4].cast("bigint").alias("sum_g"),
        f[5].cast("bigint").alias("sum_b"),
        f[6].cast("int").alias("min_byte"),
        f[7].cast("int").alias("max_byte"),
    )


@query(
    "x_golden_record",
    sql=f"""
    WITH RECURSIVE titles AS ({_TITLES_SQL}),
    variants AS ({_DIRTY_TITLES_SQL}),
    ents AS (
      SELECT t_id AS id, title AS name FROM titles
      UNION ALL
      SELECT v_id AS id, v_name AS name FROM variants
    ),
    pairs AS (
      SELECT t_id AS id_a, v_id AS id_b
      FROM titles JOIN variants
        ON lower(substr(title, 1, 2)) = lower(substr(v_name, 1, 2))
       AND abs(len(title) - len(v_name)) <= 2
      WHERE levenshtein(title, v_name) <= 2
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
    ),
    lab AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    full_lab AS (
      SELECT e.id, coalesce(l.cluster_id, e.id) AS cluster_id
      FROM ents e LEFT JOIN lab l ON e.id = l.id
    )
    SELECT f.cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
           g.name AS golden_name
    FROM full_lab f JOIN ents g ON g.id = f.cluster_id
    GROUP BY 1, 3
    """,
    note="golden-record consolidation (MDM): fuzzy-join match pairs -> "
    "connected components -> singleton-inclusive labeling -> canonical "
    "attributes from each cluster's lowest-id member; CC rounds run on the "
    "match-pair graph (match-sized, not corpus-sized), consolidation is "
    "two keyed joins + one groupBy (operators/linkage.py golden_records)",
)
def x_golden_record(spark, sf_dir):
    from flnr_wins_spark.operators.linkage import fuzzy_join, golden_records

    titles, variants = _titles_and_variants(spark, sf_dir)
    pairs = fuzzy_join(titles, variants, "title", "v_name", max_dist=2).select(
        F.col("t_id").alias("id_a"), F.col("v_id").alias("id_b")
    )
    ents = titles.select(F.col("t_id").alias("id"), F.col("title").alias("name")).unionByName(
        variants.select(F.col("v_id").alias("id"), F.col("v_name").alias("name"))
    )
    return golden_records(ents, pairs, "id", ["name"]).select(
        "cluster_id", "n_members", F.col("name").alias("golden_name")
    )


@query(
    "x_binaryfile_ingest",
    sql="""
    WITH b AS (
      SELECT doc_id, p,
             CAST('0x' || substr(
                    md5(CAST(doc_id AS VARCHAR) || ':qoi'
                        || CAST(((p // 3 - (p // 3) % 2) * 3 + p % 3) // 16 AS VARCHAR)),
                    2 * (((p // 3 - (p // 3) % 2) * 3 + p % 3) % 16) + 1, 2) AS INT)
               AS byte
      FROM documents, range(192) t(p)
      WHERE doc_id < 50
    )
    SELECT doc_id AS media_id,
           CAST(SUM(CASE WHEN p % 3 = 0 THEN byte ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(SUM(CASE WHEN p % 3 = 1 THEN byte ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN p % 3 = 2 THEN byte ELSE 0 END) AS BIGINT) AS sum_b
    FROM b GROUP BY doc_id
    """,
    note="media-dataset export/ingest round-trip: QOI-encoded images write "
    "as ONE FILE PER ROW from the executors (write_binary_files — no "
    "driver funnel), read back through Spark's built-in binaryFile source "
    "(path/length/content rows), ids recovered from filenames, REAL QOI "
    "decode; oracle recomputes expected pixel sums from the construction",
)
def x_binaryfile_ingest(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import extract_features, wrap_qoi
    from flnr_wins_spark.sources.formats import write_binary_files

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    media = _qoi_test_media(docs)
    base = scratch_dir("binfiles")
    encoded = wrap_qoi(media, 8, 8).select(
        F.concat(F.col("media_id").cast("string"), F.lit(".qoi")).alias("name"),
        "content",
    )
    write_binary_files(encoded, base)
    back = spark.read.format("binaryFile").load(base)
    media2 = back.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.qoi$", 1).cast("bigint").alias("media_id"),
        F.col("content"),
        F.struct(
            F.lit("image/qoi").alias("mime"),
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.col("length").cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )
    feats = extract_features(media2, fake=False)
    f = F.col("feature")
    return feats.select(
        "media_id",
        f[3].cast("bigint").alias("sum_r"),
        f[4].cast("bigint").alias("sum_g"),
        f[5].cast("bigint").alias("sum_b"),
    )


@query(
    "x_search_e2e",
    sql="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM doclen
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term IN ('spark', 'merge', 'window')
      GROUP BY doc_id, term
    ),
    dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    bscore AS (
      SELECT tf.doc_id,
             CAST(SUM(CAST(
               ln((CAST(stats.n_docs - dfq.df AS DOUBLE) + 0.5)
                  / (CAST(dfq.df AS DOUBLE) + 0.5) + 1.0)
               * ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                  / (CAST(tf.tf AS DOUBLE)
                     + 1.2 * ((1.0 - 0.75)
                              + (0.75 * (CAST(dl.dl AS DOUBLE) / stats.avgdl)))))
             AS DECIMAL(27,9))) AS DOUBLE) AS score
      FROM tf JOIN dfq USING (term) JOIN doclen dl USING (doc_id)
      CROSS JOIN stats GROUP BY tf.doc_id
    ),
    lex AS (
      SELECT doc_id, CAST(rn AS BIGINT) AS rank FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
        FROM bscore) WHERE rn <= 10
    ),
    vcount AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks WHERE term = 'value' GROUP BY doc_id
    ),
    second AS (
      SELECT doc_id, CAST(rn AS BIGINT) AS rank FROM (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cnt DESC, doc_id) AS rn
        FROM vcount) WHERE rn <= 10
    ),
    contrib AS (
      SELECT doc_id,
             CAST(CAST(1.0 AS DOUBLE) / CAST(60 + rank AS DOUBLE)
                  AS DECIMAL(27,12)) AS c
      FROM lex
      UNION ALL
      SELECT doc_id,
             CAST(CAST(1.0 AS DOUBLE) / CAST(60 + rank AS DOUBLE)
                  AS DECIMAL(27,12)) AS c
      FROM second
    ),
    fused AS (
      SELECT doc_id, rrf, n_systems, CAST(rn AS BIGINT) AS rank FROM (
        SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS rrf,
               CAST(COUNT(*) AS BIGINT) AS n_systems,
               ROW_NUMBER() OVER (ORDER BY CAST(SUM(c) AS DOUBLE) DESC, doc_id)
                 AS rn
        FROM contrib GROUP BY doc_id) WHERE rn <= 10
    ),
    qrels AS (SELECT doc_id FROM documents WHERE doc_id % 7 = 0),
    nrel AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rel FROM qrels),
    mhits AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS hits_k,
             CAST(MIN(rank) AS BIGINT) AS first_r,
             SUM(CAST(CAST(1.0 AS DOUBLE) / log2(CAST(rank AS DOUBLE) + 1.0)
                      AS DECIMAL(20,9))) AS dcg
      FROM fused JOIN qrels USING (doc_id)
    ),
    ideal AS (
      SELECT SUM(CAST(CAST(1.0 AS DOUBLE) / log2(CAST(r AS DOUBLE) + 1.0)
                      AS DECIMAL(20,9))) AS idcg
      FROM (SELECT CAST(unnest(range(1,
                   CAST(least(10, (SELECT n_rel FROM nrel)) AS INTEGER) + 1))
                   AS BIGINT) AS r) rr
    )
    SELECT f.doc_id, f.rrf, f.n_systems, f.rank,
           n.n_rel,
           CAST(COALESCE(m.hits_k, 0) AS BIGINT) AS hits_k,
           CAST(COALESCE(m.hits_k, 0) AS DOUBLE) / CAST(n.n_rel AS DOUBLE)
             AS recall_k,
           COALESCE(CAST(1.0 AS DOUBLE) / CAST(m.first_r AS DOUBLE),
                    CAST(0.0 AS DOUBLE)) AS mrr,
           CAST(COALESCE(CAST(m.dcg * 1000000000 AS BIGINT), 0) AS BIGINT)
             AS dcg_e9,
           CAST(i.idcg * 1000000000 AS BIGINT) AS ideal_e9,
           CAST(COALESCE(m.dcg, CAST(0 AS DECIMAL(20,9))) AS DOUBLE)
             / CAST(i.idcg AS DOUBLE) AS ndcg
    FROM fused f CROSS JOIN nrel n CROSS JOIN mhits m CROSS JOIN ideal i
    """,
    note="END-TO-END retrieval pipeline, hash-checked as ONE composition "
    "(the search-stack sibling of x_llm_corpus_e2e): BM25 keyword "
    "retrieval + an independent occurrence-count ranking -> "
    "reciprocal-rank fusion (decimal-routed contributions) -> offline "
    "evaluation against deterministic qrels (recall@10, MRR, nDCG via "
    "ranking_metrics). Every stage is an already-graded operator; this "
    "entry grades their composition — fused top-10 rows annotated with "
    "the query-level metric row (broadcast)",
)
def x_search_e2e(spark, sf_dir):
    from flnr_wins_spark.functions.search import (
        bm25_topk,
        ranking_metrics,
        rrf_fuse,
        tokens,
    )

    docs = t(spark, sf_dir, "documents")
    lex = bm25_topk(docs, ["spark", "merge", "window"], k=10)
    vcnt = (
        docs.select(
            "doc_id",
            F.size(F.filter(tokens(F.col("text")), lambda tk: tk == "value"))
            .cast("bigint")
            .alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    from pyspark.sql import Window

    # Global top-10 via TakeOrderedAndProject (per-partition heaps) BEFORE
    # the rank window, so the single-partition sort only ever sees 10 rows —
    # the bm25_topk pattern (functions/search.py); window-then-filter would
    # funnel every matching doc through one task at corpus scale.
    top10 = vcnt.orderBy(F.col("cnt").desc(), F.col("doc_id")).limit(10)
    w = Window.orderBy(F.col("cnt").desc(), F.col("doc_id"))
    second = (
        top10.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "rank")
    )
    fused = rrf_fuse([lex.select("doc_id", "rank"), second], k=10)
    res = fused.select(
        F.lit(0).cast("bigint").alias("query_id"),
        F.col("doc_id").alias("cand_id"),
        "rank",
    )
    labels = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(F.lit(0).cast("bigint").alias("query_id"),
                F.col("doc_id").alias("cand_id"))
    )
    m = ranking_metrics(res, labels, k=10).drop("query_id")
    return fused.crossJoin(F.broadcast(m)).select(
        "doc_id", "rrf", "n_systems", "rank",
        "n_rel", "hits_k", "recall_k", "mrr", "dcg_e9", "ideal_e9", "ndcg",
    )


@query(
    "x_rank_metrics",
    sql="""
    WITH qs AS (SELECT CAST(i AS BIGINT) AS q FROM range(10) t(i)),
    res AS (
      SELECT q, CAST(r AS BIGINT) AS r, (q * 7 + CAST(r AS BIGINT) * 13) % 40 AS c
      FROM qs, LATERAL (SELECT unnest(range(1, 11)) AS r) rr
    ),
    lab AS (
      SELECT q, CAST(c AS BIGINT) AS c
      FROM qs, LATERAL (SELECT unnest(range(40)) AS c) cc
      WHERE CAST(c AS BIGINT) % 4 = q % 4
    ),
    nrel AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n_rel FROM lab GROUP BY q),
    hits AS (
      SELECT res.q, CAST(COUNT(*) AS BIGINT) AS hits_k,
             CAST(MIN(r) AS BIGINT) AS first_r,
             SUM(CAST(CAST(1.0 AS DOUBLE) / log2(CAST(r AS DOUBLE) + 1.0)
                      AS DECIMAL(20,9))) AS dcg
      FROM res JOIN lab ON res.q = lab.q AND res.c = lab.c
      GROUP BY res.q
    ),
    ideal AS (
      SELECT q, n_rel,
             SUM(CAST(CAST(1.0 AS DOUBLE) / log2(CAST(r AS DOUBLE) + 1.0)
                      AS DECIMAL(20,9))) AS idcg
      FROM (SELECT q, n_rel,
                   CAST(unnest(range(1, CAST(least(10, n_rel) AS INTEGER) + 1))
                        AS BIGINT) AS r
            FROM nrel) x
      GROUP BY q, n_rel
    )
    SELECT i.q AS query_id, i.n_rel,
           CAST(COALESCE(h.hits_k, 0) AS BIGINT) AS hits_k,
           CAST(COALESCE(h.hits_k, 0) AS DOUBLE) / CAST(i.n_rel AS DOUBLE)
             AS recall_k,
           COALESCE(CAST(1.0 AS DOUBLE) / CAST(h.first_r AS DOUBLE),
                    CAST(0.0 AS DOUBLE)) AS mrr,
           CAST(COALESCE(CAST(h.dcg * 1000000000 AS BIGINT), 0) AS BIGINT)
             AS dcg_e9,
           CAST(i.idcg * 1000000000 AS BIGINT) AS ideal_e9,
           CAST(COALESCE(h.dcg, CAST(0 AS DECIMAL(20,9))) AS DOUBLE)
             / CAST(i.idcg AS DOUBLE) AS ndcg
    FROM ideal i LEFT JOIN hits h ON i.q = h.q
    """,
    note="offline retrieval evaluation (recall@k, MRR, nDCG@k) — the "
    "metric suite the search/RAG stack is tuned against: exact-rational "
    "recall/MRR, per-rank 1/log2(rank+1) gains decimal-rounded (libm "
    "rule), DCG/ideal-DCG as exact decimal sums in 1e-9 BIGINT units, "
    "ndcg one correctly-rounded division. Deterministic synthetic "
    "ranking/qrels fixture; the operator itself joins k-bounded results "
    "against qrels — result-sized, never corpus-sized",
)
def x_rank_metrics(spark, sf_dir):
    from flnr_wins_spark.functions.search import ranking_metrics

    qs = spark.range(10).select(F.col("id").alias("q"))
    ranks = spark.range(1, 11).select(F.col("id").alias("r"))
    results = qs.crossJoin(ranks).select(
        F.col("q").alias("query_id"),
        ((F.col("q") * 7 + F.col("r") * 13) % 40).alias("cand_id"),
        F.col("r").alias("rank"),
    )
    cands = spark.range(40).select(F.col("id").alias("c"))
    labels = (
        qs.crossJoin(cands)
        .filter(F.col("c") % 4 == F.col("q") % 4)
        .select(F.col("q").alias("query_id"), F.col("c").alias("cand_id"))
    )
    return ranking_metrics(results, labels, k=10)


@query(
    "x_drift_psi",
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
    note="Population Stability Index drift monitor: fixed-range "
    "equal-width bins (a data-derived grid would itself drift), additive "
    "(+1) smoothing so empty bins never divide by zero, per-bin "
    "(p-q)*ln(p/q) terms with the one libm ln decimal-rounded; the "
    "fixture shifts the serving distribution by half a bin so the graded "
    "terms measure REAL drift. Two map-side-combine count shuffles down "
    "to bins-sized frames; completes the ML-ops monitoring family next "
    "to profile_columns / dq expectations",
)
def x_drift_psi(spark, sf_dir):
    from flnr_wins_spark.operators.dataquality import drift_psi

    ev = t(spark, sf_dir, "events")
    cur = ev.filter(F.col("event_id") % 2 == 1).select(
        (F.col("value") + F.lit(25.0)).alias("value")
    )
    ref = ev.filter(F.col("event_id") % 2 == 0).select("value")
    return drift_psi(cur, ref, "value", lo=0.0, hi=500.0, bins=10)


@query(
    "x_target_encode",
    sql="""
    WITH r AS (
      SELECT o_orderkey AS id, o_orderpriority AS cat,
             CAST(o_totalprice AS DECIMAL(27,2)) AS y,
             CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2)
                       AS INTEGER) % 5 AS INTEGER) AS fold
      FROM orders
    ),
    cf AS (
      SELECT cat, fold, SUM(y) AS s_cf, CAST(COUNT(*) AS BIGINT) AS n_cf
      FROM r GROUP BY 1, 2
    ),
    c AS (
      SELECT cat, SUM(s_cf) AS s_c, CAST(SUM(n_cf) AS BIGINT) AS n_c
      FROM cf GROUP BY 1
    ),
    f AS (
      SELECT fold, SUM(s_cf) AS s_f, CAST(SUM(n_cf) AS BIGINT) AS n_f
      FROM cf GROUP BY 1
    ),
    t AS (SELECT SUM(s_cf) AS s_tot, CAST(SUM(n_cf) AS BIGINT) AS n_tot FROM cf),
    g AS (
      SELECT fold,
             CAST(s_tot - s_f AS DOUBLE) / CAST(n_tot - n_f AS DOUBLE) AS g_f
      FROM f CROSS JOIN t
    )
    SELECT r.id, r.cat, r.fold,
           (CAST(c.s_c - cf.s_cf AS DOUBLE) + (20.0 * g.g_f))
             / (CAST(c.n_c - cf.n_cf AS DOUBLE) + 20.0) AS enc
    FROM r JOIN cf USING (cat, fold) JOIN c USING (cat) JOIN g USING (fold)
    """,
    note="leakage-free OUT-OF-FOLD target encoding: each row's encoding "
    "is the smoothed target mean over the OTHER folds only, and the "
    "smoothing prior is itself out-of-fold (the global mean excluding the "
    "row's fold) — content-addressed folds make the encoding reproducible "
    "across runs/engines/partitionings. Sums route through "
    "DECIMAL(27,2) (exact, order-free), final arithmetic is one fixed "
    "parenthesization; category/fold margins broadcast back onto the "
    "narrow row projection (two map-side-combine shuffles, no self-join)",
)
def x_target_encode(spark, sf_dir):
    from flnr_wins_spark.operators.split import target_encode_oof

    orders = t(spark, sf_dir, "orders")
    return target_encode_oof(
        orders, "o_orderpriority", "o_totalprice", "o_orderkey",
        k=5, prior_weight=20,
    )


_FD_CAND_SQL = """
      SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating
      FROM (SELECT {lhs},
                   COUNT(DISTINCT {rhs})
                     + MAX(CASE WHEN {rhs} IS NULL THEN 1 ELSE 0 END) AS nd
            FROM orders GROUP BY {lhs}) g
"""

_FD_CANDS = [
    ("o_orderkey", "o_custkey"),
    ("o_custkey", "o_orderpriority"),
    ("o_orderpriority", "o_orderstatus"),
]


@query(
    "x_fd_check",
    sql="SELECT lhs, rhs, n_groups, n_violating, n_violating = 0 AS holds FROM ("
    + " UNION ALL ".join(
        "(" + _FD_CAND_SQL.format(lhs=a, rhs=b) + ")" for a, b in _FD_CANDS
    )
    + ") u",
    note="functional-dependency audit over declared candidates (the "
    "Metanome/HyFD profiling primitive, search restricted to candidates "
    "— full FD discovery is exponential and belongs offline): per "
    "lhs->rhs, determinant-group count and how many groups carry >1 "
    "distinct rhs (null-safe: NULL counts as a value). One "
    "two-column groupBy per candidate, map-side combinable; the fixture "
    "exercises a holding key FD, a failing many-to-many, and a failing "
    "categorical pair",
)
def x_fd_check(spark, sf_dir):
    from flnr_wins_spark.operators.dataquality import fd_check

    orders = t(spark, sf_dir, "orders")
    return fd_check(orders, _FD_CANDS)


@query(
    "x_dp_counts",
    sql="""
    WITH c AS (
      SELECT c_nationkey AS g, CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1
    ),
    x AS (
      SELECT g, n,
             CAST('0x' || substr(md5('dp:' || CAST(g AS VARCHAR) || ':42'), 1, 9)
                  AS BIGINT) AS h
      FROM c
    ),
    y AS (SELECT g, n, 4 * h + 2 - 137438953472 AS num FROM x),
    z AS (
      SELECT g, n,
             CASE WHEN num < 0 THEN -1 ELSE 1 END AS sgn,
             CAST(abs(num) AS DOUBLE) / 137438953472.0 AS absd
      FROM y
    ),
    w AS (
      SELECT g, n,
             CAST((-2 * sgn)
                  * (CAST(ln(1.0 - absd) AS DECIMAL(20,9)) * 1000000000)
                  AS BIGINT) AS noise_e9
      FROM z
    )
    SELECT g, n, noise_e9, n * 1000000000 + noise_e9 AS noisy_count_e9
    FROM w
    """,
    note="differentially-private group counts (Laplace mechanism, eps=0.5) "
    "with CONTENT-ADDRESSED sticky noise: u is an exact dyadic rational "
    "from md5(group), so 2u-1 and 1-|2u-1| are exact doubles, the single "
    "libm ln rounds through DECIMAL(20,9) (precision chosen so the 1e9 "
    "scale shift never hits Spark's precision-overflow scale truncation), "
    "and the graded columns are exact 1e-9 BIGINT units. Reproducible "
    "noise is the operational requirement — re-drawing on re-run would "
    "let run-differencing cancel the noise; completes the privacy family "
    "(k-anonymity/l-diversity audit + DP release)",
)
def x_dp_counts(spark, sf_dir):
    from flnr_wins_spark.operators.dataquality import dp_group_counts

    cust = t(spark, sf_dir, "customer")
    return dp_group_counts(cust, "c_nationkey", epsilon_inv=2, seed=42)


@query(
    "x_tokenize_unigram",
    sql="""
    WITH RECURSIVE occ AS (
      SELECT unnest(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''))
               AS w0
      FROM documents
    ),
    wc AS (
      SELECT substr(w0, 1, 12) AS w, CAST(COUNT(*) AS BIGINT) AS n
      FROM occ GROUP BY 1
    ),
    pc AS (
      SELECT substr(w, i, l) AS p, CAST(SUM(n) AS BIGINT) AS cnt
      FROM wc,
           LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) ii,
           LATERAL (SELECT unnest(range(1, least(4, len(w) - i + 1) + 1)) AS l) ll
      GROUP BY 1
    ),
    vocab AS (
      SELECT p, cnt FROM pc WHERE length(p) = 1
      UNION ALL
      SELECT p, cnt FROM (
        SELECT p, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, p) AS rn
        FROM pc WHERE length(p) >= 2) WHERE rn <= 300
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM vocab),
    sc AS (
      SELECT p,
             CAST(ln(CAST(cnt AS DOUBLE) / CAST(t AS DOUBLE))
                  AS DECIMAL(27,9)) AS s
      FROM vocab CROSS JOIN tot
    ),
    topw AS (
      SELECT w, n FROM (
        SELECT w, n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rn FROM wc)
      WHERE rn <= 150
    ),
    seg(w, pos, score, pieces) AS (
      SELECT w, 0, CAST(0 AS DECIMAL(38,9)), 0 FROM topw
      UNION
      SELECT s.w, s.pos + ll.l,
             CAST(s.score + v.s AS DECIMAL(38,9)), s.pieces + 1
      FROM seg s,
           LATERAL (SELECT unnest(range(1, 5)) AS l) ll,
           sc v
      WHERE s.pos + ll.l <= len(s.w)
        AND v.p = substr(s.w, s.pos + 1, ll.l)
    ),
    done AS (
      SELECT w, score, pieces,
             ROW_NUMBER() OVER (PARTITION BY w ORDER BY score DESC, pieces)
               AS rn
      FROM seg WHERE pos = len(w)
    )
    SELECT t.w, t.n AS n_occ, CAST(d.pieces AS INTEGER) AS n_pieces,
           CAST(d.score * 1000000000 AS BIGINT) AS score_e9
    FROM done d JOIN topw t USING (w) WHERE d.rn = 1
    """,
    note="unigram-LM (SentencePiece-style) tokenizer fit + Viterbi "
    "evaluation, completing the tokenizer family (BPE merges / greedy "
    "MaxMatch / minimal-piece DP / probabilistic unigram): distributed "
    "substring-count fit weighted by word frequency, char fallback "
    "vocabulary, ln(count/total) scores decimal-rounded IN-ENGINE; "
    "Viterbi DP runs driver-side in exact decimal arithmetic on the "
    "model-sized word list (kmeans/pca posture), and because decimal "
    "sums are order-free the best (score, n_pieces) value is unique — "
    "the recursive-CTE oracle enumerates all segmentations (bounded "
    "tetranacci(12) paths/word) and lands on identical values with no "
    "path-tiebreak hazard; score graded as exact 1e-9 BIGINT units",
)
def x_tokenize_unigram(spark, sf_dir):
    from flnr_wins_spark.functions.text import unigram_lm_stats

    docs = t(spark, sf_dir, "documents")
    return unigram_lm_stats(docs)


@query(
    "x_rerank_cross",
    sql="""
    WITH q AS (
      SELECT doc_id AS query_id,
             array_to_string(list_slice(string_split(text, ' '), 1, 6), ' ')
               AS qtext
      FROM documents WHERE doc_id < 5
    ),
    qt AS (
      SELECT query_id, qtext,
             list_distinct(list_filter(
               string_split_regex(lower(qtext), '[^a-z0-9]+'), t -> t <> ''))
               AS qts
      FROM q
    ),
    dt AS (
      SELECT doc_id, text,
             list_distinct(list_filter(
               string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''))
               AS dts
      FROM documents
    ),
    cand AS (
      SELECT query_id, doc_id, qtext, qts, dts, text, shared FROM (
        SELECT qt.query_id, d.doc_id, qt.qtext, qt.qts, d.dts, d.text,
               len(list_intersect(d.dts, qt.qts)) AS shared,
               ROW_NUMBER() OVER (PARTITION BY qt.query_id
                 ORDER BY len(list_intersect(d.dts, qt.qts)) DESC, d.doc_id)
                 AS rn
        FROM dt d CROSS JOIN qt
        WHERE len(list_intersect(d.dts, qt.qts)) >= 1) WHERE rn <= 20
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dt),
    qv AS (SELECT DISTINCT unnest(qts) AS term FROM qt),
    dfq AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df
      FROM (SELECT d.doc_id, u.term FROM dt d, UNNEST(d.dts) AS u(term)) p
      JOIN qv USING (term) GROUP BY term
    ),
    fidf AS (
      SELECT query_id, doc_id,
             CAST(SUM(CAST(ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE))
                           AS DECIMAL(27,9))) AS DOUBLE) AS fidf
      FROM (SELECT c.query_id, c.doc_id, u.term
            FROM cand c, UNNEST(list_intersect(c.dts, c.qts)) AS u(term)) s
      JOIN dfq USING (term) CROSS JOIN nd
      GROUP BY query_id, doc_id
    ),
    fx AS (
      SELECT query_id, doc_id,
             CAST(shared AS DOUBLE) / CAST(len(qts) AS DOUBLE) AS fov,
             CAST(len(list_filter(
               list_transform(range(1, len(string_split(qtext, ' '))),
                 i -> string_split(qtext, ' ')[i] || ' '
                      || string_split(qtext, ' ')[i + 1]),
               bg -> strpos(text, bg) > 0)) AS DOUBLE) AS fph
      FROM cand
    ),
    scored AS (
      SELECT f.query_id, f.doc_id,
             ((CAST(1.0 AS DOUBLE) * fov) + (CAST(0.2 AS DOUBLE) * fidf))
               + (CAST(0.5 AS DOUBLE) * fph) AS score
      FROM fx f JOIN fidf USING (query_id, doc_id)
    )
    SELECT query_id, doc_id, score, CAST(rn AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rn
      FROM scored) WHERE rn <= 5
    """,
    note="retrieve-then-RERANK, the production search/RAG posture: cheap "
    "term-overlap recall bounds candidates to 20/query, then a "
    "cross-encoder-style JOINT pair scorer (overlap ratio + idf-weighted "
    "shared terms + verbatim query-bigram phrase hits — the adjacency "
    "signal bag-of-words loses) re-scores only the candidates. Linear "
    "scorer is the oracle-exact stand-in for a learned cross-encoder "
    "(which would slot in as an Arrow pandas_udf with broadcast weights "
    "over the same k-bounded pairs). Completes the retrieval stack: "
    "bm25 -> rrf hybrid -> MMR diversity -> cross rerank",
    bench=True,
)
def x_rerank_cross(spark, sf_dir):
    from flnr_wins_spark.functions.search import cross_rerank

    docs = t(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 6)).alias("q_text"),
    )
    return cross_rerank(queries, docs, k=5, n_candidates=20)


@query(
    "x_warc_ingest",
    sql="""
    WITH w AS (
      SELECT doc_id,
             '<html><body><p>' || text || '</p><!-- crawl --></body></html>'
               AS html
      FROM documents WHERE doc_id < 40
    )
    SELECT doc_id, 'response' AS warc_type,
           CAST(length(html) AS BIGINT) AS content_length,
           md5(html) AS payload_md5,
           CAST(length(trim(regexp_replace(
                  regexp_replace(html, '<[^>]*>', ' ', 'g'),
                  '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))) AS BIGINT) AS clean_len
    FROM w
    """,
    note="WARC crawl-container round trip (ISO 28500 / Common Crawl "
    "layout): HTML pages wrap into multi-member-gzip WARC files (one gzip "
    "member per record, stdlib zlib, mtime=0 determinism), write as real "
    "files from the executors, read back through binaryFile + an "
    "Arrow-batched member-split/header-parse (sources/warc.py), then feed "
    "the existing JVM html_strip chain; oracle recomputes length/md5/"
    "clean-length from the construction. One file = one task — the "
    "standard per-file WARC parallelism at crawl scale",
    bench=True,
)
def x_warc_ingest(spark, sf_dir):
    from flnr_wins_spark.functions.text import html_strip
    from flnr_wins_spark.sources.warc import read_warc, warc_text

    def build(base):
        # The 8 .warc.gz files are a PURE function of documents@sf_dir
        # (multi-member gzip with mtime=0 => bit-identical rebuild), so
        # the fixture caches per process: the entry's measured cost is
        # the binaryFile read + member-split/header-parse + html_strip
        # chain, not the 8-group applyInPandas build it used to redo per
        # invocation (r11 VERDICT: the 4.27x bench drift suspect).
        from flnr_wins_spark.sources.formats import write_binary_files
        from flnr_wins_spark.sources.warc import encode_warc_gz

        docs = (
            t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 40)
            .select("doc_id", "text", (F.col("doc_id") % 8).alias("_f"))
        )

        def build_file(pdf):
            import pandas as pd

            pdf = pdf.sort_values("doc_id")
            fid = int(pdf["_f"].iloc[0])
            recs = []
            for _, r in pdf.iterrows():
                payload = (
                    "<html><body><p>" + r["text"] + "</p><!-- crawl --></body></html>"
                ).encode("utf-8")
                recs.append(
                    {
                        "headers": {
                            "WARC-Type": "response",
                            "WARC-Record-ID": f"<urn:doc:{int(r['doc_id'])}>",
                            "WARC-Target-URI": f"http://crawl.test/doc/{int(r['doc_id'])}",
                            "Content-Type": "text/html",
                        },
                        "payload": payload,
                    }
                )
            return pd.DataFrame(
                {"name": [f"{fid}.warc.gz"], "content": [encode_warc_gz(recs)]}
            )

        files = docs.groupBy("_f").applyInPandas(
            build_file, "name string, content binary"
        )
        write_binary_files(files, base)

    from flnr_wins_spark.plans.common import cached_fixture

    base = cached_fixture("warc", sf_dir, build)
    recs = warc_text(read_warc(spark, base))
    clean = html_strip(F.col("text"))
    return recs.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1).cast("bigint").alias("doc_id"),
        "warc_type",
        "content_length",
        F.md5(F.col("payload")).alias("payload_md5"),
        F.length(clean).cast("bigint").alias("clean_len"),
    )


@query(
    "x_quality_filter_pipeline",
    sql="""
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
      FROM documents
    ),
    vocab AS (SELECT term, COUNT(*) AS tf FROM toks GROUP BY term),
    total AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM vocab),
    scored AS (
      SELECT id, CAST(SUM(CAST(ln(CAST(total.total AS DOUBLE) / CAST(vocab.tf AS DOUBLE))
                               AS DECIMAL(27,9))) AS DOUBLE) / COUNT(*) AS avg_nll
      FROM toks JOIN vocab USING (term) CROSS JOIN total
      GROUP BY id
    ),
    r AS (
      SELECT id, avg_nll,
             row_number() OVER (ORDER BY avg_nll, id) AS rn,
             COUNT(*) OVER () AS n
      FROM scored
    )
    SELECT id AS doc_id, avg_nll,
           CAST(((rn - 1) * 10) // n + 1 AS INT) AS decile
    FROM r
    WHERE ((rn - 1) * 10) // n + 1 <= 9
    """,
    note="corpus-curation composition (the KenLM-style perplexity filter as "
    "a PIPELINE of registry operators): unigram-LM score -> equi-depth "
    "decile over (avg_nll, id) via the distributed global rank -> drop the "
    "worst decile; decile boundaries are pure integer arithmetic on the "
    "range-sharded rank, so the kept set is engine-exact",
)
def x_quality_filter_pipeline(spark, sf_dir):
    from flnr_wins_spark.functions.text import unigram_quality
    from flnr_wins_spark.operators.ranking import equidepth_bins

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    scored = unigram_quality(docs).select("id", "avg_nll")
    binned = equidepth_bins(scored, "avg_nll", "id", k=10)
    return binned.filter(F.col("bucket") <= 9).select(
        F.col("id").alias("doc_id"), "avg_nll", F.col("bucket").alias("decile")
    )


def _mmr_oracle_sql(k: int = 5, pool: int = 20) -> str:
    def cos(a: str, b: str) -> str:
        return (
            f"list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b})))"
        )

    parts = [
        "e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "q AS (SELECT v AS qv FROM e WHERE vec_id = 0)",
        f"""cand AS MATERIALIZED (
          SELECT id, v, rel FROM (
            SELECT c.vec_id AS id, c.v, {cos('c.v', 'q.qv')} AS rel,
                   row_number() OVER (ORDER BY {cos('c.v', 'q.qv')} DESC, c.vec_id) AS rn
            FROM e c, q WHERE c.vec_id <> 0) t
          WHERE rn <= {pool})""",
        """p1 AS MATERIALIZED (
          SELECT id, v, rel AS mmr, 1 AS sel_rank FROM (
            SELECT *, row_number() OVER (ORDER BY rel DESC, id) AS rn FROM cand) t
          WHERE rn = 1)""",
        "all1 AS (SELECT * FROM p1)",
    ]
    for r in range(2, k + 1):
        p = r - 1
        parts.append(
            f"rem{r} AS (SELECT * FROM cand WHERE id NOT IN (SELECT id FROM all{p}))"
        )
        parts.append(
            f"m{r} AS (SELECT c.id, MAX({cos('c.v', 's.v')}) AS msim "
            f"FROM rem{r} c, all{p} s GROUP BY c.id)"
        )
        parts.append(
            f"""p{r} AS MATERIALIZED (
              SELECT id, v, mmr, {r} AS sel_rank FROM (
                SELECT c.id, c.v, 0.75 * c.rel - 0.25 * m.msim AS mmr,
                       row_number() OVER (
                         ORDER BY 0.75 * c.rel - 0.25 * m.msim DESC, c.id) AS rn
                FROM rem{r} c JOIN m{r} m USING (id)) t
              WHERE rn = 1)"""
        )
        parts.append(
            f"all{r} AS (SELECT * FROM all{p} UNION ALL "
            f"SELECT id, v, mmr, sel_rank FROM p{r})"
        )
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT CAST(sel_rank AS INT) AS sel_rank, id, mmr AS mmr_score FROM all{k}"
    )


@query(
    "x_mmr_rerank",
    sql=_mmr_oracle_sql(),
    note="Maximal Marginal Relevance diversity re-rank (Carbonell-Goldstein "
    "SIGIR'98), the post-top-k RAG step: greedy k rounds of lam*rel - "
    "(1-lam)*max-sim-to-selected over a top-20 pool; selected set "
    "broadcasts each round, cosines are the module's index-ordered fold so "
    "both engines' argmax agrees bit-for-bit (lam=0.75 keeps 1-lam "
    "exactly representable); oracle = k unrolled selection rounds",
)
def x_mmr_rerank(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import brute_force_topk, mmr_rerank

    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    pool = brute_force_topk(q, emb, k=20).select(
        F.col("cand_id").alias("id"), F.col("cosine").alias("rel")
    )
    with_v = pool.join(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")), "id"
    )
    return mmr_rerank(with_v, k=5, lam=0.75, id_col="id", vec_col="v", rel_col="rel")


# x_dedup_minhash_estimate: the ZERO-SHINGLE-STATE near-dup mode — Jaccard is
# ESTIMATED as the fraction of agreeing min-hash tables (E[est] = true J),
# so only the 16-hash signature is ever stored or compared. This is the mode
# the streaming near-dup gate documents for TB-scale states; grading it
# hash-exact proves the estimator itself is engine-portable.
_MINHASH_ESTIMATE_SQL = (
    f"""
    WITH docs AS ({_DUP_SQL_DOCS}),
    tk AS (
      SELECT doc_id AS id, string_split(text, ' ') AS tks FROM docs
    ),
    sh AS (
      SELECT id, list_distinct(list_transform(range(1, len(tks) - 1),
             i -> tks[i] || ' ' || tks[i+1] || ' ' || tks[i+2])) AS shset
      FROM tk WHERE len(tks) >= 3
    ),
    sig AS (
      SELECT id,
    """
    + ",\n".join(
        f"         list_min(list_transform(shset, s -> md5(s || ':{42 + i}'))) AS mh_{i}"
        for i in range(16)
    )
    + """
      FROM sh
    )
    SELECT a.id AS id_a, b.id AS id_b,
           ("""
    + " + ".join(
        f"CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END" for i in range(16)
    )
    + """) / 16.0 AS est_jaccard
    FROM sig a JOIN sig b ON a.id < b.id
     AND ("""
    + " OR ".join(f"a.mh_{i} = b.mh_{i}" for i in range(16))
    + """)
    WHERE ("""
    + " + ".join(
        f"CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END" for i in range(16)
    )
    + """) / 16.0 >= 0.5
    """
)


@query(
    "x_dedup_minhash_estimate",
    sql=_MINHASH_ESTIMATE_SQL,
    note="signature-estimated near-dup pairs (zero shingle state): Jaccard "
    "~ fraction of agreeing min-hash tables — the 16-ints-per-doc mode the "
    "streaming gate uses at TB-scale state; md5 signatures make the "
    "estimator itself hash-exact against the oracle (the exact-verify "
    "entries remain the precision path)",
)
def x_dedup_minhash_estimate(spark, sf_dir):
    from flnr_wins_spark.operators.dedup import minhash_bands, minhash_signature_table

    from pyspark import StorageLevel

    docs = _docs_with_dups(spark, sf_dir)
    # The signature table feeds three consumers (banding + both agree
    # sides). persist(MEMORY_AND_DISK), NOT localCheckpoint: the table is
    # O(corpus-rows) (16 ints + id per doc), so it must stay spillable /
    # evictable with lineage intact — the same doctrine as
    # operators/dedup.py's verify path; only the duplicate-count-sized
    # result below may pin.
    agg = minhash_signature_table(
        docs, "text", "doc_id", num_hash_tables=16, hash_fn="md5",
        min_parallelism=docs.sparkSession.sparkContext.defaultParallelism,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bands = minhash_bands(agg, 16)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.mhv") == F.col("b.mhv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = agg.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = agg.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    agree = F.expr(
        "size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), b -> b))"
    )
    out = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", (agree / F.lit(16.0)).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= 0.5)
        # duplicate-count-sized (<< corpus): pin eagerly, then release the
        # corpus-sized signature cache
        .localCheckpoint(eager=True)
    )
    agg.unpersist()
    return out


# ---------------------------------------------------------------------------
# Lakehouse CDC loop, graded end-to-end (round 7)
# ---------------------------------------------------------------------------

_PTABLE_CDC_SQL = """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS part, o_custkey AS cust
      FROM orders
    ),
    u1 AS (SELECT k, part, cust + 1000000 AS cust FROM base
           WHERE k % 13 = 0 AND k % 19 <> 0),
    i1 AS (SELECT -k AS k, 'O' AS part, cust FROM base
           WHERE k % 17 = 0),
    b1 AS (SELECT * FROM u1 UNION ALL SELECT * FROM i1),
    after1 AS (
      SELECT * FROM b1
      UNION ALL
      SELECT b.* FROM base b
      WHERE b.k NOT IN (SELECT k FROM b1)
        AND b.k % 19 <> 0
    ),
    b2 AS (SELECT k, part, cust * 2 AS cust, 'cdc2' AS src FROM base
           WHERE k % 7 = 0),
    final AS (
      SELECT k, part, cust, src FROM b2
      UNION ALL
      SELECT a.k, a.part, a.cust, CAST(NULL AS VARCHAR) AS src FROM after1 a
      WHERE a.k NOT IN (SELECT k FROM b2)
        AND a.k NOT IN (SELECT k FROM base WHERE k % 29 = 0 AND k % 7 <> 0)
    )
    SELECT k, part, cust, src FROM final
    """


@query(
    "x_ptable_cdc_e2e",
    sql=_PTABLE_CDC_SQL,
    note="END-TO-END lakehouse CDC loop, hash-checked as ONE composition: "
    "bootstrap a partition-level MVCC table (write_ptable), apply CDC "
    "batch 1 (updates + inserts + deletes, delta-proportional "
    "merge_ptable), run OPTIMIZE (compact_ptable — physical rewrite, "
    "logically invisible), apply CDC batch 2 WITH schema evolution (new "
    "'src' column), then read the final manifest. The oracle replays the "
    "same two batches relationally — proving N sequential manifest merges "
    "== the relational fold of the changesets, the batch twin of the "
    "streaming ptable_merge_sink. All writes go to a per-call scratch "
    "dir; only touched partitions are ever read or rewritten",
    bench=True,
)
def x_ptable_cdc_e2e(spark, sf_dir):
    from flnr_wins_spark.sources.ptable import (
        compact_ptable,
        merge_ptable,
        read_ptable,
        write_ptable,
    )

    orders = t(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("part"),
        F.col("o_custkey").alias("cust"),
    )
    path = scratch_dir("ptable_cdc") + "/tbl"
    write_ptable(base, path, "part")
    # CDC batch 1: value updates (never on deleted keys), out-of-range
    # inserts, deletes carrying their (key, partition)
    u1 = base.filter((F.col("k") % 13 == 0) & (F.col("k") % 19 != 0)).select(
        "k", "part", (F.col("cust") + F.lit(1000000)).alias("cust")
    )
    # negated keys: orderkeys are strictly positive at EVERY scale factor,
    # so -k can never collide with a live key (k + 1000000 would from
    # roughly SF 0.17, where max orderkey passes 1e6 — a silent scale trap)
    i1 = base.filter(F.col("k") % 17 == 0).select(
        (-F.col("k")).alias("k"),
        F.lit("O").alias("part"),
        "cust",
    )
    d1 = base.filter(F.col("k") % 19 == 0).select("k", "part")
    merge_ptable(spark, path, u1.unionByName(i1), ["k"], delete_keys=d1)
    # OPTIMIZE between batches: collapses the merge's small files; must be
    # logically invisible to the final read
    compact_ptable(spark, path)
    # CDC batch 2: schema evolution (adds 'src'); re-inserts any batch-1
    # deleted key it names; deletes stay disjoint from its upserts
    b2 = base.filter(F.col("k") % 7 == 0).select(
        "k", "part",
        (F.col("cust") * F.lit(2)).alias("cust"),
        F.lit("cdc2").alias("src"),
    )
    d2 = base.filter((F.col("k") % 29 == 0) & (F.col("k") % 7 != 0)).select(
        "k", "part"
    )
    merge_ptable(spark, path, b2, ["k"], delete_keys=d2)
    return read_ptable(spark, path).select("k", "part", "cust", "src")


@query(
    "x_similarity_ivf_persisted",
    sql=_IVF_KMEANS_SQL,
    note="FEATURE-STORE posture for ANN: the trained IVF model (k-means "
    "centroids) persists through the versioned snapshot layer and the "
    "probe runs against the LOADED index — a stale v1 model and the "
    "current v2 model are both committed, the read resolves the newest "
    "version, and the result hash-matches the fresh-fit twin "
    "(x_similarity_ivf_kmeans's oracle verbatim): "
    "probe-over-loaded-index == probe-over-fresh-fit. Proves the model "
    "round-trips bit-exactly (parquet doubles) so ANN queries reuse a "
    "versioned index instead of refitting per query; index refresh is "
    "just the next write_snapshot, rollback is time travel",
)
def x_similarity_ivf_persisted(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import ivf_topk, kmeans_fit
    from flnr_wins_spark.sources.snapshots import read_snapshot, write_snapshot

    from flnr_wins_spark.plans.common import cached_fixture

    emb = t(spark, sf_dir, "embeddings")

    def _build(d):
        # two versioned fits, both pure per sf_dir; the graded behavior
        # is the probe over the LOADED newest version below
        write_snapshot(kmeans_fit(emb, k=8, iters=1), d + "/index")  # v1
        write_snapshot(kmeans_fit(emb, k=8, iters=3), d + "/index")  # v2

    path = cached_fixture("ivf_index", sf_dir, _build) + "/index"
    cents = read_snapshot(spark, path)  # newest complete version
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(queries, emb, nlist=8, nprobe=3, k=5, centroids=cents)


@query(
    "x_ptable_zonemap_prune",
    sql="""
    WITH hit AS (
      SELECT o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey BETWEEN 200 AND 899
    ),
    pr AS (
      SELECT CAST(COUNT(DISTINCT CAST(FLOOR(CAST(o_orderkey AS DOUBLE) / 500)
                                      AS BIGINT)) AS BIGINT) AS n
      FROM orders WHERE o_orderkey BETWEEN 200 AND 899
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
             AS sum_price,
           (SELECT n FROM pr) AS n_parts_read
    FROM hit GROUP BY o_orderstatus
    """,
    note="ZONE-MAP pruning graded end-to-end: orders committed as a "
    "partition-level MVCC table (bucketed partition key, stats_cols zone "
    "maps in the manifest), then a range probe asks prune_partitions for "
    "the candidate partitions from METADATA ALONE and reads only those — "
    "the manifest-granularity analog of parquet row-group skipping. "
    "n_parts_read pins that pruning was TIGHT (= the number of buckets "
    "the range truly intersects, which the oracle derives relationally); "
    "the aggregate over the pruned read must equal the plain WHERE over "
    "the full table",
)
def x_ptable_zonemap_prune(spark, sf_dir):
    from flnr_wins_spark.sources.ptable import (
        prune_partitions,
        read_ptable,
        write_ptable,
    )

    from flnr_wins_spark.plans.common import cached_fixture

    def _build(d):
        orders = t(spark, sf_dir, "orders")
        base = orders.select(
            "o_orderkey", "o_orderstatus", "o_totalprice",
            F.floor(F.col("o_orderkey") / F.lit(500)).cast("string").alias("kb"),
        )
        write_ptable(base, d + "/tbl", "kb", stats_cols=["o_orderkey"])

    path = cached_fixture("ptable_zm", sf_dir, _build) + "/tbl"
    pruned = prune_partitions(spark, path, "o_orderkey", 200, 899)
    hit = (
        read_ptable(spark, path, partitions=pruned)
        .filter(F.col("o_orderkey").between(200, 899))
    )
    return hit.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
        .cast("double")
        .alias("sum_price"),
        F.lit(len(pruned)).cast("bigint").alias("n_parts_read"),
    )


@query(
    "x_search_bm25_persisted",
    sql=_BM25_SQL,
    note="FEATURE-STORE posture for keyword search: the inverted index "
    "(postings/doclen/stats) is built ONCE, persisted through the "
    "versioned snapshot layer, and the query serves from the LOADED "
    "tables (bm25_topk_from_index, shared scorer) — hash-matching the "
    "fresh-build oracle verbatim, so probe-over-loaded-index == "
    "probe-over-fresh-build. Tokenization cost is paid per corpus "
    "version, not per query; the query-term IN predicate pushes to the "
    "postings parquet scan so a probe touches matching row groups, "
    "never the whole index; index refresh = next write_snapshot, "
    "rollback = time travel",
)
def x_search_bm25_persisted(spark, sf_dir):
    from flnr_wins_spark.functions.search import (
        bm25_topk_from_index,
        build_bm25_index,
    )
    from flnr_wins_spark.sources.snapshots import read_snapshot, write_snapshot

    from flnr_wins_spark.plans.common import cached_fixture

    def _build(d):
        docs = t(spark, sf_dir, "documents")
        postings, doclen, stats = build_bm25_index(docs)
        for name, frame in (
            ("postings", postings), ("doclen", doclen), ("stats", stats)
        ):
            write_snapshot(frame, f"{d}/{name}")

    base = cached_fixture("bm25_index", sf_dir, _build)
    return bm25_topk_from_index(
        read_snapshot(spark, f"{base}/postings"),
        read_snapshot(spark, f"{base}/doclen"),
        read_snapshot(spark, f"{base}/stats"),
        ["spark", "merge", "window"],
        k=10,
    )


@query(
    "x_search_bm25_incremental",
    sql=_BM25_SQL,
    note="INCREMENTAL index maintenance: the corpus arrives in two "
    "refreshes — build the index on the first half, merge_bm25_index the "
    "second half in (tokenizes ONLY the new docs; postings/doclen "
    "append, stats merge via exact bigint sums) — and the probe over the "
    "incrementally-maintained index hash-matches the from-scratch "
    "oracle verbatim. Proves index refresh cost is O(new docs), never "
    "O(corpus), with zero drift against a full rebuild",
)
def x_search_bm25_incremental(spark, sf_dir):
    from flnr_wins_spark.functions.search import (
        bm25_topk_from_index,
        build_bm25_index,
        merge_bm25_index,
    )

    docs = t(spark, sf_dir, "documents")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    postings, doclen, stats = build_bm25_index(first)
    postings, doclen, stats = merge_bm25_index(
        postings, doclen, stats, second
    )
    return bm25_topk_from_index(
        postings, doclen, stats, ["spark", "merge", "window"], k=10
    )


@query(
    "x_ptable_metadata_counts",
    sql="""
    WITH ins AS (
      SELECT o_orderpriority FROM orders
      WHERE o_orderkey % 11 = 0 AND o_orderpriority = '1-URGENT'
    ),
    survivors AS (
      SELECT o_orderpriority FROM orders
      WHERE NOT (o_orderkey % 7 = 0 AND o_orderpriority = '5-LOW')
    ),
    fin AS (
      SELECT o_orderpriority FROM survivors
      UNION ALL SELECT o_orderpriority FROM ins
    )
    SELECT o_orderpriority AS part, CAST(COUNT(*) AS BIGINT) AS nrows
    FROM fin GROUP BY o_orderpriority
    """,
    note="METADATA-ONLY aggregation: orders committed as a partition-level "
    "MVCC table with stats_cols (exact per-partition row counts ride the "
    "zone-map scan), then a CDC merge (inserts into one partition, "
    "deletes from another) re-derives counts for the partitions it "
    "rewrites and carries the other three BY REFERENCE — and the final "
    "COUNT(*) GROUP BY partition is answered by partition_rows from the "
    "manifest alone, ZERO data files read. The oracle replays the "
    "changeset relationally, proving metadata counts == data counts "
    "through a merge. At 100 TB this is the lakehouse metadata-table "
    "posture: a table-wide count is a manifest read, not a scan",
)
def x_ptable_metadata_counts(spark, sf_dir):
    from flnr_wins_spark.sources.ptable import (
        merge_ptable,
        partition_rows,
        write_ptable,
    )

    from flnr_wins_spark.plans.common import cached_fixture

    orders = t(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderpriority", "o_custkey")
    ins = base.filter(
        (F.col("o_orderkey") % 11 == 0)
        & (F.col("o_orderpriority") == "1-URGENT")
    ).select(
        # negated keys: o_orderkey >= 1 at every SF, so inserts can never
        # collide with (and silently upsert over) an existing key — the
        # oracle's plain UNION ALL stays exact at any scale factor
        (-F.col("o_orderkey")).alias("o_orderkey"),
        "o_orderpriority",
        "o_custkey",
    )
    dels = base.filter(
        (F.col("o_orderkey") % 7 == 0)
        & (F.col("o_orderpriority") == "5-LOW")
    ).select("o_orderkey", "o_orderpriority")

    def _build(d):
        # commit + merge are pure per sf_dir; the graded behavior is the
        # metadata-only partition_rows read below
        write_ptable(
            base, d + "/tbl", "o_orderpriority", stats_cols=["o_orderkey"]
        )
        merge_ptable(spark, d + "/tbl", ins, ["o_orderkey"], delete_keys=dels)

    path = cached_fixture("ptable_meta", sf_dir, _build) + "/tbl"
    counts = partition_rows(spark, path)  # manifest read — no data files
    from flnr_wins_spark.localrel import local_df

    return local_df(spark, sorted(counts.items()), "part string, nrows bigint")


@query(
    "x_ptable_bloom_point",
    sql="""
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
    WHERE c_name = (SELECT c_name FROM customer ORDER BY c_custkey LIMIT 1)
    """,
    note="BLOOM-FILTER point-lookup pruning: customer committed as a "
    "partitioned table with a per-partition bloom sidecar on c_name "
    "(2048 bits, 5 md5-double-hash probes, built JVM-side), then a "
    "point probe asks prune_partitions_eq for candidate partitions from "
    "MANIFEST METADATA alone and reads only those — the "
    "high-cardinality-equality complement to zone maps (which cannot "
    "prune an unclustered key). Bloom negatives are definitive so "
    "pruning is lossless; positives may be false so the pruned read "
    "still applies the real filter — the result must equal the plain "
    "WHERE over the full table, which is exactly what the oracle runs",
)
def x_ptable_bloom_point(spark, sf_dir):
    from flnr_wins_spark.sources.ptable import (
        prune_partitions_eq,
        read_ptable,
        write_ptable,
    )

    from flnr_wins_spark.plans.common import cached_fixture

    cust = t(spark, sf_dir, "customer")
    base = cust.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")

    def _build(d):
        write_ptable(base, d + "/tbl", "c_mktsegment", bloom_cols=["c_name"])

    path = cached_fixture("ptable_bloom", sf_dir, _build) + "/tbl"
    probe = (
        base.orderBy("c_custkey").select("c_name").limit(1).collect()[0][0]
    )
    cands = prune_partitions_eq(spark, path, "c_name", probe)
    return (
        read_ptable(spark, path, partitions=cands)
        .filter(F.col("c_name") == probe)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    )


@query(
    "x_ptable_incremental_mv",
    sql="""
    WITH fin AS (
      SELECT o_custkey,
             CASE WHEN o_orderkey % 7 <> 0 AND o_orderpriority = '2-HIGH'
                       AND o_orderkey % 11 = 0 AND o_orderkey % 13 <> 0
                  THEN CAST(o_totalprice AS DECIMAL(27,2)) + 100
                  ELSE CAST(o_totalprice AS DECIMAL(27,2)) END AS price
      FROM orders
      WHERE (o_orderkey % 7 = 0 AND o_orderpriority = '1-URGENT')
         OR (o_orderkey % 7 <> 0
             AND NOT (o_orderpriority = '2-HIGH' AND o_orderkey % 13 = 0))
    )
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(price) AS DOUBLE) AS sum_price
    FROM fin GROUP BY o_custkey
    """,
    note="MATERIALIZED-VIEW maintenance from lakehouse CDC, end-to-end: "
    "orders committed as a partitioned MVCC table, an aggregate MV built "
    "once, then a merge (inserts into one partition, updates+deletes in "
    "another) — and the MV refreshes via ptable_delta (signed rows from "
    "the CHANGED partitions of the two manifests only, NO key join: "
    "unchanged rows cancel exactly under linear aggregates) folded in "
    "with incremental_agg (exact decimal sums, zero-count groups drop). "
    "The oracle recomputes the final aggregate from scratch, proving "
    "delta-refresh == rebuild. At 100 TB the refresh reads the "
    "partitions the merge touched, never the fact table — 3 of 5 "
    "partitions are untouched here and never read",
    bench=True,
)
def x_ptable_incremental_mv(spark, sf_dir):
    from flnr_wins_spark.operators.merge import incremental_agg
    from flnr_wins_spark.sources.ptable import (
        merge_ptable,
        ptable_delta,
        write_ptable,
    )

    od = t(spark, sf_dir, "orders")
    full = od.select(
        "o_orderkey", "o_custkey", "o_orderpriority",
        F.col("o_totalprice").cast("decimal(27,2)").alias("price"),
    )
    base = full.filter(F.col("o_orderkey") % 7 != 0)
    path = scratch_dir("ptable_mv") + "/tbl"
    write_ptable(base, path, "o_orderpriority")
    # the MV, built once over the bootstrap state
    mv1 = base.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("price").alias("sum_price"),
    )
    # CDC batch confined to two of the five partitions
    ins = full.filter(
        (F.col("o_orderkey") % 7 == 0)
        & (F.col("o_orderpriority") == "1-URGENT")
    )
    upd = base.filter(
        (F.col("o_orderpriority") == "2-HIGH")
        & (F.col("o_orderkey") % 11 == 0)
        & (F.col("o_orderkey") % 13 != 0)
    ).withColumn(
        "price",
        (F.col("price") + F.lit(100).cast("decimal(27,2)"))
        .cast("decimal(27,2)"),
    )
    dels = base.filter(
        (F.col("o_orderpriority") == "2-HIGH")
        & (F.col("o_orderkey") % 13 == 0)
    ).select("o_orderkey", "o_orderpriority")
    m2 = merge_ptable(
        spark, path, ins.unionByName(upd), ["o_orderkey"], delete_keys=dels
    )
    # refresh: signed delta from the CHANGED partitions only, no key join
    delta = ptable_delta(spark, path, m2 - 1, m2).select(
        "o_custkey", "sign", F.col("price").alias("sum_price")
    )
    mv2 = incremental_agg(mv1, delta, ["o_custkey"], ["sum_price"])
    return mv2.select(
        "o_custkey", "n", F.col("sum_price").cast("double").alias("sum_price")
    )


@query(
    "x_corpus_shard",
    sql="""
    SELECT doc_id,
           CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                     AS INTEGER) % 8 AS INTEGER) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                                 1, 4) AS INTEGER) % 8
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS pos
    FROM documents
    """,
    note="deterministic training-shard export layout: shard = md5-bucket "
    "of the key mod n (content-addressed — resharding identical data "
    "never moves an example between shards), pos = rank within the "
    "shard by (md5 hex, key) — a content-derived total order, i.e. a "
    "deterministic per-shard shuffle (hash order ~ uniform), which is "
    "what LM training wants instead of source order. One hash "
    "projection, one shuffle on shard; the rank window holds one "
    "shard's rows per task (shard count is the export sizing knob). "
    "write_training_shards materializes this as one byte-stable "
    "parquet file per shard (pytest-pinned)",
    bench=True,
)
def x_corpus_shard(spark, sf_dir):
    from flnr_wins_spark.operators.split import shard_assign

    docs = t(spark, sf_dir, "documents").select("doc_id")
    return shard_assign(docs, "doc_id", n_shards=8)


@query(
    "x_bucketed_join",
    sql="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2))))
                AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    note="CO-LOCATED (shuffle-free) join via bucketing — the 100 TB "
    "analog of the reference's attribute indexes (wts.py:156-161): both "
    "fact sides persist hash-bucketed on the join key once, and every "
    "subsequent join on that key is a sort-merge over co-located "
    "buckets with NO exchange on either side (the only shuffle left in "
    "the plan is the 5-row priority aggregate's). The shuffle is paid "
    "at write time and amortized across every downstream join; plan "
    "contract pins exactly one Exchange. Result must equal the plain "
    "join, which is what the oracle runs",
)
def x_bucketed_join(spark, sf_dir):
    from flnr_wins_spark.sources.bucketing import bucketed, write_bucketed

    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    od = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li, "x_bj_lineitem", ["l_orderkey"], n_buckets=8)
    write_bucketed(od, "x_bj_orders", ["o_orderkey"], n_buckets=8)
    j = bucketed(spark, "x_bj_lineitem").hint("merge").join(
        bucketed(spark, "x_bj_orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(
            F.col("l_extendedprice").cast("decimal(27,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
        ).cast("double").alias("revenue"),
    )


@query(
    "x_ptable_ndv",
    sql="""
    WITH h AS (
      SELECT DISTINCT o_orderpriority AS part,
             CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM orders WHERE o_custkey IS NOT NULL
    ),
    rk AS (
      SELECT part, h,
             ROW_NUMBER() OVER (PARTITION BY part ORDER BY h) AS rn
      FROM h
    ),
    per AS (
      SELECT part, CAST(COUNT(*) AS BIGINT) AS n_sketch,
             CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE CAST(63 AS DOUBLE) * 1152921504606846976.0
                       / CAST(MAX(h) AS DOUBLE) END AS ndv_est
      FROM rk WHERE rn <= 64 GROUP BY part
    ),
    grk AS (
      SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
      FROM (SELECT DISTINCT h FROM h)
    ),
    gtot AS (
      SELECT '*' AS part, CAST(COUNT(*) AS BIGINT) AS n_sketch,
             CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE CAST(63 AS DOUBLE) * 1152921504606846976.0
                       / CAST(MAX(h) AS DOUBLE) END AS ndv_est
      FROM grk WHERE rn <= 64
    )
    SELECT part, n_sketch, ndv_est FROM per
    UNION ALL SELECT part, n_sketch, ndv_est FROM gtot
    """,
    note="NDV STATISTICS IN THE MANIFEST (the Iceberg-puffin posture): "
    "per-partition KMV distinct-count sketches (k=64 minimum 60-bit md5 "
    "hashes) committed as a table sidecar, answered per partition AND "
    "table-wide from METADATA ALONE — the table-wide estimate merges the "
    "per-partition sketches exactly (k smallest of the union of "
    "k-smallest sets == k smallest overall), zero data files read; this "
    "is the COUNT(DISTINCT) a cost-based planner consults before "
    "picking a join strategy. Exactness: the estimator is one "
    "correctly-rounded int->double conversion and one IEEE division per "
    "row — engine-portable, and the oracle recomputes the identical "
    "sketch relationally. Maintenance (carry/re-derive/verbatim) is "
    "pytest-pinned alongside the other sidecars",
)
def x_ptable_ndv(spark, sf_dir):
    from flnr_wins_spark.sources.ptable import (
        ndv_partitions,
        ndv_table,
        write_ptable,
    )

    from flnr_wins_spark.plans.common import cached_fixture

    def _build(d):
        orders = t(spark, sf_dir, "orders")
        base = orders.select("o_orderkey", "o_orderpriority", "o_custkey")
        write_ptable(
            base, d + "/tbl", "o_orderpriority", ndv_cols=["o_custkey"], ndv_k=64
        )

    path = cached_fixture("ptable_ndv", sf_dir, _build) + "/tbl"
    per = ndv_partitions(spark, path, "o_custkey")   # manifest read only
    tot = ndv_table(spark, path, "o_custkey")        # sketch merge, no IO
    rows = [(p, n, est) for p, (n, est) in sorted(per.items())]
    rows.append(("*", tot[0], tot[1]))
    from flnr_wins_spark.localrel import local_df

    return local_df(spark, rows, "part string, n_sketch bigint, ndv_est double")


# ---------------------------------------------------------------------------
# Round 8: cost-based statistics consumer, OPTIMIZE ZORDER witness,
# streamed-lakehouse e2e, graded ANN recall floor
# ---------------------------------------------------------------------------

@query(
    "x_ptable_join_advisor",
    sql="""
    WITH f AS (
      SELECT o_orderkey, o_custkey,
             CAST(o_totalprice AS DECIMAL(27,2)) AS price
      FROM orders
    ),
    d AS (SELECT c_custkey, c_mktsegment FROM customer)
    SELECT d.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS revenue,
           'broadcast' AS strategy,
           'right' AS build_side
    FROM f JOIN d ON f.o_custkey = d.c_custkey
    GROUP BY d.c_mktsegment
    """,
    note="COST-BASED PLANNING from manifest statistics: both join sides "
    "are committed as stats-bearing ptables, and advise_join picks the "
    "physical strategy from METADATA ALONE — on-disk bytes (FS listing) "
    "decide broadcast-vs-shuffle exactly like Spark's bytes-denominated "
    "autoBroadcastJoinThreshold, manifest row counts + mergeable KMV NDV "
    "sketches size the System-R output-cardinality estimate for the "
    "shuffle path. Here the threshold is pinned above any fixture size "
    "(SF-independent decision; both directions of the real 10 MiB rule "
    "are pytest-pinned), the build SIDE comes from measured bytes — the "
    "customer dim is 1/10 the fact at every SF, so broadcast-right — "
    "run_advised_join pins the build side with F.broadcast, and the "
    "result hash-matches the plain relational join — the strategy "
    "changed, the answer did not. The oracle carries the advised "
    "strategy as literals because the decision is deterministic from "
    "the fixture's sizes; the plan contract pins that the executed plan "
    "really does broadcast. At 100 TB the point is WHERE the decision "
    "cost lives: one manifest read + one directory listing, not a scan "
    "of either side",
    bench=True,
)
def x_ptable_join_advisor(spark, sf_dir):
    from flnr_wins_spark.plans.common import cached_fixture
    from flnr_wins_spark.sources.advisor import advise_join, run_advised_join
    from flnr_wins_spark.sources.ptable import write_ptable

    def _build(d):
        # fixture is a PURE function of sf_dir: build once per process,
        # so bench/regrades measure the metadata-only PROBE, not two
        # full ptable commits per invocation (VERDICT r8/r9 task)
        fact = t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderpriority",
            F.col("o_totalprice").cast("decimal(27,2)").alias("price"),
        )
        dim = t(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_mktsegment"
        )
        write_ptable(
            fact, d + "/fact", "o_orderpriority",
            stats_cols=["o_custkey"], ndv_cols=["o_custkey"],
        )
        write_ptable(
            dim, d + "/dim", "c_mktsegment",
            stats_cols=["c_custkey"], ndv_cols=["c_custkey"],
        )

    base = cached_fixture("adv_tables", sf_dir, _build)
    fact_path, dim_path = base + "/fact", base + "/dim"
    # threshold pinned ABOVE any fixture size so the graded decision is
    # deterministic at EVERY scale factor (the oracle carries it as a
    # literal; with the 10 MiB default, customer would cross the line
    # around SF 1 and the entry would diverge for a scale reason — the
    # same trap class as the CDC insert keys). The build SIDE still comes
    # from the measured bytes (smaller side), and both directions of the
    # real thresholded decision are pytest-pinned in test_advisor.py.
    advice = advise_join(
        spark, fact_path, dim_path, "o_custkey", "c_custkey",
        broadcast_threshold_bytes=1 << 40,
    )
    joined = run_advised_join(
        spark, advice, F.col("o_custkey") == F.col("c_custkey")
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price").cast("double").alias("revenue"),
    ).select(
        "c_mktsegment", "n_orders", "revenue",
        F.lit(advice.strategy).alias("strategy"),
        F.lit(advice.build_side).alias("build_side"),
    )


_ZORDER_OPT_SQL = """
    WITH base AS (
      SELECT o_orderkey % 16 AS a, o_custkey % 16 AS b,
             CAST(o_totalprice AS DECIMAL(27,2)) AS price
      FROM orders
    ),
    zc AS (
      SELECT a, b, price,
             CAST(FLOOR(a / 4) AS BIGINT) AS p1,
             (((((CAST(a AS BIGINT) & 15) >> 0) & 1) << 0)
            | ((((CAST(b AS BIGINT) & 15) >> 0) & 1) << 1)
            | ((((CAST(a AS BIGINT) & 15) >> 1) & 1) << 2)
            | ((((CAST(b AS BIGINT) & 15) >> 1) & 1) << 3)
            | ((((CAST(a AS BIGINT) & 15) >> 2) & 1) << 4)
            | ((((CAST(b AS BIGINT) & 15) >> 2) & 1) << 5)
            | ((((CAST(a AS BIGINT) & 15) >> 3) & 1) << 6)
            | ((((CAST(b AS BIGINT) & 15) >> 3) & 1) << 7)) >> 4 AS pz
      FROM base
    ),
    zones1 AS (
      SELECT p1, MIN(a) AS mn_a, MAX(a) AS mx_a,
             MIN(b) AS mn_b, MAX(b) AS mx_b, COUNT(*) AS nrows
      FROM zc GROUP BY p1
    ),
    zonesz AS (
      SELECT pz, MIN(a) AS mn_a, MAX(a) AS mx_a,
             MIN(b) AS mn_b, MAX(b) AS mx_b, COUNT(*) AS nrows
      FROM zc GROUP BY pz
    ),
    kept1 AS (
      SELECT * FROM zones1
      WHERE NOT (mx_a < 2 OR mn_a > 5 OR mx_b < 2 OR mn_b > 5)
    ),
    keptz AS (
      SELECT * FROM zonesz
      WHERE NOT (mx_a < 2 OR mn_a > 5 OR mx_b < 2 OR mn_b > 5)
    ),
    hit AS (
      SELECT COUNT(*) AS n_rows, CAST(SUM(price) AS DOUBLE) AS revenue
      FROM zc WHERE a BETWEEN 2 AND 5 AND b BETWEEN 2 AND 5
    )
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM zones1) AS parts_total_1d,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM kept1) AS parts_kept_1d,
      (SELECT CAST(COALESCE(SUM(nrows), 0) AS BIGINT) FROM kept1)
        AS rows_scanned_1d,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM zonesz) AS parts_total_z,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM keptz) AS parts_kept_z,
      (SELECT CAST(COALESCE(SUM(nrows), 0) AS BIGINT) FROM keptz)
        AS rows_scanned_z,
      (SELECT CAST(n_rows AS BIGINT) FROM hit) AS n_rows,
      (SELECT revenue FROM hit) AS revenue
    """


@query(
    "x_ptable_zorder_optimize",
    sql=_ZORDER_OPT_SQL,
    note="OPTIMIZE ZORDER witness at the partition level: the same rows "
    "committed twice — once range-partitioned on ONE dimension (a//4), "
    "once partitioned by the top bits of the Morton interleave of BOTH "
    "dimensions (operators/layout.py zorder_key, the bit-exact SQL twin "
    "rides the oracle) — and the SAME two-column range probe is pruned "
    "through advise_scan (zone-map intersection) against each layout. "
    "The graded row carries the witness in its hashed values: the 1-D "
    "layout's zone maps are tight on a and useless on b (every "
    "partition spans b's full domain), the Z layout is tight on BOTH, "
    "so rows_scanned_z < rows_scanned_1d while the query answer "
    "(n_rows, revenue) is identical. rows_scanned_* comes from manifest "
    "row counts over the kept partitions — metadata only, like the "
    "prune itself. At 100 TB this is why the lakehouse clusters by "
    "Morton key before writing (compact_ptable's sort_cols is the "
    "within-file half of the same move): a multi-predicate scan reads "
    "the tiles the zones cannot exclude, not half the table",
    bench=True,
)
def x_ptable_zorder_optimize(spark, sf_dir):
    from flnr_wins_spark.operators.layout import zorder_key
    from flnr_wins_spark.sources.advisor import advise_scan
    from flnr_wins_spark.sources.ptable import (
        partition_rows,
        read_ptable,
        write_ptable,
    )

    from flnr_wins_spark.plans.common import cached_fixture

    def _build(d):
        base = t(spark, sf_dir, "orders").select(
            (F.col("o_orderkey") % 16).alias("a"),
            (F.col("o_custkey") % 16).alias("b"),
            F.col("o_totalprice").cast("decimal(27,2)").alias("price"),
        )
        t1 = base.withColumn(
            "part", F.floor(F.col("a") / 4).cast("string")
        )
        tz = base.withColumn(
            "part",
            F.shiftright(zorder_key([F.col("a"), F.col("b")], bits=4), 4)
            .cast("string"),
        )
        write_ptable(t1, d + "/t1", "part", stats_cols=["a", "b"])
        write_ptable(tz, d + "/tz", "part", stats_cols=["a", "b"])

    zbase = cached_fixture("zopt", sf_dir, _build)
    path1, pathz = zbase + "/t1", zbase + "/tz"

    probe = {"a": (2, 5), "b": (2, 5)}
    kept1 = advise_scan(spark, path1, ranges=probe)
    keptz = advise_scan(spark, pathz, ranges=probe)
    rows1 = partition_rows(spark, path1)
    rowsz = partition_rows(spark, pathz)

    hit = (
        read_ptable(spark, pathz, partitions=keptz)
        .filter(F.col("a").between(2, 5) & F.col("b").between(2, 5))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("price").cast("double").alias("revenue"),
        )
    )
    return hit.select(
        F.lit(len(rows1)).cast("bigint").alias("parts_total_1d"),
        F.lit(len(kept1)).cast("bigint").alias("parts_kept_1d"),
        F.lit(sum(rows1[p] for p in kept1)).cast("bigint")
        .alias("rows_scanned_1d"),
        F.lit(len(rowsz)).cast("bigint").alias("parts_total_z"),
        F.lit(len(keptz)).cast("bigint").alias("parts_kept_z"),
        F.lit(sum(rowsz[p] for p in keptz)).cast("bigint")
        .alias("rows_scanned_z"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        "revenue",
    )


_STREAM_LAKEHOUSE_SQL = """
    WITH w AS (
      SELECT CAST(CEIL((MAX(o_orderkey) + 1) / 16.0) AS BIGINT) AS w
      FROM orders
    ),
    base AS (SELECT o_orderkey AS k, o_custkey AS cust FROM orders),
    fin AS (
      SELECT k, cust + 1000000 AS cust FROM base
      WHERE k % 13 = 0 AND k % 19 <> 0
      UNION ALL
      SELECT -k AS k, cust FROM base WHERE k % 17 = 0
      UNION ALL
      SELECT k, cust FROM base WHERE k % 19 <> 0 AND k % 13 <> 0
    )
    SELECT f.k, f.cust
    FROM fin f, w
    WHERE f.k >= 2 * w.w AND f.k <= 4 * w.w - 1
    """


@query(
    "x_stream_lakehouse_prune",
    sql=_STREAM_LAKEHOUSE_SQL,
    note="STREAMING ingestion keeps the metadata layer honest, graded "
    "end-to-end: bootstrap a zone-mapped ptable (16 scale-adaptive key "
    "buckets), stream TWO CDC micro-batches through ptable_merge_sink "
    "(batch 1: value updates + negated-key inserts; batch 2: deletes — "
    "key sets disjoint, so the final state is batch-order independent), "
    "then answer a key-range probe by ZONE-MAP PRUNING over the "
    "post-stream manifest + the residual filter. The oracle replays the "
    "changeset relationally over the raw table — proving the sidecars "
    "the streamed merges re-derived (zone maps, row counts) still prune "
    "LOSSLESSLY: a stale or wrong zone map after streaming would drop "
    "rows and break the hash. The sink's exactly-once batch-id commit "
    "and the delta-proportional merge are the same code paths the batch "
    "CDC entry grades; THIS entry pins that continuous ingestion and "
    "metadata pruning compose. At 100 TB: streams land all day, range "
    "probes still read only the partitions the zones cannot exclude",
)
def x_stream_lakehouse_prune(spark, sf_dir):
    from flnr_wins_spark.sources.ptable import (
        prune_partitions,
        read_ptable,
        write_ptable,
    )
    from flnr_wins_spark.streaming.sinks import ptable_merge_sink

    orders = t(spark, sf_dir, "orders")
    max_k = orders.agg(F.max("o_orderkey")).collect()[0][0]  # scalar
    w = -(-(int(max_k) + 1) // 16)  # ceil division, scale-adaptive buckets
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.floor(F.col("o_orderkey") / F.lit(w)).cast("string").alias("kb"),
        F.col("o_custkey").alias("cust"),
    )
    root = scratch_dir("stream_lakehouse")
    path = root + "/tbl"
    write_ptable(base, path, "kb", stats_cols=["k"])

    # two CDC micro-batch files with DISJOINT key sets (final state is
    # independent of delivery order): updates+inserts, then deletes
    schema = "k bigint, kb string, cust bigint, is_delete boolean"
    upd = base.filter((F.col("k") % 13 == 0) & (F.col("k") % 19 != 0)).select(
        "k", "kb", (F.col("cust") + F.lit(1000000)).alias("cust"),
        F.lit(False).alias("is_delete"),
    )
    ins = base.filter(F.col("k") % 17 == 0).select(
        (-F.col("k")).alias("k"),
        F.floor(-F.col("k") / F.lit(w)).cast("string").alias("kb"),
        "cust", F.lit(False).alias("is_delete"),
    )
    dels = base.filter(F.col("k") % 19 == 0).select(
        "k", "kb", "cust", F.lit(True).alias("is_delete"),
    )
    src = root + "/src"
    upd.unionByName(ins).coalesce(1).write.mode("append").parquet(src)
    dels.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from flnr_wins_spark.plans.events import _run_stream

    _run_stream(
        spark,
        lambda: ptable_merge_sink(
            stream, path, ["k"], root + "/ckpt", delete_flag_col="is_delete"
        ),
        what="CDC stream",
    )

    lo, hi = 2 * w, 4 * w - 1
    kept = prune_partitions(spark, path, "k", lo, hi)  # manifest only
    return (
        read_ptable(spark, path, partitions=kept)
        .filter(F.col("k").between(lo, hi))
        .select("k", "cust")
    )


# x_ann_recall oracle: the exact top-5 CTE is x_similarity_topk's oracle and
# the ANN CTE is _ANN_PORTABLE_SQL's md5-parity pipeline — both already
# hash-verified entries — composed into per-query recall@5. Intersection is
# over (query, candidate) IDENTITY, so no float compare is involved; the
# only division is one IEEE bigint/double op, identical on both engines.
_ANN_RECALL_SQL = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ex AS (
      SELECT query_id, cand_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 list_dot_product(q.v, c.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(c.v, c.v))) DESC,
                 c.vec_id) AS rn
        FROM e q JOIN e c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 10)
      WHERE rn <= 5
    ),
    hp AS (
      SELECT j, list_transform(range(0, 64),
               d -> CASE WHEN substr(md5(CAST(j * 64 + d AS VARCHAR) || ':42'), 32, 1)
                          IN ('1','3','5','7','9','b','d','f')
                    THEN 1.0 ELSE -1.0 END) AS h
      FROM UNNEST(range(0, 16)) AS t(j)
    ),
    sig AS (
      SELECT e.vec_id,
             CAST(SUM(CASE WHEN list_dot_product(e.v, hp.h) >= 0
                           THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS s
      FROM e CROSS JOIN hp GROUP BY e.vec_id
    ),
    banded AS (
      SELECT vec_id,
             CAST(b AS VARCHAR) || ':' || CAST((s >> CAST(b * 4 AS INT)) & 15 AS VARCHAR)
               AS bucket
      FROM sig, UNNEST(range(0, 4)) AS u(b)
    ),
    qb AS (SELECT vec_id AS query_id, bucket FROM banded WHERE vec_id < 10),
    cp AS (
      SELECT DISTINCT q.query_id, c.vec_id AS cand_id
      FROM qb q JOIN banded c USING (bucket) WHERE q.query_id <> c.vec_id
    ),
    ann AS (
      SELECT query_id, cand_id FROM (
        SELECT cp.query_id, cp.cand_id,
               ROW_NUMBER() OVER (PARTITION BY cp.query_id ORDER BY
                 list_dot_product(qv.v, cv.v)
                   / (sqrt(list_dot_product(qv.v, qv.v))
                      * sqrt(list_dot_product(cv.v, cv.v))) DESC,
                 cp.cand_id) AS rn
        FROM cp
        JOIN e qv ON qv.vec_id = cp.query_id
        JOIN e cv ON cv.vec_id = cp.cand_id)
      WHERE rn <= 5
    )
    SELECT ex.query_id,
           CAST(COUNT(ann.cand_id) AS BIGINT) AS hits,
           CAST(COUNT(ann.cand_id) AS DOUBLE) / CAST(5 AS DOUBLE)
             AS recall_at_5
    FROM ex LEFT JOIN ann
      ON ex.query_id = ann.query_id AND ex.cand_id = ann.cand_id
    GROUP BY ex.query_id
    """


@query(
    "x_ann_recall",
    sql=_ANN_RECALL_SQL,
    note="ANN QUALITY AS A GRADED METRIC: recall@5 of the hyperplane-LSH "
    "index (md5-parity twin of x_similarity_ann_portable) against the "
    "exact brute-force top-5 (x_similarity_topk) — per query, the "
    "fraction of true neighbors the index surfaced. Both constituent "
    "result sets are independently hash-verified entries; this "
    "composition converts the ANN stack's quality from a pytest-only "
    "recall floor into driver-graded evidence. Intersection is over "
    "(query, candidate) identity so no float comparison is involved; "
    "a query whose LSH buckets surfaced nothing still reports (hits=0) "
    "via the left join rather than vanishing. The recall an index "
    "ships with is a NUMBER, not a vibe — at 100 TB you re-run this "
    "probe set against the persisted index after every refresh",
)
def x_ann_recall(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import ann_lsh_topk, brute_force_topk

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(queries, emb, k=5).select("query_id", "cand_id")
    ann = ann_lsh_topk(queries, emb, dim=64, k=5, hash_fn="md5").select(
        "query_id", "cand_id"
    )
    # left join on both identity columns; COUNT of the ann side = hits
    a = ann.select(
        F.col("query_id").alias("aq"), F.col("cand_id").alias("ac")
    )
    return (
        exact.join(
            a,
            (exact.query_id == a.aq) & (exact.cand_id == a.ac),
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("ac").alias("hits"))
        .select(
            "query_id",
            F.col("hits").cast("bigint").alias("hits"),
            (F.col("hits").cast("double") / F.lit(5.0)).alias("recall_at_5"),
        )
    )


def _recall_join(exact, ann, k: int):
    """recall@k of an ANN result against the exact top-k, per query —
    intersection over (query_id, cand_id) IDENTITY (no float compare;
    the only division is one IEEE bigint/double op). A query whose index
    probes surfaced nothing still reports hits=0 via the left join."""
    a = ann.select(
        F.col("query_id").alias("aq"), F.col("cand_id").alias("ac")
    )
    return (
        exact.join(
            a, (exact.query_id == a.aq) & (exact.cand_id == a.ac), "left"
        )
        .groupBy("query_id")
        .agg(F.count("ac").alias("hits"))
        .select(
            "query_id",
            F.col("hits").cast("bigint").alias("hits"),
            (F.col("hits").cast("double") / F.lit(float(k))).alias(
                f"recall_at_{k}"
            ),
        )
    )


# x_ivf_recall / x_pq_recall oracles (r12 VERDICT task 5): the exact top-5
# CTE is x_similarity_topk's oracle and the index CTE is the respective
# entry's own already-hash-verified pipeline (_IVF_KMEANS_SQL / _PQ_SQL,
# legal as a nested-WITH CTE body in DuckDB), composed into per-query
# recall@5 exactly like x_ann_recall — identity intersection, no float
# compare.
_EXACT5_CTE = """
    eo AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ex AS (
      SELECT query_id, cand_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 list_dot_product(q.v, c.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(c.v, c.v))) DESC,
                 c.vec_id) AS rn
        FROM eo q JOIN eo c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 10)
      WHERE rn <= 5
    )"""

_RECALL_TAIL = """
    SELECT ex.query_id,
           CAST(COUNT(idx.cand_id) AS BIGINT) AS hits,
           CAST(COUNT(idx.cand_id) AS DOUBLE) / CAST(5 AS DOUBLE)
             AS recall_at_5
    FROM ex LEFT JOIN idx
      ON ex.query_id = idx.query_id AND ex.cand_id = idx.cand_id
    GROUP BY ex.query_id
"""

_IVF_RECALL_SQL = (
    "WITH " + _EXACT5_CTE + ", idx AS (" + _IVF_KMEANS_SQL + ")" + _RECALL_TAIL
)

_PQ_RECALL_SQL = (
    "WITH " + _EXACT5_CTE + ", idx AS (" + _PQ_SQL + ")" + _RECALL_TAIL
)


@query(
    "x_ivf_recall",
    sql=_IVF_RECALL_SQL,
    note="IVF ANN QUALITY AS A GRADED METRIC (r12 verdict task 5): "
    "recall@5 of the trained-k-means IVF index (x_similarity_ivf_kmeans's "
    "exact pipeline — decimal-routed Lloyd's fit, nprobe=3) against the "
    "exact brute-force top-5 (x_similarity_topk), per query. Both "
    "constituent result sets are independently hash-verified entries; "
    "the composition turns the IVF stack's pytest-only recall floor "
    "into driver-graded evidence. Intersection is over (query, "
    "candidate) identity — no float compare. At 100 TB this is the "
    "quality probe you re-run against the persisted index after every "
    "refresh: nprobe trades recall for probe cost, and this number is "
    "what the trade buys",
)
def x_ivf_recall(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import (
        brute_force_topk,
        ivf_topk,
        kmeans_fit,
    )

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(queries, emb, k=5).select("query_id", "cand_id")
    cents = kmeans_fit(emb, k=8, iters=3)
    ann = ivf_topk(queries, emb, nlist=8, nprobe=3, k=5, centroids=cents).select(
        "query_id", "cand_id"
    )
    return _recall_join(exact, ann, 5)


@query(
    "x_pq_recall",
    sql=_PQ_RECALL_SQL,
    note="PQ/ADC QUALITY AS A GRADED METRIC (r12 verdict task 5): "
    "recall@5 of the product-quantization index (x_similarity_pq's exact "
    "pipeline — per-subspace decimal-routed codebooks, m=4 codes, "
    "asymmetric-distance top-k) against the exact brute-force top-5, "
    "per query, identity intersection. PQ compresses 64 doubles to 4 "
    "codes — this entry grades what that 128x compression costs in "
    "recall, the number a 100 TB corpus quotes before swapping exact "
    "vectors for codes",
)
def x_pq_recall(spark, sf_dir):
    from flnr_wins_spark.functions.vectors import (
        brute_force_topk,
        pq_encode,
        pq_fit,
        pq_topk,
    )

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(queries, emb, k=5).select("query_id", "cand_id")
    books = pq_fit(emb, dim=64, m=4, ksub=16, iters=2)
    enc = pq_encode(emb, books, dim=64, m=4)
    ann = pq_topk(queries, enc, books, dim=64, m=4, k=5).select(
        "query_id", "cand_id"
    )
    return _recall_join(exact, ann, 5)


# x_advisor_estimate oracle: the KMV table-wide NDV (x_ptable_ndv's gtot
# pattern, 60-bit md5 hashes), the System-R containment estimate, and the
# partition sizing are all one-int->double-conversion + one-IEEE-op chains —
# engine-portable per the registry's portable-hashing doctrine.
_ADVISOR_EST_SQL = """
    WITH hl AS (
      SELECT DISTINCT CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15)
                           AS BIGINT) AS h
      FROM orders WHERE o_custkey IS NOT NULL
    ),
    rl AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM hl),
    nl AS (
      SELECT CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE CAST(63 AS DOUBLE) * 1152921504606846976.0
                       / CAST(MAX(h) AS DOUBLE) END AS ndv
      FROM rl WHERE rn <= 64
    ),
    hr AS (
      SELECT DISTINCT CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 15)
                           AS BIGINT) AS h
      FROM customer WHERE c_custkey IS NOT NULL
    ),
    rr_ AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM hr),
    nr AS (
      SELECT CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE CAST(63 AS DOUBLE) * 1152921504606846976.0
                       / CAST(MAX(h) AS DOUBLE) END AS ndv
      FROM rr_ WHERE rn <= 64
    ),
    est AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS rows_left,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS rows_right,
             CAST(FLOOR(
               CAST((SELECT COUNT(*) FROM orders) AS DOUBLE)
               * CAST((SELECT COUNT(*) FROM customer) AS DOUBLE)
               / GREATEST((SELECT ndv FROM nl), (SELECT ndv FROM nr))
             ) AS BIGINT) AS est_rows
    )
    SELECT rows_left, rows_right, est_rows,
           GREATEST(CAST(8 AS BIGINT),
                    CAST(CEIL(CAST(est_rows AS DOUBLE) / CAST(1000 AS DOUBLE))
                         AS BIGINT)) AS shuffle_parts,
           'shuffle' AS strategy,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
             AS n_actual
    FROM est
    """


@query(
    "x_advisor_estimate",
    sql=_ADVISOR_EST_SQL,
    note="The advisor's SHUFFLE path, graded end-to-end: with the "
    "broadcast threshold forced to zero, advise_join reads manifest row "
    "counts + mergeable KMV NDV sketches, computes the System-R output "
    "estimate rows_l * rows_r / max(ndv_l, ndv_r), and sizes the shuffle "
    "partition count from it (min floor pinned at 8 so the value is "
    "environment-independent). The graded row carries the DECISION "
    "(est_rows, shuffle_parts, strategy) next to REALITY (n_actual from "
    "executing the advised join) — the oracle recomputes the identical "
    "KMV estimate relationally, so a drifting sketch, estimator, or "
    "sizing rule breaks the hash. Every input is metadata: the estimate "
    "costs two manifest reads, not a scan. The companion broadcast-path "
    "entry is x_ptable_join_advisor",
)
def x_advisor_estimate(spark, sf_dir):
    from flnr_wins_spark.sources.advisor import advise_join, run_advised_join
    from flnr_wins_spark.sources.ptable import write_ptable

    from flnr_wins_spark.plans.common import cached_fixture

    def _build(d):
        fact = t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderpriority"
        )
        dim = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        write_ptable(
            fact, d + "/fact", "o_orderpriority",
            stats_cols=["o_custkey"], ndv_cols=["o_custkey"],
        )
        write_ptable(
            dim, d + "/dim", "c_mktsegment",
            stats_cols=["c_custkey"], ndv_cols=["c_custkey"],
        )

    ebase = cached_fixture("adv_est_tables", sf_dir, _build)
    fact_path, dim_path = ebase + "/fact", ebase + "/dim"
    advice = advise_join(
        spark, fact_path, dim_path, "o_custkey", "c_custkey",
        broadcast_threshold_bytes=0,       # force the shuffle path
        target_rows_per_partition=1000,
        min_shuffle_partitions=8,          # environment-independent floor
    )
    joined = run_advised_join(
        spark, advice, F.col("o_custkey") == F.col("c_custkey")
    )
    return joined.agg(F.count(F.lit(1)).alias("_n")).select(
        F.lit(advice.left.rows_total).cast("bigint").alias("rows_left"),
        F.lit(advice.right.rows_total).cast("bigint").alias("rows_right"),
        F.lit(advice.est_output_rows).cast("bigint").alias("est_rows"),
        F.lit(advice.shuffle_partitions).cast("bigint").alias("shuffle_parts"),
        F.lit(advice.strategy).alias("strategy"),
        F.col("_n").cast("bigint").alias("n_actual"),
    )


@query(
    "x_ptable_dpp_join",
    sql="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IN (1, 2, 3)
    """,
    note="MANIFEST-LEVEL DYNAMIC PARTITION PRUNING: a selective dim "
    "filter's join keys probe the fact table's per-partition BLOOM "
    "sidecars (prune_partitions_eq per key, union of survivors) before "
    "any fact data is read — the lakehouse analog of Spark's DPP, except "
    "the pruning decision costs one manifest read instead of a runtime "
    "subquery broadcast. The fact is partitioned on an orderkey bucket "
    "(UNCORRELATED with the join key — exactly the case zone maps cannot "
    "prune and blooms exist for); a customer's handful of orders touch "
    "few buckets, so most partitions prune. Bloom negatives are "
    "definitive, so the pruned join hash-matches the oracle's plain "
    "join; positives are re-filtered by the real predicate. Pruning "
    "tightness is pytest-pinned (kept < total); at 100 TB this turns a "
    "key-list probe join into a read of the few partitions that can "
    "contain the keys",
)
def x_ptable_dpp_join(spark, sf_dir):
    from flnr_wins_spark.plans.common import cached_fixture
    from flnr_wins_spark.sources.advisor import prune_points_any
    from flnr_wins_spark.sources.ptable import read_ptable, write_ptable

    def _build(d):
        # pure per sf_dir: cache so regrades pay the bloom PROBE, not
        # a fresh bloom-ptable commit per invocation
        orders = t(spark, sf_dir, "orders")
        max_k = int(orders.agg(F.max("o_orderkey")).collect()[0][0])  # scalar
        w = -(-(max_k + 1) // 32)  # 32 scale-adaptive orderkey buckets
        fact = orders.select(
            "o_orderkey", "o_custkey",
            F.floor(F.col("o_orderkey") / F.lit(w)).cast("string").alias("kb"),
        )
        write_ptable(fact, d + "/tbl", "kb", bloom_cols=["o_custkey"])

    path = cached_fixture("ptable_dpp", sf_dir, _build) + "/tbl"

    keys = [1, 2, 3]  # the dim filter's join keys (bounded by selectivity)
    # ONE manifest read serves all three probes (union of survivors)
    kept = prune_points_any(spark, path, "o_custkey", keys)
    if not kept:
        # definitive bloom negatives can legitimately exclude EVERY
        # partition (no probe key present, no false positive) — that is
        # the empty answer, not an error
        from flnr_wins_spark.localrel import local_df

        return local_df(
            spark, [], "o_orderkey bigint, o_custkey bigint, c_name string"
        )
    dim = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey").isin(keys))
        .select("c_custkey", "c_name")
    )
    return (
        read_ptable(spark, path, partitions=kept)
        .filter(F.col("o_custkey").isin(keys))
        .join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_custkey", "c_name")
    )


# x_partition_bounds_advisor oracle: the content-addressed value sample
# (distinct values, 60-bit md5 order, k smallest) and the bound-picking rule
# sample_sorted[(i*m)//n] are pure integer/hash constructions — the oracle
# recomputes them relationally, so bounds AND bucket row counts hash-match.
_BOUNDS_ADV_SQL = """
    WITH vals AS (
      SELECT DISTINCT o_custkey AS v FROM orders WHERE o_custkey IS NOT NULL
    ),
    hs AS (
      SELECT v, CAST('0x' || substring(md5(CAST(v AS VARCHAR)), 1, 15)
                     AS BIGINT) AS h
      FROM vals
    ),
    samp AS (
      SELECT v FROM (
        SELECT v, ROW_NUMBER() OVER (ORDER BY h, v) AS rn FROM hs)
      WHERE rn <= 256
    ),
    sv AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS vr FROM samp),
    mm AS (SELECT COUNT(*) AS m FROM samp),
    bounds AS (
      SELECT CAST(t.i AS BIGINT) AS i,
             (SELECT v FROM sv
              WHERE vr = (t.i * (SELECT m FROM mm)) // 8 + 1) AS bv
      FROM UNNEST(range(1, 8)) AS t(i)
    ),
    bucketed AS (
      SELECT CAST((SELECT COUNT(*) FROM bounds b WHERE o.o_custkey > b.bv)
                  AS BIGINT) AS bucket
      FROM orders o
    )
    SELECT g.bucket,
           (SELECT bv FROM bounds WHERE i = g.bucket + 1) AS upper_bound,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM bucketed g GROUP BY g.bucket
    """


@query(
    "x_partition_bounds_advisor",
    sql=_BOUNDS_ADV_SQL,
    note="RANGE-PARTITION PLANNING from metadata: the table commits a "
    "content-addressed VALUE SAMPLE sidecar (k distinct values with the "
    "smallest 60-bit md5 hashes — mergeable across partitions by the "
    "same k-smallest argument as the KMV sketch, but carrying VALUES), "
    "and propose_range_bounds reads the MERGED sample from the manifest "
    "to pick 7 split values for an 8-way range layout — zero data files "
    "touched for the decision. The graded rows carry the proposal "
    "(upper_bound per bucket) next to the witness (actual per-bucket row "
    "counts over the real data — near-balanced because the key is "
    "near-uniform). The oracle recomputes the identical sample, bounds, "
    "and counts relationally. At 100 TB this is how repartition_ptable / "
    "repartitionByRange bounds get chosen without a sort or a scan: the "
    "sample rides every commit, the planner reads JSON",
)
def x_partition_bounds_advisor(spark, sf_dir):
    from flnr_wins_spark.sources.advisor import (
        propose_range_bounds,
        range_bucket,
    )
    from flnr_wins_spark.sources.ptable import read_ptable, write_ptable

    from flnr_wins_spark.plans.common import cached_fixture

    def _build(d):
        orders = t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderpriority"
        )
        write_ptable(
            orders, d + "/tbl", "o_orderpriority", sample_cols=["o_custkey"]
        )

    path = cached_fixture("bounds_adv", sf_dir, _build) + "/tbl"
    bounds = propose_range_bounds(spark, path, "o_custkey", 8)

    counts = (
        read_ptable(spark, path)
        .select(
            range_bucket(F.col("o_custkey"), bounds)
            .cast("bigint")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    ub = None
    for i, b in enumerate(bounds):
        cond = F.col("bucket") == i
        ub = F.when(cond, F.lit(b)) if ub is None else ub.when(cond, F.lit(b))
    ub = ub.otherwise(F.lit(None)).cast("bigint")
    return counts.select(
        "bucket", ub.alias("upper_bound"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
    )


@query(
    "x_ptable_time_travel",
    sql="""
    WITH base AS (
      SELECT o_orderkey AS k, o_custkey AS cust FROM orders
    ),
    v2 AS (
      SELECT k, cust + 5000000 AS cust FROM base
      WHERE k % 11 = 0 AND k % 23 <> 0
      UNION ALL
      SELECT k, cust FROM base WHERE k % 11 <> 0 AND k % 23 <> 0
    )
    SELECT CAST(1 AS BIGINT) AS ver, k, cust FROM base
    UNION ALL
    SELECT CAST(2 AS BIGINT) AS ver, k, cust FROM v2
    """,
    note="TIME TRAVEL graded end-to-end: bootstrap the MVCC table "
    "(manifest m1), merge a changeset of updates + deletes (manifest "
    "m2), then read BOTH versions in one result — the m1 read must "
    "reproduce the pre-merge table exactly (stage dirs are immutable; "
    "the merge rewrote only touched partitions and the old manifest "
    "still references the old stages), while the m2 read reflects the "
    "changeset. The oracle replays both states relationally. This is "
    "the reproducibility contract a training pipeline leans on at "
    "100 TB: yesterday's snapshot stays byte-stable under today's "
    "ingestion, rollback is a manifest id, and an audit diff is two "
    "reads of the same table",
)
def x_ptable_time_travel(spark, sf_dir):
    from flnr_wins_spark.sources.ptable import (
        merge_ptable,
        read_ptable,
        write_ptable,
    )

    from flnr_wins_spark.plans.common import cached_fixture

    def _build(d):
        # the m1 commit AND the m2 merge are both a pure function of
        # sf_dir — the graded behavior is the two versioned READS below
        orders = t(spark, sf_dir, "orders")
        base = orders.select(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("part"),
            F.col("o_custkey").alias("cust"),
        )
        write_ptable(base, d + "/tbl", "part")  # manifest m1
        upd = base.filter(
            (F.col("k") % 11 == 0) & (F.col("k") % 23 != 0)
        ).select("k", "part", (F.col("cust") + F.lit(5000000)).alias("cust"))
        dels = base.filter(F.col("k") % 23 == 0).select("k", "part")
        merge_ptable(spark, d + "/tbl", upd, ["k"], delete_keys=dels)  # m2

    path = cached_fixture("ptable_tt", sf_dir, _build) + "/tbl"
    v1 = read_ptable(spark, path, manifest=1).select(
        F.lit(1).cast("bigint").alias("ver"), "k", "cust"
    )
    v2 = read_ptable(spark, path, manifest=2).select(
        F.lit(2).cast("bigint").alias("ver"), "k", "cust"
    )
    return v1.unionByName(v2)


@query(
    "x_advisor_colocated",
    sql="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(27,2))) AS DOUBLE)
             AS gross,
           'colocated' AS strategy
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    note="The advisor's THIRD strategy, graded: both join sides are "
    "bucketed catalog tables, advise_catalog_join reads the METASTORE "
    "bucket specs (DESCRIBE FORMATTED — no data touched) and picks "
    "'colocated' because both sides bucket on exactly their join key "
    "with equal bucket counts — the write-time shuffle is already paid, "
    "so run_advised_catalog_join executes a sort-merge join with NO "
    "exchange on either side (plan contract pins exactly one Exchange: "
    "the 5-row aggregate's). The decision is structural (bucket spec "
    "equality), so it is deterministic at every SF, and the result "
    "hash-matches the plain relational join. Together with "
    "x_ptable_join_advisor (broadcast) and x_advisor_estimate (shuffle, "
    "sized from KMV estimates) this completes the broadcast / shuffle / "
    "bucketed strategy triple a cost-based planner chooses among",
)
def x_advisor_colocated(spark, sf_dir):
    from flnr_wins_spark.sources.advisor import (
        advise_catalog_join,
        run_advised_catalog_join,
    )
    from flnr_wins_spark.sources.bucketing import write_bucketed

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    od = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    write_bucketed(li, "x_adv_li", ["l_orderkey"], n_buckets=8)
    write_bucketed(od, "x_adv_od", ["o_orderkey"], n_buckets=8)
    advice = advise_catalog_join(
        spark, "x_adv_li", "x_adv_od", ["l_orderkey"], ["o_orderkey"]
    )
    j = run_advised_catalog_join(
        spark, advice, F.col("l_orderkey") == F.col("o_orderkey")
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(27,2)"))
        .cast("double").alias("gross"),
    ).select(
        "o_orderpriority", "n_items", "gross",
        F.lit(advice.strategy).alias("strategy"),
    )


# x_dedup_index_incremental oracle: the md5-portable MinHash construction of
# _MINHASH_PORTABLE_SQL, with the pair space restricted to (new = odd ids,
# indexed base = even ids) — probing a persisted index against a new batch
# is relationally just that asymmetric candidate join.
_DEDUP_INDEX_SQL = (
    f"""
    WITH docs AS ({_DUP_SQL_DOCS}),
    tk AS (
      SELECT doc_id AS id, string_split(text, ' ') AS tks FROM docs
    ),
    sh AS (
      SELECT id, list_distinct(list_transform(range(1, len(tks) - 1),
             i -> tks[i] || ' ' || tks[i+1] || ' ' || tks[i+2])) AS shset
      FROM tk WHERE len(tks) >= 3
    ),
    sig AS (
      SELECT id, shset,
    """
    + ",\n".join(
        f"         list_min(list_transform(shset, s -> md5(s || ':{42 + i}'))) AS mh_{i}"
        for i in range(8)
    )
    + """
      FROM sh
    ),
    cand AS (
      SELECT n.id AS id_new, b.id AS id_base,
             n.shset AS sh_n, b.shset AS sh_b
      FROM sig n JOIN sig b ON n.id % 2 = 1 AND b.id % 2 = 0
       AND ("""
    + " OR ".join(f"n.mh_{i} = b.mh_{i}" for i in range(8))
    + """)
    ),
    j AS (
      SELECT id_new, id_base,
             CAST(len(list_intersect(sh_n, sh_b)) AS DOUBLE)
               / (len(sh_n) + len(sh_b) - len(list_intersect(sh_n, sh_b)))
               AS jaccard
      FROM cand
    )
    SELECT id_new, id_base, jaccard FROM j WHERE jaccard >= 0.8
    """
)


@query(
    "x_dedup_index_incremental",
    sql=_DEDUP_INDEX_SQL,
    note="DEDUP-AT-INGESTION with a PERSISTED index: the base corpus's "
    "MinHash signature + shingle table (md5-portable, 8 tables) commits "
    "through the versioned snapshot layer once; a NEW batch computes "
    "signatures for ITSELF ONLY (O(new), narrow map) and probes the "
    "LOADED index via the banded (table, minhash) join — candidates "
    "verify by exact Jaccard against the index's stored shingle sets. "
    "The oracle rebuilds both sides relationally and restricts the pair "
    "space to new-vs-base, so probe-over-loaded-index == "
    "probe-over-fresh-build, bit for bit. This is the batch twin of the "
    "streaming near-dup ingestion gate (streaming/sinks.py), with "
    "driver-graded evidence: at 100 TB you never re-sign the corpus to "
    "admit a batch — index refresh is appending the batch's own "
    "signature rows (the next write_snapshot), and the probe cost is "
    "O(new x bucket width)",
)
def x_dedup_index_incremental(spark, sf_dir):
    from flnr_wins_spark.operators.dedup import (
        exact_jaccard,
        minhash_bands,
        minhash_signature_table,
    )
    from flnr_wins_spark.sources.snapshots import read_snapshot, write_snapshot

    from flnr_wins_spark.plans.common import cached_fixture

    docs = _docs_with_dups(spark, sf_dir)
    base = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)

    def _build(d):
        # the persisted base index is pure per sf_dir; the graded
        # behavior is the O(new) probe over the LOADED index below
        write_snapshot(
            minhash_signature_table(
                base, "text", "doc_id", num_hash_tables=8, hash_fn="md5",
                min_parallelism=spark.sparkContext.defaultParallelism,
            ),
            d + "/index",
        )

    idx_path = cached_fixture("dedup_index", sf_dir, _build) + "/index"
    idx = read_snapshot(spark, idx_path)  # loaded index, not a refit
    probe = minhash_signature_table(
        new, "text", "doc_id", num_hash_tables=8, hash_fn="md5",
        min_parallelism=spark.sparkContext.defaultParallelism,
    )
    pb = minhash_bands(probe, 8).withColumnRenamed("id", "id_new")
    ib = minhash_bands(idx, 8).withColumnRenamed("id", "id_base")
    cand = pb.join(ib, ["band", "mhv"]).select("id_new", "id_base").distinct()
    a = probe.select(F.col("id").alias("id_new"), F.col("shset").alias("sh_n"))
    b = idx.select(F.col("id").alias("id_base"), F.col("shset").alias("sh_b"))
    return (
        cand.join(a, "id_new")
        .join(b, "id_base")
        .select(
            "id_new", "id_base",
            exact_jaccard(F.col("sh_n"), F.col("sh_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
    )


# ---------------------------------------------------------------------------
# Round-10 surfaces: value-level skew sidecar, auto-advised read path,
# graded JDBC snapshot
# ---------------------------------------------------------------------------

def _skew_family_fixture(spark, sf_dir):
    """ONE shared fixture for the whole hot-key skew/advisor family
    (r12 VERDICT task 4): x_skew_sidecar_join, x_auto_skew_join,
    x_grid_skew_{join,left,full,right}, and x_right_hot_left_join each
    rebuilt overlapping lineitem-scale ptables in sweep tail positions
    (~370 s totals, SWEEP_TIMINGS_r12) — the fact commit with its
    heavy-hitter sidecar dominates and was paid FOUR times. One
    cached_fixture key now builds, once per process:

      /fact        hot fact: key 0 holds half the rows, spread evenly
                   across partitions (partition-granular counts see NO
                   skew — only the value-level sidecar does); carries
                   ``rid`` for the sidecar entry's tiebreak (harmless
                   surplus for the others: every consumer aggregates
                   over skew_key/qty only, and the grid's all-columns
                   salt stays a uniform hash)
      /dim_auto    one row per live key + grp (x_auto_skew_join)
      /dim_grid    both-sides-hot dim: roster + 40 extra key-0 reps,
                   heavy sidecar flags key 0 (the grid entries)
      /probe_right right-only-hot roster: live keys + 20 matchless keys
                   1000..1019, sidecar flags NOTHING
                   (x_right_hot_left_join)
    """
    from flnr_wins_spark.plans.common import cached_fixture
    from flnr_wins_spark.sources.ptable import write_ptable

    def _build(d):
        li = t(spark, sf_dir, "lineitem")
        fact = li.select(
            F.when(F.col("l_orderkey") % 10 < 5, F.lit(0).cast("bigint"))
            .otherwise(F.col("l_orderkey") % 1000)
            .alias("skew_key"),
            F.pmod(F.col("l_partkey"), F.lit(8)).cast("string").alias("pb"),
            F.col("l_quantity").alias("qty"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        )
        n = fact.count()  # scalar: sizes the scale-adaptive threshold
        write_ptable(
            fact, d + "/fact", "pb",
            stats_cols=["skew_key"],
            heavy_cols=["skew_key"], heavy_k=32,
            heavy_threshold=max(2, n // 512),
        )
        keys = fact.select("skew_key").distinct()
        write_ptable(
            keys.withColumn("grp", F.col("skew_key") % 7)
            .withColumn("db", F.lit("all")),
            d + "/dim_auto", "db", stats_cols=["skew_key"],
        )
        reps = spark.range(40).select(
            F.lit(0).cast("bigint").alias("skew_key"),
            F.col("id").cast("bigint").alias("rep"),
        )
        dim = (
            keys.withColumn("rep", F.lit(-1).cast("bigint"))
            .unionByName(reps)
            .withColumn("db", F.lit("all"))
        )
        write_ptable(
            dim, d + "/dim_grid", "db",
            stats_cols=["skew_key"],
            heavy_cols=["skew_key"], heavy_k=8, heavy_threshold=8,
        )
        probe = keys.unionByName(
            spark.range(20).select(
                (F.col("id") + 1000).cast("bigint").alias("skew_key")
            )
        ).withColumn("db", F.lit("all"))
        write_ptable(
            probe, d + "/probe_right", "db",
            stats_cols=["skew_key"],
            heavy_cols=["skew_key"], heavy_k=8, heavy_threshold=8,
        )

    return cached_fixture("skew_family", sf_dir, _build)


_SKEW_SIDECAR_SQL = """
    WITH f AS (
      SELECT CASE WHEN l_orderkey % 10 < 5 THEN 0
                  ELSE l_orderkey % 1000 END AS skew_key,
             l_quantity
      FROM lineitem
    ),
    d AS (SELECT DISTINCT skew_key FROM f),
    d2 AS (SELECT skew_key, skew_key % 7 AS grp FROM d)
    SELECT d2.grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(f.l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
           'salt' AS advice,
           CAST(1 AS INT) AS n_hot
    FROM f JOIN d2 ON f.skew_key = d2.skew_key
    GROUP BY d2.grp
"""


@query(
    "x_skew_sidecar_join",
    sql=_SKEW_SIDECAR_SQL,
    note="VALUE-LEVEL skew handled end-to-end from METADATA: the fact "
    "table (half its rows piled on one derived join key, spread evenly "
    "across partitions so partition-granular row counts see NO skew) "
    "commits with the heavy-hitter sidecar — per-partition exact counts "
    "for the k hash-smallest values plus every value above a "
    "per-partition threshold, both exactly mergeable by addition "
    "(ptable._compute_heavy). detect_key_skew reads the MANIFEST ALONE, "
    "flags the hot key from the merged lower bounds, and salted_join "
    "salts ONLY that key (hot slice: xxhash64 salt spread over 16 "
    "buckets; long tail joins plain) — the graded result hash-matches "
    "the plain relational join, with the metadata-driven decision "
    "carried as literals. At 100 TB this is the straggler killer AQE "
    "cannot give you for stream-static or broadcast-ineligible joins: "
    "the hot-key decision costs one manifest read, BEFORE any shuffle "
    "runs, and the salt replication cost scales with the hot keys' "
    "dimension rows, not the dimension",
)
def x_skew_sidecar_join(spark, sf_dir):
    from flnr_wins_spark.operators.skew import salted_join
    from flnr_wins_spark.sources.advisor import detect_key_skew
    from flnr_wins_spark.sources.ptable import read_ptable

    path = _skew_family_fixture(spark, sf_dir) + "/fact"
    rep = detect_key_skew(spark, path, "skew_key", hot_ratio=0.05)
    big = read_ptable(spark, path)
    dim = (
        big.select("skew_key").distinct()
        .withColumn("grp", F.col("skew_key") % 7)
    )
    joined = salted_join(
        big, dim, "skew_key", "rid", buckets=16, hot_keys=rep.hot_keys
    )
    return (
        joined.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("qty").cast("decimal(27,2)")).cast("double").alias("sum_qty"),
        )
        .select(
            "grp", "n_rows", "sum_qty",
            F.lit(rep.advice).alias("advice"),
            F.lit(len(rep.hot_keys)).cast("int").alias("n_hot"),
        )
    )


_AUTO_READ_SQL = """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS revenue,
           'broadcast' AS strategy,
           'right' AS build_side
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <= TIMESTAMP '1996-12-31 23:59:59'
      AND c_mktsegment = 'BUILDING'
    GROUP BY c_mktsegment
"""


@query(
    "x_advisor_auto_read",
    sql=_AUTO_READ_SQL,
    bench=True,  # r11 promotion: flagship auto-advised read path
    note="The AUTO-ADVISED read path end-to-end (advise_auto_join -> "
    "run_auto_join): predicates are declared ONCE, pruning runs through "
    "every sidecar they can use — the fact's o_orderdate range prunes "
    "year partitions via zone maps, the dim's mktsegment point prunes "
    "via hive partition identity — and the join strategy is decided "
    "from statistics of the PRUNED partition sets only (bytes listed "
    "for kept partitions, manifest rows, merged KMV NDV). Residual "
    "re-filters restore row-exactness after the partition-granular "
    "prune, so the result hash-matches the plain filtered join (the "
    "oracle) — the scan set and strategy changed, the answer did not. "
    "Threshold pinned above fixture sizes for an SF-independent "
    "decision (broadcast, build=right: the pruned dim is smaller at "
    "every SF); both real-threshold directions are pytest-pinned. At "
    "100 TB this is partition-pruning-aware CBO: a date range that "
    "keeps 2 of 7 years changes broadcast feasibility and shuffle "
    "sizing, and the decision sees it for one manifest read + one "
    "listing of the KEPT partitions — never a data file",
)
def x_advisor_auto_read(spark, sf_dir):
    from flnr_wins_spark.sources.advisor import advise_auto_join, run_auto_join
    from flnr_wins_spark.sources.ptable import write_ptable

    from flnr_wins_spark.plans.common import cached_fixture

    def _build(d):
        fact = t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderdate",
            F.col("o_totalprice").cast("decimal(27,2)").alias("price"),
            F.year("o_orderdate").cast("string").alias("oy"),
        )
        dim = t(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_mktsegment"
        )
        write_ptable(
            fact, d + "/fact", "oy",
            stats_cols=["o_orderdate", "o_custkey"], ndv_cols=["o_custkey"],
        )
        write_ptable(
            dim, d + "/dim", "c_mktsegment",
            stats_cols=["c_custkey"], ndv_cols=["c_custkey"],
        )

    abase = cached_fixture("auto_read_tables", sf_dir, _build)
    fact_path, dim_path = abase + "/fact", abase + "/dim"
    plan = advise_auto_join(
        spark, fact_path, dim_path, "o_custkey", "c_custkey",
        left_ranges={
            "o_orderdate": ("1995-01-01T00:00:00", "1996-12-31T23:59:59")
        },
        right_points={"c_mktsegment": "BUILDING"},
        broadcast_threshold_bytes=1 << 40,
    )
    joined = run_auto_join(spark, plan)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("price").cast("double").alias("revenue"),
        )
        .select(
            "c_mktsegment", "n_orders", "revenue",
            F.lit(plan.join.strategy).alias("strategy"),
            F.lit(plan.join.build_side).alias("build_side"),
        )
    )


_JDBC_SNAPSHOT_SQL = """
    SELECT n_regionkey,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           MIN(n_name) AS first_name
    FROM nation GROUP BY n_regionkey
"""


@query(
    "x_jdbc_snapshot",
    sql=_JDBC_SNAPSHOT_SQL,
    note="S9 (reference wts.py:174, the SDE view CopyRows snapshot) "
    "graded end-to-end over a LIVE JDBC endpoint: the nation table is "
    "loaded into an embedded in-memory Derby database through Spark's "
    "real JDBC writer, read back via spark.read.jdbc (the genuine "
    "remote-view path, including the Derby CLOB->string round trip for "
    "VARCHAR columns), snapshotted to parquet (snapshot_view — the "
    "CopyRows analog), and the downstream aggregate runs on the "
    "SNAPSHOT. The oracle runs the same aggregate on the original "
    "parquet — a hash match proves the whole remote->snapshot->query "
    "chain is value-faithful. At scale the snapshot is the point: "
    "downstream stages re-read cheap columnar parquet, never re-query "
    "the source system, exactly the reference's staging discipline",
)
def x_jdbc_snapshot(spark, sf_dir):
    from flnr_wins_spark.plans.common import cached_fixture
    from flnr_wins_spark.sources.jdbc import read_jdbc_view, snapshot_view

    # the Derby load + snapshot is a PURE function of sf_dir — build it
    # once per process so re-invocations (bench min-of-N, driver
    # regrades) measure the downstream aggregate, not a JDBC reload
    # (ADVICE r10)
    def _build(d):
        nation = t(spark, sf_dir, "nation")
        url = "jdbc:derby:memory:xjdbcsnap;create=true"
        opts = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
        (
            nation.write.format("jdbc")
            .option("url", url)
            .option("dbtable", "nation_src")
            .option("driver", opts["driver"])
            .mode("overwrite")
            .save()
        )
        remote = read_jdbc_view(spark, url, "nation_src", options=opts)
        snapshot_view(remote, d + "/nation")

    snap = cached_fixture("jdbc_snap", sf_dir, _build) + "/nation"
    s = spark.read.parquet(snap)
    return s.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


_AUTO_SKEW_SQL = """
    WITH f AS (
      SELECT CASE WHEN l_orderkey % 10 < 5 THEN 0
                  ELSE l_orderkey % 1000 END AS skew_key,
             l_quantity
      FROM lineitem
    ),
    d AS (SELECT DISTINCT skew_key FROM f),
    d2 AS (SELECT skew_key, skew_key % 7 AS grp FROM d)
    SELECT d2.grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(f.l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
           'shuffle' AS strategy,
           CAST(1 AS INT) AS n_hot
    FROM f JOIN d2 ON f.skew_key = d2.skew_key
    GROUP BY d2.grp
"""


@query(
    "x_auto_skew_join",
    sql=_AUTO_SKEW_SQL,
    bench=True,  # r11 promotion: automatic skew arm of the auto path
    note="The auto-advised path's SKEW arm, graded: with the broadcast "
    "threshold forced to zero the decision is shuffle, and "
    "advise_auto_join reads the left heavy-hitter sidecar to flag the "
    "one hot join key (half the fact's rows) from the MANIFEST alone — "
    "run_auto_join then executes the hot/tail salted split "
    "(xxhash64-of-all-columns salt, plain long tail) and the result "
    "hash-matches the plain relational join. Same fixture shape as "
    "x_skew_sidecar_join but the salting decision is AUTOMATIC — no "
    "caller names a hot key or a salt column. At 100 TB this closes "
    "the loop: commit-time exact counts -> manifest read -> the one "
    "key that would straggle a 1000-executor shuffle is spread across "
    "16 tasks before the shuffle runs",
)
def x_auto_skew_join(spark, sf_dir):
    from flnr_wins_spark.sources.advisor import advise_auto_join, run_auto_join

    base = _skew_family_fixture(spark, sf_dir)
    plan = advise_auto_join(
        spark, base + "/fact", base + "/dim_auto", "skew_key",
        broadcast_threshold_bytes=0,  # force the shuffle strategy
        min_shuffle_partitions=8,     # environment-independent floor
    )
    joined = run_auto_join(spark, plan)
    return (
        joined.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("qty").cast("decimal(27,2)")).cast("double").alias("sum_qty"),
        )
        .select(
            "grp", "n_rows", "sum_qty",
            F.lit(plan.join.strategy).alias("strategy"),
            F.lit(len(plan.hot_keys)).cast("int").alias("n_hot"),
        )
    )


def _grid_skew_fixture(spark, sf_dir):
    """Both-sides-hot fixture for the grid entries: the fact's key 0
    holds half the rows; the dim carries one row per key PLUS 40 extra
    key-0 rows (distinct rep ids so the grid's all-columns hash actually
    spreads them) — hot on the dim side too at every SF (41 rows vs the
    5% floor over ~340-540 total), and only key 0 crosses the
    SF-independent commit threshold of 8. Since r13 a view over the
    family-wide :func:`_skew_family_fixture` (fact built ONCE for all
    seven skew/advisor entries); the grid dim lives at /dim_grid."""
    return _skew_family_fixture(spark, sf_dir)



_GRID_SKEW_SQL = """
    WITH f AS (
      SELECT CASE WHEN l_orderkey % 10 < 5 THEN 0
                  ELSE l_orderkey % 1000 END AS skew_key,
             l_quantity
      FROM lineitem
    ),
    d AS (SELECT DISTINCT skew_key FROM f),
    r AS (
      SELECT skew_key FROM d
      UNION ALL
      SELECT CAST(0 AS BIGINT) FROM range(40)
    )
    SELECT CAST(f.skew_key % 7 AS BIGINT) AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(f.l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
           'shuffle' AS strategy,
           CAST(1 AS INT) AS n_hot_left,
           CAST(1 AS INT) AS n_hot_right
    FROM f JOIN r ON f.skew_key = r.skew_key
    GROUP BY 1
"""


@query(
    "x_grid_skew_join",
    sql=_GRID_SKEW_SQL,
    note="The 2-D GRID-salted join, auto-selected: key 0 is hot on BOTH "
    "sides (half the fact's rows; 41 of ~540 dim rows — above the 5% "
    "ratio), the genuinely quadratic |L_0| x |R_0| case one-sided "
    "salting cannot fix (whichever side salts, every pair still routes "
    "through the other side's single partition of that key). Both "
    "manifests' heavy sidecars flag it, advise_auto_join carries hot "
    "keys for both sides, and run_auto_join routes the hot slice "
    "through grid_salted_join — each left row to ONE of 8 cell columns "
    "replicated over 8 cell rows, each right row to ONE cell row "
    "replicated over 8 columns, so a pair meets in EXACTLY ONE of 64 "
    "cells (no duplicates, exact result) and the quadratic output is "
    "built by 64 tasks instead of one. The long tail joins plain; the "
    "result hash-matches the plain relational join with the per-side "
    "hot-key counts carried as graded literals. At 100 TB this is the "
    "mega-key self-join/fact-fact straggler killer: replication cost is "
    "hot-slice x 8 per side, never |table| x grid",
)
def x_grid_skew_join(spark, sf_dir):
    from flnr_wins_spark.sources.advisor import advise_auto_join, run_auto_join

    base = _grid_skew_fixture(spark, sf_dir)
    plan = advise_auto_join(
        spark, base + "/fact", base + "/dim_grid", "skew_key",
        broadcast_threshold_bytes=0,  # force the shuffle strategy
        min_shuffle_partitions=8,     # environment-independent floor
    )
    joined = run_auto_join(spark, plan)
    return (
        joined.groupBy((F.col("skew_key") % 7).cast("bigint").alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("qty").cast("decimal(27,2)")).cast("double").alias("sum_qty"),
        )
        .select(
            "grp", "n_rows", "sum_qty",
            F.lit(plan.join.strategy).alias("strategy"),
            F.lit(len(plan.hot_keys)).cast("int").alias("n_hot_left"),
            F.lit(len(plan.hot_keys_right)).cast("int").alias("n_hot_right"),
        )
    )


_GRID_SKEW_LEFT_SQL = """
    WITH f AS (
      SELECT CASE WHEN l_orderkey % 10 < 5 THEN 0
                  ELSE l_orderkey % 1000 END AS skew_key,
             l_quantity
      FROM lineitem
    ),
    d AS (SELECT DISTINCT skew_key FROM f),
    r AS (
      SELECT skew_key, CAST(-1 AS BIGINT) AS rep FROM d
      UNION ALL
      SELECT CAST(0 AS BIGINT), CAST(i AS BIGINT) FROM range(40) t(i)
    ),
    rf AS (SELECT skew_key, rep FROM r WHERE skew_key <= 500)
    SELECT CAST(f.skew_key % 7 AS BIGINT) AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(rf.rep) AS BIGINT) AS n_matched,
           CAST(SUM(CAST(f.l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
           'shuffle' AS strategy,
           CAST(1 AS INT) AS n_hot_left,
           CAST(1 AS INT) AS n_hot_right
    FROM f LEFT JOIN rf ON f.skew_key = rf.skew_key
    GROUP BY 1
"""


@query(
    "x_grid_skew_left",
    sql=_GRID_SKEW_LEFT_SQL,
    note="The grid-salted join's LEFT arm, auto-selected on the same "
    "both-sides-hot fixture as x_grid_skew_join (built once, shared): "
    "a zone-map range predicate (skew_key <= 500) residual-filters the "
    "dim, so fact keys above 500 are genuinely MATCHLESS and must "
    "null-pad exactly once. A left join cannot ride the replicated "
    "grid directly (an unmatched row would null-fill once per phantom "
    "cell), so grid_salted_join decomposes it exactly: the grid INNER "
    "join supplies every matched pair in 64 parallel cells, and the "
    "null-padded complement comes from a left-anti probe against the "
    "dim's DISTINCT keys — a key-count-sized set, skew-free however "
    "hot the dim rows are. Hash-matches the plain relational LEFT "
    "join; n_matched counts null-padded rows apart from matched ones. "
    "At 100 TB this closes the left-join gap of the both-hot arm: "
    "enrichment joins against a hot dimension keep outer semantics "
    "without a single straggler task",
)
def x_grid_skew_left(spark, sf_dir):
    from flnr_wins_spark.sources.advisor import advise_auto_join, run_auto_join

    base = _grid_skew_fixture(spark, sf_dir)
    plan = advise_auto_join(
        spark, base + "/fact", base + "/dim_grid", "skew_key",
        right_ranges={"skew_key": (None, 500)},
        broadcast_threshold_bytes=0,  # force the shuffle strategy
        min_shuffle_partitions=8,     # environment-independent floor
    )
    joined = run_auto_join(spark, plan, how="left")
    return (
        joined.groupBy((F.col("skew_key") % 7).cast("bigint").alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("rep").cast("bigint").alias("n_matched"),
            F.sum(F.col("qty").cast("decimal(27,2)")).cast("double").alias("sum_qty"),
        )
        .select(
            "grp", "n_rows", "n_matched", "sum_qty",
            F.lit(plan.join.strategy).alias("strategy"),
            F.lit(len(plan.hot_keys)).cast("int").alias("n_hot_left"),
            F.lit(len(plan.hot_keys_right)).cast("int").alias("n_hot_right"),
        )
    )


_GRID_SKEW_FULL_SQL = """
    WITH f AS (
      SELECT CASE WHEN l_orderkey % 10 < 5 THEN 0
                  ELSE l_orderkey % 1000 END AS skew_key,
             l_quantity
      FROM lineitem
    ),
    d AS (SELECT DISTINCT skew_key FROM f),
    r AS (
      SELECT skew_key, CAST(-1 AS BIGINT) AS rep FROM d
      UNION ALL
      SELECT CAST(0 AS BIGINT), CAST(i AS BIGINT) FROM range(40) t(i)
    ),
    ff AS (SELECT skew_key, l_quantity FROM f WHERE skew_key <= 500)
    SELECT CAST(COALESCE(ff.skew_key, r.skew_key) % 7 AS BIGINT) AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN ff.l_quantity IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dim_only,
           CAST(SUM(CAST(ff.l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
           'shuffle' AS strategy,
           CAST(1 AS INT) AS n_hot_left,
           CAST(1 AS INT) AS n_hot_right
    FROM ff FULL JOIN r ON ff.skew_key = r.skew_key
    GROUP BY 1
"""


@query(
    "x_grid_skew_full",
    sql=_GRID_SKEW_FULL_SQL,
    note="The grid-salted join's FULL OUTER arm, auto-selected on the "
    "same both-sides-hot fixture as x_grid_skew_join (built once, "
    "shared): a zone-map range predicate (skew_key <= 500) residual-"
    "filters the FACT this time, so dim keys above 500 are genuinely "
    "matchless from the RIGHT and must emit left-null-padded exactly "
    "once — the complement a left join never surfaces. Full outer "
    "cannot ride the replicated grid directly on either side, so "
    "grid_salted_join decomposes it exactly: the grid INNER join "
    "supplies every matched pair in 64 parallel cells, and TWO "
    "skew-free distinct-key anti probes (left against the dim's keys, "
    "the transpose against the fact's) supply both null-padded "
    "complements. Hash-matches the plain relational FULL join; "
    "n_dim_only counts the left-null-padded rows. At 100 TB this "
    "completes the outer-join matrix of the skew arsenal: "
    "reconciliation joins (both sides must survive) over a mega-key "
    "no longer straggle",
)
def x_grid_skew_full(spark, sf_dir):
    from flnr_wins_spark.sources.advisor import advise_auto_join, run_auto_join

    base = _grid_skew_fixture(spark, sf_dir)
    plan = advise_auto_join(
        spark, base + "/fact", base + "/dim_grid", "skew_key",
        left_ranges={"skew_key": (None, 500)},
        broadcast_threshold_bytes=0,  # force the shuffle strategy
        min_shuffle_partitions=8,     # environment-independent floor
    )
    joined = run_auto_join(spark, plan, how="full")
    return (
        joined.groupBy((F.col("skew_key") % 7).cast("bigint").alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("qty").isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_dim_only"),
            F.sum(F.col("qty").cast("decimal(27,2)")).cast("double").alias("sum_qty"),
        )
        .select(
            "grp", "n_rows", "n_dim_only", "sum_qty",
            F.lit(plan.join.strategy).alias("strategy"),
            F.lit(len(plan.hot_keys)).cast("int").alias("n_hot_left"),
            F.lit(len(plan.hot_keys_right)).cast("int").alias("n_hot_right"),
        )
    )


_GRID_SKEW_RIGHT_SQL = """
    WITH f AS (
      SELECT CASE WHEN l_orderkey % 10 < 5 THEN 0
                  ELSE l_orderkey % 1000 END AS skew_key,
             l_quantity
      FROM lineitem
    ),
    d AS (SELECT DISTINCT skew_key FROM f),
    r AS (
      SELECT skew_key, CAST(-1 AS BIGINT) AS rep FROM d
      UNION ALL
      SELECT CAST(0 AS BIGINT), CAST(i AS BIGINT) FROM range(40) t(i)
    ),
    ff AS (SELECT skew_key, l_quantity FROM f WHERE skew_key <= 500)
    SELECT CAST(r.skew_key % 7 AS BIGINT) AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN ff.l_quantity IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dim_only,
           CAST(SUM(CAST(ff.l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
           'shuffle' AS strategy,
           CAST(1 AS INT) AS n_hot_left,
           CAST(1 AS INT) AS n_hot_right
    FROM ff RIGHT JOIN r ON ff.skew_key = r.skew_key
    GROUP BY 1
"""


@query(
    "x_grid_skew_right",
    sql=_GRID_SKEW_RIGHT_SQL,
    note="The grid-salted join's RIGHT-OUTER arm, auto-selected on the "
    "same both-sides-hot fixture as x_grid_skew_join (built once, "
    "shared) — r12 completes the inner/left/right/full matrix: a "
    "zone-map range predicate (skew_key <= 500) residual-filters the "
    "FACT, so dim keys above 500 are genuinely matchless and must "
    "left-null-pad exactly once while matchless fact rows are dropped. "
    "grid_salted_join decomposes the RIGHT join exactly as the "
    "transpose of LEFT without swapping the caller's layout: the grid "
    "INNER join supplies every matched pair in 64 parallel cells, and "
    "ONLY the transpose anti probe (dim against the fact's DISTINCT "
    "keys — key-count-sized, skew-free) supplies the left-null-padded "
    "complement. Hash-matches the plain relational RIGHT join; "
    "n_dim_only counts the null-padded rows apart. At 100 TB this is "
    "the preserved-hot-dimension pattern: enrichment joins that must "
    "keep every dimension row get outer semantics with zero straggler "
    "tasks",
)
def x_grid_skew_right(spark, sf_dir):
    from flnr_wins_spark.sources.advisor import advise_auto_join, run_auto_join

    base = _grid_skew_fixture(spark, sf_dir)
    plan = advise_auto_join(
        spark, base + "/fact", base + "/dim_grid", "skew_key",
        left_ranges={"skew_key": (None, 500)},
        broadcast_threshold_bytes=0,  # force the shuffle strategy
        min_shuffle_partitions=8,     # environment-independent floor
    )
    joined = run_auto_join(spark, plan, how="right")
    return (
        joined.groupBy((F.col("skew_key") % 7).cast("bigint").alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("qty").isNull(), 1).otherwise(0))
            .cast("bigint").alias("n_dim_only"),
            F.sum(F.col("qty").cast("decimal(27,2)")).cast("double").alias("sum_qty"),
        )
        .select(
            "grp", "n_rows", "n_dim_only", "sum_qty",
            F.lit(plan.join.strategy).alias("strategy"),
            F.lit(len(plan.hot_keys)).cast("int").alias("n_hot_left"),
            F.lit(len(plan.hot_keys_right)).cast("int").alias("n_hot_right"),
        )
    )


def _right_skew_fixture(spark, sf_dir):
    """Right-only-hot fixture: the PRESERVED left side is a key roster
    (one row per live key, plus 20 matchless keys 1000..1019 that must
    null-pad) whose heavy sidecar flags NOTHING — every key holds one
    row, far under the 5% floor — while the right fact's key 0 holds
    half its rows and is flagged at every SF. Since r13 a view over the
    family-wide :func:`_skew_family_fixture` (fact built ONCE for all
    seven skew/advisor entries); the roster lives at /probe_right."""
    return _skew_family_fixture(spark, sf_dir)


_RIGHT_HOT_LEFT_SQL = """
    WITH f AS (
      SELECT CASE WHEN l_orderkey % 10 < 5 THEN 0
                  ELSE l_orderkey % 1000 END AS skew_key,
             l_quantity
      FROM lineitem
    ),
    k AS (
      SELECT DISTINCT skew_key FROM f
      UNION ALL
      SELECT CAST(1000 + i AS BIGINT) FROM range(20) t(i)
    )
    SELECT CAST(k.skew_key % 7 AS BIGINT) AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(f.l_quantity) AS BIGINT) AS n_matched,
           CAST(SUM(CAST(f.l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
           'shuffle' AS strategy,
           CAST(0 AS INT) AS n_hot_left,
           CAST(1 AS INT) AS n_hot_right
    FROM k LEFT JOIN f ON k.skew_key = f.skew_key
    GROUP BY 1
"""


@query(
    "x_right_hot_left_join",
    sql=_RIGHT_HOT_LEFT_SQL,
    note="The right-only-hot LEFT join, auto-selected — the last hot-key "
    "fall-through closed: a key roster (PRESERVED side, one row per "
    "key plus 20 matchless keys that must null-pad exactly once) left-"
    "joins a fact whose key 0 holds half the rows. Only the fact's "
    "heavy sidecar flags it (the roster is uniform — n_hot_left = 0), "
    "the preserved side cannot swap roles, and one-sided salting of "
    "the right alone would null-fill unmatched roster rows once per "
    "salt replica — so run_auto_join routes through the DEGENERATE "
    "(1 x 8) grid: each fact row hashes to one of 8 cells, only the "
    "roster's hot-key slice (a single row — the key is cold on the "
    "roster) replicates 8 ways, and the null-padded complement comes "
    "from a skew-free left-anti probe against the fact's distinct "
    "keys. Hash-matches the plain relational LEFT join; n_matched "
    "counts null-padded rows apart. At 100 TB this is the hot-dim "
    "enrichment pattern with outer semantics: a mega-key fact side "
    "spreads over 8 tasks instead of straggling on one",
)
def x_right_hot_left_join(spark, sf_dir):
    from flnr_wins_spark.sources.advisor import advise_auto_join, run_auto_join

    base = _right_skew_fixture(spark, sf_dir)
    plan = advise_auto_join(
        spark, base + "/probe_right", base + "/fact", "skew_key",
        broadcast_threshold_bytes=0,  # force the shuffle strategy
        min_shuffle_partitions=8,     # environment-independent floor
    )
    joined = run_auto_join(spark, plan, how="left")
    return (
        joined.groupBy((F.col("skew_key") % 7).cast("bigint").alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("qty").cast("bigint").alias("n_matched"),
            F.sum(F.col("qty").cast("decimal(27,2)")).cast("double").alias("sum_qty"),
        )
        .select(
            "grp", "n_rows", "n_matched", "sum_qty",
            F.lit(plan.join.strategy).alias("strategy"),
            F.lit(len(plan.hot_keys)).cast("int").alias("n_hot_left"),
            F.lit(len(plan.hot_keys_right)).cast("int").alias("n_hot_right"),
        )
    )


# x_multimodal_dhash_dedup oracle: the image construction (9x8 PGM whose 72
# raster bytes are md5-of-seed digits, docs with doc_id%10<=1 sharing a seed
# and the %10==1 twin perturbed in pixel 0) is replayed relationally, the
# dHash bits are adjacent-pixel comparisons, the 64-bit hash rides as two
# 32-bit BIGINT halves + a 16-char hex (sign-trap-free), and the banded
# Hamming join + exact verify mirror the DataFrame plan operation for
# operation — candidates are BAND-equality pairs on BOTH sides, so the
# LSH recall semantics (not just the final filter) are value-checked.
_DHASH_SQL = """
    WITH d AS (
      SELECT doc_id,
             CAST(CASE WHEN doc_id % 10 <= 1 THEN doc_id - (doc_id % 10)
                       ELSE doc_id END AS VARCHAR) AS seed
      FROM documents
    ),
    px AS (
      SELECT d.doc_id, t.p,
             (CAST('0x' || substr(md5(d.seed || ':dh' || CAST(t.p // 16 AS VARCHAR)),
                                  2 * (t.p % 16) + 1, 2) AS INT)
              + CASE WHEN d.doc_id % 10 = 1 AND t.p = 0 THEN 1 ELSE 0 END) % 256
               AS b
      FROM d, range(72) t(p)
    ),
    bits AS (
      SELECT a.doc_id, (a.p // 9) * 8 + (a.p % 9) AS i,
             CASE WHEN a.b > r.b THEN 1 ELSE 0 END AS v
      FROM px a JOIN px r ON r.doc_id = a.doc_id AND r.p = a.p + 1
      WHERE a.p % 9 < 8
    ),
    h AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN i >= 32
                           THEN v * (CAST(1 AS BIGINT) << (i - 32))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(SUM(CASE WHEN i < 32
                           THEN v * (CAST(1 AS BIGINT) << i)
                           ELSE 0 END) AS BIGINT) AS lo
      FROM bits GROUP BY doc_id
    ),
    hx AS (
      SELECT doc_id, hi, lo, printf('%08x', hi) || printf('%08x', lo) AS hex16
      FROM h
    ),
    bands AS (
      SELECT doc_id, hi, lo, t.i AS band,
             substr(hex16, CAST(4 * t.i + 1 AS INT), 4) AS bv
      FROM hx, range(4) t(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS INT)
             AS hamming
    FROM cand
    WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 10
"""


@query(
    "x_multimodal_dhash_dedup",
    sql=_DHASH_SQL,
    bench=True,  # r11 promotion: perceptual-dedup headliner
    note="IMAGE near-dup dedup over REAL pixels: each doc becomes a "
    "genuine binary P5 PGM (9x8 raster from md5 bytes; doc pairs with "
    "doc_id%10<=1 share a seed, the second perturbed by one pixel — a "
    "true near-duplicate), image_dhash decodes with the stdlib decoder "
    "and emits the perceptual difference hash (integer luma, "
    "nearest-neighbor grid, horizontal gradient bits), and duplicates "
    "surface through a banded Hamming self-join (4 x 16-bit bands -> "
    "candidates -> exact bit_count verify <= 10) — SimHash's plan shape "
    "applied to pixels. The oracle replays construction, decode "
    "arithmetic, banding, and verify relationally, so the decoder, the "
    "hash, and the LSH recall semantics are all value-checked. At "
    "100 TB: O(n x band width) candidates, never all-pairs; the decode "
    "is executor-side Arrow-batched — the image-dedup stage of a "
    "multimodal curation pipeline",
)
def x_multimodal_dhash_dedup(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import image_dhash

    docs = t(spark, sf_dir, "documents")
    seed = (
        F.when(
            F.col("doc_id") % 10 <= 1,
            F.col("doc_id") - F.col("doc_id") % 10,
        )
        .otherwise(F.col("doc_id"))
        .cast("string")
    )
    digs = [
        F.md5(F.encode(F.concat(seed, F.lit(f":dh{j}")), "UTF-8"))
        for j in range(5)
    ]
    raw = F.concat(*[F.unhex(d) for d in digs])  # 80 bytes; raster = 72
    b0 = F.conv(F.substring(digs[0], 1, 2), 16, 10).cast("int")
    b0 = F.when(F.col("doc_id") % 10 == 1, (b0 + 1) % 256).otherwise(b0)
    content = F.concat(
        F.encode(F.lit("P5\n9 8\n255\n"), "UTF-8"),
        F.unhex(F.lpad(F.lower(F.hex(b0)), 2, "0")),
        F.substring(raw, 2, 71),
    )
    media = docs.select(F.col("doc_id").alias("media_id"), content.alias("content"))
    from pyspark import StorageLevel

    # persist: the banded self-join consumes `hashed` on BOTH sides, so the
    # mapInPandas image decode would otherwise run twice per query. The
    # persisted frame is (id, 16-char hex, 2 bigints) — fingerprint-sized,
    # never the pixels (guide §8: move heavy bytes once, decide on proxies).
    hashed = image_dhash(media, hash_size=8).select(
        "media_id",
        "dhash",
        F.conv(F.substring("dhash", 1, 8), 16, 10).cast("bigint").alias("hi"),
        F.conv(F.substring("dhash", 9, 8), 16, 10).cast("bigint").alias("lo"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bands = hashed.select(
        "media_id", "hi", "lo",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.substring("dhash", 4 * i + 1, 4).alias("bv"),
                )
                for i in range(4)
            ])
        ).alias("bb"),
    ).select("media_id", "hi", "lo", "bb.band", "bb.bv")
    a = bands.select(
        F.col("media_id").alias("id_a"), F.col("hi").alias("hi_a"),
        F.col("lo").alias("lo_a"), "band", "bv",
    )
    b = bands.select(
        F.col("media_id").alias("id_b"), F.col("hi").alias("hi_b"),
        F.col("lo").alias("lo_b"), "band", "bv",
    )
    cand = (
        a.join(b, ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b")
        .distinct()
    )
    ham = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("int")
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= 10
    )


# 44-byte RIFF/WAVE header for PCM16 mono 8 kHz with a 272-byte data chunk
# (136 samples = 17 md5 digests) — the audio-fingerprint fixture's format.
_WAV_FP_HDR_HEX = (
    "524946463401000057415645666d7420100000000100"
    "0100401f0000803e0000020010006461746110010000"
)

# x_multimodal_audio_dedup oracle: replay the clip construction (136 signed
# little-endian PCM16 samples from 17 md5 digests of a shared seed, the
# %10==1 twin's first sample low byte perturbed), the 65-frame energy walk,
# the 64 gradient bits, and the banded Hamming join — the audio twin of
# _DHASH_SQL, decoder arithmetic and LSH semantics value-checked.
_AUDIO_FP_SQL = """
    WITH d AS (
      SELECT doc_id,
             CAST(CASE WHEN doc_id % 10 <= 1 THEN doc_id - (doc_id % 10)
                       ELSE doc_id END AS VARCHAR) AS seed
      FROM documents
    ),
    s AS (
      SELECT d.doc_id, t.i,
             (CAST('0x' || substr(md5(d.seed || ':af' || CAST(t.i // 8 AS VARCHAR)),
                                  2 * ((2 * t.i) % 16) + 1, 2) AS INT)
              + CASE WHEN d.doc_id % 10 = 1 AND t.i = 0 THEN 1 ELSE 0 END) % 256
             + 256 * CAST('0x' || substr(md5(d.seed || ':af' || CAST(t.i // 8 AS VARCHAR)),
                                         2 * ((2 * t.i + 1) % 16) + 1, 2) AS INT)
               AS uv
      FROM d, range(136) t(i)
    ),
    sv AS (
      SELECT doc_id, i,
             CAST(CASE WHEN uv >= 32768 THEN uv - 65536 ELSE uv END AS BIGINT) AS v
      FROM s
    ),
    fr AS (
      SELECT sv.doc_id, f.f, SUM(v * v) AS e
      FROM sv, range(65) f(f)
      WHERE sv.i >= (f.f * 136) // 65 AND sv.i < ((f.f + 1) * 136) // 65
      GROUP BY sv.doc_id, f.f
    ),
    bits AS (
      SELECT a.doc_id, a.f AS i,
             CASE WHEN a.e > b.e THEN 1 ELSE 0 END AS v
      FROM fr a JOIN fr b ON b.doc_id = a.doc_id AND b.f = a.f + 1
      WHERE a.f < 64
    ),
    h AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN i >= 32
                           THEN v * (CAST(1 AS BIGINT) << (i - 32))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(SUM(CASE WHEN i < 32
                           THEN v * (CAST(1 AS BIGINT) << i)
                           ELSE 0 END) AS BIGINT) AS lo
      FROM bits GROUP BY doc_id
    ),
    hx AS (
      SELECT doc_id, hi, lo, printf('%08x', hi) || printf('%08x', lo) AS hex16
      FROM h
    ),
    bands AS (
      SELECT doc_id, hi, lo, t.i AS band,
             substr(hex16, CAST(4 * t.i + 1 AS INT), 4) AS bv
      FROM hx, range(4) t(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS INT)
             AS hamming
    FROM cand
    WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 10
"""


@query(
    "x_multimodal_audio_dedup",
    sql=_AUDIO_FP_SQL,
    note="AUDIO near-dup dedup over REAL samples: each doc becomes a "
    "genuine RIFF/WAVE PCM16 clip (136 md5-derived samples; doc pairs "
    "with doc_id%10<=1 share a seed, the second's first sample "
    "perturbed — a true near-duplicate), audio_fingerprint decodes with "
    "the stdlib chunk walker and emits the 64-bit energy-gradient "
    "fingerprint (65 integer frame energies, temporal gradient bits — "
    "the audio twin of the image dHash), and duplicates surface through "
    "the same banded Hamming self-join + exact bit_count verify. The "
    "oracle replays construction, sign handling, frame boundaries, "
    "banding, and verify relationally. At 100 TB: O(n x band width) "
    "candidates over executor-side Arrow-batched decodes — the "
    "audio-dedup stage of a multimodal curation pipeline",
)
def x_multimodal_audio_dedup(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import audio_fingerprint

    docs = t(spark, sf_dir, "documents")
    seed = (
        F.when(
            F.col("doc_id") % 10 <= 1,
            F.col("doc_id") - F.col("doc_id") % 10,
        )
        .otherwise(F.col("doc_id"))
        .cast("string")
    )
    digs = [
        F.md5(F.encode(F.concat(seed, F.lit(f":af{j}")), "UTF-8"))
        for j in range(17)
    ]
    payload = F.concat(*[F.unhex(d) for d in digs])  # 272 bytes
    b0 = F.conv(F.substring(digs[0], 1, 2), 16, 10).cast("int")
    b0 = F.when(F.col("doc_id") % 10 == 1, (b0 + 1) % 256).otherwise(b0)
    content = F.concat(
        F.unhex(F.lit(_WAV_FP_HDR_HEX)),
        F.unhex(F.lpad(F.lower(F.hex(b0)), 2, "0")),
        F.substring(payload, 2, 271),
    )
    media = docs.select(F.col("doc_id").alias("media_id"), content.alias("content"))
    from pyspark import StorageLevel

    # persist: self-joined on both sides — one audio decode per query, not
    # two (same rationale as x_multimodal_dhash_dedup; fingerprint-sized).
    hashed = audio_fingerprint(media, n_bits=64).select(
        "media_id",
        "afp",
        F.conv(F.substring("afp", 1, 8), 16, 10).cast("bigint").alias("hi"),
        F.conv(F.substring("afp", 9, 8), 16, 10).cast("bigint").alias("lo"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bands = hashed.select(
        "media_id", "hi", "lo",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.substring("afp", 4 * i + 1, 4).alias("bv"),
                )
                for i in range(4)
            ])
        ).alias("bb"),
    ).select("media_id", "hi", "lo", "bb.band", "bb.bv")
    a = bands.select(
        F.col("media_id").alias("id_a"), F.col("hi").alias("hi_a"),
        F.col("lo").alias("lo_a"), "band", "bv",
    )
    b = bands.select(
        F.col("media_id").alias("id_b"), F.col("hi").alias("hi_b"),
        F.col("lo").alias("lo_b"), "band", "bv",
    )
    cand = (
        a.join(b, ["band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b")
        .distinct()
    )
    ham = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("int")
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= 10
    )


# x_multimodal_video_dedup oracle: four 9x8 PGM frames per doc (frame j's 72
# raster bytes from md5 digests ':v<5j>'..':v<5j+4>' of a shared seed; the
# %10==1 twin perturbs frame 0 pixel 0), per-frame dHash replayed exactly as
# in _DHASH_SQL, candidates = pairs sharing ANY exact frame hash, verified
# by counting ALIGNED frames within Hamming 2 — near-dup at >= 3 of 4.
_VIDEO_DHASH_SQL = """
    WITH d AS (
      SELECT doc_id,
             CAST(CASE WHEN doc_id % 10 <= 1 THEN doc_id - (doc_id % 10)
                       ELSE doc_id END AS VARCHAR) AS seed
      FROM documents
    ),
    px AS (
      SELECT d.doc_id, f.j, t.p,
             (CAST('0x' || substr(md5(d.seed || ':v' ||
                                      CAST(f.j * 5 + t.p // 16 AS VARCHAR)),
                                  2 * (t.p % 16) + 1, 2) AS INT)
              + CASE WHEN d.doc_id % 10 = 1 AND f.j = 0 AND t.p = 0
                     THEN 1 ELSE 0 END) % 256 AS b
      FROM d, range(4) f(j), range(72) t(p)
    ),
    bits AS (
      SELECT a.doc_id, a.j, (a.p // 9) * 8 + (a.p % 9) AS i,
             CASE WHEN a.b > r.b THEN 1 ELSE 0 END AS v
      FROM px a
      JOIN px r ON r.doc_id = a.doc_id AND r.j = a.j AND r.p = a.p + 1
      WHERE a.p % 9 < 8
    ),
    h AS (
      SELECT doc_id, j,
             CAST(SUM(CASE WHEN i >= 32
                           THEN v * (CAST(1 AS BIGINT) << (i - 32))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(SUM(CASE WHEN i < 32
                           THEN v * (CAST(1 AS BIGINT) << i)
                           ELSE 0 END) AS BIGINT) AS lo
      FROM bits GROUP BY doc_id, j
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM h a JOIN h b
        ON a.hi = b.hi AND a.lo = b.lo AND a.doc_id < b.doc_id
    ),
    aligned AS (
      SELECT c.id_a, c.id_b, fa.j,
             bit_count(xor(fa.hi, fb.hi)) + bit_count(xor(fa.lo, fb.lo))
               AS ham
      FROM cand c
      JOIN h fa ON fa.doc_id = c.id_a
      JOIN h fb ON fb.doc_id = c.id_b AND fb.j = fa.j
    )
    SELECT id_a, id_b,
           CAST(SUM(CASE WHEN ham <= 2 THEN 1 ELSE 0 END) AS INT)
             AS n_close_frames
    FROM aligned
    GROUP BY id_a, id_b
    HAVING SUM(CASE WHEN ham <= 2 THEN 1 ELSE 0 END) >= 3
"""


@query(
    "x_multimodal_video_dedup",
    sql=_VIDEO_DHASH_SQL,
    note="VIDEO near-dup dedup over REAL frames: each doc becomes a "
    "4-frame clip (concatenated binary PGMs — the container-less frame "
    "layout x_multimodal_frames samples), frames slice out by exact "
    "byte offsets (the frame-sampler contract), each frame dHashes "
    "through the stdlib decoder, candidates surface where ANY frame "
    "hash matches exactly (the hash itself is the LSH band — one equal "
    "frame is enough to probe), and pairs verify by counting ALIGNED "
    "frames within Hamming 2: near-dup at >= 3 of 4 (the %10<=1 seed "
    "twins differ in exactly one perturbed frame). Completes the "
    "image/audio/video perceptual-dedup triptych on one plan shape; "
    "the oracle replays construction, per-frame decode arithmetic, "
    "candidate generation, and the aligned-frame verify relationally. "
    "At 100 TB: frame hashes are tiny rows, the exact-hash join is a "
    "hash shuffle on 16-byte keys, never a pixel comparison across "
    "clips",
)
def x_multimodal_video_dedup(spark, sf_dir):
    from flnr_wins_spark.functions.multimodal import image_dhash

    docs = t(spark, sf_dir, "documents")
    seed = (
        F.when(
            F.col("doc_id") % 10 <= 1,
            F.col("doc_id") - F.col("doc_id") % 10,
        )
        .otherwise(F.col("doc_id"))
        .cast("string")
    )

    def frame(j):
        digs = [
            F.md5(F.encode(F.concat(seed, F.lit(f":v{j * 5 + c}")), "UTF-8"))
            for c in range(5)
        ]
        raw = F.concat(*[F.unhex(dg) for dg in digs])
        b0 = F.conv(F.substring(digs[0], 1, 2), 16, 10).cast("int")
        if j == 0:
            b0 = F.when(
                F.col("doc_id") % 10 == 1, (b0 + 1) % 256
            ).otherwise(b0)
        return F.concat(
            F.encode(F.lit("P5\n9 8\n255\n"), "UTF-8"),
            F.unhex(F.lpad(F.lower(F.hex(b0)), 2, "0")),
            F.substring(raw, 2, 71),
        )

    video = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(*[frame(j) for j in range(4)]).alias("content"),
    )
    # the frame sampler: exact byte-offset slices of the clip (83 bytes
    # per frame: 11-byte header + 72-byte raster)
    frames = video.select(
        "media_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    F.substring("content", j * 83 + 1, 83).alias("fbytes"),
                )
                for j in range(4)
            ])
        ).alias("fr"),
    ).select(
        (F.col("media_id") * 4 + F.col("fr.j")).alias("media_id"),
        F.col("fr.fbytes").alias("content"),
    )
    from pyspark import StorageLevel

    # persist: `fh` feeds FOUR plan branches (candidate self-join a/b +
    # aligned-frame verify fa/fb), so the per-frame mapInPandas decode
    # would otherwise run 4x per query. Persisted rows are
    # (vid, j, hex, hi, lo) — fingerprints, never frame bytes.
    fh = image_dhash(frames, hash_size=8).select(
        (F.col("media_id") / 4).cast("bigint").alias("vid"),
        F.pmod(F.col("media_id"), F.lit(4)).cast("int").alias("j"),
        "dhash",
        F.conv(F.substring("dhash", 1, 8), 16, 10).cast("bigint").alias("hi"),
        F.conv(F.substring("dhash", 9, 8), 16, 10).cast("bigint").alias("lo"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = fh.select(
        F.col("vid").alias("id_a"), F.col("dhash").alias("dh")
    )
    b = fh.select(
        F.col("vid").alias("id_b"), F.col("dhash").alias("dh")
    )
    cand = (
        a.join(b, "dh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    fa = fh.select(
        F.col("vid").alias("id_a"), "j",
        F.col("hi").alias("hi_a"), F.col("lo").alias("lo_a"),
    )
    fb = fh.select(
        F.col("vid").alias("id_b"), "j",
        F.col("hi").alias("hi_b"), F.col("lo").alias("lo_b"),
    )
    ham = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    )
    return (
        cand.join(fa, "id_a")
        .join(fb, ["id_b", "j"])
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.when(ham <= 2, 1).otherwise(0)).cast("int")
            .alias("n_close_frames")
        )
        .filter(F.col("n_close_frames") >= 3)
    )
