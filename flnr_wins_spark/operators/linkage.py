"""Fuzzy joining / entity resolution: blocked candidate generation +
edit-distance verification — the record-linkage primitive (merge near-match
entity tables without an all-pairs cross join).

Reference analog: none (the reference joins only on exact keys,
`/root/reference/src/wins_transform_staging.py:176-187`); this belongs to
the SURVEY §2c curation surface (dirty catalog/entity merges feeding a
training corpus).

Scale design — the whole point is to NEVER materialize |L|×|R|:

* candidates come from an equi-join on a compound blocking key
  ``(2-char prefix, length band)``; only the (smaller) left side is
  replicated to the ±1 neighbor bands, so any pair within
  ``max_dist`` edits of each other and sharing the prefix is guaranteed
  to co-occur in some block (an edit changes length by at most 1, so
  ``max_dist`` edits stay inside the adjacent band for
  ``band_width > max_dist``). Prefix-corrupting typos are the standard
  recall loss of prefix blocking; add a second blocking pass (e.g. on a
  suffix) for higher recall — same operator, different key function.
* blocks are bounded by ``max_block_width`` (count-filtered before the
  candidate join) so one degenerate key ("", repeated boilerplate names)
  cannot go quadratic — the same hot-key guard as dedup.py's
  ``max_bucket_width``.
* verification is JVM ``levenshtein`` (integer DP, engine-exact) on
  candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _block_key(col, band):
    return F.struct(
        F.lower(F.substring(col, 1, 2)).alias("pfx"),
        band.alias("band"),
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    max_dist: int = 2,
    band_width: int = 4,
    max_block_width: int = 10_000,
) -> DataFrame:
    """Return candidate matches ``(left row..., right row..., dist)`` with
    ``levenshtein(left_key, right_key) <= max_dist``, found via prefix+length
    blocking (see module docstring for the recall contract). ``left`` is the
    replicated (≈3×) side — pass the smaller table there."""
    assert band_width > max_dist, "band_width must exceed max_dist for recall"
    lb = left.withColumn(
        "_bk",
        F.explode(
            F.array(
                *[
                    _block_key(
                        F.col(left_key),
                        (F.length(left_key) / band_width).cast("int") + d,
                    )
                    for d in (-1, 0, 1)
                ]
            )
        ),
    )
    rb = right.withColumn(
        "_bk", _block_key(F.col(right_key), (F.length(right_key) / band_width).cast("int"))
    )
    # hot-block guard: a blocking key wider than max_block_width on the right
    # side is dropped (degenerate keys would otherwise go quadratic). The
    # width rides a count window over the SAME _bk partitioning the join
    # needs next, so the right side is scanned once and its exchange feeds
    # the join — the old groupBy+broadcast-anti shape evaluated the right
    # subtree twice. Counting a hot block is linear per task; the quadratic
    # hazard (the join) only ever sees guarded blocks.
    from pyspark.sql import Window

    rb = (
        rb.withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("_bk")))
        .filter(F.col("_n") <= max_block_width)
        .drop("_n")
    )
    dist = F.levenshtein(F.col(left_key), F.col(right_key))
    # No post-dedup needed: the right row carries exactly ONE band key, so a
    # (left, right) pair can co-occur in at most one block despite the 3x
    # left replication — the join emits each candidate once.
    return (
        lb.join(rb, "_bk")
        # cheap length gate first: lev <= d implies |Δlen| <= d, and an
        # integer compare prunes most candidates before the O(n*m) DP
        .filter(
            F.abs(F.length(left_key) - F.length(right_key)) <= max_dist
        )
        .filter(dist <= max_dist)
        .drop("_bk")
        .withColumn("dist", dist.cast("bigint"))
    )


def sorted_neighborhood(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_key: str,
    right_id: str,
    right_key: str,
    window: int = 5,
    max_dist: int | None = None,
) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernandez & Stolfo 1995):
    union both sides, globally sort by the key, and emit cross-source pairs
    whose sort positions differ by at most ``window``. The complementary
    blocking family to :func:`fuzzy_join`'s prefix blocks — SNM catches
    near-matches that share a sort neighborhood even when the error lands
    inside the blocking prefix; production linkage runs several passes with
    different key functions and unions the candidates.

    Scale shape: the global sort rank comes from
    ``operators.ranking.global_row_number`` (range-shard + broadcast
    offsets — NO single-partition window), then neighbors meet through an
    equi-join on the rank block ``rn div window`` (left side replicated to
    the ±1 neighbor blocks, the fuzzy_join trick), so any pair within
    ``window`` positions shares a join key and nothing quadratic exists.
    Candidates verify with JVM levenshtein when ``max_dist`` is set.

    Returns ``(left_id, right_id, pos_gap, dist)``.
    """
    from flnr_wins_spark.operators.ranking import global_row_number

    u = left.select(
        F.lit(0).alias("_src"),
        F.col(left_id).alias("_id"),
        F.col(left_key).cast("string").alias("_k"),
    ).unionByName(
        right.select(
            F.lit(1).alias("_src"),
            F.col(right_id).alias("_id"),
            F.col(right_key).cast("string").alias("_k"),
        )
    )
    ranked = global_row_number(u, ["_k", "_src", "_id"])
    lhs = ranked.filter(F.col("_src") == 0).select(
        F.col("_id").alias("_lid"),
        F.col("_k").alias("_lk"),
        F.col("rn").alias("_lrn"),
        F.explode(
            F.array(
                *[((F.col("rn") - 1) / window).cast("bigint") + d for d in (-1, 0, 1)]
            )
        ).alias("_blk"),
    )
    rhs = ranked.filter(F.col("_src") == 1).select(
        F.col("_id").alias("_rid"),
        F.col("_k").alias("_rk"),
        F.col("rn").alias("_rrn"),
        ((F.col("rn") - 1) / window).cast("bigint").alias("_blk"),
    )
    out = (
        lhs.join(rhs, "_blk")
        .filter(F.abs(F.col("_lrn") - F.col("_rrn")) <= window)
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            F.abs(F.col("_lrn") - F.col("_rrn")).cast("bigint").alias("pos_gap"),
            F.levenshtein(F.col("_lk"), F.col("_rk")).cast("bigint").alias("dist"),
        )
        # no dedup needed: each right row carries exactly ONE block key, so a
        # pair meets at most one of the left side's 3 replicas (same argument
        # as fuzzy_join's single-band right side)
    )
    if max_dist is not None:
        out = out.filter(F.col("dist") <= max_dist)
    return out


def golden_records(
    entities: DataFrame,
    pairs: DataFrame,
    id_col: str,
    attr_cols: list[str],
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Golden-record consolidation (the MDM step after linkage): cluster the
    match pairs with connected components, include unmatched entities as
    singleton clusters, and take every cluster's canonical attributes from
    its lowest-id member — the same survivor policy as
    ``operators.graph.dedup_clusters``, applied to full records instead of
    ids. Returns ``(cluster_id, n_members, *attr_cols-of-the-survivor)``.

    Scale shape: CC is the iterative piece (diameter-bounded rounds on the
    PAIR graph, which is match-sized, not corpus-sized); the consolidation
    itself is one left join from entities to labels + one groupBy + one
    join back to the survivor's attributes — all keyed on ids.
    """
    from flnr_wins_spark.operators.graph import connected_components

    cc = connected_components(pairs, src=id_a, dst=id_b)
    labeled = (
        entities.select(F.col(id_col).alias("id"))
        .join(cc, "id", "left")
        .select("id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id"))
    )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    survivors = entities.select(
        F.col(id_col).alias("cluster_id"), *[F.col(c) for c in attr_cols]
    )
    return sizes.join(survivors, "cluster_id")
