"""Connected components over a pair/edge list — duplicate-cluster formation.

Near-dup detectors (MinHash, SimHash, n-gram Jaccard — operators/dedup.py)
emit PAIRS; a training-data pipeline needs CLUSTERS so it can keep one
survivor per duplicate group. Components = min-label propagation:

    label(v) <- min(label(v), min over neighbors u of label(u))

iterated to fixpoint. Iterations needed = graph diameter, and near-dup
graphs are dense small cliques (diameter 1-2), so 2-3 rounds converge in
practice; ``max_iter`` bounds the worst case.

Scale notes: each round is one shuffle join edges-to-labels plus a groupBy
min — both on the edge key, so AQE reuses the partitioning. Lineage is
truncated per round with ``localCheckpoint`` (eager) — without it the
iterative plan nests a copy of the whole DAG per round and analysis time
blows up by round ~10. For web-scale graphs swap in the large-star/
small-star algorithm (Kiveris et al., "Connected Components in MapReduce");
the interface stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Label every vertex of the undirected edge list with the minimum
    vertex id reachable from it. Returns (id, cluster_id). Deterministic.

    Raises if ``max_iter`` rounds do not converge (diameter > max_iter).
    """
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    e = e.localCheckpoint()
    labels = e.select(F.col("a").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            e.join(labels, e.b == labels.id)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("id", F.col("label").alias("cluster_id"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    scale: int = 1_000_000_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list, in scaled INTEGER
    arithmetic. Returns (id, rank) with rank ~ pagerank * ``scale``.

    Why integers: a float PageRank's per-vertex sums are IEEE
    order-dependent, so two runs (or two engines) disagree in the last bits.
    Representing rank as a scaled bigint and using integer division
    (``div``) everywhere makes every iteration bit-exact regardless of
    partitioning — the same determinism discipline as plans/common.py's
    decimal-routed sums, which is what lets the DuckDB oracle check this
    operator value-for-value.

    Scale shape: per iteration, one join edges->ranks (both sides hash on
    the src key; AQE reuses the partitioning round to round) and one groupBy
    sum on dst. Lineage is truncated per round with ``localCheckpoint`` —
    same rationale as connected_components above. The vertex count is the
    only driver-side action (one metadata-scale count). Vertices with no
    out-edges leak their damped mass (the simplified variant); rankings are
    unaffected for the connected graphs this feeds on.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint()
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    n = verts.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outd"))
    base = (damp_den - damp_num) * scale // (damp_den * n)
    ranks = verts.withColumn("rank", F.lit(scale // n).cast("bigint"))
    for _ in range(n_iter):
        contrib = (
            e.join(deg, "src")
            .join(ranks, e.src == ranks.id)
            .groupBy("dst")
            .agg(F.sum(F.expr("rank div outd")).alias("contrib"))
        )
        ranks = (
            verts.join(contrib, verts.id == contrib.dst, "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(f"({damp_num} * coalesce(contrib, CAST(0 AS BIGINT))) div {damp_den}")
                ).cast("bigint").alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Cluster near-dup pairs; returns (id, cluster_id, is_survivor) where
    the survivor is the lowest id in each cluster (the keep-one policy)."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.withColumn("is_survivor", F.col("id") == F.col("cluster_id"))
