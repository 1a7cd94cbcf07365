"""Connected components over a pair/edge list — duplicate-cluster formation.

Near-dup detectors (MinHash, SimHash, n-gram Jaccard — operators/dedup.py)
emit PAIRS; a training-data pipeline needs CLUSTERS so it can keep one
survivor per duplicate group. Components = min-label propagation:

    label(v) <- min(label(v), min over neighbors u of label(u))

iterated to fixpoint. Iterations needed = graph diameter, and near-dup
graphs are dense small cliques (diameter 1-2), so 2-3 rounds converge in
practice; ``max_iter`` bounds the worst case.

Two algorithms behind one interface (``algorithm=`` on
:func:`connected_components`):

  * ``"label"`` (default): min-label propagation — rounds = diameter; the
    right choice for near-dup graphs, whose components are dense cliques.
  * ``"star"``: alternating large-star/small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014) — rounds =
    O(log^2 n) REGARDLESS of diameter, the web-scale choice when
    components can be long chains (URL graphs, citation chains). Each
    half-round rewires edges toward the component minimum, so path length
    collapses geometrically instead of shrinking by one hop per round.

Scale notes: each round is one shuffle join edges-to-labels plus a groupBy
min — both on the edge key, so AQE reuses the partitioning. Lineage is
truncated per round with ``localCheckpoint`` (eager) — without it the
iterative plan nests a copy of the whole DAG per round and analysis time
blows up by round ~10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    algorithm: str = "label",
) -> DataFrame:
    """Label every vertex of the undirected edge list with the minimum
    vertex id reachable from it. Returns (id, cluster_id). Deterministic —
    both algorithms converge to the identical min-id labeling.

    Raises if ``max_iter`` rounds do not converge (for ``"label"``:
    diameter > max_iter; for ``"star"``: ~log^2(n) > max_iter).
    """
    if algorithm == "star":
        return _cc_star(edges, src, dst, max_iter)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm {algorithm!r} (label|star)")
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # symmetrize via explode, not union-of-two-selects: the upstream edge
    # producer (e.g. a within-cell pair join) is evaluated ONCE — a union
    # would compute it per branch
    e = (
        fwd.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("_e")
        )
        .select("_e.a", "_e.b")
        .distinct()
    )
    e = e.localCheckpoint()
    # Round 1 fused: initial labels are the vertex ids themselves, so the
    # first neighbor-min pass is a bare groupBy over the edges — no label
    # join and no init-labels checkpoint job. Every round carries a _chg
    # flag (did this vertex's label shrink?) so the convergence check is a
    # filter-count on the just-checkpointed round output instead of a
    # separate old-vs-new join job. Labels produced are identical to the
    # unfused loop's (round 1 with label(v) = v IS min(v, min(N(v)))).
    new_labels = (
        e.groupBy("a")
        .agg(F.min("b").alias("_nbr"))
        .select(
            F.col("a").alias("id"),
            F.least(F.col("a"), F.col("_nbr")).alias("label"),
            (F.col("_nbr") < F.col("a")).alias("_chg"),
        )
        .localCheckpoint()
    )
    changed = new_labels.filter("_chg").count()
    labels = new_labels.drop("_chg")
    if changed == 0:
        return labels.select("id", F.col("label").alias("cluster_id"))
    for _ in range(max_iter - 1):
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
                (
                    F.coalesce(F.col("nbr_label"), F.col("label")) < F.col("label")
                ).alias("_chg"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter("_chg").count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            return labels.select("id", F.col("label").alias("cluster_id"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def _cc_star(edges: DataFrame, src: str, dst: str, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star rounds (Kiveris et al. 2014).

    Edges are kept canonical as (lo < hi). One round = large-star then
    small-star:

      large-star(u): connect every neighbor v > u to m = min(N(u) ∪ {u})
      small-star(u): connect every neighbor v <= u (and u itself) to
                     m = min of u's smaller neighborhood

    Both are a symmetrize + groupBy-min + re-join — two shuffles per
    half-round, keyed on vertex id. Fixpoint = the canonical edge set stops
    changing, detected with an order-insensitive (count, xor of xxhash64)
    signature — one tiny aggregate per round instead of a set-difference
    join (xor over 64-bit hashes: a false fixpoint needs colliding multiset
    hashes, ~2^-64). At fixpoint the graph is a disjoint union of stars:
    every non-root has exactly one edge to its component minimum.
    """
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # canonicalize first (one scan of the upstream pair producer), THEN
    # derive the vertex set from the checkpointed edges — deriving both from
    # ``fwd`` would re-evaluate the pair join three times
    canon = (
        fwd.select(F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi"))
        .distinct()
        .localCheckpoint()
    )
    verts = (
        canon.select(F.col("lo").alias("id"))
        .union(canon.select(F.col("hi").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    e = canon.filter(F.col("lo") < F.col("hi"))

    def signature(df: DataFrame) -> tuple[int, int]:
        # scalar aggregate action (one row to the driver) — the same class
        # of per-round driver action as the label loop's count()
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                # bit_xor is order/partitioning-insensitive
                F.expr("bit_xor(xxhash64(lo, hi))"), F.lit(0)
            ).alias("h"),
        ).first()
        return (row["n"], row["h"])

    sig = signature(e)
    for _ in range(max_iter):
        # large-star: for each u, m = min over symmetric neighborhood ∪ {u};
        # every strictly-larger neighbor re-wires to m
        sym = e.select(F.col("lo").alias("u"), F.col("hi").alias("v")).union(
            e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
        m = F.least(F.col("_mn"), F.col("u"))
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(m.alias("lo"), F.col("v").alias("hi"))
            .filter(F.col("lo") < F.col("hi"))
            .distinct()
        )
        # small-star: key every edge by its larger endpoint; all smaller
        # neighbors (and the key itself) re-wire to the smallest of them
        d = ls.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        smins = d.groupBy("u").agg(F.min("v").alias("_m"))
        ss = (
            d.join(smins, "u")
            .filter(F.col("v") != F.col("_m"))
            .select(F.col("_m").alias("lo"), F.col("v").alias("hi"))
            .union(smins.select(F.col("_m").alias("lo"), F.col("u").alias("hi")))
            .distinct()
            .localCheckpoint()
        )
        new_sig = signature(ss)
        e = ss
        if new_sig == sig:
            star = e.select(F.col("hi").alias("id"), F.col("lo").alias("cluster_id"))
            return (
                verts.join(star, "id", "left")
                .select("id", F.coalesce("cluster_id", "id").alias("cluster_id"))
            )
        sig = new_sig
    raise RuntimeError(f"star connected_components did not converge in {max_iter} rounds")


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
    # fold out-degree into the checkpointed edge list ONCE: every round's
    # contrib used to re-derive deg (groupBy) and re-join it to the edges —
    # one checkpoint here removes an aggregate + join per iteration
    e = (
        e.join(e.groupBy("src").agg(F.count(F.lit(1)).alias("outd")), "src")
        .localCheckpoint()
    )
    base = (damp_den - damp_num) * scale // (damp_den * n)
    ranks = verts.withColumn("rank", F.lit(scale // n).cast("bigint"))
    for _ in range(n_iter):
        contrib = (
            e.join(ranks, e.src == ranks.id)
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


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected simple edge list as (lo < hi), self-loops dropped,
    deduplicated, lineage pinned (one evaluation of the upstream producer)."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .filter(F.col("lo") < F.col("hi"))
        .distinct()
        .localCheckpoint()
    )


def _symmetrize(canon: DataFrame) -> DataFrame:
    return canon.select(F.col("lo").alias("u"), F.col("hi").alias("v")).union(
        canon.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
    )


def triangle_counts(edges: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Per-vertex triangle counts over an undirected edge list.

    Degree-oriented node-iterator (Suri & Vassilvitskii, "Counting triangles
    and the curse of the last reducer", WWW 2011): orient every edge from the
    endpoint of lower (degree, id) to the higher, enumerate wedges only at
    the LOW end, and close each wedge against the canonical edge set. The
    orientation caps per-vertex wedge fan-out at O(sqrt(m)) — a celebrity
    vertex with degree d generates no wedges itself because all its edges
    point INTO it — which is what makes the all-pairs-per-vertex step safe on
    power-law graphs at 100 TB. The triangle SET is orientation-independent,
    so an oracle can enumerate with the naive lo<mid<hi three-way join and
    land on identical counts.

    Returns ``(id, triangles)`` for vertices in >= 1 triangle. Shuffles: one
    groupBy for degrees, one self-join keyed on the wedge apex, one closing
    join keyed on the (min, max) wedge endpoints — all equi-keyed, no
    all-pairs anywhere.
    """
    canon = _canonical_edges(edges, src, dst)
    deg = _symmetrize(canon).groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # orientation rank = (degree, id); attach to both endpoints once
    e = (
        canon.join(deg.withColumnRenamed("u", "lo").withColumnRenamed("d", "dlo"), "lo")
        .join(deg.withColumnRenamed("u", "hi").withColumnRenamed("d", "dhi"), "hi")
        .select(
            F.when(
                (F.col("dlo") < F.col("dhi"))
                | ((F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))),
                F.struct(F.col("lo").alias("s"), F.col("hi").alias("t")),
            )
            .otherwise(F.struct(F.col("hi").alias("s"), F.col("lo").alias("t")))
            .alias("o")
        )
        .select("o.s", "o.t")
        .localCheckpoint()
    )
    w1 = e.select(F.col("s"), F.col("t").alias("v1"))
    w2 = e.select(F.col("s"), F.col("t").alias("v2"))
    wedges = w1.join(w2, "s").filter(F.col("v1") < F.col("v2"))
    tri = wedges.join(
        canon,
        (wedges.v1 == canon.lo) & (wedges.v2 == canon.hi),
    ).select(F.col("s").alias("x"), F.col("v1").alias("y"), F.col("v2").alias("z"))
    verts = tri.select(
        F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("id")
    )
    return verts.groupBy("id").agg(F.count(F.lit(1)).cast("bigint").alias("triangles"))


def kcore(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    k: int = 3,
    rounds: int = 6,
) -> DataFrame:
    """k-core decomposition by iterative peeling, ``rounds`` unrolled rounds.

    Each round drops every vertex whose current degree is < k (and all its
    edges), which can cascade — hence iteration. Peeling is monotone, so the
    result after R rounds is deterministic and engine-portable regardless of
    whether the peel has fully converged; once converged, further rounds are
    identities, which is what lets a fixed-R unrolled SQL twin hash-match an
    early-exiting Spark loop. Returns ``(id, core_degree)`` for surviving
    vertices.

    Scale shape per round: one degree groupBy + two semi-joins keyed on the
    vertex id (the survivor set is O(V) — shuffled semi-join, deliberately
    NOT broadcast). Lineage truncated per round (localCheckpoint), same
    rationale as connected_components.
    """
    e = _canonical_edges(edges, src, dst)
    prev = None
    for _ in range(rounds):
        n_edges = e.count()  # tiny driver action; doubles as convergence probe
        if prev is not None and n_edges == prev:
            break
        prev = n_edges
        keep = (
            _symmetrize(e)
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select("u")
        )
        e = (
            e.join(keep.withColumnRenamed("u", "lo"), "lo", "left_semi")
            .join(keep.withColumnRenamed("u", "hi"), "hi", "left_semi")
            .localCheckpoint()
        )
    return (
        _symmetrize(e)
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .select(F.col("u").alias("id"), "core_degree")
    )


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Cluster near-dup pairs; returns (id, cluster_id, is_survivor) where
    the survivor is the lowest id in each cluster (the keep-one policy)."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.withColumn("is_survivor", F.col("id") == F.col("cluster_id"))


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    source_col: str = "id",
    max_hops: int = 6,
) -> DataFrame:
    """Multi-source breadth-first distances over the undirected edge list:
    (id, dist) with dist = minimum hop count from ANY source vertex,
    covering every vertex within ``max_hops`` (sources at dist 0).
    Unreached vertices emit no row.

    Same frontier discipline as the other iterative ops here: each round
    expands the frontier through ONE join against the symmetrized edges,
    anti-joins the visited set (so a vertex's first reach IS its minimum —
    the BFS invariant), and localCheckpoints to cut lineage. ``max_hops``
    is a fixed unroll, so the SQL twin enumerates the same rounds and
    takes MIN(first-reaching round) without needing the visited pruning.
    Scale: each round shuffles (frontier x degree) rows on the vertex key;
    the visited set grows to the reachable ball — for billion-vertex
    graphs cap ``max_hops`` (distances beyond a few hops rarely inform)
    exactly as published BFS-on-MapReduce formulations do.
    """
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = (
        fwd.select(F.explode(F.array(F.struct("a", "b"), F.struct(F.col("b").alias("a"), F.col("a").alias("b")))).alias("e"))
        .select(F.col("e.a").alias("a"), F.col("e.b").alias("b"))
        .distinct()
        # every hop joins against e — pin it once (same discipline as
        # connected_components/pagerank) instead of re-running the
        # upstream join+symmetrize+distinct max_hops times
        .localCheckpoint()
    )
    frontier = sources.select(F.col(source_col).alias("id")).distinct()
    out = frontier.select("id", F.lit(0).alias("dist"))
    visited = frontier
    for hop in range(1, max_hops + 1):
        if frontier.isEmpty():
            break
        nxt = (
            frontier.join(e, frontier["id"] == e["a"])
            .select(F.col("b").alias("id"))
            .distinct()
            .join(visited, "id", "left_anti")
            .localCheckpoint()
        )
        out = out.unionByName(nxt.select("id", F.lit(hop).alias("dist")))
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return out.select("id", F.col("dist").cast("int").alias("dist"))
