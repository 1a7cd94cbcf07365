"""Spatial function tests (functions/geo.py): geohash against canonical
published values, grid-join against brute force, and the no-cartesian
plan contract."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flnr_wins_spark.functions.geo import (
    geohash_encode,
    geohash_expr_sql,
    grid_bbox_join,
)

# canonical geohash reference points (public examples)
CANONICAL = [
    (57.64911, 10.40744, "u4pruydq"),
    (42.605, -5.603, "ezs42"),
    (0.0, 0.0, "s0000"),
    (-25.382708, -49.265506, "6gkzwgjz"),
]


class TestGeohash:
    @pytest.mark.parametrize("lat,lon,want", CANONICAL)
    def test_canonical_values_spark(self, spark, lat, lon, want):
        lat_u = round((lat + 90) * 1e6)
        lon_u = round((lon + 180) * 1e6)
        df = spark.createDataFrame([(lat_u, lon_u)], "lat_u long, lon_u long")
        got = df.select(
            geohash_encode("lat_u", "lon_u", precision=len(want)).alias("gh")
        ).collect()[0].gh
        assert got == want

    @pytest.mark.parametrize("lat,lon,want", CANONICAL)
    def test_canonical_values_duckdb_dialect(self, lat, lon, want):
        lat_u = round((lat + 90) * 1e6)
        lon_u = round((lon + 180) * 1e6)
        sql = geohash_expr_sql(str(lat_u), str(lon_u), len(want), div="//")
        assert duckdb.sql(f"select {sql}").fetchone()[0] == want

    def test_top_edge_clamps_into_last_cell(self, spark):
        # lat_u == exactly 180e6 (the +90 pole) must not overflow the bit range
        df = spark.createDataFrame(
            [(180_000_000, 360_000_000)], "lat_u long, lon_u long"
        )
        got = df.select(geohash_encode("lat_u", "lon_u", 6).alias("gh")).collect()[0].gh
        assert got == "zzzzzz"

    def test_prefix_property(self, spark):
        # nearby points share a prefix; the precision-5 hash is a prefix of 8
        df = spark.createDataFrame(
            [(147_649_110, 190_407_440)], "lat_u long, lon_u long"
        )
        row = df.select(
            geohash_encode("lat_u", "lon_u", 5).alias("g5"),
            geohash_encode("lat_u", "lon_u", 8).alias("g8"),
        ).collect()[0]
        assert row.g8.startswith(row.g5)


class TestGridBboxJoin:
    def _fixture(self, spark):
        pts = [(i, (i * 37_000_000) % 360_000_001, (i * 53_000_000) % 180_000_001)
               for i in range(200)]
        boxes = []
        for b in range(10):
            cx = (b * 41_000_000) % 360_000_001
            cy = (b * 29_000_000) % 180_000_001
            boxes.append((b, max(0, cx - 2_500_000), min(360_000_000, cx + 2_500_000),
                          max(0, cy - 2_500_000), min(180_000_000, cy + 2_500_000)))
        p = spark.createDataFrame(pts, "point_id long, x_u long, y_u long")
        bx = spark.createDataFrame(
            boxes, "box_id long, xmin_u long, xmax_u long, ymin_u long, ymax_u long"
        )
        return p, bx

    def test_matches_brute_force(self, spark):
        p, bx = self._fixture(spark)
        grid = {(r.point_id, r.box_id) for r in grid_bbox_join(p, bx).collect()}
        brute = {
            (r.point_id, r.box_id)
            for r in p.crossJoin(bx)
            .filter(
                (F.col("x_u") >= F.col("xmin_u")) & (F.col("x_u") <= F.col("xmax_u"))
                & (F.col("y_u") >= F.col("ymin_u")) & (F.col("y_u") <= F.col("ymax_u"))
            )
            .collect()
        }
        assert grid == brute and brute  # nonempty fixture

    def test_no_duplicate_pairs(self, spark):
        # a box spanning many cells must still match each point exactly once
        p = spark.createDataFrame([(1, 5_000_000, 5_000_000)], "point_id long, x_u long, y_u long")
        bx = spark.createDataFrame(
            [(7, 0, 20_000_000, 0, 20_000_000)],
            "box_id long, xmin_u long, xmax_u long, ymin_u long, ymax_u long",
        )
        out = grid_bbox_join(p, bx).collect()
        assert len(out) == 1

    def test_plan_has_no_cartesian_product(self, spark):
        p, bx = self._fixture(spark)
        plan = grid_bbox_join(p, bx)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestPlanarKnn:
    def test_matches_brute_force_and_ranks(self, spark):
        from flnr_wins_spark.functions.geo import planar_knn

        pts = [(i, (i * 31) % 100 * 1_000_000, (i * 17) % 100 * 1_000_000)
               for i in range(40)]
        df = spark.createDataFrame(pts, "id long, x_u long, y_u long")
        out = planar_knn(
            df.filter(F.col("id") < 5), df, k=3,
            query_cols=("id", "x_u", "y_u"), cand_cols=("id", "x_u", "y_u"),
        ).collect()
        assert len(out) == 15
        by_q = {}
        for r in out:
            by_q.setdefault(r.query_id, []).append(r)
        coords = {i: (x, y) for i, x, y in pts}
        for qid, rows in by_q.items():
            rows.sort(key=lambda r: r.rank)
            # distances non-decreasing with rank, and exactly the true top-3
            d = [r.dist2 for r in rows]
            assert d == sorted(d)
            qx, qy = coords[qid]
            truth = sorted(
                ((cx - qx) ** 2 + (cy - qy) ** 2, i)
                for i, (cx, cy) in coords.items() if i != qid
            )[:3]
            assert [r.dist2 for r in rows] == [t[0] for t in truth]
