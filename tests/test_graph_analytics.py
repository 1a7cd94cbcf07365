"""Triangle counting + k-core peeling (operators/graph.py additions)."""

from __future__ import annotations


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a bigint, id_b bigint")


class TestTriangles:
    def test_single_triangle(self, spark):
        from flnr_wins_spark.operators.graph import triangle_counts

        e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
        got = {r.id: r.triangles for r in triangle_counts(e).collect()}
        assert got == {1: 1, 2: 1, 3: 1}  # 4 hangs off, no triangle

    def test_k4_has_four_triangles(self, spark):
        from flnr_wins_spark.operators.graph import triangle_counts

        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        got = {r.id: r.triangles for r in triangle_counts(_edges(spark, k4)).collect()}
        # K4: each vertex is in C(3,2)=3 triangles, 4 triangles total
        assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        from flnr_wins_spark.operators.graph import triangle_counts

        e = _edges(spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)])
        got = {r.id: r.triangles for r in triangle_counts(e).collect()}
        assert got == {1: 1, 2: 1, 3: 1}

    def test_triangle_free_graph_empty(self, spark):
        from flnr_wins_spark.operators.graph import triangle_counts

        star = _edges(spark, [(0, i) for i in range(1, 6)])
        assert triangle_counts(star).count() == 0


class TestKCore:
    def test_peel_cascade(self, spark):
        from flnr_wins_spark.operators.graph import kcore

        # triangle (1,2,3) plus a chain 3-4-5: 2-core must cascade away the
        # whole chain (4 drops, then 5 would but 5 drops in the same sweep's
        # next round)
        e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
        got = {r.id: r.core_degree for r in kcore(e, k=2, rounds=6).collect()}
        assert got == {1: 2, 2: 2, 3: 2}

    def test_k1_keeps_everything(self, spark):
        from flnr_wins_spark.operators.graph import kcore

        e = _edges(spark, [(1, 2), (3, 4)])
        got = {r.id: r.core_degree for r in kcore(e, k=1, rounds=3).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1}

    def test_core_empties(self, spark):
        from flnr_wins_spark.operators.graph import kcore

        chain = _edges(spark, [(i, i + 1) for i in range(5)])
        assert kcore(chain, k=2, rounds=6).count() == 0

    def test_converged_result_stable_under_extra_rounds(self, spark):
        from flnr_wins_spark.operators.graph import kcore

        e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 3)])
        a = sorted(map(tuple, kcore(e, k=2, rounds=3).collect()))
        b = sorted(map(tuple, kcore(e, k=2, rounds=10).collect()))
        assert a == b
