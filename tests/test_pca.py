"""Covariance / PCA tests (functions/vectors.py round-5 additions).

The covariance operator's contract is EXACT integer arithmetic (its oracle
twin hash-checks it); PCA's contract is agreement with an independent
eigensolver — numpy.linalg.eigh — on the same quantized covariance."""

from __future__ import annotations

import numpy as np
import pytest

from flnr_wins_spark.functions.vectors import embedding_covariance, pca_project


@pytest.fixture(scope="module")
def anisotropic(spark):
    rng = np.random.RandomState(5)
    dim, n = 6, 400
    V = rng.randn(n, dim) @ np.diag([3, 2, 1, 0.5, 0.2, 0.1]) + rng.randn(dim) * 2
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(5)
    return V, df


class TestEmbeddingCovariance:
    def test_matches_numpy_integer_formula(self, spark, anisotropic):
        V, df = anisotropic
        dim, n = V.shape[1], V.shape[0]
        out = embedding_covariance(df, dim, scale=4).collect()
        assert len(out) == dim * (dim + 1) // 2
        Vq = np.floor(V * 1e4 + 0.5).astype(np.int64)
        S = Vq.T @ Vq
        sx = Vq.sum(0)
        for r in out:
            assert r["n"] == n
            # cov_num is DECIMAL(38,0) now (bigint silently overflowed);
            # compare as Python ints
            assert int(r["cov_num"]) == int(n * S[r["i"], r["j"]]) - int(
                sx[r["i"]]
            ) * int(sx[r["j"]])

    def test_partition_invariant(self, spark, anisotropic):
        V, df = anisotropic
        dim = V.shape[1]
        a = sorted(map(tuple, embedding_covariance(df, dim).collect()))
        b = sorted(map(tuple, embedding_covariance(df.repartition(11), dim).collect()))
        assert a == b

    def test_negative_values_round_half_up(self, spark):
        # floor(x*10^s + 0.5) is half-UP for negatives too (-0.00005 -> 0,
        # not -1) — the rule the SQL oracle mirrors verbatim
        df = spark.createDataFrame(
            [(0, [-0.00005, 0.00005]), (1, [-1.5e-4, 1.5e-4])],
            "vec_id long, embedding array<double>",
        )
        out = {(r["i"], r["j"]): r for r in embedding_covariance(df, 2).collect()}
        q = np.floor(np.array([[-0.00005, 0.00005], [-1.5e-4, 1.5e-4]]) * 1e4 + 0.5)
        q = q.astype(np.int64)
        S = q.T @ q
        sx = q.sum(0)
        for (i, j), r in out.items():
            assert int(r["cov_num"]) == int(2 * S[i, j]) - int(sx[i]) * int(sx[j])


class TestPcaProject:
    def test_top_component_matches_numpy_eigh(self, spark, anisotropic):
        V, df = anisotropic
        dim, n = V.shape[1], V.shape[0]
        proj = {r["id"]: (r["pc0"], r["pc1"]) for r in
                pca_project(df, dim, k=2).collect()}
        Vc = V - V.mean(0)
        _, Q = np.linalg.eigh(np.cov(V.T, bias=True))
        ref = []
        for c in (-1, -2):  # eigh returns ascending — top two, sign-fixed
            q = Q[:, c]
            if q[np.argmax(np.abs(q))] < 0:
                q = -q
            ref.append(Vc @ q)
        for i in range(n):
            assert abs(proj[i][0] - ref[0][i]) < 1e-3
            assert abs(proj[i][1] - ref[1][i]) < 1e-3

    def test_projection_variance_ordering(self, spark, anisotropic):
        V, df = anisotropic
        dim = V.shape[1]
        rows = pca_project(df, dim, k=2).collect()
        v0 = np.var([r["pc0"] for r in rows])
        v1 = np.var([r["pc1"] for r in rows])
        assert v0 > v1 > 0


class TestPcaPowerProject:
    def test_matches_numpy_top_eigenvector(self, spark, anisotropic):
        """The fold-exact power-iteration witness (the graded twin of
        x_embedding_pca) must still be REAL PCA: its projection agrees
        with numpy's top eigenvector of the same scale=2-quantized
        covariance to iteration tolerance."""
        from flnr_wins_spark.functions.vectors import pca_power_project

        V, df = anisotropic
        dim, n = V.shape[1], V.shape[0]
        proj = {r["vec_id"]: r["pc0"] for r in
                pca_power_project(df, dim=dim, n_iter=40, scale=2).collect()}
        Vq = np.floor(V * 100 + 0.5) / 100.0
        C = np.cov(Vq.T, bias=True)
        _, Q = np.linalg.eigh(C)
        q = Q[:, -1]
        # the witness sign-fixes by fold-sum; mirror it
        if q.sum() < 0:
            q = -q
        ref = (V - Vq.mean(0)) @ q
        for i in range(n):
            assert abs(proj[i] - ref[i]) < 1e-3

    def test_deterministic_across_partitionings(self, spark, anisotropic):
        from flnr_wins_spark.functions.vectors import pca_power_project

        V, df = anisotropic
        dim = V.shape[1]
        a = sorted(map(tuple, pca_power_project(df, dim=dim).collect()))
        b = sorted(map(tuple, pca_power_project(df.repartition(11), dim=dim).collect()))
        assert a == b  # bit-identical, not approximately equal
