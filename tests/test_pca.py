"""PCA family (operators/pca.py): exact integer Gram sufficient statistics
+ driver eigensolve + JVM projection. Differential against numpy on the
same quantized grid; both Gram strategies pinned value-identical."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.pca import (
    embedding_gram,
    pca_fit,
    pca_transform,
)
from funcify_feature_eng_spark.operators.similarity import quantize_vec


@pytest.fixture(scope="module")
def vecs(spark):
    """Deterministic correlated 6-dim vectors: z ~ grid noise, then a fixed
    linear map so the top principal direction is known by construction."""
    rng = np.random.default_rng(7)
    z = rng.integers(-50, 51, size=(400, 6)).astype(np.float64)
    z[:, 0] *= 8.0  # dominant variance along axis 0 pre-mix
    mix = np.eye(6)
    mix[1, 0] = 0.5  # correlate dims 0/1
    x = z @ mix.T
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(len(x))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _np_gram(df, d):
    q = df.select(quantize_vec(F.col("embedding")).alias("q")).collect()
    qm = np.array([r.q for r in q], dtype=np.int64)
    return qm.T @ qm, qm.sum(axis=0), qm.shape[0]


def test_gram_matches_numpy_and_strategies_agree(vecs):
    ga = {(r.i, r.j): (r.sxx, r.sx_i, r.sx_j, r.n)
          for r in embedding_gram(vecs, strategy="arrow").collect()}
    ge = {(r.i, r.j): (r.sxx, r.sx_i, r.sx_j, r.n)
          for r in embedding_gram(vecs, strategy="explode").collect()}
    assert ga == ge
    g, s, n = _np_gram(vecs, 6)
    assert len(ga) == 6 * 7 // 2
    for i in range(6):
        for j in range(i, 6):
            assert ga[(i, j)] == (g[i, j], s[i], s[j], n)


def test_gram_drops_null_and_wrong_length(spark):
    rows = [
        (0, [1.0, 2.0, 3.0]),
        (1, None),
        (2, [1.0, 2.0]),        # wrong length — dropped
        (3, [4.0, -2.0, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_gram(df, dim=3, strategy="explode").collect()
    assert all(r.n == 2 for r in out)


def test_gram_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_gram(df, dim=4).count() == 0
    with pytest.raises(ValueError, match="empty gram"):
        pca_fit(embedding_gram(df, dim=4), k=2)


def test_gram_rejects_bad_strategy(vecs):
    with pytest.raises(ValueError, match="strategy"):
        embedding_gram(vecs, strategy="tree")


def test_pca_fit_properties(vecs):
    m = pca_fit(embedding_gram(vecs), k=4)
    assert m.dim == 6 and m.k == 4
    ev = m.explained_var
    assert all(a >= b - 1e-9 for a, b in zip(ev, ev[1:]))  # descending
    c = np.array(m.components)
    assert np.allclose(c @ c.T, np.eye(4), atol=1e-9)  # orthonormal
    # dominant direction is (by construction) concentrated on dims 0/1
    assert abs(c[0][0]) > 0.8
    # sign canonicalized: largest-|coef| entry positive
    for comp in m.components:
        assert comp[int(np.argmax(np.abs(comp)))] > 0


def test_pca_fit_deterministic(vecs):
    g = embedding_gram(vecs)
    assert pca_fit(g, k=3) == pca_fit(g, k=3)


def test_transform_variance_matches_eigvals(vecs):
    m = pca_fit(embedding_gram(vecs), k=3)
    p = np.array(
        [r.pca for r in pca_transform(vecs, m).select("pca").collect()]
    )
    assert np.allclose(p.var(axis=0), m.explained_var, rtol=1e-6)
    assert np.allclose(p.mean(axis=0), 0.0, atol=1e-6)  # centered


def test_transform_whiten_unit_variance(vecs):
    m = pca_fit(embedding_gram(vecs), k=3)
    p = np.array(
        [r.pca for r in pca_transform(vecs, m, whiten=True).select("pca").collect()]
    )
    assert np.allclose(p.var(axis=0), 1.0, rtol=1e-6)


def test_transform_null_and_wrong_length_yield_null(spark, vecs):
    m = pca_fit(embedding_gram(vecs), k=2)
    rows = [(0, [1.0] * 6), (1, None), (2, [1.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.pca for r in pca_transform(df, m).collect()}
    assert got[0] is not None and got[1] is None and got[2] is None


def test_reconstruction_error_decreases_with_k(vecs):
    g = embedding_gram(vecs)
    q = vecs.select(quantize_vec(F.col("embedding")).alias("q")).collect()
    qm = np.array([r.q for r in q], dtype=np.float64)

    def recon_err(k):
        m = pca_fit(g, k=k)
        c = np.array(m.components)
        mu = np.array(m.mean_q)
        p = np.array(
            [r.pca for r in pca_transform(vecs, m).select("pca").collect()]
        )
        back = p @ c + mu
        return float(((qm - back) ** 2).mean())

    errs = [recon_err(k) for k in (1, 3, 6)]
    assert errs[0] > errs[1] > errs[2] - 1e-12
    assert errs[2] < 1e-12  # full rank reconstructs exactly
