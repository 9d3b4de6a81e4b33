

"""Tests for operators/similarity.py pooling (wave 6)."""

import pytest

# ------------------------------------------------------------ pooling


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "grp: string, vec_id: long, embedding: array<float>"
    )


def test_pool_embeddings_hand_computed(spark):
    from funcify_feature_eng_spark.operators.similarity import (
        pool_embeddings, quantize_vec,
    )

    df = _vecs(spark, [
        ("a", 1, [1.0, 0.0, -1.0]),
        ("a", 2, [0.5, 0.5, 0.0]),
        ("b", 3, [2.0, -2.0, 2.0]),
    ])
    # quantized grid (levels=127): a1 -> [127,0,-127]; a2 -> [127,127,0]
    # (amax=0.5); b3 -> [127,-127,127]
    out = {r["grp"]: r for r in pool_embeddings(
        df, "grp", how="mean", strategy="fold",
    ).collect()}
    assert out["a"]["pooled"] == [127, 63, -64]  # floor((127+0)/2, 127/2, -127/2)
    assert out["a"]["n_vecs"] == 2
    assert out["b"]["pooled"] == [127, -127, 127] and out["b"]["n_vecs"] == 1
    s = {r["grp"]: r for r in pool_embeddings(
        df, "grp", how="sum", strategy="fold",
    ).collect()}
    assert s["a"]["pooled"] == [254, 127, -127]


def test_pool_embeddings_strategies_identical(spark):
    from funcify_feature_eng_spark.operators.similarity import pool_embeddings

    rows = [
        (f"g{i % 3}", i, [float(((i * 7 + j * 13) % 21) - 10) / 4 for j in range(8)])
        for i in range(50)
    ]
    df = _vecs(spark, rows)
    for how in ("mean", "sum"):
        a = sorted(
            (r["grp"], tuple(r["pooled"]), r["n_vecs"])
            for r in pool_embeddings(df, "grp", how=how, strategy="fold").collect()
        )
        b = sorted(
            (r["grp"], tuple(r["pooled"]), r["n_vecs"])
            for r in pool_embeddings(df, "grp", how=how, strategy="explode").collect()
        )
        assert a == b, how


def test_pool_embeddings_null_empty_and_dim_guard(spark):
    from funcify_feature_eng_spark.operators.similarity import pool_embeddings

    df = _vecs(spark, [
        ("a", 1, [1.0, 1.0]),
        ("a", 2, None),     # excluded
        ("a", 3, []),       # excluded
    ])
    for strat in ("fold", "explode"):
        [r] = pool_embeddings(df, "grp", strategy=strat).collect()
        assert r["n_vecs"] == 1 and r["pooled"] == [127, 127], strat

    bad = _vecs(spark, [("a", 1, [1.0, 1.0]), ("a", 2, [1.0, 1.0, 1.0])])
    for strat in ("fold", "explode"):
        with pytest.raises(Exception, match="mixed vector dimensions"):
            pool_embeddings(bad, "grp", strategy=strat).collect()


def test_pool_embeddings_negative_mean_floors(spark):
    """Mean uses FLOOR (toward -inf), not truncation: sum=-127, n=2 ->
    -64 on every engine."""
    from funcify_feature_eng_spark.operators.similarity import pool_embeddings

    df = _vecs(spark, [("a", 1, [-1.0]), ("a", 2, [0.0, ])])
    # equal dims required: make second vector 1-dim zero -> quantizes to [0]
    [r] = pool_embeddings(df, "grp", how="mean", strategy="explode").collect()
    assert r["pooled"] == [-64]


def test_centroid_similarity_matches_pure_python(spark):
    import math

    from funcify_feature_eng_spark.operators.similarity import (
        centroid_similarity,
        pool_embeddings,
    )

    rows = [
        ("a", [1.0, 0.0, 0.0]), ("a", [1.0, 1.0, 0.0]),
        ("b", [0.0, 2.0, 0.0]),
        ("c", [0.0, 0.0, 0.0]),  # zero-norm centroid -> NULL cos, row kept
    ]
    df = spark.createDataFrame(rows, "g string, embedding array<float>")
    out = {(r["group_a"], r["group_b"]): r for r in centroid_similarity(
        df, "g").collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    pooled = {r["g"]: r["pooled"] for r in pool_embeddings(
        df, ["g"], strategy="explode").collect()}

    def cos(u, v):
        d = sum(x * y for x, y in zip(u, v))
        nu = sum(x * x for x in u); nv = sum(y * y for y in v)
        return None if nu == 0 or nv == 0 else d / (math.sqrt(nu) * math.sqrt(nv))

    for (ga, gb), r in out.items():
        ref = cos(pooled[ga], pooled[gb])
        assert r["cos_sim"] == ref, (ga, gb)
        assert r["dot_q"] == sum(x * y for x, y in zip(pooled[ga], pooled[gb]))
    assert out[("a", "c")]["cos_sim"] is None
    with pytest.raises(ValueError, match="one group column"):
        centroid_similarity(df, ["g", "g"])


def test_centroid_similarity_dim_mismatch_raises(spark):
    from funcify_feature_eng_spark.operators.similarity import centroid_similarity

    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("b", [1.0, 2.0, 3.0])],
        "g string, embedding array<float>",
    )
    with pytest.raises(Exception, match="dimensions differ"):
        centroid_similarity(df, "g").collect()
