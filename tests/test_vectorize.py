"""Feature-hashing vectorizer (operators/vectorize.py).

Differential gate: the per-row HOF fold must equal an independent
explode→groupBy→collect re-aggregation of the same hash arithmetic, and the
pure-Python xxh64 twin, on real document text.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.functions.xxh64 import spark_xxhash64
from funcify_feature_eng_spark.operators.vectorize import (
    hashed_count_vector,
    hashed_vector_cols,
)

DIM, SEED = 32, 7


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            "doc_id",
            F.filter(F.split("text", " "), lambda t: t != "").alias("toks"),
        )
        .filter(F.col("toks").isNotNull())
        .limit(120)
        .cache()
    )


def _py_vector(tokens: list[str], dim: int, seed: int, signed: bool):
    sums: dict[int, int] = {}
    for t in tokens:
        if t is None:
            continue
        h = spark_xxhash64(("int", seed), t)
        s = (-1 if h < 0 else 1) if signed else 1
        k = h % dim
        sums[k] = sums.get(k, 0) + s
    idx = sorted(sums)
    return idx, [sums[k] for k in idx]


@pytest.mark.parametrize("signed", [True, False])
def test_matches_python_twin(spark, docs, signed):
    out = hashed_count_vector(docs, "toks", DIM, seed=SEED, signed=signed)
    for r in out.collect():
        idx, val = _py_vector(r["toks"], DIM, SEED, signed)
        assert list(r["indices"]) == idx, r["doc_id"]
        assert list(r["values"]) == val, r["doc_id"]


def test_matches_explode_groupby(spark, docs):
    """The zero-shuffle fold ≡ the shuffle-based reference aggregation."""
    folded = hashed_count_vector(docs, "toks", DIM, seed=SEED).select(
        "doc_id",
        F.explode(F.arrays_zip("indices", "values")).alias("z"),
    ).select(
        "doc_id", F.col("z.indices").alias("slot"), F.col("z.values").alias("v")
    )
    h = F.xxhash64(F.lit(SEED).cast("int"), F.col("tok"))
    ref = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .select(
            "doc_id",
            F.pmod(h, F.lit(DIM)).cast("int").alias("slot"),
            F.when(h < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long").alias("s"),
        )
        .groupBy("doc_id", "slot")
        .agg(F.sum("s").alias("v"))
    )
    assert folded.exceptAll(ref).count() == 0
    assert ref.exceptAll(folded).count() == 0


def test_unsigned_totals_and_order(spark, docs):
    out = hashed_count_vector(docs, "toks", DIM, seed=SEED, signed=False)
    rows = out.select(
        F.size("toks").alias("n"),
        F.aggregate("values", F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "tot"
        ),
        # strictly increasing indices: sorted AND distinct
        (F.col("indices") == F.array_sort(F.array_distinct("indices"))).alias(
            "inc"
        ),
        F.size("indices").alias("k"),
    ).collect()
    for r in rows:
        assert r["tot"] == r["n"]  # unsigned values sum to token count
        assert r["inc"]
        assert r["k"] <= DIM


def test_null_and_empty_edges(spark):
    df = spark.createDataFrame(
        [(1, ["a", None, "b"]), (2, []), (3, None)],
        "id int, toks array<string>",
    )
    out = {r["id"]: r for r in hashed_count_vector(df, "toks", 8, seed=0).collect()}
    # NULL tokens skipped: row 1 has exactly the slots of ['a','b']
    idx, val = _py_vector(["a", "b"], 8, 0, True)
    assert list(out[1]["indices"]) == idx and list(out[1]["values"]) == val
    assert list(out[2]["indices"]) == [] and list(out[2]["values"]) == []
    assert out[3]["indices"] is None and out[3]["values"] is None


def test_cancelling_collision_keeps_slot(spark):
    """dim=1 forces every token into slot 0; a +1/-1 token pair must keep
    the slot with value 0 (occupied-slot set depends on tokens alone)."""
    pos = neg = None
    i = 0
    while pos is None or neg is None:
        t = f"tok{i}"
        if spark_xxhash64(("int", 0), t) < 0:
            neg = neg or t
        else:
            pos = pos or t
        i += 1
    df = spark.createDataFrame([(1, [pos, neg])], "id int, toks array<string>")
    r = hashed_count_vector(df, "toks", 1, seed=0).collect()[0]
    assert list(r["indices"]) == [0] and list(r["values"]) == [0]


def test_bad_dim_raises(spark):
    with pytest.raises(ValueError, match="dim must be positive"):
        hashed_vector_cols(F.col("x"), 0)


def test_plan_is_map_only(spark, docs):
    plan = hashed_count_vector(docs, "toks", DIM, seed=SEED)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan  # zero Python
