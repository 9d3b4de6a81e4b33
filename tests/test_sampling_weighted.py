"""Weighted sampling: integer-exact Bernoulli + Efraimidis-Spirakis top-k.

Pins (a) exactness of the hash=False Bernoulli rule against a pure-Python
recomputation, (b) layout independence, (c) E-S selection size and
proportional-odds behavior, (d) E-S determinism across repartition.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.sampling import (
    weighted_sample,
    weighted_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    # weights 1..40 cycle so inclusion odds vary 40x
    rows = [(i, "g%d" % (i % 3), (i % 40) + 1) for i in range(2000)]
    return spark.createDataFrame(rows, "id long, g string, w int")


def test_weighted_sample_exact_integer_rule(spark, docs):
    got = sorted(
        r.id for r in weighted_sample(docs, "id", "w", 1, 80, hash=False).collect()
    )
    expect = [
        i
        for i in range(2000)
        if ((i % 2**31) * 2654435761 % 2**32) * 80 < ((i % 40) + 1) * 2**32
    ]
    assert got == expect
    # sanity: selection is weight-biased — heavy rows kept far more often
    heavy = sum(1 for i in expect if (i % 40) + 1 > 30) / 500
    light = sum(1 for i in expect if (i % 40) + 1 <= 10) / 500
    assert heavy > 3 * light


def test_weighted_sample_layout_independent(spark, docs):
    a = sorted(r.id for r in weighted_sample(docs, "id", "w", 1, 80, hash=True).collect())
    b = sorted(
        r.id
        for r in weighted_sample(
            docs.repartition(13, "g"), "id", "w", 1, 80, hash=True
        ).collect()
    )
    assert a == b and 0 < len(a) < 2000


def test_weighted_sample_rate_caps_at_one(spark, docs):
    # rate 1000/1 -> every probability >= 1 -> all rows kept, both modes
    assert weighted_sample(docs, "id", "w", 1000, 1, hash=False).count() == 2000
    assert weighted_sample(docs, "id", "w", 1000, 1, hash=True).count() == 2000


def test_weighted_topk_size_and_determinism(spark, docs):
    out = weighted_topk(docs, "g", "id", "w", 100)
    per = {r.g: r.n for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert per == {"g0": 100, "g1": 100, "g2": 100}
    a = sorted((r.g, r.id) for r in out.collect())
    b = sorted(
        (r.g, r.id)
        for r in weighted_topk(docs.repartition(17), "g", "id", "w", 100).collect()
    )
    assert a == b


def test_weighted_topk_small_group_keeps_all(spark):
    df = spark.createDataFrame([(i, 1) for i in range(5)], "id long, w int")
    assert weighted_topk(df, None, "id", "w", 100).count() == 5


def test_weighted_topk_proportional_odds(spark):
    # two weight classes 1 vs 9: among k=500 of 2000 rows (half each class),
    # the heavy class must dominate roughly 9:1 per E-S odds
    rows = [(i, 9 if i % 2 else 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w int")
    kept = weighted_topk(df, None, "id", "w", 500).collect()
    heavy = sum(1 for r in kept if r.w == 9)
    assert heavy > 350  # E[heavy] ~ 450; far above the 250 unweighted mean


def test_weighted_topk_drops_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -1), (4, None)], "id long, w int"
    )
    assert [r.id for r in weighted_topk(df, None, "id", "w", 10).collect()] == [1]


def test_weighted_sample_bad_rate(spark, docs):
    with pytest.raises(ValueError):
        weighted_sample(docs, "id", "w", 0, 5)
    with pytest.raises(ValueError):
        weighted_topk(docs, "g", "id", "w", 0)


def test_weighted_sample_huge_weight_no_wraparound(spark):
    """hash=False: weight*num >= 2^31 must keep ALL rows (p >= 1), not
    silently drop them via 64-bit wrap of w*num*2^32."""
    df = spark.createDataFrame(
        [(i, 3000) for i in range(50)], "id long, w long"
    )
    from funcify_feature_eng_spark.operators.sampling import weighted_sample

    assert weighted_sample(df, "id", "w", 1_000_000, 1, hash=False).count() == 50


def test_budget_mixture_exact_integer_rule(spark):
    """hash=False decisions equal a pure-Python recomputation of
    key*W*T_s < budget*w_s*2^32, with the p>=1 carve-out."""
    from funcify_feature_eng_spark.operators.sampling import budget_mixture_sample

    rows = [(i, "s%d" % (i % 3), 50 + i % 7) for i in range(900)]
    df = spark.createDataFrame(rows, "id long, src string, sz int")
    weights = {"s0": 3, "s1": 1}  # s2 unlisted -> dropped
    budget, W = 8000, 4
    got = sorted(
        r.id
        for r in budget_mixture_sample(
            df, "src", "id", "sz", budget, weights, hash=False
        ).collect()
    )
    totals = {}
    for i, s, z in rows:
        totals[s] = totals.get(s, 0) + z
    expect = []
    for i, s, z in rows:
        if s not in weights:
            continue
        key = (i % 2**31) * 2654435761 % 2**32
        if budget * weights[s] >= W * totals[s] or (
            key * W * totals[s] < budget * weights[s] * 2**32
        ):
            expect.append(i)
    assert got == sorted(expect) and 0 < len(got) < 600


def test_budget_mixture_hits_target_shares(spark):
    """Expected kept size per source ~ budget*w_s/W (law of large numbers)."""
    from funcify_feature_eng_spark.operators.sampling import budget_mixture_sample
    from pyspark.sql import functions as F

    rows = [(i, "a" if i % 2 else "b", 100) for i in range(20000)]
    df = spark.createDataFrame(rows, "id long, src string, sz int")
    out = budget_mixture_sample(df, "src", "id", "sz", 300_000, {"a": 2, "b": 1})
    kept = {
        r.src: r.total
        for r in out.groupBy("src").agg(F.sum("sz").alias("total")).collect()
    }
    # targets: a -> 200k, b -> 100k of 1M per side; 4-sigma-ish bands
    assert 170_000 < kept["a"] < 230_000, kept
    assert 80_000 < kept["b"] < 120_000, kept


def test_budget_mixture_small_source_keeps_all(spark):
    from funcify_feature_eng_spark.operators.sampling import budget_mixture_sample

    rows = [(i, "big", 100) for i in range(1000)] + [(10_000 + i, "tiny", 10) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, src string, sz int")
    out = budget_mixture_sample(df, "src", "id", "sz", 5000, {"big": 1, "tiny": 1}, hash=False)
    assert out.filter("src = 'tiny'").count() == 5  # p caps at 1


def test_budget_mixture_validation_and_overflow_guard(spark):
    from funcify_feature_eng_spark.operators.sampling import budget_mixture_sample
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([(1, "a", 10)], "id long, src string, sz int")
    with pytest.raises(ValueError):
        budget_mixture_sample(df, "src", "id", "sz", 0, {"a": 1})
    with pytest.raises(ValueError):
        budget_mixture_sample(df, "src", "id", "sz", 10, {})
    with pytest.raises(ValueError, match="use hash=True"):
        budget_mixture_sample(df, "src", "id", "sz", 2**40, {"a": 1}, hash=False)
    # data-dependent LHS guard: W*T_s >= 2^31 raises at execution
    big = spark.createDataFrame([(1, "a", 2**31)], "id long, src string, sz long")
    with pytest.raises(SparkRuntimeException):
        budget_mixture_sample(big, "src", "id", "sz", 10, {"a": 1}, hash=False).count()


def test_weighted_sample_fractional_weight_hash_false_raises(spark):
    """hash=False is the integer-exact path — a fractional weight column
    would truncate to 0 and never be kept, so it must raise with the
    fixed-point-grid guidance instead of silently dropping everything."""
    import pytest

    df = spark.createDataFrame([(f"d{i}", 0.5) for i in range(10)], "id string, w double")
    with pytest.raises(ValueError, match="integral weight"):
        weighted_sample(df, "id", "w", 1, 2, hash=False)
    # hash=True still accepts fractional weights (double semantics)
    assert weighted_sample(df, "id", "w", 2, 1, hash=True).count() == 10


def test_topk_oracle_gap_margin():
    """Proof obligation for the q_weighted_topk value gate: the only float
    step in the hash=False Efraimidis-Spirakis key ln(u)/w is ln over a
    bit-identical dyadic input, so engines can disagree by at most ~1 ulp
    (~2.2e-16 relative). Assert the gate fixture's minimum adjacent-key gap
    within any language group clears that by >= 6 orders of magnitude —
    then no boundary rank can flip between Spark and the DuckDB oracle."""
    import collections
    import math
    import os

    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip(f"no fixture at {path}")
    rows = duckdb.connect().execute(
        f"SELECT doc_id, lang, strlen(text) FROM '{path}' WHERE strlen(text) > 0"
    ).fetchall()
    groups = collections.defaultdict(list)
    for doc_id, lang, w in rows:
        k = ((doc_id % 2147483648) + 2147483648) % 2147483648 * 2654435761 % 4294967296
        groups[lang].append(math.log((k + 1) / 4294967296.0) / w)
    min_rel = 1.0
    for keys in groups.values():
        keys.sort()
        for a, b in zip(keys, keys[1:]):
            rel = abs(b - a) / max(abs(a), abs(b))
            min_rel = min(min_rel, rel)
    # 1 ulp ~ 2.2e-16 relative; require >= 1e-10 (a million-fold margin)
    assert min_rel >= 1e-10, f"adjacent-key relative gap {min_rel} too tight"
