"""group_auc: Mann-Whitney rank-sum AUC vs an independent pair-counting
reference (the O(n²) definition), including tie handling and edge cases."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.metrics import group_auc


def _auc_pairs(rows):
    """Definitional AUC: P(score_pos > score_neg) + 0.5·P(equal)."""
    pos = [s for y, s in rows if y]
    neg = [s for y, s in rows if not y]
    if not pos or not neg:
        return None
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_auc_matches_pair_counting_with_ties(spark):
    rng = random.Random(11)
    rows = []
    for g in ("a", "b", "c"):
        for _ in range(300):
            y = rng.random() < 0.3
            # quantized scores force heavy ties; positives shifted up
            s = round(rng.gauss(1.0 if y else 0.0, 1.0) * 4) / 4.0
            rows.append((g, y, s))
    df = spark.createDataFrame(rows, "g string, y boolean, s double")
    got = {r.g: (r.n_pos, r.n_neg, r.auc) for r in group_auc(df, "y", "s", ["g"]).collect()}
    for g in ("a", "b", "c"):
        sub = [(y, s) for gg, y, s in rows if gg == g]
        want = _auc_pairs(sub)
        n_pos, n_neg, auc = got[g]
        assert n_pos == sum(1 for y, _ in sub if y)
        assert auc == pytest.approx(want, abs=1e-12)
        assert auc > 0.6  # the planted shift is detectable


def test_auc_perfect_and_degenerate(spark):
    df = spark.createDataFrame(
        [(True, 10.0), (True, 9.0), (False, 1.0), (False, 2.0)], "y boolean, s double"
    )
    assert group_auc(df, "y", "s").collect()[0].auc == 1.0
    rev = group_auc(df.withColumn("s", -F.col("s")), "y", "s").collect()[0]
    assert rev.auc == 0.0
    one_class = spark.createDataFrame([(True, 1.0), (True, 2.0)], "y boolean, s double")
    r = group_auc(one_class, "y", "s").collect()[0]
    assert r.auc is None and r.n_neg == 0


def test_auc_all_tied_is_half_and_nulls_drop(spark):
    df = spark.createDataFrame(
        [(True, 5.0), (False, 5.0), (True, 5.0), (False, 5.0),
         (None, 1.0), (True, None)],
        "y boolean, s double",
    )
    r = group_auc(df, "y", "s").collect()[0]
    assert r.auc == 0.5 and r.n_pos == 2 and r.n_neg == 2


def test_label_gini_matches_rational_reference(spark):
    from fractions import Fraction
    from math import floor

    from funcify_feature_eng_spark.operators.metrics import label_gini

    rows = [
        ("f1", "x"), ("f1", "x"), ("f1", "x"),              # pure
        ("f2", "x"), ("f2", "y"),                           # uniform 2
        ("f3", "x"), ("f3", "x"), ("f3", "y"),              # 2/3 - 1/3
        ("f4", "x"), ("f4", "y"), ("f4", "z"),              # uniform 3
        (None, "x"), ("f1", None),                          # excluded
    ]
    df = spark.createDataFrame(rows, "f string, y string")
    got = {
        r["f"]: (r["n"], r["n_labels"], r["majority_ppm"], r["gini_ppm"])
        for r in label_gini(df, feature="f", label="y").collect()
    }
    from collections import Counter
    per = {}
    for f, y in rows:
        if f is not None and y is not None:
            per.setdefault(f, []).append(y)
    ref = {}
    for f, ys in per.items():
        c = Counter(ys)
        n = len(ys)
        ref[f] = (
            n, len(c),
            floor(Fraction(1_000_000 * max(c.values()), n)),
            floor(Fraction(1_000_000) * (n * n - sum(v * v for v in c.values())) / (n * n)),
        )
    assert got == ref
    assert got["f1"][3] == 0                       # pure -> gini 0
    assert got["f2"][3] == 500_000                 # uniform 2 -> 1/2
    assert got["f4"][3] == 666_666                 # uniform 3 floored


def _poisson_w_ref(ident, rep, thresholds):
    u = ((ident % 2**31) * 2654435761 + rep * 40503) % 2**32
    return sum(1 for t in thresholds if u >= t)


def test_poisson_bootstrap_matches_reference(spark):
    from fractions import Fraction
    from math import floor

    from funcify_feature_eng_spark.operators.metrics import (
        poisson_bootstrap,
        poisson_cdf_thresholds_u32,
    )

    rows = [(i, (i * 7) % 13) for i in range(200)] + [(None, 5), (7, None)]
    df = spark.createDataFrame(rows, "id long, x int")
    out = {
        r["replicate"]: (r["n_eff"], r["mean_e6"])
        for r in poisson_bootstrap(
            df, value="x", id_col="id", n_replicates=8, hash=False
        ).collect()
    }
    th = poisson_cdf_thresholds_u32()
    ref = {}
    for rep in range(8):
        sw = swx = 0
        for i, x in rows:
            if i is None or x is None:
                continue
            w = _poisson_w_ref(i, rep, th)
            sw += w
            swx += w * x
        ref[rep] = (sw, floor(Fraction(1_000_000 * swx, sw)) if sw else None)
    assert out == ref
    # weights average ~1: total effective n within 25% of the true n
    assert all(0.75 * 200 < n < 1.25 * 200 for n, _ in out.values())


def test_bootstrap_ci_rank_semantics(spark):
    import pytest

    from funcify_feature_eng_spark.operators.metrics import bootstrap_ci

    means = [(r, m) for r, m in enumerate(
        [900, 100, 500, 300, 700, 200, 800, 600, 400, 1000, None])]
    df = spark.createDataFrame(means, "replicate int, mean_e6 long")
    row = bootstrap_ci(df, alpha_ppm=100_000).collect()[0]
    # B = 10 non-NULL; sorted = 100..1000; lo = elem[floor(9*.1)] =
    # elem[0]=100? floor(0.9)=0 -> 100; hi = elem[ceil(9*.9)] =
    # elem[ceil(8.1)=9] -> 1000; median = elem[4] = 500
    assert row["n_replicates"] == 10
    assert (row["lo_e6"], row["median_e6"], row["hi_e6"]) == (100, 500, 1000)
    with pytest.raises(ValueError):
        bootstrap_ci(df, alpha_ppm=600_000)


def test_bootstrap_end_to_end_rate_ci(spark):
    from funcify_feature_eng_spark.operators.metrics import (
        bootstrap_ci,
        poisson_bootstrap,
    )

    # 30% true rate; CI must bracket it with B=32. hash=True (xxhash64)
    # is the statistically sound path — the linear knuth key (hash=False,
    # the cross-engine ORACLE convention) can correlate with periodic
    # labels like this one and is exactness-tested above instead.
    rows = [(i, 1 if i % 10 < 3 else 0) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, x int")
    reps = poisson_bootstrap(
        df, value="x", id_col="id", n_replicates=32, hash=True)
    ci = bootstrap_ci(reps).collect()[0]
    assert ci["lo_e6"] <= 300_000 <= ci["hi_e6"]
    assert ci["hi_e6"] - ci["lo_e6"] < 150_000  # tight-ish at n=1000


def test_bootstrap_ci_empty_means_yields_null_endpoints(spark):
    from funcify_feature_eng_spark.operators.metrics import bootstrap_ci

    df = spark.createDataFrame([(0, None)], "replicate int, mean_e6 long")
    row = bootstrap_ci(df).collect()[0]
    # zero non-NULL means: degenerate row with NULL endpoints (matching
    # the SQL twin's ms[1] on an empty list), never an ANSI index crash
    assert row["n_replicates"] == 0
    assert row["lo_e6"] is None and row["hi_e6"] is None


def test_ranking_metrics_exact(spark):
    from funcify_feature_eng_spark.operators.metrics import ranking_metrics

    results = spark.createDataFrame(
        [
            # q1: hits at ranks 2 and 3 of 3 retrieved
            ("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3),
            # q2: no hits in top k (rank 6 is beyond k=5)
            ("q2", "x", 1), ("q2", "b", 6),
            # q3: retrieved but no truth row at all
            ("q3", "z", 1),
            # NULL/odd ranks ignored
            ("q1", "zz", None), ("q1", "zy", 0),
        ],
        "q string, doc string, rank int",
    )
    truth = spark.createDataFrame(
        [("q1", "b"), ("q1", "c"), ("q1", "d"), ("q2", "b"), ("q2", "b"),
         ("q4", "only-truth")],
        "q string, doc string",
    )
    rows = {
        r["q"]: r
        for r in ranking_metrics(
            results, truth, query_col="q", doc_col="doc", rank_col="rank", k=5
        ).collect()
    }
    assert set(rows) == {"q1", "q2", "q3", "q4"}
    q1 = rows["q1"]
    assert (q1["n_relevant"], q1["n_retrieved"], q1["n_hits"]) == (3, 3, 2)
    assert q1["precision_ppm"] == 2 * 1_000_000 // 3
    assert q1["recall_ppm"] == 2 * 1_000_000 // 3
    assert q1["rr_ppm"] == 500_000  # first hit at rank 2
    q2 = rows["q2"]
    assert (q2["n_relevant"], q2["n_retrieved"], q2["n_hits"]) == (1, 1, 0)
    assert q2["precision_ppm"] == 0 and q2["recall_ppm"] == 0 and q2["rr_ppm"] == 0
    q3 = rows["q3"]
    assert q3["n_relevant"] == 0 and q3["recall_ppm"] is None
    assert q3["precision_ppm"] == 0
    q4 = rows["q4"]
    assert q4["n_retrieved"] == 0 and q4["precision_ppm"] is None
    assert q4["recall_ppm"] == 0 and q4["rr_ppm"] == 0


def test_ranking_metrics_validation(spark):
    import pytest

    from funcify_feature_eng_spark.operators.metrics import ranking_metrics

    df = spark.createDataFrame([("q", "d", 1)], "q string, doc string, rank int")
    with pytest.raises(ValueError, match="k must be"):
        ranking_metrics(df, df.select("q", "doc"), query_col="q", doc_col="doc",
                        rank_col="rank", k=0)


def test_ranking_metrics_duplicate_doc_collapses_to_best_rank(spark):
    # sets, not bags: a doc listed at two ranks counts once (best rank) —
    # bag semantics would report precision_ppm 1e6 with n_hits 2 here
    from funcify_feature_eng_spark.operators.metrics import ranking_metrics

    res = spark.createDataFrame(
        [("q1", "docA", 1), ("q1", "docA", 3), ("q1", "docB", 2)],
        "q string, doc string, rank int",
    )
    tru = spark.createDataFrame([("q1", "docA")], "q string, doc string")
    r = ranking_metrics(
        res, tru, query_col="q", doc_col="doc", rank_col="rank", k=5
    ).collect()[0]
    assert r["n_retrieved"] == 2 and r["n_hits"] == 1
    assert r["precision_ppm"] == 500_000 and r["recall_ppm"] == 1_000_000
    assert r["rr_ppm"] == 1_000_000  # first hit at rank 1
