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
