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
