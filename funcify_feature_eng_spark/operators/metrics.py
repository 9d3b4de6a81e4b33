"""Distributed evaluation metrics for feature/model pipelines.

Rounds out the eval family (kNN label precision in retrieval.py, allclose
parity in parity.py, TVD drift in drift.py) with the standard ranking
metric: per-group ROC-AUC via the Mann-Whitney rank-sum identity —
``AUC = (R_pos − n_pos·(n_pos+1)/2) / (n_pos·n_neg)`` where ``R_pos`` is
the sum of the positives' AVERAGE ranks (ties share the mean of their rank
range, the textbook tie treatment). No O(n²) pair enumeration: one window
sort per group + one aggregation.

Engine-portable by construction (oracle-gated): ranks are integers, tie
adjustments are exact halves, and every intermediate (rank sums bounded by
n² ≪ 2^52, halves) is exactly representable in IEEE doubles — so the one
final division produces bit-identical results in any engine from the same
rows, no matter the summation order.

Reference anchor: the reference computes features, not metrics
(materializer modules) — scoring the features it produces is the
capability a Spark user adds on top (SURVEY §2 extensions).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def group_auc(
    df: DataFrame,
    label_col: str | Column,
    score_col: str | Column,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Per-group ROC-AUC of ``score_col`` against boolean ``label_col``.

    Emits ``(group..., n_pos, n_neg, auc)``; ``auc`` is NULL when a group
    lacks both classes (undefined). Rows with NULL label or score drop.
    Higher scores ranking positives higher ⇒ AUC → 1; 0.5 = chance.

    Scale shape: ONE exchange (the per-group rank window; the tie-count
    window shares its partitioning) + a combinable aggregation. At 10^12
    rows partition by entity/day groups — a single global AUC over
    everything funnels one group through one task, like any global sort.
    """
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    sc = F.col(score_col) if isinstance(score_col, str) else score_col
    keys = list(group_by)
    part = keys or [F.lit(1)]
    base = df.filter(lab.isNotNull() & sc.isNotNull()).select(
        *keys, lab.cast("boolean").alias("__y"), sc.alias("__s")
    )
    w_rank = W.partitionBy(*part).orderBy("__s")
    w_tie = W.partitionBy(*part, "__s")
    # average rank of a tie block = min_rank + (block_size - 1)/2
    avg_rank = (
        F.rank().over(w_rank).cast("double")
        + (F.count(F.lit(1)).over(w_tie).cast("double") - F.lit(1.0)) / F.lit(2.0)
    )
    ranked = base.withColumn("__r", avg_rank)
    gb = ranked.groupBy(*keys) if keys else ranked.groupBy()
    agg = gb.agg(
        F.sum(F.when(F.col("__y"), F.col("__r"))).alias("__rpos"),
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).cast("long").alias("n_neg"),
    )
    np_, nn = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    auc = (F.col("__rpos") - np_ * (np_ + F.lit(1.0)) / F.lit(2.0)) / (np_ * nn)
    return agg.select(
        *keys,
        "n_pos",
        "n_neg",
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc).alias("auc"),
    )


def label_gini(
    df: DataFrame,
    *,
    feature: str,
    label: str,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Per-feature-value label purity: Gini impurity + majority share,
    exact to the ppm floor — the split-quality screen ("does bucketing
    by this feature separate the labels?") that pairs with
    :func:`~funcify_feature_eng_spark.operators.agreement.chi2_association`
    (global association) and cumulative target encoding (per-value
    signal). Gini is the impurity measure that stays RATIONAL —
    1 − Σ_k (c_k/n)² — so unlike entropy it needs no log call and an
    independent engine reproduces it bit-for-bit:
    ``gini_ppm = floor(1e6 · (n² − Σ_k c_k²) / n²)``.

    NULL feature/label rows are excluded. Output per group:
    ``group_by + (feature value, n, n_labels, majority_ppm, gini_ppm)``
    where ``majority_ppm = floor(1e6 · max_k c_k / n)``. Gini of a pure
    value is 0; of a uniform K-label value, (1 − 1/K) · 1e6 (floored).

    Scale: one groupBy onto (feature × label)-sized rows, one onto
    feature-sized rows — both map-side combined; decimal(38) headroom
    past 10^15 rows per feature value.
    """
    gb = list(group_by)
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    pairs = df.filter(
        F.col(feature).isNotNull() & F.col(label).isNotNull()
    ).select(*gb, F.col(feature).alias("__f"), F.col(label).alias("__y"))
    cell = pairs.groupBy(*gb, "__f", "__y").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__c")
    )
    per = cell.groupBy(*gb, "__f").agg(
        F.sum("__c").alias("__n"),
        F.count(F.lit(1)).cast("bigint").alias("n_labels"),
        F.max("__c").alias("__maj"),
        F.sum(F.col("__c") * F.col("__c")).alias("__sq"),
    )
    n = F.col("__n")
    return per.select(
        *gb,
        F.col("__f").alias(feature),
        n.cast("bigint").alias("n"),
        "n_labels",
        exact_floor_div(F.col("__maj") * F.lit(1_000_000), n)
        .alias("majority_ppm"),
        exact_floor_div(
            (n * n - F.col("__sq")) * F.lit(1_000_000), n * n
        ).alias("gini_ppm"),
    )
