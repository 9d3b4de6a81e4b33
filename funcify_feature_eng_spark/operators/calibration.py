"""Model-calibration evaluation: reliability bins + expected calibration
error (ECE), exactly.

Before a scored model gates training data (quality filters, reward
models, safety classifiers), the pipeline owner needs to know whether
its scores MEAN what they say — a 0.9 that is right 60% of the time
mis-prices every downstream threshold. Reliability diagrams and ECE
(Naeini et al. 2015, public statistics) are the standard instruments;
here they are one-pass exact aggregates.

Determinism contract (house rule shared with checks/agreement): scores
enter as integer fixed-point millionths (``score_e6`` in [0, 1e6] — the
repo-wide ppm grid), so every bin statistic is integer arithmetic in
DECIMAL and an independent engine reproduces it bit-for-bit. No float
ever crosses an aggregation boundary (float sums are partition-order
dependent; integer sums are not). Callers with a double score column
pre-scale it once: ``F.round(score * 1e6).cast("long")``.

ECE identity: with per-bin positives ``pos_b``, score sums ``ssum_b``
and N total rows,
``acc_b − conf_b = (1e6·pos_b − ssum_b) / (1e6·n_b)``, so
``ECE·1e6 = floor(Σ_b |1e6·pos_b − ssum_b| / N)`` — one exact floor
division of integer totals (each |…| term is exactly n_b·1e6·|gap_b|).

Scale: one groupBy onto ≤ n_bins rows per group (map-side combined),
then a bins-sized summary aggregate. Nothing data-sized shuffles.

Reference parity anchor: the reference engine has no calibration
operator; this extends its materialized-feature QA surface
(feature-json/.../FeatureJsonPublisher.kt is the closest sink analog)
with the eval a scored-corpus pipeline needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.util import exact_floor_div

__all__ = [
    "reliability_bins",
    "calibration_summary",
    "calibration_state",
    "merge_calibration_states",
    "reliability_from_state",
]

_PPM = 1_000_000


def _binned(
    df: DataFrame,
    score_e6: str,
    label: str,
    n_bins: int,
    group_by: Sequence[str],
) -> DataFrame:
    """Shared per-bin aggregate: group_by + bin → (n, n_pos, ssum)."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    gb = list(group_by)
    s = F.col(score_e6).cast("decimal(38,0)")
    # integer bucketing: floor(score_e6 · n_bins / 1e6), clamped so the
    # boundary score 1e6 (and any out-of-range input) lands in an edge
    # bin instead of a phantom one
    bucket = F.greatest(
        F.lit(0),
        F.least(
            F.lit(int(n_bins) - 1),
            exact_floor_div(s * F.lit(int(n_bins)), F.lit(_PPM).cast("decimal(38,0)")),
        ),
    ).cast("int")
    rows = df.filter(
        F.col(score_e6).isNotNull() & F.col(label).isNotNull()
    ).select(
        *gb,
        bucket.alias("bin"),
        F.col(label).cast("long").alias("__y"),
        s.alias("__s"),
    )
    return rows.groupBy(*gb, "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__y").cast("bigint").alias("n_pos"),
        F.sum("__s").alias("__ssum"),
    )


def calibration_state(
    df: DataFrame,
    *,
    score_e6: str,
    label: str,
    n_bins: int = 10,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """The MERGEABLE per-bin calibration state: ``group_by + (bin, n,
    n_pos, score_sum)`` — three integer sums per bin, so states from
    disjoint slices (micro-batches, partitions, days) merge by addition
    into exactly the whole-data state (the same incremental posture as
    ``operators.checks.check_state``). ``score_sum`` is the exact
    decimal sum of the fixed-point scores. Feed slices here, union the
    outputs, then :func:`merge_calibration_states` →
    :func:`reliability_from_state`."""
    agg = _binned(df, score_e6, label, n_bins, list(group_by))
    return agg.withColumnRenamed("__ssum", "score_sum")


def merge_calibration_states(
    states: DataFrame, group_by: Sequence[str] = ()
) -> DataFrame:
    """Commutative/associative merge of :func:`calibration_state`
    frames: one groupBy-sum per (group, bin). Merging per-batch states
    equals the single-pass state over the concatenated data exactly —
    every field is an integer sum."""
    gb = list(group_by)
    return states.groupBy(*gb, "bin").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("n_pos").cast("bigint").alias("n_pos"),
        F.sum("score_sum").cast("decimal(38,0)").alias("score_sum"),
    )


def reliability_from_state(
    state: DataFrame, group_by: Sequence[str] = ()
) -> DataFrame:
    """Project a (merged) :func:`calibration_state` frame onto the
    reliability-diagram columns (see :func:`reliability_bins`)."""
    gb = list(group_by)
    pos6 = F.col("n_pos").cast("decimal(38,0)") * F.lit(_PPM)
    nn = F.col("n").cast("decimal(38,0)")
    gap = pos6 - F.col("score_sum")
    return state.select(
        *gb, "bin", "n", "n_pos",
        exact_floor_div(pos6, nn).alias("acc_ppm"),
        exact_floor_div(F.col("score_sum"), nn).alias("conf_ppm"),
        exact_floor_div(
            F.when(gap < 0, -gap).otherwise(gap), nn
        ).alias("gap_ppm"),
    )


def reliability_bins(
    df: DataFrame,
    *,
    score_e6: str,
    label: str,
    n_bins: int = 10,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Reliability-diagram table: per score bin, how often the label
    actually fired vs what the score claimed.

    ``score_e6`` is an integer fixed-point score in [0, 1e6]; ``label``
    is 0/1 (NULL rows on either column are excluded). Output per group:
    ``group_by + (bin, n, n_pos, acc_ppm, conf_ppm, gap_ppm)`` where
    ``acc_ppm = floor(1e6·n_pos/n)``, ``conf_ppm = floor(ssum/n)`` and
    ``gap_ppm = floor(|1e6·n_pos − ssum| / n)`` — the bin's exact
    |accuracy − confidence| on the ppm grid (NOT |acc_ppm − conf_ppm|,
    which would double-floor). Empty bins are absent (their mass is 0).
    Composition of :func:`calibration_state` (the mergeable form) and
    :func:`reliability_from_state`.
    """
    gb = list(group_by)
    return reliability_from_state(
        calibration_state(
            df, score_e6=score_e6, label=label, n_bins=n_bins, group_by=gb
        ),
        group_by=gb,
    )


def calibration_summary(
    df: DataFrame,
    *,
    score_e6: str,
    label: str,
    n_bins: int = 10,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """One-row-per-group calibration verdict: ECE and max-gap (MCE).

    ``ece_ppm = floor(Σ_b |1e6·n_pos_b − ssum_b| / N)`` (the exact
    bin-mass-weighted |acc − conf|, see module docstring) and
    ``mce_ppm = max_b floor(|1e6·n_pos_b − ssum_b| / n_b)``. Output:
    ``group_by + (n, ece_ppm, mce_ppm)``; groups with zero scored rows
    are absent.
    """
    gb = list(group_by)
    agg = _binned(df, score_e6, label, n_bins, gb)
    pos6 = F.col("n_pos").cast("decimal(38,0)") * F.lit(_PPM)
    gap = pos6 - F.col("__ssum")
    absgap = F.when(gap < 0, -gap).otherwise(gap)
    per = agg.select(
        *gb,
        F.col("n"),
        absgap.alias("__g"),
        exact_floor_div(absgap, F.col("n").cast("decimal(38,0)")).alias("__mce"),
    )
    exprs = [
        F.sum("n").cast("bigint").alias("n"),
        F.sum("__g").alias("__gsum"),
        F.max("__mce").alias("mce_ppm"),
    ]
    out = per.groupBy(*gb).agg(*exprs) if gb else per.agg(*exprs)
    return out.select(
        *gb, "n",
        exact_floor_div(
            F.col("__gsum"), F.col("n").cast("decimal(38,0)")
        ).alias("ece_ppm"),
        "mce_ppm",
    )
