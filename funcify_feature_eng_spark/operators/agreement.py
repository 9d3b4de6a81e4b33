"""Inter-rater agreement and confusion analysis for labeled corpora.

An RLHF / annotation pipeline at scale ships label batches from many
raters (human or model); before labels train anything, the pipeline
owner needs (a) where two raters disagree (confusion matrix) and (b)
whether agreement beats chance (Cohen's kappa, 1960 — public
statistics). Both here as exact, one-job aggregates.

Determinism contract (matches the checks/BM25 house rule): every output
is a BIGINT count or an integer parts-per-million computed in DECIMAL —
kappa is a ratio of integer-valued counts, so an independent engine
reproduces it bit-for-bit. κ·1e6 = floor(1e6 · (n·agree − S) /
(n² − S)) where S = Σ_k rowmarg_k · colmarg_k; the decimal(38) headroom
holds past 10^12 labeled pairs (n²·1e6 ≈ 10^30 < 10^38).

Scale: the pair frame shuffles once per marginal groupBy on
(group, label) — label cardinality is tiny, so every aggregate is
map-side combined; nothing data-sized is joined or collected.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["confusion_matrix", "cohen_kappa"]

_PPM = 1_000_000


def confusion_matrix(
    df: DataFrame,
    *,
    expected: str,
    predicted: str,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Exact (expected, predicted) label-pair counts with global shares.

    Rows where either label is NULL are excluded (they are
    completeness's problem, not agreement's). Output per group:
    ``group_by + (expected, predicted, n_pairs, share_e6)`` where
    ``share_e6`` is the integer-floor millionths share of the group's
    pair total. One groupBy plus a broadcast-sized totals join.
    """
    gb = list(group_by)
    pairs = df.filter(
        F.col(expected).isNotNull() & F.col(predicted).isNotNull()
    )
    cell = pairs.groupBy(
        *gb, F.col(expected).alias("expected"),
        F.col(predicted).alias("predicted"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    if gb:
        totals = cell.groupBy(*gb).agg(F.sum("n_pairs").alias("__tot"))
        cell = cell.join(F.broadcast(totals), on=gb, how="inner")
    else:
        totals = cell.agg(F.sum("n_pairs").alias("__tot"))
        cell = cell.crossJoin(F.broadcast(totals))
    share = F.floor(
        F.col("n_pairs").cast("decimal(38,0)") * F.lit(_PPM)
        / F.col("__tot").cast("decimal(38,0)")
    ).cast("bigint")
    return cell.select(
        *gb, "expected", "predicted", "n_pairs", share.alias("share_e6")
    )


def cohen_kappa(
    df: DataFrame,
    *,
    rater_a: str,
    rater_b: str,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Cohen's κ per group, exact to the ppm floor.

    κ = (p_o − p_e) / (1 − p_e) with p_o = agree/n and
    p_e = Σ_k marg_a(k)·marg_b(k)/n², computed as the integer identity
    κ·1e6 = floor(1e6·(n·agree − S)/(n² − S)). Output:
    ``group_by + (n_pairs, n_agree, kappa_ppm)``; ``kappa_ppm`` is NULL
    when undefined (no pairs, or p_e = 1 — both raters degenerate onto
    marginals whose product saturates, e.g. both constant). Rows with a
    NULL label on either side are excluded.

    Plan: one base aggregate for (n, agree) + two label-marginal
    aggregates joined on the tiny label set — three map-combined
    shuffles of group×label rows, no data-sized join.
    """
    gb = list(group_by)
    pairs = df.filter(
        F.col(rater_a).isNotNull() & F.col(rater_b).isNotNull()
    ).select(
        *gb,
        F.col(rater_a).alias("__a"),
        F.col(rater_b).alias("__b"),
    )

    def _agg(d, exprs):
        return d.groupBy(*gb).agg(*exprs) if gb else d.agg(*exprs)

    base = _agg(pairs, [
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.coalesce(F.sum(F.when(F.col("__a") == F.col("__b"), 1)), F.lit(0))
        .cast("bigint").alias("n_agree"),
    ])
    ma = pairs.groupBy(*gb, F.col("__a").alias("__lbl")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__ca")
    )
    mb = pairs.groupBy(*gb, F.col("__b").alias("__lbl")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__cb")
    )
    on = gb + ["__lbl"]
    prod = ma.join(mb, on=on, how="inner").select(
        *gb,
        (F.col("__ca").cast("decimal(38,0)")
         * F.col("__cb").cast("decimal(38,0)")).alias("__p"),
    )
    s = _agg(prod, [F.sum("__p").alias("__s")])
    joined = (
        base.join(s, on=gb, how="left") if gb
        else base.crossJoin(F.broadcast(s))
    )
    n = F.col("n_pairs").cast("decimal(38,0)")
    agree = F.col("n_agree").cast("decimal(38,0)")
    ssum = F.coalesce(F.col("__s"), F.lit(0).cast("decimal(38,0)"))
    num = n * agree - ssum
    den = n * n - ssum
    kappa = F.when(
        (F.col("n_pairs") > 0) & (den != 0),
        F.floor(num * F.lit(_PPM) / den).cast("bigint"),
    )
    return joined.select(*gb, "n_pairs", "n_agree", kappa.alias("kappa_ppm"))
