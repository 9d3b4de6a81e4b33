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

__all__ = [
    "confusion_matrix", "cohen_kappa", "fleiss_kappa", "chi2_association",
]

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
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    share = exact_floor_div(
        F.col("n_pairs").cast("decimal(38,0)") * F.lit(_PPM),
        F.col("__tot").cast("decimal(38,0)"),
    )
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
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    kappa = F.when(
        (F.col("n_pairs") > 0) & (den != 0),
        exact_floor_div(num * F.lit(_PPM), den),
    )
    return joined.select(*gb, "n_pairs", "n_agree", kappa.alias("kappa_ppm"))


def fleiss_kappa(
    df: DataFrame,
    *,
    item: str,
    category: str,
    n_raters: int,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Fleiss' κ (1971) per group — chance-corrected agreement among a
    FIXED number of raters per item, exact to the ppm floor.

    Input is the tall rating frame: one row per (item, assigned
    category); an item rated by ``n_raters`` raters contributes exactly
    ``n_raters`` rows. Items whose rating count differs from
    ``n_raters`` are EXCLUDED (Fleiss' statistic assumes equal raters
    per item; partially-rated items are reported in
    ``n_items_dropped``, not silently mixed in). NULL item/category
    rows are excluded up front.

    Integer identity (n = n_raters, N = eligible items, T = N·n,
    A = Σ_items Σ_cats n_ij², S = Σ_cats c_j² over eligible items):
    κ·1e6 = floor(1e6 · (T·(A − T) − S·(n − 1)) / ((n − 1)·(T² − S))).
    Every operand is an exact integer in decimal(38,0) — headroom holds
    to T ≈ 10^12 ratings per group (T²·1e6 < 10^31) — so an independent
    engine reproduces the value bit-for-bit. NULL when no eligible
    items, n < 2, or p_e = 1 (T² = S: every rating one category).

    Plan: one groupBy to item×category cells, one item-level aggregate
    for eligibility + A, a semi-join of eligibility back onto the cells
    for the category totals — all shuffles are item- or label-sized,
    map-side combined; nothing data-sized is collected.
    """
    if n_raters < 2:
        raise ValueError(f"fleiss_kappa: n_raters must be >= 2, got {n_raters}")
    gb = list(group_by)
    ratings = df.filter(
        F.col(item).isNotNull() & F.col(category).isNotNull()
    ).select(*gb, F.col(item).alias("__it"), F.col(category).alias("__ct"))

    nij = ratings.groupBy(*gb, "__it", "__ct").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__nij")
    )
    item_tot = nij.groupBy(*gb, "__it").agg(
        F.sum("__nij").alias("__tot"),
        F.sum(F.col("__nij") * F.col("__nij")).alias("__sq"),
    )
    ok = item_tot.filter(F.col("__tot") == n_raters)

    def _agg(d, exprs):
        return d.groupBy(*gb).agg(*exprs) if gb else d.agg(*exprs)

    # base aggregates over ALL items (conditional on eligibility) so a
    # group whose items are ALL partially rated still emits its row —
    # n_items 0, n_items_dropped reported, kappa NULL — instead of
    # silently vanishing from the output
    eligible = F.col("__tot") == n_raters
    base = _agg(item_tot, [
        F.count(F.when(eligible, 1)).cast("bigint").alias("n_items"),
        F.sum(F.when(eligible, F.col("__sq"))).alias("__a"),
        F.count(F.when(~eligible, 1)).cast("bigint")
        .alias("n_items_dropped"),
    ])
    cat = nij.join(ok.select(*gb, "__it"), on=gb + ["__it"], how="left_semi")
    cj = cat.groupBy(*gb, "__ct").agg(F.sum("__nij").alias("__cj"))
    s = _agg(cj, [F.sum(F.col("__cj") * F.col("__cj")).alias("__s")])

    j = (
        base.join(s, on=gb, how="left") if gb
        else base.crossJoin(F.broadcast(s))
    )
    zero = F.lit(0).cast("decimal(38,0)")
    t = (F.col("n_items").cast("decimal(38,0)") * F.lit(int(n_raters)))
    a = F.coalesce(F.col("__a"), zero)
    ssum = F.coalesce(F.col("__s"), zero)
    num = t * (a - t) - ssum * F.lit(int(n_raters) - 1)
    den = (t * t - ssum) * F.lit(int(n_raters) - 1)
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    kappa = F.when(
        (F.col("n_items") > 0) & (den != 0),
        exact_floor_div(num * F.lit(_PPM), den),
    )
    return j.select(
        *gb,
        "n_items",
        F.coalesce(F.col("n_items_dropped"), F.lit(0).cast("bigint"))
        .alias("n_items_dropped"),
        kappa.alias("kappa_ppm"),
    )


def chi2_association(
    df: DataFrame,
    *,
    col_a: str,
    col_b: str,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Pearson chi-square independence statistic between two categorical
    columns, as a deterministic integer (χ²·1e6, floored per cell).

    The feature-screening primitive ("does this categorical feature
    carry signal about the label?") computed from the exact identity
    χ² = Σ_ij (n·o_ij − r_i·c_j)² / (n·r_i·c_j). Each cell's millionths
    value is floored exactly via the two-step division
    ``floor(t/d)·1e6 + floor((t mod d)·1e6 / d)`` — every intermediate
    fits decimal(38,0) for n up to ~10^9 pairs per group (t ≤ n⁴; the
    remainder path ≤ n³·1e6; the quotient path ≤ n·1e6 because a cell's
    χ² contribution is bounded by n). Zero-observed cells (absent from
    the contingency groupBy) enter through their closed-form total,
    (n² − Σ_observed r·c)/n, floored once. The statistic is defined AS
    this floored sum (within #cells+1 ppm of real χ²), so an independent
    engine reproduces it bit-for-bit. NULL-bearing pairs are excluded.

    Output: ``group_by + (n_pairs, dof, chi2_e6)`` with dof =
    (distinct_a − 1)·(distinct_b − 1); ``chi2_e6`` is NULL when dof = 0
    (a degenerate single-level side). Plan: label-sized contingency
    aggregates joined on tiny marginal tables — nothing data-sized.
    """
    gb = list(group_by)
    pairs = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).select(*gb, F.col(col_a).alias("__a"), F.col(col_b).alias("__b"))

    cell = pairs.groupBy(*gb, "__a", "__b").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__o")
    )
    ra = pairs.groupBy(*gb, "__a").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__r")
    )
    cb = pairs.groupBy(*gb, "__b").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__c")
    )

    def _agg(d, exprs):
        return d.groupBy(*gb).agg(*exprs) if gb else d.agg(*exprs)

    tot = _agg(pairs, [
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.countDistinct("__a").alias("__ka"),
        F.countDistinct("__b").alias("__kb"),
    ])
    j = cell.join(ra, on=gb + ["__a"]).join(cb, on=gb + ["__b"])
    j = j.join(F.broadcast(tot), on=gb) if gb else j.crossJoin(
        F.broadcast(tot)
    )
    n, o, r, c = F.col("__n"), F.col("__o"), F.col("__r"), F.col("__c")
    t = (n * o - r * c) * (n * o - r * c)
    d = n * r * c
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    cell_e6 = (
        exact_floor_div(t, d).cast("decimal(38,0)") * F.lit(_PPM)
        + exact_floor_div((t % d) * F.lit(_PPM), d).cast("decimal(38,0)")
    )
    per = j.select(
        *gb, "__ka", "__kb",
        F.col("__n").cast("bigint").alias("__np"),
        cell_e6.alias("__x"),
        (r * c).alias("__rc"),
    )
    gcols = gb + ["__np", "__ka", "__kb"]
    out = per.groupBy(*gcols).agg(
        F.sum("__x").cast("bigint").alias("__obs"),
        F.sum("__rc").alias("__src"),
    )
    # zero-observed cells never appear in the contingency groupBy, but
    # each still contributes e_ij = r_i·c_j/n to χ²; their total is the
    # closed-form missing mass (n² − Σ_observed r·c)/n — one exact floor
    nn = F.col("__np").cast("decimal(38,0)")
    missing_e6 = exact_floor_div((nn * nn - F.col("__src")) * F.lit(_PPM), nn)
    dof = ((F.col("__ka") - 1) * (F.col("__kb") - 1)).cast("bigint")
    return out.select(
        *gb,
        F.col("__np").alias("n_pairs"),
        dof.alias("dof"),
        F.when(dof > 0, F.col("__obs") + missing_e6).alias("chi2_e6"),
    )
