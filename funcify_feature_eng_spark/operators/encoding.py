"""Leakage-free categorical target encoding.

Target encoding replaces a categorical value with a statistic of the target
over *other* rows of the same category. Done naively (a global per-category
mean) it leaks the row's own target and, worse, leaks the FUTURE into the
past — the classic train-time/serve-time skew the reference's point-in-time
store exists to prevent (``schema/tracking/TrackableValue.kt:147-155``:
a tracked value is only visible at timestamps >= when it was calculated).

`cumulative_target_encode` is the streaming-consistent formulation: for each
row, the encoding uses ONLY rows of the same category that are strictly
earlier in the (order)-total-order — exactly what an online system that
updates per-category counters as events arrive would have seen. Computed as
one window pass (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING) per category:
one shuffle on the category key, fully JVM-side, no Python.

Smoothing is additive (m pseudo-observations of a fixed prior), kept on an
integer grid so the result is bit-identical across engines: with integer
target values ``t`` (e.g. a micro-unit fixed-point target),

    enc = (sum_prior(t) + m * prior) DIV (count_prior + m)

never leaves BIGINT arithmetic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cumulative_target_encode(
    df: DataFrame,
    *,
    category_col: str,
    target_col: Column | str,
    order: Sequence[str],
    smoothing_m: int = 10,
    prior: int = 0,
    out_col: str = "target_enc",
) -> DataFrame:
    """Attach the strictly-prior smoothed per-category target mean.

    ``target_col`` must be integral (cast your target onto a fixed-point
    grid first); ``order`` must be a total order (include a unique
    tie-break column) so the "strictly prior" set is deterministic under
    any shuffle layout. Also emits ``{out}_cnt`` / ``{out}_sum`` so
    downstream consumers can re-smooth without a second pass.

    The integer division truncates toward zero; with a non-negative target
    and prior that is floor division, and both Spark's ``DIV`` and
    DuckDB's ``//`` agree on it — the cross-engine-exactness contract used
    throughout the gate.
    """
    tgt = F.col(target_col) if isinstance(target_col, str) else target_col
    w = (
        Window.partitionBy(category_col)
        .orderBy(*[F.col(c).asc() for c in order])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cnt = F.count("__t").over(w).cast("long")
    ssum = F.coalesce(F.sum("__t").over(w), F.lit(0)).cast("long")
    # BIGINT literals (L suffix): under ANSI mode m * prior would otherwise
    # be planned as INT * INT and overflow at ~2^31
    enc = F.expr(
        f"(`{out_col}_sum` + {int(smoothing_m)}L * {int(prior)}L)"
        f" div (`{out_col}_cnt` + {int(smoothing_m)}L)"
    )
    return (
        df.withColumn("__t", tgt)
        .withColumn(f"{out_col}_cnt", cnt)
        .withColumn(f"{out_col}_sum", ssum)
        .withColumn(out_col, enc.cast("long"))
        .drop("__t")
    )


def count_encode(
    df: DataFrame,
    category_col: str,
    *,
    group_by: Sequence[str] = (),
    out_prefix: str = "cat",
) -> DataFrame:
    """Frequency (count) encoding: attach ``{out_prefix}_cnt`` — how many
    rows share this row's category (within ``group_by`` if given) — and
    ``{out_prefix}_share_ppm`` = floor(1e6 * cnt / group total). The
    no-training-table cousin of target encoding: a category's prevalence
    is often the only signal a tail category has, and unlike one-hot it
    costs one column at ANY cardinality.

    NULL categories are a real level (frequency encoding treats "absent"
    as informative) — counted as their own group, like SQL GROUP BY.

    Exactness: counts are integers; the share uses the remainder-identity
    floor division (``exact_floor_div``), so both outputs are
    bit-reproducible in any engine. Unlike ``cumulative_target_encode``
    this is NOT leakage-free w.r.t. a label — it encodes prevalence, not
    the target; it needs no temporal guard.

    Scale: one map-side-combined aggregate onto category-grain rows +
    one group-grain roll-up of that (no second data pass), broadcast
    back — the data side never shuffles."""
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    keys = list(group_by)
    counts = df.groupBy(*keys, category_col).agg(
        F.count(F.lit(1)).alias(f"{out_prefix}_cnt")
    )
    tot_w = Window.partitionBy(*[F.col(k) for k in keys])
    # totals via a window over the CATEGORY-GRAIN frame: tiny (one row per
    # category), never the data
    enriched = counts.withColumn(
        "__tot", F.sum(f"{out_prefix}_cnt").over(tot_w)
    ).withColumn(
        f"{out_prefix}_share_ppm",
        exact_floor_div(
            F.col(f"{out_prefix}_cnt").cast("decimal(38,0)")
            * F.lit(1_000_000).cast("decimal(38,0)"),
            F.col("__tot").cast("decimal(38,0)"),
        ),
    ).drop("__tot")
    # NULL-SAFE equality throughout: NULL categories (and NULL group keys)
    # are real levels — a name-based null-unsafe join would silently hand
    # them NULL counts instead of their own row's. Catalyst rewrites
    # EqualNullSafe into coalesced join keys (stays a broadcast hash join).
    join_cols = keys + [category_col]
    l, r = df.alias("__ce_l"), enriched.alias("__ce_r")
    cond = None
    for c in join_cols:
        esc = c.replace("`", "``")
        eq = F.col(f"__ce_l.`{esc}`").eqNullSafe(F.col(f"__ce_r.`{esc}`"))
        cond = eq if cond is None else (cond & eq)
    out = l.join(F.broadcast(r), cond, "left")
    for c in join_cols:
        out = out.drop(F.col("__ce_r.`" + c.replace("`", "``") + "`"))
    return out


def hash_cross(
    df: DataFrame,
    cols: Sequence[str],
    *,
    n_buckets: int,
    out_col: str = "cross_bucket",
) -> DataFrame:
    """The hashing trick for feature crosses (Weinberger et al. 2009,
    public): ``out_col`` = xxhash64(col1, ..., colN) mod n_buckets — a
    bounded-cardinality id for the INTERACTION of the columns, without
    materializing the cross-product vocabulary. Collisions are the
    accepted trade (size n_buckets for the cross's live cardinality).

    Deterministic: Spark's xxhash64 seeds each column's hash with the
    previous column's (seed 42 first), so the bucket is a pure function
    of the values — reproducible across runs, engines with the same
    xxhash64 chain (the repo's pure-Python ``functions/xxh64.py`` twin
    locks the algorithm), and cluster layouts. NULL participates as
    xxhash64's NULL convention (skipped — document crosses with NULLable
    columns accordingly). Zero shuffle: a pure Column expression."""
    if n_buckets < 1:
        raise ValueError(f"hash_cross: n_buckets must be >= 1, got {n_buckets}")
    if not cols:
        raise ValueError("hash_cross: need at least one column")
    return df.withColumn(
        out_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(int(n_buckets))).cast(
            "int"
        ),
    )


def woe_ratio_encode(
    df: DataFrame,
    *,
    category_col: str,
    label_col: Column | str,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Weight-of-evidence category table WITHOUT the logarithm: per
    category, the ratio of its share of positives to its share of
    negatives, in exact integer ppm —
    ``evidence_ratio_ppm = (n_pos_c · N_neg · 1e6) // (n_neg_c · N_pos)``.
    WOE is the natural log of exactly this ratio, so ranking / binning /
    thresholding on ``evidence_ratio_ppm`` IS ranking on WOE with no
    transcendental anywhere (the item_lift / PMI device —
    ``cooccurrence.py::item_lift``); apply ln driver-side on the tiny
    category table if a model insists on the log scale.

    Output: one row per (``group_by``..., ``category``) with ``n``,
    ``n_pos``, ``n_neg``, ``pos_share_ppm``, ``neg_share_ppm``,
    ``evidence_ratio_ppm`` (NULL when the category has zero negatives or
    the group has zero positives — infinite/undefined evidence, the
    caller's smoothing decision, not ours). NULL labels are excluded;
    NULL categories form their own row (missingness is evidence).

    Scale: one category-grain aggregate + a category-table window for
    the group totals — the encoded table is categories-sized, never
    data-sized; join it back broadcast."""
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    keys = list(group_by)
    dec = "decimal(38,0)"
    per_cat = (
        df.filter(lab.isNotNull())
        .select(*keys, F.col(category_col).alias("category"), lab.alias("__y"))
        .groupBy(*keys, "category")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("__y").cast("boolean"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos"),
        )
        .withColumn("n_neg", (F.col("n") - F.col("n_pos")).cast("bigint"))
    )
    wn = Window.partitionBy(*[F.col(k) for k in keys])
    tot_pos = F.sum("n_pos").over(wn).cast(dec)
    tot_neg = F.sum("n_neg").over(wn).cast(dec)
    npd = F.col("n_pos").cast(dec)
    nnd = F.col("n_neg").cast(dec)
    share = lambda num, den: F.when(  # noqa: E731
        den > 0, exact_floor_div(num * F.lit(1_000_000), den)
    ).cast("bigint")
    ratio = F.when(
        (F.col("n_neg") > 0) & (tot_pos > 0),
        exact_floor_div(npd * tot_neg * F.lit(1_000_000), nnd * tot_pos),
    ).cast("bigint")
    return (
        per_cat.withColumn("pos_share_ppm", share(npd, tot_pos))
        .withColumn("neg_share_ppm", share(nnd, tot_neg))
        .withColumn("evidence_ratio_ppm", ratio)
    )
