"""Two-sample tests and trend/change-point detection — exact at any scale.

``drift.drift_report`` answers "did the histogram move" with a fixed
binning; this module answers the sharper monitoring questions a feature
owner actually escalates on, with NO binning decisions and NO floats
until the final, mirrored expression:

* :func:`ks_test` — exact two-sample Kolmogorov–Smirnov statistic
  (max ECDF gap), the binning-free distribution-shift test.
* :func:`mann_whitney` — rank-sum location-shift test with the exact
  tie-corrected normal approximation z (the significance companion to
  ``metrics.group_auc``, whose AUC is U/(n1·n2) — same ranks, new
  output: "is this shift bigger than chance").
* :func:`ols_trend` — per-group least-squares slope/intercept from the
  same exact integer moments as ``correlation.pearson_corr`` ("is this
  metric trending, and how fast").
* :func:`cusum_changepoint` — exact CUSUM split point: WHERE in the
  ordered stream the mean moved, via argmax of the integer statistic
  ``d_i = n·cum_i − i·S = i·(n−i)·(mean_before − mean_after)``.

House contract (cf. ``correlation``, ``drift``, ``scaling``): every
comparison, rank, cumulative sum and product is exact integer/DECIMAL(38)
arithmetic; doubles appear only in the last expression, whose shape the
SQL oracle mirrors operation-for-operation, so IEEE-754 engines agree to
the last bit. Degenerate groups (one-sided samples, zero variance, <2
rows) yield NULL statistics, never errors.

Scale shape (ks_test / mann_whitney): ONE map-side-combined groupBy onto
``(group, value)`` grain — ties collapse BEFORE any window, so the sort
that follows moves value-grain rows, not data — then group-partitioned
cumulative windows (rank/ECDF positions derive from cumulative tie
counts) and a group-grain reduce. The value-grain aggregate is the only
data-sized shuffle; everything after is distinct-value-sized.
cusum_changepoint is one Exchange (partition by group, sort by the
caller's total order) with all windows sharing that partitioning.
ols_trend is one map-side-combined aggregate, zero windows.

Reference parity anchor: the reference has no statistical operators;
this extends the monitoring family (SURVEY §2 extensions) beside
drift_report (binned TVD) and spearman_corr (monotone association).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .correlation import (  # the exact-moment machinery (same contract)
    _abs_guards,
    _check_integral,
    _guard_col,
    _pair_moments,
)

__all__ = ["ks_test", "mann_whitney", "ols_trend", "cusum_changepoint"]

_DEC = "decimal(38,0)"


def _grain_counts(
    df: DataFrame,
    value_col: str,
    side_col: str | Column,
    keys: Sequence[str],
) -> DataFrame:
    """Collapse to ``(group, value)`` grain with per-side counts.

    The map-side-combined aggregate that makes both two-sample tests
    data-pass-once: rows with a NULL value or NULL side are excluded
    (they belong to neither ECDF), and every downstream window runs over
    distinct values only."""
    side = F.col(side_col) if isinstance(side_col, str) else side_col
    side = side.cast("boolean")
    base = df.filter(F.col(value_col).isNotNull() & side.isNotNull())
    return (
        base.groupBy(*keys, F.col(value_col).alias("__v"))
        .agg(
            F.count(F.when(side, F.lit(1))).cast(_DEC).alias("__c1"),
            F.count(F.when(~side, F.lit(1))).cast(_DEC).alias("__c2"),
        )
    )


def ks_test(
    df: DataFrame,
    value_col: str,
    side_col: str | Column,
    *,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per group.

    ``side_col`` (boolean; True = reference sample) splits each group
    into two samples; the statistic is ``D = max_v |F_ref(v) − F_cur(v)|``
    over the observed values — computed as the exact integer
    ``d(v) = |cum_ref(v)·n_cur − cum_cur(v)·n_ref|`` (ECDF gaps
    cross-multiplied so no division ever happens before the argmax),
    with the max located at the SMALLEST value among ties
    (deterministic). ECDFs are step functions, so checking only observed
    values is exact, not an approximation.

    Output: group keys + ``n_ref`` ``n_cur`` (bigint) + ``ks_at`` (the
    value where the gap peaks, ``value_col``'s type) + ``ks_d`` (double
    in [0, 1]; NULL when either sample is empty — the test is undefined,
    not zero).

    Scale: see module doc — the only data-sized shuffle is the
    map-combined value-grain aggregate; the ECDF windows and argmax run
    over distinct values. 10^12 rows with a fixed-point value grid is a
    few million value-grain rows per group.
    """
    keys = list(group_by)
    part = keys or [F.lit(1)]
    grain = _grain_counts(df, value_col, side_col, keys)

    w_cum = (
        Window.partitionBy(*part)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*part)
    cum1 = F.sum("__c1").over(w_cum)
    cum2 = F.sum("__c2").over(w_cum)
    n1 = F.sum("__c1").over(w_all)
    n2 = F.sum("__c2").over(w_all)
    gap = F.abs(cum1 * n2 - cum2 * n1)
    stepped = grain.select(
        *keys,
        F.col("__v"),
        gap.alias("__gap"),
        n1.alias("__n1"),
        n2.alias("__n2"),
    )
    # argmax over value-grain rows: biggest gap first, smallest value on
    # ties — a total order, so exactly one row survives per group
    w_pick = Window.partitionBy(*part).orderBy(
        F.col("__gap").desc(), F.col("__v").asc()
    )
    picked = stepped.withColumn("__rn", F.row_number().over(w_pick)).filter(
        F.col("__rn") == 1
    )
    defined = (F.col("__n1") > 0) & (F.col("__n2") > 0)
    ks_d = F.when(
        defined,
        F.col("__gap").cast("double")
        / (F.col("__n1").cast("double") * F.col("__n2").cast("double")),
    )
    return picked.select(
        *keys,
        F.col("__n1").cast("bigint").alias("n_ref"),
        F.col("__n2").cast("bigint").alias("n_cur"),
        F.when(defined, F.col("__v")).alias("ks_at"),
        ks_d.alias("ks_d"),
    )


def mann_whitney(
    df: DataFrame,
    value_col: str,
    side_col: str | Column,
    *,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Mann–Whitney rank-sum test per group, exact ranks + tie-corrected z.

    The doubled mid-rank of a tie block at value v is
    ``2·cum_below(v) + t(v) + 1`` (twice the average of min and max rank
    — an integer even when the mid-rank is half-integral), so the doubled
    rank sum of the reference sample and hence ``u_ref_x2 = 2·R1 −
    n1·(n1+1)`` are exact integers; ``u_ref_x2 / (2·n1·n2)`` is exactly
    ``metrics.group_auc``'s AUC. The normal-approximation z uses the
    standard tie correction, assembled from three exact integers:

        A     = u_ref_x2 − n1·n2                      (2·(U − mean))
        V_num = n1·n2·((n+1)·n·(n−1) − Σ(t³−t))       (12·n·(n−1)·var)
        V_den = 12·n·(n−1)
        z     = A·sqrt(V_den) / (2·sqrt(V_num))

    — the only doubles are that final expression, mirrored in the oracle.

    Output: group keys + ``n_ref`` ``n_cur`` (bigint) + ``u_ref_x2``
    (bigint, guarded < 2^63) + ``auc_ref`` ``mw_z`` (double; NULL when a
    sample is empty or every value ties — zero variance, z undefined).
    Positive z = reference sample stochastically LARGER.

    Scale: same two-stage shape as :func:`ks_test` — one data-sized
    map-combined aggregate to value grain, then distinct-value-sized
    windows and a group-grain reduce.
    """
    keys = list(group_by)
    part = keys or [F.lit(1)]
    grain = _grain_counts(df, value_col, side_col, keys)

    t = F.col("__c1") + F.col("__c2")
    w_cum = (
        Window.partitionBy(*part)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_below = F.sum(t).over(w_cum) - t
    dr = F.lit(2).cast(_DEC) * cum_below + t + F.lit(1).cast(_DEC)
    per_val = grain.select(
        *keys,
        (F.col("__c1") * dr).alias("__r1x2"),  # side-1 doubled rank mass
        F.col("__c1").alias("__c1"),
        F.col("__c2").alias("__c2"),
        (t * t * t - t).alias("__tcorr"),
    )
    agg = per_val.groupBy(*keys).agg(
        F.sum("__r1x2").alias("__R1x2"),
        F.sum("__c1").alias("__n1"),
        F.sum("__c2").alias("__n2"),
        F.sum("__tcorr").alias("__T"),
    )
    n1, n2, big_t = F.col("__n1"), F.col("__n2"), F.col("__T")
    n = n1 + n2
    u_x2 = F.col("__R1x2") - n1 * (n1 + 1)
    a = u_x2 - n1 * n2
    v_num = n1 * n2 * ((n + 1) * n * (n - 1) - big_t)
    v_den = F.lit(12).cast(_DEC) * n * (n - 1)
    defined = (n1 > 0) & (n2 > 0) & (v_num > 0)
    auc = F.when(
        defined,
        u_x2.cast("double")
        / (F.lit(2.0) * n1.cast("double") * n2.cast("double")),
    )
    z = F.when(
        defined,
        a.cast("double")
        * F.sqrt(v_den.cast("double"))
        / (F.lit(2.0) * F.sqrt(v_num.cast("double"))),
    )
    # u_ref_x2 ≤ 2·n1·n2 — exact in BIGINT while n1·n2 < 2^62; the guard
    # makes the 10^10×10^10-row edge a loud error, never a wrapped value
    guard = F.coalesce(
        F.assert_true(
            (n1 * n2) < F.lit(2 ** 62).cast(_DEC),
            F.lit(
                "mann_whitney: n_ref*n_cur >= 2^62 — u_ref_x2 no longer fits "
                "BIGINT; shard the group key before testing"
            ),
        ).cast("bigint"),
        F.lit(0),
    )
    return agg.select(
        *keys,
        n1.cast("bigint").alias("n_ref"),
        n2.cast("bigint").alias("n_cur"),
        (u_x2.cast("bigint") + guard).alias("u_ref_x2"),
        auc.alias("auc_ref"),
        z.alias("mw_z"),
    )


def ols_trend(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Per-group least-squares line ``y = slope·x + intercept`` from the
    exact integer moments (``correlation._pair_moments`` — same
    pairwise-complete NULL drop, same runtime-enforced |value| < 2^31
    fixed-point contract; put time on an hours- or days-since-epoch grid,
    never raw micros):

        slope     = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)
        intercept = Σy/n − slope·(Σx/n)

    slope's numerator and denominator are exact DECIMAL(38); intercept is
    four IEEE ops over exact integers — both mirrored in the oracle.

    Output: group keys + ``n_pairs`` (bigint) + ``slope`` ``intercept``
    (double; NULL when n = 0 or x is constant). ONE map-side-combined
    aggregate, no windows, no second pass.
    """
    _check_integral(df, (x_col, y_col), "ols_trend")
    keys = list(group_by)
    cols = [x_col] if x_col == y_col else [x_col, y_col]
    agg = df.groupBy(*keys).agg(
        *_pair_moments(F.col(x_col), F.col(y_col), "0"),
        *_abs_guards(cols),
    )
    n = F.col("__n_0")
    sx, sy, sxx, sxy = (
        F.col("__sx_0"), F.col("__sy_0"), F.col("__sxx_0"), F.col("__sxy_0")
    )
    vx = n * sxx - sx * sx
    num = n * sxy - sx * sy
    slope = F.when(
        vx <= 0, F.lit(None).cast("double")
    ).otherwise(num.cast("double") / vx.cast("double"))
    intercept = F.when(
        vx <= 0, F.lit(None).cast("double")
    ).otherwise(
        sy.cast("double") / n.cast("double")
        - slope * (sx.cast("double") / n.cast("double"))
    )
    return agg.select(
        *keys,
        (n.cast("bigint") + _guard_col(cols)).alias("n_pairs"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )


def cusum_changepoint(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    *,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Exact CUSUM change-point per group: the split maximizing the
    weighted before/after mean gap.

    With rows in the caller's ``order_by`` order (MUST be a total order
    within each group — pass a unique id last; ties would make the
    argmax nondeterministic), the statistic at prefix length i is the
    exact integer

        d_i = n·cum_i − i·S  =  i·(n−i)·(mean(x_1..i) − mean(x_{i+1}..n))

    — the classic CUSUM deviation of the prefix sum from the no-change
    line, weighted by i·(n−i) so end splits aren't favored. The
    change-point is argmax |d_i| over 1 ≤ i ≤ n−1 (both sides
    non-empty), smallest i on ties.

    Values must be integral (fixed-point grid — the 2^31 house contract
    is NOT needed here: no value products, only sums, so DECIMAL(38)
    cumulative sums are exact for any BIGINT values).

    Output: group keys + ``n_rows`` ``cp_index`` (bigint; the prefix
    length i) + ``mean_gap`` (double; mean_before − mean_after at the
    split, ``d / (i·(n−i))`` with exact-integer operands). Groups with
    fewer than 2 rows are dropped (no valid split exists).

    Scale: ONE Exchange (partition by group, sort by order_by); the
    cumulative, total and argmax windows all share it.
    """
    _check_integral(df, (value_col,), "cusum_changepoint")
    if not order_by:
        raise ValueError("cusum_changepoint: order_by must be non-empty")
    keys = list(group_by)
    part = keys or [F.lit(1)]
    order = [F.col(c).asc() for c in order_by]

    v = F.col(value_col).cast(_DEC)
    w_cum = (
        Window.partitionBy(*part)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*part)
    cum = F.sum(v).over(w_cum)
    i = F.row_number().over(Window.partitionBy(*part).orderBy(*order))
    total = F.sum(v).over(w_all)
    n = F.count(F.lit(1)).over(w_all)
    d = (
        F.col("__n").cast(_DEC) * F.col("__cum")
        - F.col("__i").cast(_DEC) * F.col("__s")
    )

    stepped = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *keys,
            cum.alias("__cum"),
            i.alias("__i"),
            total.alias("__s"),
            n.alias("__n"),
        )
        .select(
            *keys,
            F.col("__i"),
            F.col("__n"),
            F.abs(d).alias("__absd"),
            d.alias("__d"),
        )
        .filter((F.col("__i") >= 1) & (F.col("__i") <= F.col("__n") - 1))
    )
    w_pick = Window.partitionBy(*part).orderBy(
        F.col("__absd").desc(), F.col("__i").asc()
    )
    picked = stepped.withColumn("__rn", F.row_number().over(w_pick)).filter(
        F.col("__rn") == 1
    )
    gap = F.col("__d").cast("double") / (
        F.col("__i").cast("double")
        * (F.col("__n") - F.col("__i")).cast("double")
    )
    return picked.select(
        *keys,
        F.col("__n").cast("bigint").alias("n_rows"),
        F.col("__i").cast("bigint").alias("cp_index"),
        gap.alias("mean_gap"),
    )
