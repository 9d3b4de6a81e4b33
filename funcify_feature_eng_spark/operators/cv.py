"""Leakage-safe temporal cross-validation: purged k-fold with embargo.

Random k-fold CV leaks on temporal data twice over: (1) training rows
whose LABEL horizon overlaps the test period have seen test-period
outcomes ("purging"), and (2) training rows immediately AFTER the test
period carry serial correlation back into it ("embargo") — the purged
k-fold CV of López de Prado, *Advances in Financial Machine Learning*
ch. 7 (public method). The same zero-temporal-leakage discipline the
north rule demands of features (strictly-prior windows, as-of joins)
applied to the train/test protocol itself.

Folds are CONTIGUOUS TIME RANGES (equal-width over ``[min ts, max ts]``),
not random row subsets — the only fold shape for which "before/after the
test period" is well-defined. Assignment is pure integer arithmetic
(``(es - lo) // width``) so an independent engine reproduces every row's
role bit-for-bit.

Scale: one bounded aggregate for the time range (two longs to the
driver), then a broadcast join against the k-row fold table — no global
sort, no ntile over a single partition. The long form materializes
``n·k`` rows; at 10^12 rows use :func:`purged_fold_slice` per fold
(same arithmetic, no replication) inside the training loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.windows import epoch_seconds

ROLE_TEST = "test"
ROLE_TRAIN = "train"
ROLE_PURGED = "purged"
ROLE_EMBARGOED = "embargoed"


def _bounds(df: DataFrame, ts_col: str, time_range) -> tuple[int, int]:
    if time_range is not None:
        lo, hi = int(time_range[0]), int(time_range[1])
    else:
        es = epoch_seconds(ts_col)
        row = df.agg(F.min(es), F.max(es)).first()
        if row[0] is None:
            raise ValueError("purged_folds: no rows with a non-NULL timestamp")
        lo, hi = int(row[0]), int(row[1])
    if hi < lo:
        raise ValueError(f"purged_folds: empty time range [{lo}, {hi}]")
    return lo, hi


def _role_col(
    es: Column, f: Column, lo: int, width: int, purge_before_s: int, embargo_after_s: int
) -> Column:
    f_lo = F.lit(lo) + f * F.lit(width)
    f_hi = f_lo + F.lit(width)  # exclusive
    return (
        F.when(F.floor((es - F.lit(lo)) / F.lit(width)).cast("long") == f, F.lit(ROLE_TEST))
        .when(
            (es >= f_lo - F.lit(int(purge_before_s))) & (es < f_lo), F.lit(ROLE_PURGED)
        )
        .when(
            (es >= f_hi) & (es < f_hi + F.lit(int(embargo_after_s))),
            F.lit(ROLE_EMBARGOED),
        )
        .otherwise(F.lit(ROLE_TRAIN))
    )


def purged_folds(
    df: DataFrame,
    *,
    ts_col: str,
    k: int,
    purge_before_s: int = 0,
    embargo_after_s: int = 0,
    time_range: tuple[int, int] | None = None,
    fold_col: str = "test_fold",
    role_col: str = "role",
) -> DataFrame:
    """Long-form fold assignment: each input row × each of the ``k`` test
    folds, with ``role`` ∈ test / train / purged / embargoed.

    ``purge_before_s`` drops training rows in the window BEFORE the test
    fold (rows whose forward-looking label would peek into it);
    ``embargo_after_s`` drops training rows just AFTER it (serial
    correlation). Rows with a NULL timestamp are excluded — they have no
    position in time. ``time_range=(lo_s, hi_s)`` skips the bounds
    aggregate when the caller already knows the epoch-second range; rows
    OUTSIDE that range are excluded too — assigning them any role would
    leak data from outside the CV period into training (they match no
    test/purge/embargo branch and would otherwise default to 'train' in
    every fold).
    """
    if k < 2:
        raise ValueError(f"purged_folds: k must be >= 2, got {k}")
    if purge_before_s < 0 or embargo_after_s < 0:
        raise ValueError("purge/embargo windows must be >= 0")
    lo, hi = _bounds(df, ts_col, time_range)
    width = (hi - lo + k) // k  # ceil((hi-lo+1)/k): folds cover the range
    spark = df.sparkSession
    folds = spark.range(0, k).select(F.col("id").cast("int").alias(fold_col))
    es = epoch_seconds(ts_col)
    return (
        df.filter(es.between(F.lit(lo), F.lit(hi)))
        .crossJoin(F.broadcast(folds))
        .withColumn(
            role_col,
            _role_col(
                es,
                F.col(fold_col).cast("long"),
                lo,
                width,
                purge_before_s,
                embargo_after_s,
            ),
        )
    )


def purged_fold_slice(
    df: DataFrame,
    *,
    ts_col: str,
    k: int,
    fold: int,
    purge_before_s: int = 0,
    embargo_after_s: int = 0,
    time_range: tuple[int, int] | None = None,
    role_col: str = "role",
) -> DataFrame:
    """One fold's usable rows (role ∈ test/train only) without the ``n·k``
    replication — the per-fold form a 10^12-row training loop iterates.
    Identical arithmetic to :func:`purged_folds` restricted to ``fold``;
    purged/embargoed rows are dropped, not returned, and rows outside
    the (given or derived) time range are excluded exactly as in the
    long form."""
    if not 0 <= fold < k:
        raise ValueError(f"fold must be in [0, {k}), got {fold}")
    lo, hi = _bounds(df, ts_col, time_range)
    width = (hi - lo + k) // k
    es = epoch_seconds(ts_col)
    role = _role_col(es, F.lit(int(fold)).cast("long"), lo, width, purge_before_s, embargo_after_s)
    return (
        df.filter(es.between(F.lit(lo), F.lit(hi)))
        .withColumn(role_col, role)
        .filter(F.col(role_col).isin(ROLE_TEST, ROLE_TRAIN))
    )
