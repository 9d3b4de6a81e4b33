"""Purged temporal k-fold CV (operators/cv.py) vs a pure-Python oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.cv import (
    ROLE_EMBARGOED,
    ROLE_PURGED,
    ROLE_TEST,
    ROLE_TRAIN,
    purged_fold_slice,
    purged_folds,
)


def _mk(spark, ts):
    rows = [(i, t) for i, t in enumerate(ts)]
    return spark.createDataFrame(rows, "id long, t long").select(
        "id", F.timestamp_seconds(F.col("t")).alias("ts"), "t"
    )


def _oracle(ts, k, purge, embargo):
    lo, hi = min(ts), max(ts)
    width = (hi - lo + k) // k
    out = {}
    for i, t in enumerate(ts):
        for f in range(k):
            f_lo, f_hi = lo + f * width, lo + (f + 1) * width
            if (t - lo) // width == f:
                role = ROLE_TEST
            elif f_lo - purge <= t < f_lo:
                role = ROLE_PURGED
            elif f_hi <= t < f_hi + embargo:
                role = ROLE_EMBARGOED
            else:
                role = ROLE_TRAIN
            out[(i, f)] = role
    return out


@pytest.mark.parametrize(
    "k,purge,embargo",
    [(2, 0, 0), (3, 5, 0), (4, 7, 3), (5, 100, 100)],
)
def test_purged_folds_matches_oracle(spark, k, purge, embargo):
    ts = [0, 3, 10, 11, 19, 20, 21, 35, 49, 50, 77, 99, 100]
    df = _mk(spark, ts)
    got = {
        (r["id"], r["test_fold"]): r["role"]
        for r in purged_folds(
            df, ts_col="ts", k=k, purge_before_s=purge, embargo_after_s=embargo
        ).collect()
    }
    assert got == _oracle(ts, k, purge, embargo)


def test_every_fold_has_test_rows(spark):
    ts = list(range(0, 200, 7))
    df = _mk(spark, ts)
    out = purged_folds(df, ts_col="ts", k=4)
    per_fold = {
        r["test_fold"]: r["n"]
        for r in out.filter(F.col("role") == ROLE_TEST)
        .groupBy("test_fold")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(per_fold) == {0, 1, 2, 3} and all(v > 0 for v in per_fold.values())
    # with no purge/embargo every (row, fold) pair is test or train and
    # each row is test in exactly one fold
    n = len(ts)
    assert out.count() == n * 4
    assert out.filter(F.col("role") == ROLE_TEST).count() == n


def test_slice_consistent_with_long_form(spark):
    ts = [0, 3, 10, 11, 19, 20, 21, 35, 49, 50, 77, 99, 100]
    df = _mk(spark, ts)
    k, purge, embargo = 4, 7, 3
    long = purged_folds(
        df, ts_col="ts", k=k, purge_before_s=purge, embargo_after_s=embargo
    )
    for f in range(k):
        want = sorted(
            (r["id"], r["role"])
            for r in long.filter(
                (F.col("test_fold") == f)
                & F.col("role").isin(ROLE_TEST, ROLE_TRAIN)
            ).collect()
        )
        got = sorted(
            (r["id"], r["role"])
            for r in purged_fold_slice(
                df, ts_col="ts", k=k, fold=f, purge_before_s=purge,
                embargo_after_s=embargo,
            ).collect()
        )
        assert got == want, f


def test_null_ts_rows_excluded(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, None), (2, 50)], "id long, t long"
    ).select("id", F.timestamp_seconds(F.col("t")).alias("ts"))
    out = purged_folds(df, ts_col="ts", k=2)
    assert sorted({r["id"] for r in out.collect()}) == [0, 2]


def test_validation(spark):
    df = _mk(spark, [1, 2])
    with pytest.raises(ValueError, match="k must be >= 2"):
        purged_folds(df, ts_col="ts", k=1)
    with pytest.raises(ValueError, match=">= 0"):
        purged_folds(df, ts_col="ts", k=2, purge_before_s=-1)
    with pytest.raises(ValueError, match="fold must be"):
        purged_fold_slice(df, ts_col="ts", k=2, fold=2)
    empty = df.filter(F.lit(False))
    with pytest.raises(ValueError, match="no rows"):
        purged_folds(empty, ts_col="ts", k=2)


def test_explicit_time_range_excludes_out_of_range_rows(spark):
    """Rows outside an explicit time_range must be EXCLUDED, not silently
    assigned 'train' in every fold (data from outside the CV period
    leaking into training)."""
    ts = [0, 10, 20, 500, 900]
    df = _mk(spark, ts)
    out = purged_folds(df, ts_col="ts", k=2, time_range=(0, 99))
    ids = sorted({r["id"] for r in out.collect()})
    assert ids == [0, 1, 2]  # rows at 500/900 are gone
    sl = purged_fold_slice(df, ts_col="ts", k=2, fold=0, time_range=(0, 99))
    assert sorted({r["id"] for r in sl.collect()}) == [0, 1, 2]
