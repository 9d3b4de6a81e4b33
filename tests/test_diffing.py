"""Distributed allclose parity diff (operators/diffing.py)."""

import math

import pytest

from funcify_feature_eng_spark.operators.diffing import (
    frame_diff,
    frames_allclose,
)


def _pair(spark):
    exp = spark.createDataFrame(
        [
            (1, 10.0, "a", [1.0, 2.0]),
            (2, 20.0, "b", [3.0, 4.0]),
            (3, None, "c", None),
            (4, 40.0, "d", [5.0]),
            (5, float("nan"), "e", [6.0]),
        ],
        "id long, v double, s string, emb array<double>",
    )
    act = spark.createDataFrame(
        [
            (1, 10.0 + 5e-7, "a", [1.0, 2.0 + 5e-7]),   # within atol
            (2, 21.0, "B", [3.0, 4.5]),                  # v, s, emb mismatch
            (3, None, "c", None),                        # both-null equal
            (4, 40.0, "d", [5.0, 9.0]),                  # emb length mismatch
            (5, float("nan"), "e", [6.0]),               # NaN pair
            (6, 60.0, "f", [7.0]),                       # only in actual
        ],
        "id long, v double, s string, emb array<double>",
    )
    return exp, act


def test_frame_diff_summary(spark):
    exp, act = _pair(spark)
    out = {r["column"]: r for r in
           frame_diff(exp, act, keys=["id"], atol=1e-6).collect()}
    rows = out["__rows__"]
    assert (rows["n_expected"], rows["n_actual"]) == (5, 6)
    assert rows["n_compared"] == 5 and rows["n_mismatch"] == 1

    v = out["v"]
    assert v["n_compared"] == 5
    assert v["n_mismatch"] == 2          # id 2 (1.0 off) + id 5 (NaN pair)
    assert v["n_expected"] == 4          # non-null v among matched
    assert math.isnan(v["max_abs_diff"])  # NaN pair dominates the max

    s = out["s"]
    assert s["n_mismatch"] == 1 and s["max_abs_diff"] is None

    emb = out["emb"]
    assert emb["n_mismatch"] == 2        # id 2 element off; id 4 length


def test_equal_nan_and_rtol(spark):
    exp, act = _pair(spark)
    out = {r["column"]: r for r in
           frame_diff(exp, act, keys=["id"], atol=1e-6,
                      equal_nan=True).collect()}
    assert out["v"]["n_mismatch"] == 1   # NaN pair now equal
    # rtol scales |expected|: 1.0 diff at expected 20.0 passes rtol=0.06
    out2 = {r["column"]: r for r in
            frame_diff(exp, act, keys=["id"], rtol=0.06, atol=1e-6,
                       equal_nan=True).collect()}
    assert out2["v"]["n_mismatch"] == 0


def test_frames_allclose_bool(spark):
    exp, _ = _pair(spark)
    assert frames_allclose(exp, exp, keys=["id"], equal_nan=True) is True
    assert frames_allclose(exp, exp, keys=["id"]) is False  # NaN row
    _, act = _pair(spark)
    assert frames_allclose(exp, act, keys=["id"], atol=1e-6,
                           equal_nan=True) is False


def test_one_null_side_is_mismatch_and_int_cols(spark):
    exp = spark.createDataFrame([(1, 5), (2, None)], "id long, x int")
    act = spark.createDataFrame([(1, None), (2, 7)], "id long, x int")
    out = {r["column"]: r for r in
           frame_diff(exp, act, keys=["id"]).collect()}
    assert out["x"]["n_mismatch"] == 2
    assert out["x"]["max_abs_diff"] is None  # no both-non-null pair


def test_bigint_past_double_mantissa_detected(spark):
    """A 64-bit counter differing past 2^53 must mismatch at rtol=atol=0 —
    a double-cast comparison would declare them equal and pass a real
    regression through the parity gate."""
    exp = spark.createDataFrame(
        [(1, 9007199254740993)], "id long, ctr long"
    )
    act = spark.createDataFrame(
        [(1, 9007199254740992)], "id long, ctr long"
    )
    out = {r["column"]: r for r in frame_diff(exp, act, keys=["id"]).collect()}
    assert out["ctr"]["n_mismatch"] == 1
    assert out["ctr"]["max_abs_diff"] == 1.0


def test_validation_errors(spark):
    exp, act = _pair(spark)
    with pytest.raises(ValueError, match="keys must be non-empty"):
        frame_diff(exp, act, keys=[])
    with pytest.raises(ValueError, match="missing from a side"):
        frame_diff(exp, act, keys=["nope"])
    with pytest.raises(ValueError, match="no value columns"):
        frame_diff(exp.select("id"), act.select("id"), keys=["id"])
    with pytest.raises(ValueError, match="bad value column"):
        frame_diff(exp, act, keys=["id"], value_cols=["nope"])
