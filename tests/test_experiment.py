"""CUPED readout (operators/experiment.py)."""

from __future__ import annotations

import pytest
from pyspark.errors import PySparkException

from funcify_feature_eng_spark.operators.experiment import cuped_readout


def _expected(units):
    """Pure-Python twin of the mirrored expression (same op order)."""
    pooled = [(x, y) for _, y, x in units]
    n_p = float(len(pooled))
    sx_p = float(sum(x for x, _ in pooled))
    sxx_p = float(sum(x * x for x, _ in pooled))
    sxy_p = float(sum(x * y for x, y in pooled))
    sy_p = float(sum(y for _, y in pooled))
    num = n_p * sxy_p - sx_p * sy_p
    den = n_p * sxx_p - sx_p * sx_p
    theta = (num / den) if den > 0 else None
    out = {}
    for arm in {a for a, _, _ in units}:
        rows = [(x, y) for a, y, x in units if a == arm]
        n_a = float(len(rows))
        sy_a = float(sum(y for _, y in rows))
        sx_a = float(sum(x for x, _ in rows))
        mean_y = sy_a / n_a
        if theta is None:
            adj = mean_y
        else:
            adj = mean_y - theta * (sx_a / n_a - sx_p / n_p)
        out[arm] = (int(n_a), mean_y, adj, theta)
    return out


UNITS = [
    # (arm, metric y, covariate x) — x predicts y, arms slightly imbalanced
    ("t", 110, 100), ("t", 220, 200), ("t", 160, 140), ("t", 90, 70),
    ("c", 100, 105), ("c", 210, 195), ("c", 140, 150), ("c", 60, 50),
    ("c", 180, 160),
]


def test_cuped_matches_python_twin(spark):
    df = spark.createDataFrame(UNITS, "arm string, y long, x long")
    got = {
        r["arm"]: (r["n"], r["mean_y"], r["mean_adj"], r["theta"])
        for r in cuped_readout(
            df, arm_col="arm", metric_col="y", covariate_col="x"
        ).collect()
    }
    assert got == _expected(UNITS)  # bit-identical doubles


def test_cuped_reduces_spread(spark):
    # theta ~ 1 here, so the adjusted arm gap must shrink toward the true
    # effect; sanity that the adjustment moves in the right direction
    df = spark.createDataFrame(UNITS, "arm string, y long, x long")
    rows = {r["arm"]: r for r in cuped_readout(
        df, arm_col="arm", metric_col="y", covariate_col="x"
    ).collect()}
    raw_gap = abs(rows["t"]["mean_y"] - rows["c"]["mean_y"])
    adj_gap = abs(rows["t"]["mean_adj"] - rows["c"]["mean_adj"])
    assert rows["t"]["theta"] is not None
    assert adj_gap != raw_gap  # the covariate imbalance was corrected


def test_cuped_zero_variance_covariate(spark):
    rows = [("t", 10, 5), ("t", 20, 5), ("c", 30, 5)]
    df = spark.createDataFrame(rows, "arm string, y long, x long")
    got = {r["arm"]: r for r in cuped_readout(
        df, arm_col="arm", metric_col="y", covariate_col="x"
    ).collect()}
    for arm in ("t", "c"):
        assert got[arm]["theta"] is None
        assert got[arm]["mean_adj"] == got[arm]["mean_y"]


def test_cuped_null_rows_excluded(spark):
    rows = [("t", 10, 1), ("t", None, 2), ("t", 30, None), (None, 50, 4),
            ("c", 20, 1), ("c", 40, 3)]
    df = spark.createDataFrame(rows, "arm string, y long, x long")
    got = {r["arm"]: r["n"] for r in cuped_readout(
        df, arm_col="arm", metric_col="y", covariate_col="x"
    ).collect()}
    assert got == {"t": 1, "c": 2}


def test_cuped_grouped(spark):
    rows = [("g1",) + u for u in UNITS] + [
        ("g2", "t", 5, 1), ("g2", "c", 7, 1),  # zero-variance group
    ]
    df = spark.createDataFrame(rows, "seg string, arm string, y long, x long")
    out = cuped_readout(
        df, arm_col="arm", metric_col="y", covariate_col="x", group_by=["seg"]
    ).collect()
    g1 = {r["arm"]: (r["n"], r["mean_y"], r["mean_adj"], r["theta"])
          for r in out if r["seg"] == "g1"}
    assert g1 == _expected(UNITS)
    g2 = {r["arm"]: r for r in out if r["seg"] == "g2"}
    assert g2["t"]["theta"] is None and g2["t"]["mean_adj"] == 5.0


def test_cuped_validation_and_guard(spark):
    df = spark.createDataFrame([("t", 1.5, 2.0)], "arm string, y double, x double")
    with pytest.raises(ValueError, match="integral"):
        cuped_readout(df, arm_col="arm", metric_col="y", covariate_col="x")
    big = spark.createDataFrame(
        [("t", 2**31, 1), ("c", 5, 2)], "arm string, y long, x long"
    )
    with pytest.raises(PySparkException, match="2\\^31"):
        cuped_readout(
            big, arm_col="arm", metric_col="y", covariate_col="x"
        ).collect()
