"""Calibration operators (operators/calibration.py)."""

from fractions import Fraction
from math import floor

import pytest

from funcify_feature_eng_spark.operators.calibration import (
    calibration_summary,
    reliability_bins,
)

_PPM = 1_000_000


def _ref(rows, n_bins):
    """Independent rational-arithmetic reliability + ECE reference."""
    bins = {}
    for s, y in rows:
        if s is None or y is None:
            continue
        b = max(0, min(n_bins - 1, (s * n_bins) // _PPM))
        n, pos, ssum = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, pos + y, ssum + s)
    table = {
        b: (
            n, pos,
            floor(Fraction(_PPM * pos, n)),
            floor(Fraction(ssum, n)),
            floor(Fraction(abs(_PPM * pos - ssum), n)),
        )
        for b, (n, pos, ssum) in bins.items()
    }
    ntot = sum(n for n, _, _ in bins.values())
    ece = floor(
        Fraction(sum(abs(_PPM * pos - ssum) for _, pos, ssum in bins.values()), ntot)
    ) if ntot else None
    mce = max(g for *_, g in table.values()) if table else None
    return table, ntot, ece, mce


_ROWS = [
    (50_000, 0), (120_000, 0), (180_000, 1),       # bins 0,1,1
    (450_000, 0), (470_000, 1), (499_999, 1),      # bin 4
    (500_000, 0), (730_000, 1),                    # bins 5,7
    (900_000, 1), (999_999, 1), (1_000_000, 1),    # bins 9,9,9 (clamped)
    (None, 1), (300_000, None),                    # excluded
]


def test_reliability_bins_match_rational_reference(spark):
    df = spark.createDataFrame(_ROWS, "s long, y int")
    out = {
        r["bin"]: (r["n"], r["n_pos"], r["acc_ppm"], r["conf_ppm"], r["gap_ppm"])
        for r in reliability_bins(df, score_e6="s", label="y", n_bins=10).collect()
    }
    table, *_ = _ref(_ROWS, 10)
    assert out == table
    # boundary score 1e6 clamps into bin 9, never a phantom bin 10
    assert 10 not in out and out[9][0] == 3


def test_calibration_summary_matches_reference(spark):
    df = spark.createDataFrame(_ROWS, "s long, y int")
    row = calibration_summary(df, score_e6="s", label="y", n_bins=10).collect()[0]
    _, ntot, ece, mce = _ref(_ROWS, 10)
    assert (row["n"], row["ece_ppm"], row["mce_ppm"]) == (ntot, ece, mce)
    # gap is computed on the exact rationals, not double-floored ppm:
    # a bin with pos6 % n != 0 distinguishes the two definitions
    assert row["ece_ppm"] is not None


def test_calibration_grouped_and_perfect(spark):
    # perfectly calibrated group: score 1e6 with label 1 -> ece = 0
    rows = [("a", 1_000_000, 1)] * 3 + [("a", 0, 0)] * 2 + [
        ("b", 800_000, 0), ("b", 800_000, 0),
    ]
    df = spark.createDataFrame(rows, "g string, s long, y int")
    out = {r["g"]: r for r in calibration_summary(
        df, score_e6="s", label="y", group_by=["g"]).collect()}
    assert out["a"]["ece_ppm"] == 0 and out["a"]["mce_ppm"] == 0
    # group b: claims 0.8, delivers 0 -> gap exactly 800000 ppm
    assert out["b"]["ece_ppm"] == 800_000 == out["b"]["mce_ppm"]
    with pytest.raises(ValueError):
        reliability_bins(df, score_e6="s", label="y", n_bins=0)
