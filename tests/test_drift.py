"""TVD drift report: hand-computable extremes and an exact mid case."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from funcify_feature_eng_spark.operators.drift import drift_report

T0 = dt.datetime(2024, 1, 1)


def _df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["v", "off"])
    pdf["ts"] = pdf["off"].map(lambda s: T0 + dt.timedelta(seconds=int(s)))
    return spark.createDataFrame(pdf.drop(columns=["off"]))


def test_identical_halves_zero_drift(spark):
    rows = [(v, 0) for v in (5, 15, 25)] + [(v, 10_000) for v in (5, 15, 25)]
    out = drift_report(
        _df(spark, rows), value_col="v", ts_col="ts", n_bins=4, bin_width=10.0
    ).toPandas()
    assert (out["tvd_e6"] == 0).all()
    assert set(zip(out["cnt_ref"], out["cnt_cur"])) == {(1, 1)}


def test_disjoint_halves_full_drift(spark):
    rows = [(5, 0), (5, 1)] + [(35, 10_000), (35, 10_001)]
    out = drift_report(
        _df(spark, rows), value_col="v", ts_col="ts", n_bins=4, bin_width=10.0
    ).toPandas()
    # disjoint supports -> TVD is exactly 1
    assert (out["tvd_e6"] == 1_000_000).all()


def test_partial_drift_exact_value_and_tail_clamp(spark):
    # ref: 2 rows bucket0, 2 rows bucket1; cur: 2 rows bucket0, 2 rows in the
    # clamped tail bucket (v=999 -> bucket 3). TVD = 1/2(|.5-.5|+.5+.5) = 0.5
    rows = [(5, 0), (5, 1), (15, 2), (15, 3)] + [
        (5, 10_000), (5, 10_001), (999, 10_002), (999, 10_003)
    ]
    out = drift_report(
        _df(spark, rows), value_col="v", ts_col="ts", n_bins=4, bin_width=10.0
    ).toPandas()
    assert (out["tvd_e6"] == 500_000).all()
    assert 3 in set(out["bucket"])  # right tail absorbed by the last bucket
    assert (out["n_ref"] == 4).all() and (out["n_cur"] == 4).all()


def test_null_values_excluded_from_buckets(spark):
    """NULL value rows are dropped (matching histogram_counts), never
    counted into the tail bucket (regression: F.least skips NULL operands,
    so NULLs used to land in bucket n_bins-1 and skew TVD)."""
    base = 1_700_000_000
    rows = (
        [(float(v), dt.datetime.fromtimestamp(base + 10)) for v in range(4)]
        + [(float(v), dt.datetime.fromtimestamp(base + 90)) for v in range(4)]
        + [(None, dt.datetime.fromtimestamp(base + 10))] * 5
        + [(None, dt.datetime.fromtimestamp(base + 90))] * 5
    )
    df = spark.createDataFrame(rows, "v double, ts timestamp")
    out = drift_report(
        df, value_col="v", ts_col="ts", n_bins=4, bin_width=1.0,
        split_us=(base + 50) * 1_000_000,
    ).collect()
    # identical non-NULL halves: zero drift, and counts exclude the NULLs
    assert all(r["tvd_e6"] == 0 for r in out)
    assert sum(r["cnt_ref"] for r in out) == 4
    assert sum(r["cnt_cur"] for r in out) == 4
    tail = [r for r in out if r["bucket"] == 3]
    assert tail and tail[0]["cnt_ref"] == 1 and tail[0]["cnt_cur"] == 1
