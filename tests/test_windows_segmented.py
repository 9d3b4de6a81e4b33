"""Segmented (skew-proof) turn features must equal the single-window op."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from funcify_feature_eng_spark.operators.windows import turn_features
from funcify_feature_eng_spark.operators.windows_segmented import turn_features_segmented

COLS = ["conv_id", "turn_idx", "prior_role", "prior_tool", "gap_secs", "session_id", "turn_len"]


def _compare(base_pd, seg_pd):
    assert len(base_pd) == len(seg_pd)
    for col in ["prior_role", "prior_tool"]:
        b = base_pd[col].to_numpy(object)
        s = seg_pd[col].to_numpy(object)
        same = (b == s) | (pd.isna(b.astype(object)) & pd.isna(s.astype(object)))
        assert same.all(), f"{col}: {int((~same).sum())} mismatches"
    for col in ["gap_secs", "session_id", "turn_len"]:
        assert np.allclose(
            base_pd[col].astype(float), seg_pd[col].astype(float), equal_nan=True
        ), col


@pytest.mark.parametrize("kw", [
    {"bucket_seconds": 3600},      # tiny time buckets → heavy carry use
    {"bucket_seconds": 86400},
    {"bucket_rows": 7},            # row-index buckets via turn_idx
])
def test_segmented_equals_plain(spark, transcripts, kw):
    base = (
        turn_features(transcripts)
        .select(*COLS)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    seg = (
        turn_features_segmented(transcripts, **kw)
        .select(*COLS)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    _compare(base, seg)


def test_segmented_single_row_convs(spark):
    rows = [("a", 0, "user", "x", None, "2024-01-01 00:00:00"),
            ("b", 0, "user", "y", "code", "2024-01-02 05:00:00")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts_s string"
    ).selectExpr("conv_id", "turn_idx", "role", "text", "tool",
                 "cast(ts_s as timestamp) as ts")
    out = turn_features_segmented(df, bucket_seconds=3600).orderBy("conv_id").toPandas()
    assert out["prior_role"].isna().all()
    assert out["gap_secs"].isna().all()
    assert (out["session_id"] == 0).all()
