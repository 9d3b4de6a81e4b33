"""Windowed turn features vs a plain-pandas oracle (SURVEY.md §5 test plan #2)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from funcify_feature_eng_spark.operators.windows import collect_ordered, turn_features

GAP_S = 1800.0


def pandas_turn_features(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["conv_id", "turn_idx", "ts"], kind="stable").reset_index(drop=True)
    g = pdf.groupby("conv_id", sort=False)
    out = pdf.copy()
    out["prior_role"] = g["role"].shift(1)
    out["prior_tool"] = g["tool"].transform(lambda s: s.shift(1).ffill())
    out["gap_secs"] = g["ts"].diff().dt.total_seconds()
    out["session_id"] = (
        out["gap_secs"].gt(GAP_S).astype(int).groupby(out["conv_id"], sort=False).cumsum()
    )
    out["turn_len"] = out["text"].str.len()
    return out


def test_turn_features_match_pandas_oracle(spark, transcripts, transcripts_pd):
    got = (
        turn_features(transcripts)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
        .reset_index(drop=True)
    )
    exp = pandas_turn_features(transcripts_pd)

    assert len(got) == len(exp)
    # per-turn text byte equality under stable ordering (BASELINE invariant)
    assert (got["text"].to_numpy() == exp["text"].to_numpy()).all()
    for col in ["prior_role", "prior_tool"]:
        g, e = got[col].to_numpy(object), exp[col].to_numpy(object)
        same = (g == e) | (pd.isna(g.astype(object)) & pd.isna(e.astype(object)))
        assert same.all(), f"{col} mismatch at {np.flatnonzero(~same)[:5]}"
    for col in ["gap_secs", "turn_len", "session_id"]:
        g = got[col].astype(float).to_numpy()
        e = exp[col].astype(float).to_numpy()
        assert np.allclose(g, e, equal_nan=True), col


def test_first_turn_nulls(spark, transcripts):
    first = (
        turn_features(transcripts)
        .filter("turn_idx = 0")
        .select("prior_role", "prior_tool", "gap_secs", "session_id")
        .toPandas()
    )
    assert first["prior_role"].isna().all()
    assert first["prior_tool"].isna().all()
    assert first["gap_secs"].isna().all()
    assert (first["session_id"] == 0).all()


def test_collect_ordered_matches_sorted_groups(spark, transcripts, transcripts_pd):
    got = collect_ordered(transcripts, "text").orderBy("conv_id").toPandas()
    exp = (
        transcripts_pd.sort_values(["conv_id", "turn_idx", "ts"], kind="stable")
        .groupby("conv_id")["text"]
        .apply(list)
    )
    for _, row in got.iterrows():
        assert list(row["collected"]) == exp[row["conv_id"]]


def test_multi_horizon_agg_single_shuffle_and_values(spark):
    """rolling_multi_horizon_agg: N horizons must share ONE Exchange/sort,
    and each horizon's columns must equal the single-horizon operator's."""
    from pyspark.sql import functions as F

    from funcify_feature_eng_spark.operators.windows import (
        rolling_multi_horizon_agg,
        rolling_time_agg,
    )

    rows = [("a", t, v) for t, v in [(0, 1), (30, 2), (59, 3), (60, 4), (60, 5), (3700, 6)]]
    rows += [("b", t, 10 * t + 1) for t in (5, 65, 4000)]
    df = spark.createDataFrame(rows, "e string, t long, v long").select(
        "e", F.timestamp_seconds(F.col("t")).alias("ts"), "v", "t"
    )
    out = rolling_multi_horizon_agg(
        df, keys=["e"], ts_col="ts", value_col="v",
        horizons={"m1": 60, "h1": 3600},
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    got = {
        (r["e"], r["t"]): (r["m1_cnt"], r["m1_sum"], r["h1_cnt"], r["h1_sum"])
        for r in out.collect()
    }
    one_m = rolling_time_agg(
        df, keys=["e"], ts_col="ts", value_col="v", window_s=60, out_prefix="m1"
    )
    one_h = rolling_time_agg(
        df, keys=["e"], ts_col="ts", value_col="v", window_s=3600, out_prefix="h1"
    )
    exp_m = {(r["e"], r["t"]): (r["m1_cnt"], r["m1_sum"]) for r in one_m.collect()}
    exp_h = {(r["e"], r["t"]): (r["h1_cnt"], r["h1_sum"]) for r in one_h.collect()}
    for key, (mc, ms, hc, hs) in got.items():
        assert (mc, ms) == exp_m[key], key
        assert (hc, hs) == exp_h[key], key


def test_multi_horizon_agg_validation(spark):
    import pytest as _pytest

    from funcify_feature_eng_spark.operators.windows import (
        rolling_multi_horizon_agg,
    )

    with _pytest.raises(ValueError, match="non-empty"):
        rolling_multi_horizon_agg(
            None, keys=[], ts_col="ts", value_col="v", horizons={}
        )
    with _pytest.raises(ValueError, match=">= 1 second"):
        rolling_multi_horizon_agg(
            None, keys=[], ts_col="ts", value_col="v", horizons={"x": 0}
        )
