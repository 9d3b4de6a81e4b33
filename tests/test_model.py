"""FeatureModel DAG compiler: tabular materialization, aliasing, topo order,
feature-on-feature, plan cache, error paths."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.plans.model import FeatureModel, PlanError


@pytest.fixture()
def model(feature_store):
    m = FeatureModel(entity_key="conv_id", order=("turn_idx", "ts"), event_time="ts")
    m.declare_window_feature("prior_role", op="lag", col="role")
    m.declare_window_feature("prior_tool", op="ffill_strict", col="tool")
    m.declare_window_feature("gap_secs", op="gap")
    m.declare_window_feature("session_id", op="session", gap_threshold_s=1800.0)
    m.declare_transformer_feature("turn_len", "char_len", args=["text"])
    # feature-on-feature: negative_to_null over gap_secs (J1 tier-2 wiring)
    m.declare_transformer_feature("gap_nonneg", "negative_to_null", args=["gap_secs"])
    m.register_store("fs", feature_store)
    m.declare_asof_feature(
        "asof_store_value", store="fs", right_ts="value_at_ts", value_col="value",
        right_order=("value",),
    )
    m.alias("priorRole", "prior_role")
    m.alias("convId", "conv_id")
    return m


COLUMNS = [
    "conv_id", "turn_idx", "text", "prior_role", "prior_tool",
    "gap_secs", "session_id", "turn_len", "gap_nonneg", "asof_store_value",
]


def test_materialize_full_vector(spark, model, transcripts, transcripts_pd):
    out = (
        model.materialize(transcripts, COLUMNS)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert list(out.columns) == COLUMNS
    exp = transcripts_pd.sort_values(["conv_id", "turn_idx", "ts"], kind="stable")
    # pass-through text equality (BASELINE invariant)
    assert (out["text"].to_numpy() == exp["text"].to_numpy()).all()
    assert np.allclose(
        out["turn_len"].to_numpy(float),
        exp["text"].str.len().to_numpy(float),
    )
    # gap_nonneg == gap_secs where non-negative (gaps are never negative here)
    g = out["gap_secs"].to_numpy(float)
    gn = out["gap_nonneg"].to_numpy(float)
    assert np.allclose(g, gn, equal_nan=True)


def test_alias_resolution(spark, model, transcripts):
    out = model.materialize(transcripts, ["convId", "priorRole"])
    assert out.columns == ["convId", "priorRole"]
    assert out.count() == transcripts.count()


def test_unknown_column_raises(model, transcripts):
    with pytest.raises(PlanError, match="cannot resolve"):
        model.materialize(transcripts, ["no_such_feature"])


def test_missing_event_time_raises(spark, model, transcripts):
    with pytest.raises(PlanError, match="event-time"):
        model.materialize(transcripts.drop("ts"), ["conv_id"])


def test_cycle_detection(feature_store):
    m = FeatureModel()
    m.declare_transformer_feature("a", "negative_to_null", args=["b"])
    m.declare_transformer_feature("b", "negative_to_null", args=["a"])
    with pytest.raises(PlanError, match="cycle"):
        m.compile(["a"], spine_cols=["conv_id", "ts"])


def test_plan_cache_hit(model, transcripts):
    cols = ["prior_role", "turn_len"]
    p1 = model.compile(cols, transcripts.columns)
    p2 = model.compile(cols, transcripts.columns)
    assert p1 is p2  # same object ⇒ cache hit
    model.declare_window_feature("extra", op="row_number")
    p3 = model.compile(cols, transcripts.columns)
    assert p3 is not p1  # declaration invalidates the cache


def test_duplicate_feature_raises():
    m = FeatureModel()
    m.declare_window_feature("x", op="row_number")
    with pytest.raises(PlanError, match="already declared"):
        m.declare_window_feature("x", op="row_number")


def test_unknown_transformer_raises():
    m = FeatureModel()
    with pytest.raises(PlanError, match="unknown transformer"):
        m.declare_transformer_feature("f", "nope", args=["x"])


def test_max_depth_enforced():
    m = FeatureModel(max_depth=3)
    m.declare_window_feature("f0", op="row_number")
    for i in range(1, 6):
        m.declare_transformer_feature(f"f{i}", "negative_to_null", args=[f"f{i-1}"])
    with pytest.raises(PlanError, match="max_depth"):
        m.compile(["f5"], spine_cols=["conv_id", "ts"])
    # within the bound compiles fine
    assert len(m.compile(["f2"], spine_cols=["conv_id", "ts"])) == 3


def test_topo_order_feature_on_feature(model, transcripts):
    plan = model.compile(["gap_nonneg"], transcripts.columns)
    names = [s.name for s in plan]
    assert names.index("gap_secs") < names.index("gap_nonneg")
