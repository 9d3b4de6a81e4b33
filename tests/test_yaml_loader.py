"""YAML-declared transformers/features (jq-transformers.yml parity)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.functions.registry import TransformerRegistry, default_registry
from funcify_feature_eng_spark.functions.yaml_loader import (
    load_features_yaml,
    load_transformers_yaml,
)
from funcify_feature_eng_spark.plans.model import FeatureModel

TRANSFORMERS_YML = """
transformers:
  - name: negative_to_null_yml
    args: [input]
    expr: "CASE WHEN input >= 0.0 THEN input END"
  - name: list_size_yml
    args: [input]
    expr: "CASE WHEN input IS NOT NULL THEN size(input) END"
  - name: extract_decade_yml
    args: [input]
    expr: "CASE WHEN input >= 1900 THEN input % 100 END"
  - name: add_n
    args: [input, n]
    defaults: {n: 1}
    expr: "input + n"
"""

FEATURES_YML = """
features:
  - name: gap_plus_one
    transformer: add_n
    args: [gap_secs]
  - name: gap_secs
    kind: window
    op: gap
  - name: prior_role
    kind: window
    op: lag
    col: role
"""


@pytest.fixture(scope="module")
def reg():
    r = default_registry()
    load_transformers_yaml(r, TRANSFORMERS_YML)
    return r


def test_yaml_golden_cases(spark, reg):
    df = spark.createDataFrame([(-1.0, 2020), (1.0, 1899)], "x double, y int")
    got = df.select(
        reg.apply("negative_to_null_yml", F.col("x")).alias("a"),
        reg.apply("extract_decade_yml", F.col("y")).alias("b"),
    ).toPandas()
    assert pd.isna(got["a"][0]) and got["a"][1] == 1.0
    assert got["b"][0] == 20 and pd.isna(got["b"][1])


def test_yaml_list_size(spark, reg):
    df = spark.createDataFrame([(["a", "b"],), (None,)], "x array<string>")
    got = df.select(reg.apply("list_size_yml", F.col("x")).alias("n")).toPandas()
    assert got["n"][0] == 2 and pd.isna(got["n"][1])


def test_yaml_defaults_and_override(spark, reg):
    df = spark.createDataFrame([(10,)], "x int")
    got = df.select(
        reg.apply("add_n", F.col("x")).alias("d"),
        reg.apply("add_n", F.col("x"), n=5).alias("o"),
    ).toPandas()
    assert got["d"][0] == 11 and got["o"][0] == 15


def test_yaml_missing_arg_raises(spark):
    r = TransformerRegistry()
    load_transformers_yaml(r, "transformers:\n  - name: f\n    args: [a, b]\n    expr: 'a + b'\n")
    with pytest.raises(ValueError, match="not supplied"):
        r.apply("f", F.lit(1))


def test_yaml_composed_args_need_projection(spark, reg):
    # composed expressions must be pre-projected to a named column
    with pytest.raises(ValueError, match="Pre-project"):
        reg.apply("add_n", F.col("x") * 2, n=1)
    df = spark.createDataFrame([(3,)], "x int").withColumn("x2", F.col("x") * 2)
    got = df.select(reg.apply("add_n", F.col("x2"), n=1).alias("v")).toPandas()
    assert got["v"][0] == 7


def test_yaml_features_on_model(spark, transcripts, reg):
    m = FeatureModel(registry=reg)
    names = load_features_yaml(m, FEATURES_YML)
    assert names == ["gap_plus_one", "gap_secs", "prior_role"]
    out = (
        m.materialize(transcripts, ["conv_id", "turn_idx", "gap_secs", "gap_plus_one", "prior_role"])
        .filter("gap_secs is not null")
        .limit(100)
        .toPandas()
    )
    assert ((out["gap_plus_one"] - out["gap_secs"]).round(6) == 1).all()
