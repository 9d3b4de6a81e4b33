"""Entry point A analog: document-shaped requests (plans/document.py).

Mirrors the reference's document composition/validation tests
(schema/src/test/.../document/GQLDocumentComposerTest.kt,
preparse validation in DefaultMaterializationPreparsedDocumentProvider):
invalid documents fail at parse, arguments bind from variables or literals,
and the compiled request reuses the same plan machinery as the tabular path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.plans.document import (
    compile_document,
    materialize_document,
    parse_document,
)
from funcify_feature_eng_spark.plans.model import FeatureModel, PlanError


def _model() -> FeatureModel:
    m = FeatureModel(entity_key="user_id", order=("ts", "event_id"), event_time="ts")
    m.declare_window_feature("prior_event_type", op="lag", col="event_type")
    m.declare_window_feature("session_id", op="session", gap_threshold_s=1800.0)
    m.declare_window_feature("event_seq", op="row_number")
    return m


def _events(spark):
    return spark.createDataFrame(
        [
            (1, "u1", "view", "2024-01-01 00:00:00"),
            (2, "u1", "click", "2024-01-01 00:10:00"),
            (3, "u1", "view", "2024-01-01 01:00:00"),
            (4, "u2", "view", "2024-01-01 00:00:00"),
        ],
        "event_id long, user_id string, event_type string, ts_s string",
    ).select("event_id", "user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))


# ------------------------------------------------------------- validation
def test_unknown_top_level_key_rejected():
    with pytest.raises(PlanError, match="unknown top-level"):
        parse_document({"select": {"columns": ["a"]}, "operationName": "x"})


def test_unknown_selection_key_rejected():
    with pytest.raises(PlanError, match="unknown 'select' keys"):
        parse_document({"select": {"cols": ["a"]}})


def test_empty_document_rejected():
    with pytest.raises(PlanError, match="selects nothing"):
        parse_document({"select": {}})


def test_unknown_feature_rejected():
    with pytest.raises(PlanError, match="unknown feature"):
        compile_document(_model(), {"select": {"features": {"nope": {}}}})


def test_undefined_variable_rejected():
    doc = {
        "select": {"features": {"s": {"feature": "session_id",
                                      "args": {"gap_threshold_s": "$gap"}}}},
    }
    with pytest.raises(PlanError, match="undefined variable"):
        compile_document(_model(), doc)


def test_bad_feature_selection_keys_rejected():
    with pytest.raises(PlanError, match="unknown keys"):
        parse_document({"select": {"features": {"x": {"argz": {}}}}})


# ------------------------------------------------------------- execution
def test_document_matches_tabular_path(spark):
    m = _model()
    ev = _events(spark)
    doc = {
        "select": {
            "columns": ["event_id", "user_id"],
            "features": {"prior_event_type": {}, "event_seq": {}},
        }
    }
    got = materialize_document(m, ev, doc).orderBy("event_id").collect()
    exp = (
        m.materialize(ev, ["event_id", "user_id", "prior_event_type", "event_seq"])
        .orderBy("event_id")
        .collect()
    )
    assert got == exp


def test_variable_parameterizes_feature(spark):
    """One document, two variable bindings → different sessionization."""
    m = _model()
    ev = _events(spark)

    def run(gap):
        doc = {
            "variables": {"gap": gap},
            "select": {
                "columns": ["event_id"],
                "features": {
                    "sess": {"feature": "session_id", "args": {"gap_threshold_s": "$gap"}}
                },
            },
        }
        out = materialize_document(m, ev, doc).orderBy("event_id").collect()
        return [r["sess"] for r in out]

    # u1 gaps: 600s then 3000s — a 1800s threshold splits once, 10000s never
    assert run(1800.0) == [0, 0, 1, 0]
    assert run(10000.0) == [0, 0, 0, 0]
    # base model feature is untouched by the request-scoped variants
    base = m.materialize(ev, ["event_id", "session_id"]).orderBy("event_id").collect()
    assert [r["session_id"] for r in base] == [0, 0, 1, 0]


def test_alias_and_literal_arg(spark):
    m = _model()
    ev = _events(spark)
    doc = {
        "select": {
            "columns": ["event_id"],
            "features": {"tight_session": {"feature": "session_id",
                                           "args": {"gap_threshold_s": 300.0}}},
        }
    }
    out = materialize_document(m, ev, doc).orderBy("event_id")
    assert out.columns == ["event_id", "tight_session"]
    assert [r["tight_session"] for r in out.collect()] == [0, 1, 2, 0]


def test_plan_cache_reuses_compiled_request(spark):
    m = _model()
    doc = {"select": {"columns": ["event_id"], "features": {"event_seq": {}}}}
    materialize_document(m, _events(spark), doc)
    first = m._doc_cache[next(iter(m._doc_cache))]
    materialize_document(m, _events(spark), doc)
    assert m._doc_cache[next(iter(m._doc_cache))] is first
