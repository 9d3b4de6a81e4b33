"""FeatureModel ⇄ SDL round-trip (plans/sdl.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.plans.model import FeatureModel, PlanError
from funcify_feature_eng_spark.plans.sdl import from_sdl, to_sdl


def _events(spark):
    rows = []
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    for uid in (1, 2):
        for i in range(5):
            rows.append((uid * 100 + i, base + dt.timedelta(seconds=i * 700),
                         uid, ["view", "click", "purchase"][i % 3],
                         float(uid * 10 + i)))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double"
    )


def _store(spark):
    rows = [(1, dt.datetime(2024, 3, 1, 11, 0, 0), 5.0),
            (2, dt.datetime(2024, 3, 1, 12, 20, 0), 7.0)]
    return spark.createDataFrame(rows, "user_id long, value_at_ts timestamp, value double")


def _model(spark):
    m = FeatureModel(entity_key="user_id", order=("ts", "event_id"),
                     event_time="ts")
    m.declare_window_feature("prior_event_type", op="lag", col="event_type")
    m.declare_window_feature("session_id", op="session", gap_threshold_s=1800.0)
    m.declare_window_feature("gap_secs", op="gap")
    m.declare_transformer_feature("gap_nonneg", "negative_to_null",
                                  args=["gap_secs"])
    m.register_store("fs", _store(spark))
    m.declare_asof_feature("store_val", "fs", right_ts="value_at_ts",
                           value_col="value")
    m.alias("lastType", "prior_event_type")
    return m


COLS = ["event_id", "user_id", "prior_event_type", "session_id",
        "gap_nonneg", "store_val", "last_type"]


def test_round_trip_materializes_identically(spark):
    ev = _events(spark)
    m = _model(spark)
    sdl = to_sdl(m)
    m2 = from_sdl(sdl, stores={"fs": _store(spark)})
    a = sorted(map(tuple, m.materialize(ev, COLS).collect()))
    b = sorted(map(tuple, m2.materialize(ev, COLS).collect()))
    assert a == b and len(a) == 10


def test_to_sdl_idempotent_on_parsed_model(spark):
    sdl = to_sdl(_model(spark))
    again = to_sdl(from_sdl(sdl, stores={"fs": _store(spark)}))
    assert again == sdl


def test_sdl_carries_entity_config(spark):
    sdl = to_sdl(_model(spark))
    assert '@entity(key: "user_id", order: ["ts", "event_id"]' in sdl
    m2 = from_sdl(sdl, stores={"fs": _store(spark)})
    assert m2.entity_key == "user_id" and m2.order == ("ts", "event_id")
    assert m2.event_time == "ts"


def test_sdl_errors(spark):
    with pytest.raises(PlanError, match="unknown directive"):
        from_sdl('type T @entity(key: "u") { a: Float @windw(op: "lag") }')
    with pytest.raises(PlanError, match="exactly one of"):
        from_sdl('type T @entity(key: "u") { a: Float }')
    with pytest.raises(PlanError, match="store 'nope' not registered"):
        from_sdl('type T @entity(key: "u") '
                 '{ a: Float @asof(store: "nope", valueCol: "v") }')
    with pytest.raises(PlanError, match="missing argument"):
        from_sdl('type T @entity(key: "u") { a: Float @transformer(args: []) }')


def test_sdl_ignores_descriptive_types(spark):
    # the declared scalar type is documentation; planning uses Spark schemas
    m = from_sdl('type T @entity(key: "user_id", order: ["ts", "event_id"], '
                 'eventTime: "ts") '
                 '{ seq: [Int!]! @window(op: "row_number") }')
    out = m.materialize(_events(spark), ["event_id", "seq"])
    assert out.count() == 10


def test_sdl_store_directive_carries_last_updated(spark):
    m = FeatureModel(entity_key="user_id", order=("ts", "event_id"),
                     event_time="ts")
    m.register_store("fs", _store(spark), last_updated="value_at_ts")
    # no per-feature right_ts: the store's @lastUpdated supplies it
    m.declare_asof_feature("store_val", "fs", value_col="value")
    sdl = to_sdl(m)
    assert '@store(name: "fs", lastUpdated: "value_at_ts")' in sdl
    m2 = from_sdl(sdl, stores={"fs": _store(spark)})
    ev = _events(spark)
    a = sorted(map(tuple, m.materialize(ev, ["event_id", "store_val"]).collect()))
    b = sorted(map(tuple, m2.materialize(ev, ["event_id", "store_val"]).collect()))
    assert a == b


def test_sdl_declared_store_requires_binding(spark):
    sdl = ('type T @entity(key: "user_id") @store(name: "fs") '
           '{ a: Float @asof(store: "fs", valueCol: "value") }')
    with pytest.raises(PlanError, match="no binding was provided"):
        from_sdl(sdl)


def test_sdl_asof_direction_round_trips(spark):
    m = FeatureModel(entity_key="user_id", order=("ts", "event_id"),
                     event_time="ts")
    m.register_store("fs", _store(spark), last_updated="value_at_ts")
    m.declare_asof_feature("near_val", "fs", value_col="value",
                           direction="nearest")
    sdl = to_sdl(m)
    assert 'direction: "nearest"' in sdl
    m2 = from_sdl(sdl, stores={"fs": _store(spark)})
    ev = _events(spark)
    a = sorted(map(tuple, m.materialize(ev, ["event_id", "near_val"]).collect()))
    b = sorted(map(tuple, m2.materialize(ev, ["event_id", "near_val"]).collect()))
    assert a == b
    # nearest genuinely differs from the backward default on this data
    m3 = FeatureModel(entity_key="user_id", order=("ts", "event_id"),
                      event_time="ts")
    m3.register_store("fs", _store(spark), last_updated="value_at_ts")
    m3.declare_asof_feature("near_val", "fs", value_col="value")
    c = sorted(map(tuple, m3.materialize(ev, ["event_id", "near_val"]).collect()))
    assert a != c


def test_sdl_scaling_verbs_round_trip(spark):
    """@window(op:"zscore"/"minmax") — the schema-first route to the
    within-entity scaling verbs — round-trips and materializes."""
    from funcify_feature_eng_spark.plans.sdl import from_sdl, to_sdl

    sdl = (
        'type T @entity(key: "user_id", order: ["turn_idx"], eventTime: "ts")'
        ' { v_z: Float @window(op: "zscore", col: "v")'
        ' v_mm: Float @window(op: "minmax", col: "v") }'
    )
    m = from_sdl(sdl)
    assert to_sdl(from_sdl(to_sdl(m))) == to_sdl(m)
    spine = spark.createDataFrame(
        [("u1", 0, 10), ("u1", 1, 30), ("u2", 0, 5)],
        "user_id string, turn_idx int, v long",
    ).selectExpr("user_id", "turn_idx", "timestamp('2024-01-01') as ts", "v")
    got = {(r["user_id"], r["turn_idx"]): (r["v_z"], r["v_mm"])
           for r in m.materialize(
               spine, ["user_id", "turn_idx", "v_z", "v_mm"]).collect()}
    assert got[("u1", 1)][1] == 1_000_000 and got[("u1", 0)][1] == 0
    assert got[("u2", 0)] == (None, 0)


def test_sdl_value_control_characters_round_trip():
    """String params with newlines/tabs/CRs must survive to_sdl∘from_sdl:
    the GraphQL string token forbids raw newlines, so an unescaped \\n
    rendered SDL the lexer could not tokenize."""
    from funcify_feature_eng_spark.plans.model import FeatureModel
    from funcify_feature_eng_spark.plans.sdl import from_sdl, to_sdl

    m = FeatureModel(entity_key="user_id", order=("ts", "event_id"),
                     event_time="ts")
    val = 'line1\nline2\t"q"\r back\\slash'
    m.declare_window_feature("f", op="lag", col="x", default=val)
    m2 = from_sdl(to_sdl(m))
    assert m2._features["f"].params["default"] == val
    assert to_sdl(m2) == to_sdl(m)
