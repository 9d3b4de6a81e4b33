"""P6 value-level validation (plans/validation.py): malformed/violating JSON
blobs are quarantined with reasons, never silently nulled — the Spark analog
of the reference's call-time JSON-Schema check
(jq/.../jackson/DefaultJacksonJqTransformer.kt:89-113)."""

from __future__ import annotations

from funcify_feature_eng_spark.plans.validation import validate_json_values

SCHEMA = {
    "type": "object",
    "required": ["k"],
    "properties": {
        "k": {"type": "integer", "minimum": 0, "maximum": 100},
        "tag": {"type": "string", "enum": ["a", "b"]},
        "ok": {"type": "boolean"},
    },
}


def _df(spark):
    rows = [
        (1, '{"k": 5, "tag": "a", "ok": true}'),   # valid
        (2, '{"k": 5}'),                            # valid (optional absent)
        (3, '{k: 5}'),                              # malformed JSON
        (4, '{"tag": "a"}'),                        # missing required k
        (5, '{"k": "five"}'),                       # wrong type
        (6, '{"k": 200}'),                          # above maximum
        (7, '{"k": -1}'),                           # below minimum
        (8, '{"k": 5, "tag": "z"}'),                # enum violation
        (9, '{"k": 5, "ok": "yes"}'),               # bad boolean
        (10, None),                                 # NULL blob: valid by contract
    ]
    return spark.createDataFrame(rows, "id long, props string")


def test_valid_and_quarantine_split(spark):
    valid, quarantined = validate_json_values(_df(spark), "props", SCHEMA)
    assert sorted(r["id"] for r in valid.collect()) == [1, 2, 10]
    q = {r["id"]: list(r["violations"]) for r in quarantined.collect()}
    assert sorted(q) == [3, 4, 5, 6, 7, 8, 9]
    assert q[3] == ["malformed JSON"]
    assert q[4] == ["k: required"]
    assert q[5] == ["k: expected integer"]
    assert q[6] == ["k: above maximum 100"]
    assert q[7] == ["k: below minimum 0"]
    assert q[8] == ["tag: not in enum"]
    assert q[9] == ["ok: expected boolean"]


def test_quarantine_is_counted_not_nulled(spark):
    valid, quarantined = validate_json_values(_df(spark), "props", SCHEMA)
    assert quarantined.count() == 7  # observable dead-letter count
    # the original blob survives in quarantine for inspection
    row = quarantined.filter("id = 3").head()
    assert row["props"] == '{k: 5}'


def test_validation_stays_jvm_side(spark):
    """The violation predicates must compile to Column expressions — no
    BatchEvalPython / ArrowEval in the plan (validation at scan speed)."""
    valid, quarantined = validate_json_values(_df(spark), "props", SCHEMA)
    for df in (valid, quarantined):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_transformer_guard_values(spark):
    """A registered transformer with a declared value_schema quarantines
    violating blobs before the expression applies (registry integration)."""
    from pyspark.sql import functions as F

    from funcify_feature_eng_spark.functions.registry import TransformerRegistry

    reg = TransformerRegistry()
    t = reg.register(
        "extract_k",
        lambda c: F.get_json_object(c, "$.k").cast("int"),
        value_schema=SCHEMA,
    )
    df = _df(spark)
    valid, quarantined = t.guard_values(df, "props")
    assert valid.count() == 3 and quarantined.count() == 7
    out = valid.select("id", t(F.col("props")).alias("k")).collect()
    assert {r["id"]: r["k"] for r in out} == {1: 5, 2: 5, 10: None}


def test_transformer_guard_without_schema_is_identity(spark):
    from pyspark.sql import functions as F

    from funcify_feature_eng_spark.functions.registry import TransformerRegistry

    reg = TransformerRegistry()
    t = reg.register("noop", lambda c: F.length(c))
    valid, quarantined = t.guard_values(_df(spark), "props")
    assert valid.count() == 10 and quarantined.count() == 0
    assert "violations" in quarantined.columns


def test_string_type_enforced_and_leading_whitespace_object_valid(spark):
    from funcify_feature_eng_spark.plans.validation import validate_json_values

    schema = {
        "type": "object",
        "required": ["tag"],
        "properties": {"tag": {"type": "string"}},
    }
    df = spark.createDataFrame(
        [
            (1, '{"tag": "ok"}'),
            (2, '{"tag": 123}'),        # wrong type must quarantine
            (3, '  {"tag": "ws"}'),     # leading whitespace is valid JSON
        ],
        "id long, blob string",
    )
    valid, quarantined = validate_json_values(df, "blob", schema)
    assert sorted(r["id"] for r in valid.collect()) == [1, 3]
    q = {r["id"]: list(r["violations"]) for r in quarantined.collect()}
    assert q == {2: ["tag: expected string"]}


def test_property_name_with_regex_metacharacters(spark):
    """Regression: the string-type shape check regex-escapes the property
    name — a key like 'a+b' is data, not a pattern."""
    from funcify_feature_eng_spark.plans.validation import validate_json_values

    schema = {"type": "object", "properties": {"a+b": {"type": "string"}}}
    df = spark.createDataFrame(
        [(1, '{"a+b": "x"}'), (2, '{"a+b": 3}')], "id long, blob string"
    )
    valid, quarantined = validate_json_values(df, "blob", schema)
    assert [r["id"] for r in valid.collect()] == [1]
    q = quarantined.collect()
    assert len(q) == 1 and list(q[0]["violations"]) == ["a+b: expected string"]
