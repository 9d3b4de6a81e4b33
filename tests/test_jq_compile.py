"""Golden tests for the jq-subset compiler (F4).

The reference evaluates these exact programs per value through jackson-jq
(``DefaultJacksonJqTransformer.kt:43-62``; goldens
``JqTransformerYamlTest.kt:32-105``: negative_to_null(-1)→null,
negative_to_null(1)→1). Here they compile to Column expressions and the
same values must come out.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.functions.jq_compile import (
    REFERENCE_TRANSFORMERS_YAML,
    compile_jq,
    parse,
)
from funcify_feature_eng_spark.functions.registry import TransformerRegistry
from funcify_feature_eng_spark.functions.yaml_loader import load_transformers_yaml


def _run1(spark, builder, value, in_type="double"):
    df = spark.createDataFrame([(value,)], f"v {in_type}")
    return df.select(builder(F.col("v")).alias("out")).collect()[0]["out"]


# ------------------------------------------------- reference YAML, verbatim


@pytest.fixture(scope="module")
def ref_registry():
    reg = TransformerRegistry()
    names = load_transformers_yaml(reg, REFERENCE_TRANSFORMERS_YAML)
    assert names == ["negative_to_null", "list_size", "extract_decade"]
    return reg


def test_negative_to_null_golden(spark, ref_registry):
    t = ref_registry.get("negative_to_null")
    # JqTransformerYamlTest.kt:88-99: -1 → null, 1 → 1
    assert _run1(spark, t, -1.0) is None
    assert _run1(spark, t, 1.0) == 1.0
    assert _run1(spark, t, 0.0) == 0.0
    assert _run1(spark, t, None) is None


def test_list_size_golden(spark, ref_registry):
    t = ref_registry.get("list_size")
    df = spark.createDataFrame([(["a", "b", "c"],), ([],), (None,)], "v array<string>")
    got = [r["out"] for r in df.select(t(F.col("v")).alias("out")).collect()]
    assert got == [3, 0, None]


def test_extract_decade_golden(spark, ref_registry):
    t = ref_registry.get("extract_decade")
    assert _run1(spark, t, 1905, "int") == 5
    assert _run1(spark, t, 1899, "int") is None
    assert _run1(spark, t, 2023, "int") == 23
    assert _run1(spark, t, None, "int") is None


def test_reference_yaml_arg_typing(spark, ref_registry):
    # P6 plan-time typing derived from input_schema: number family enforced
    t = ref_registry.get("negative_to_null")
    with pytest.raises(TypeError):
        t.validate_input_types({"input": "string"})
    t.validate_input_types({"input": "double"})  # ok


# ----------------------------------------------------------- language tests


def test_parse_shapes():
    assert parse(".") == ("identity",)
    assert parse(".a.b") == ("field", ("field", ("identity",), "a"), "b")
    assert parse(". | length")[0] == "pipe"
    assert parse("if . then 1 else 2 end")[0] == "if"
    assert parse(". as $x | $x")[0] == "bind"  # variable binding supported
    assert parse("reduce .[] as $x (0; . + $x)")[0] == "reduce"
    assert parse("getpath([\"a\"])")[0] == "call"  # supported since round 5
    with pytest.raises(ValueError):
        parse("leaf_paths")  # unsupported builtin
    assert parse("map(. + 1)")[0] == "call"
    assert parse("[.a, .b]")[0] == "arr"
    assert parse("{x: .a, y}") == (
        "obj",
        [("x", ("field", ("identity",), "a")),
         ("y", ("field", ("identity",), "y"))],
    )


def test_truthiness_zero_and_null(spark):
    # jq: 0 and "" are TRUTHY; only null/false are falsey
    b = compile_jq('if . then "t" else "f" end', input_type="number")
    assert _run1(spark, b, 0.0) == "t"
    assert _run1(spark, b, None) == "f"
    bb = compile_jq('if . then "t" else "f" end', input_type="boolean")
    assert _run1(spark, bb, False, "boolean") == "f"
    assert _run1(spark, bb, True, "boolean") == "t"
    assert _run1(spark, bb, None, "boolean") == "f"


def test_elif_chain(spark):
    b = compile_jq(
        'if . < 10 then "small" elif . < 100 then "mid" else "big" end',
        input_type="number",
    )
    assert _run1(spark, b, 5.0) == "small"
    assert _run1(spark, b, 50.0) == "mid"
    assert _run1(spark, b, 500.0) == "big"


def test_if_without_else_is_identity(spark):
    # jq: "if A then B end" == "if A then B else . end"
    b = compile_jq("if . < 0 then 0 end", input_type="number")
    assert _run1(spark, b, -5.0) == 0
    assert _run1(spark, b, 7.0) == 7.0


def test_alternative_operator(spark):
    b = compile_jq(". // -1", input_type="number")
    assert _run1(spark, b, 3.0) == 3.0
    assert _run1(spark, b, None) == -1
    bb = compile_jq("(. > 10) // false", input_type="number")
    assert _run1(spark, bb, 20.0) is True
    assert _run1(spark, bb, None) is False  # NULL cmp → falsey → alt


def test_and_or_not(spark):
    b = compile_jq("(. > 0) and (. < 10)", input_type="number")
    assert _run1(spark, b, 5.0) is True
    assert _run1(spark, b, 50.0) is False
    assert _run1(spark, b, None) is False  # null falsey, not NULL
    b2 = compile_jq("(. < 0) or (. > 10)", input_type="number")
    assert _run1(spark, b2, 5.0) is False
    assert _run1(spark, b2, 50.0) is True
    b3 = compile_jq(". | not", input_type="boolean")
    assert _run1(spark, b3, False, "boolean") is True
    assert _run1(spark, b3, None, "boolean") is True  # null falsey → not → true


def test_arithmetic_jq_semantics(spark):
    # jq: / is always float division; % truncates to integers
    assert _run1(spark, compile_jq(". / 2", input_type="number"), 3.0) == 1.5
    assert _run1(spark, compile_jq(". % 2", input_type="number"), 5.7) == 1
    assert _run1(spark, compile_jq("(. * 2) + 1", input_type="number"), 4.0) == 9.0
    assert _run1(spark, compile_jq("- .", input_type="number"), 4.0) == -4.0


def test_string_ops(spark):
    assert _run1(spark, compile_jq('. + "!"', input_type="string"), "hi", "string") == "hi!"
    assert (
        _run1(spark, compile_jq("ascii_downcase", input_type="string"), "ÆBC", "string")
        == "Æbc"  # jq only maps A-Z, unlike F.lower
    )
    assert _run1(spark, compile_jq("length", input_type="string"), "abcd", "string") == 4
    assert _run1(spark, compile_jq("tostring", input_type="integer"), 7, "int") == "7"


def test_field_access_and_index(spark):
    df = spark.createDataFrame(
        [((1, "x"), ["p", "q", "r"])],
        "s struct<a:int,b:string>, arr array<string>",
    )
    b = compile_jq(".a", input_type="object")
    assert df.select(b(F.col("s")).alias("o")).collect()[0]["o"] == 1
    bi = compile_jq(".[0]", input_type="array")
    assert df.select(bi(F.col("arr")).alias("o")).collect()[0]["o"] == "p"
    bn = compile_jq(".[-1]", input_type="array")
    assert df.select(bn(F.col("arr")).alias("o")).collect()[0]["o"] == "r"


def test_floor_ceil_fabs(spark):
    assert _run1(spark, compile_jq("floor", input_type="number"), 3.7) == 3
    assert _run1(spark, compile_jq("ceil", input_type="number"), 3.2) == 4
    assert _run1(spark, compile_jq("fabs", input_type="number"), -3.5) == 3.5


def test_type_filter_static_mismatch_is_null(spark):
    # `numbers` over a declared string column: empty stream → NULL collapse
    b = compile_jq("numbers", input_type="string")
    assert _run1(spark, b, "hello", "string") is None


def test_output_schema_coercion(spark):
    # output integer on a float-typed result coerces (jq emits JSON ints)
    b = compile_jq("floor", input_type="number", output_type="integer")
    v = _run1(spark, b, 9.9)
    assert v == 9 and isinstance(v, int)


def test_whole_plan_is_jvm_side(spark):
    """The compiled program must be pure Column expressions — no Python."""
    reg = TransformerRegistry()
    load_transformers_yaml(reg, REFERENCE_TRANSFORMERS_YAML)
    df = spark.range(10).select(
        (F.col("id") * 1.0).alias("v"), (F.col("id") + 1900).cast("int").alias("y")
    )
    out = df.select(
        reg.get("negative_to_null")(F.col("v") - 5).alias("a"),
        reg.get("extract_decade")(F.col("y")).alias("b"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_array_builtins(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.5],), ([],)], "v array<double>")
    got = df.select(
        compile_jq("add", input_type="array")(F.col("v")).alias("s"),
        compile_jq("min", input_type="array")(F.col("v")).alias("mn"),
        compile_jq("max", input_type="array")(F.col("v")).alias("mx"),
    ).collect()
    assert (got[0]["s"], got[0]["mn"], got[0]["mx"]) == (6.5, 1.0, 3.5)
    assert (got[1]["s"], got[1]["mn"], got[1]["mx"]) == (None, None, None)  # jq: []|add == null


def test_string_arg_builtins(spark):
    def run(prog, v):
        return _run1(spark, compile_jq(prog, input_type="string"), v, "string")

    assert run('ltrimstr("pre_")', "pre_x") == "x"
    assert run('ltrimstr("pre_")', "nope") == "nope"  # non-match passthrough
    assert run('rtrimstr(".txt")', "a.txt") == "a"
    assert run('split("|") | length', "a|b|c") == 3
    assert run('startswith("ab")', "abc") is True
    assert run('endswith("bc")', "abc") is True
    assert run('test("^[a-z]+$")', "abc") is True
    assert run('test("^[a-z]+$")', "a1c") is False
    # join on a split round-trip
    b = compile_jq('split(",") | join(";")', input_type="string")
    assert _run1(spark, b, "x,y,z", "string") == "x;y;z"


def test_arg_builtin_requires_paren():
    with pytest.raises(ValueError, match="requires an argument"):
        parse("split")


def test_null_safe_equality(spark):
    # jq: null == null → true; x != null → true (total equality)
    b = compile_jq("if . == null then 0 else . end", input_type="number")
    assert _run1(spark, b, None) == 0
    assert _run1(spark, b, 5.0) == 5.0
    bne = compile_jq('. != 3', input_type="number")
    assert _run1(spark, bne, None) is True  # null != 3 in jq
    assert _run1(spark, bne, 3.0) is False


def test_join_requires_literal():
    with pytest.raises(ValueError, match="literal string"):
        compile_jq("join(.)", input_type="array")(F.lit(None))


def test_gsub_sub_select_goldens(spark):
    """Outputs verified against real jq 1.7 semantics by hand:
    gsub replaces every match, sub only the first, select passes the
    input through or yields empty (NULL in the columnar mapping)."""
    g = compile_jq('gsub("[aeiou]"; "*")', input_type="string")
    assert _run1(spark, g, "hello world", in_type="string") == "h*ll* w*rld"
    s = compile_jq('sub("l+"; "L")', input_type="string")
    assert _run1(spark, s, "hello world", in_type="string") == "heLo world"
    # regex-special replacement chars stay literal ($ and \ escaped for Java)
    d = compile_jq('gsub("o"; "$0\\\\x")', input_type="string")
    assert _run1(spark, d, "go", in_type="string") == "g$0\\x"
    sel = compile_jq("select(. > 2)", input_type="number")
    assert _run1(spark, sel, 3.0) == 3.0
    assert _run1(spark, sel, 1.0) is None
    # piped select: filter then transform
    p = compile_jq('select(test("^h")) | ascii_upcase', input_type="string")
    assert _run1(spark, p, "hi", in_type="string") == "HI"
    assert _run1(spark, p, "bye", in_type="string") is None


def test_sub_gsub_parse_errors():
    with pytest.raises(ValueError, match=r"expected '\)'"):
        parse('sub("a" "b")')
    with pytest.raises(ValueError, match="literal regex"):
        compile_jq("gsub(.; \"x\")", input_type="string")(F.lit("a"))


# ------------------------------------------- higher-order / constructor jq


def _run_arr(spark, prog, arr, elem="double"):
    b = compile_jq(prog, input_type="array")
    df = spark.createDataFrame([(arr,)], f"v array<{elem}>")
    return df.select(b(F.col("v")).alias("out")).collect()[0]["out"]


def test_map_transform_filter(spark):
    """map/map(select) compile to F.transform/F.filter — verified against
    real jq 1.7: `[3,-1,2] | map(.*2)` == [6,-2,4], `map(select(.>0))` ==
    [3,2], `map(select(.>0) | .+10)` == [13,12]."""
    assert _run_arr(spark, "map(. * 2)", [3.0, -1.0, 2.0]) == [6.0, -2.0, 4.0]
    assert _run_arr(spark, "map(select(. > 0))", [3.0, -1.0, 2.0]) == [3.0, 2.0]
    assert _run_arr(spark, "map(select(. > 0) | . + 10)", [3.0, -1.0, 2.0]) == [13.0, 12.0]
    assert _run_arr(spark, "map(. * 2)", []) == []
    assert _run_arr(spark, "map(. * 2)", None) is None
    # chained select predicates AND a piped body after them
    assert _run_arr(
        spark, "map(select(. > 0) | select(. < 3) | tostring)", [3.0, -1.0, 2.0],
    ) == ["2.0"]


def test_map_mid_pipe_select_rejected():
    with pytest.raises(ValueError, match="head of the body"):
        compile_jq("map(. + 1 | select(. > 0))", input_type="array")(F.lit(None))


def test_array_order_builtins(spark):
    # jq: [3,1,2,2]|sort==[1,2,2,3]; unique==[1,2,3]; reverse==[2,2,1,3]
    assert _run_arr(spark, "sort", [3.0, 1.0, 2.0, 2.0]) == [1.0, 2.0, 2.0, 3.0]
    assert _run_arr(spark, "unique", [3.0, 1.0, 2.0, 2.0]) == [1.0, 2.0, 3.0]
    assert _run_arr(spark, "reverse", [3.0, 1.0, 2.0, 2.0]) == [2.0, 2.0, 1.0, 3.0]
    assert _run_arr(spark, "first", [3.0, 1.0]) == 3.0
    assert _run_arr(spark, "last", [3.0, 1.0]) == 1.0
    # jq errors on first/last of []; documented columnar delta: NULL
    assert _run_arr(spark, "first", []) is None
    assert _run_arr(spark, "sort_by(- .)", [1.0, 3.0, 2.0]) == [3.0, 2.0, 1.0]
    nested = compile_jq("flatten", input_type="array")
    df = spark.createDataFrame([([[1.0], [2.0, 3.0]],)], "v array<array<double>>")
    assert df.select(nested(F.col("v")).alias("o")).collect()[0]["o"] == [1.0, 2.0, 3.0]


def test_any_all_forms(spark):
    # jq: any([]) is false, all([]) is true; predicate forms short-circuit
    assert _run_arr(spark, "any(. > 2)", [1.0, 3.0]) is True
    assert _run_arr(spark, "any(. > 5)", [1.0, 3.0]) is False
    assert _run_arr(spark, "all(. > 0)", [1.0, 3.0]) is True
    assert _run_arr(spark, "all(. > 2)", [1.0, 3.0]) is False
    assert _run_arr(spark, "any(. > 0)", []) is False
    assert _run_arr(spark, "all(. > 0)", []) is True
    # zero-arg forms over a mapped boolean array
    assert _run_arr(spark, "map(. > 2) | any", [1.0, 3.0]) is True
    assert _run_arr(spark, "map(. > 5) | all", [1.0, 3.0]) is False


def test_round_sqrt_index_oob(spark):
    # jq round is half-away-from-zero (C round()): 2.5→3, -2.5→-3
    assert _run1(spark, compile_jq("round", "number"), 2.5) == 3
    assert _run1(spark, compile_jq("round", "number"), -2.5) == -3
    assert _run1(spark, compile_jq("sqrt", "number"), 6.25) == 2.5
    # jq: .[i] out of range is null, not an error (ANSI try_element_at)
    assert _run_arr(spark, ".[9]", [1.0]) is None
    assert _run_arr(spark, ".[-1]", [1.0, 7.0]) == 7.0


def test_object_array_construction(spark):
    b = compile_jq('{double_a: (.a * 2), tag: .b, a}', input_type="object")
    df = spark.createDataFrame([({"a": 5, "b": "x"},)], "v struct<a: long, b: string>")
    row = df.select(b(F.col("v")).alias("o")).collect()[0]["o"]
    assert row.double_a == 10 and row.tag == "x" and row.a == 5
    arr = compile_jq("[.a, .a + 1]", input_type="object")
    assert df.select(arr(F.col("v")).alias("o")).collect()[0]["o"] == [5, 6]
    with pytest.raises(ValueError, match="empty object"):
        parse("{}")


def test_map_is_jvm_side(spark):
    """The higher-order forms must stay in codegen — no BatchEvalPython."""
    df = spark.createDataFrame([([1.0, -2.0],)], "v array<double>")
    b = compile_jq("map(select(. > 0) | . * 2) | add", input_type="array")
    plan = df.select(b(F.col("v")).alias("o"))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_iterate_collect_sugar(spark):
    # jq: [.[]|.*2] ≡ map(.*2); [.[]|select(.>0)] filters; [.[]] is identity
    assert _run_arr(spark, "[.[] | . * 2]", [3.0, -1.0]) == [6.0, -2.0]
    assert _run_arr(spark, "[.[] | select(. > 0) | . + 1]", [3.0, -1.0]) == [4.0]
    assert _run_arr(spark, "[.[]]", [3.0, -1.0]) == [3.0, -1.0]
    # iterate over a struct field's array: [.xs[] | . * 10]
    df = spark.createDataFrame([({"xs": [1.0, 2.0]},)], "v struct<xs: array<double>>")
    b = compile_jq("[.xs[] | . * 10]", input_type="object")
    assert df.select(b(F.col("v")).alias("o")).collect()[0]["o"] == [10.0, 20.0]
    with pytest.raises(ValueError, match="stream"):
        compile_jq(".[] + 1", input_type="array")(F.lit(None))


def test_string_interpolation(spark):
    # jq: "\(.)-x" over 5 → "5.0-x" (Spark double renders with .0; jq 1.7
    # renders 5.0 as "5" — documented tostring delta); null → "null"
    b = compile_jq('"v=\\(.) end"', input_type="string")
    assert _run1(spark, b, "abc", "string") == "v=abc end"
    assert _run1(spark, b, None, "string") == "v=null end"
    b2 = compile_jq('"\\(. * 2)!"', input_type="integer")
    assert _run1(spark, b2, 4, "int") == "8!"
    # nested parens inside the interpolated expression
    b3 = compile_jq('"r\\((. + 1) * 2)"', input_type="integer")
    assert _run1(spark, b3, 3, "int") == "r8"
    # plain strings (no interpolation) still literal, escapes intact
    assert parse('"a\\tb"') == ("lit", "a\tb")


def test_string_interpolation_nested_string_with_paren(spark):
    r"""A nested string literal INSIDE \(...) may contain parens — they are
    literal text, not balance (regression: the matcher used to count raw
    parens and mis-slice). Nested quotes arrive escaped (\") per the
    tokenizer's string grammar and are peeled one level before re-parse."""
    # "\(. + "):")" — the ")" inside the nested literal must not close \(
    b = compile_jq('"x\\(tostring + \\"):\\")"', input_type="integer")
    assert _run1(spark, b, 7, "int") == "x7):"
    # a test() call whose regex contains a close paren
    b2 = compile_jq('"m=\\(test(\\"a[)]b\\"))"', input_type="string")
    assert _run1(spark, b2, "a)b", "string") == "m=true"
    assert _run1(spark, b2, "ab", "string") == "m=false"


def test_contains_tojson(spark):
    # jq: "barn" | contains("arn") → true (string substring form)
    b = compile_jq('contains("arn")', input_type="string")
    assert _run1(spark, b, "barn", "string") is True
    assert _run1(spark, b, "bark", "string") is False
    assert _run1(spark, b, None, "string") is None
    with pytest.raises(ValueError, match="strings"):
        compile_jq('contains("x")', input_type="number")(F.lit(1.0))
    # tojson over complex values; scalars rejected with a hint
    bj = compile_jq("tojson", input_type="object")
    df = spark.createDataFrame([({"a": 1, "b": "x"},)], "v struct<a: long, b: string>")
    assert df.select(bj(F.col("v")).alias("o")).collect()[0]["o"] == '{"a":1,"b":"x"}'
    ba = compile_jq("map(. * 2) | tojson", input_type="array")
    assert _run_arr(spark, "tojson", [1.5, 2.0]) == "[1.5,2.0]"
    assert ba is not None
    with pytest.raises(ValueError, match="object/array"):
        compile_jq("tojson", input_type="number")(F.lit(1.0))


def test_reduce_and_bindings(spark):
    """`reduce SRC as $x (init; update)` folds with Spark's aggregate HOF;
    `EXPR as $x | body` binds a variable with '.' unchanged in body — all
    verified against jq 1.7 semantics by hand:
      [1,2,3,4] | reduce .[] as $x (0; . + $x)            -> 10
      [1,2,3]   | reduce .[] as $x (0; . + ($x * $x))     -> 14
      []        | reduce .[] as $x (5; . + $x)            -> 5
      null      | reduce .[] as $x (5; . + $x)            -> 5  (empty stream)
      [2,9,4]   | reduce .[] as $x (0; if $x > . then $x else . end) -> 9
      [1,2,3]   | . as $a | reduce .[] as $x (0; . + $x)  -> 6
    """
    assert _run_arr(spark, "reduce .[] as $x (0; . + $x)", [1.0, 2.0, 3.0, 4.0]) == 10.0
    assert _run_arr(spark, "reduce .[] as $x (0; . + ($x * $x))", [1.0, 2.0, 3.0]) == 14.0
    assert _run_arr(spark, "reduce .[] as $x (5; . + $x)", []) == 5.0
    assert _run_arr(spark, "reduce .[] as $x (5; . + $x)", None) == 5.0
    assert _run_arr(
        spark, "reduce .[] as $x (0; if $x > . then $x else . end)", [2.0, 9.0, 4.0]
    ) == 9.0
    assert _run_arr(spark, ". as $a | reduce .[] as $x (0; . + $x)", [1.0, 2.0, 3.0]) == 6.0
    # stream with elementwise stages before the fold: select inside the source
    assert _run_arr(
        spark, "reduce (map(select(. > 0)))[] as $x (0; . + $x)", [3.0, -1.0, 2.0]
    ) == 5.0
    # string accumulator stays a string (no double widening)
    b = compile_jq('reduce .[] as $x (""; . + "*")', input_type="array")
    df = spark.createDataFrame([(["a", "b", "c"],)], "v array<string>")
    assert df.select(b(F.col("v")).alias("o")).collect()[0]["o"] == "***"


def test_reduce_variable_errors(spark):
    with pytest.raises(ValueError, match="unbound variable"):
        compile_jq("$nope", input_type="number")(F.lit(1.0))
    with pytest.raises(ValueError, match="must be a stream"):
        compile_jq("reduce . as $x (0; . + $x)", input_type="array")(F.lit(None))
    # binding is scoped: $x unavailable outside its body
    with pytest.raises(ValueError, match="unbound variable"):
        compile_jq("(. as $x | $x) + $x", input_type="number")(F.lit(1.0))


def test_mid_pipe_as_binding(spark):
    """`a | b as $x | c` — jq binds `as` after a pipe stage; within c,
    '.' is a's output. jq 1.7: [1,2,3] | length as $n | . -> [1,2,3] with
    $n=3, so `map(. * $n)` -> [3,6,9] ... our arrays are double-typed."""
    assert _run_arr(spark, "length as $n | map(. * $n)", [1.0, 2.0, 3.0]) == [
        3.0, 6.0, 9.0,
    ]
    # parenthesized form still works and scopes correctly
    assert _run_arr(
        spark, "(add // 0) as $s | map(. - $s) | length", [5.0, 7.0]
    ) == 2


def test_jq_compile_thread_safety(spark):
    """Concurrent compilation from multiple threads must not corrupt the
    per-thread $var stacks (the stack is threading.local)."""
    from concurrent.futures import ThreadPoolExecutor

    def build_and_eval(i):
        prog = "reduce .[] as $x (0; . + $x + %d)" % (i % 3)
        b = compile_jq(prog, input_type="array")
        df = spark.createDataFrame([([1.0, 2.0],)], "v array<double>")
        return df.select(b(F.col("v")).alias("o")).collect()[0]["o"]

    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(build_and_eval, range(24)))
    for i, r in enumerate(results):
        assert r == 3.0 + 2 * (i % 3), (i, r)


# --------------------------------------- object/regex builtin tail (round 5)
# jq reference behavior for each golden checked against jq 1.7 semantics
# (jackson-jq evaluates full jq in the reference,
# DefaultJacksonJqTransformer.kt:43-62).


def _run_map(spark, prog, value, **kw):
    b = compile_jq(prog, input_type="object", map_input=True, **kw)
    df = spark.createDataFrame([(value,)], "v map<string,double>")
    return df.select(b(F.col("v")).alias("out")).collect()[0]["out"]


def test_map_object_introspection(spark):
    m = {"y": 2.0, "x": 1.0}
    assert _run_map(spark, "keys", m) == ["x", "y"]
    assert sorted(_run_map(spark, "keys_unsorted", m)) == ["x", "y"]
    assert _run_map(spark, "to_entries | map(.key) | sort", m) == ["x", "y"]
    assert _run_map(spark, "to_entries | map(.value) | add", m) == 3.0
    assert _run_map(spark, 'has("x")', m) is True
    assert _run_map(spark, 'has("z")', m) is False
    assert _run_map(spark, "to_entries | from_entries | .y", m) == 2.0
    assert _run_map(
        spark, 'with_entries({key: .key, value: (.value * 10)}) | .x', m
    ) == 10.0
    assert _run_map(spark, 'getpath(["y"])', m) == 2.0
    # null input propagates as NULL, never errors
    assert _run_map(spark, "keys", None) is None
    assert _run_map(spark, 'has("x")', None) is None


def test_struct_object_introspection(spark):
    b = compile_jq("to_entries", input_type="object", input_fields=["a", "b"])
    df = spark.createDataFrame([((1, 5),), (None,)], "v struct<a:int,b:int>")
    rows = df.select(b(F.col("v")).alias("out")).collect()
    assert [e.asDict() for e in rows[0]["out"]] == [
        {"key": "a", "value": 1},
        {"key": "b", "value": 5},
    ]
    assert rows[1]["out"] is None  # null object → null entries

    bk = compile_jq("keys", input_type="object", input_fields=["b", "a"])
    assert df.select(bk(F.col("v")).alias("o")).collect()[0]["o"] == ["a", "b"]

    # struct key presence is compile-time schema (jq: declared null HAS key)
    bh = compile_jq('has("a")', input_type="object", input_fields=["a", "b"])
    assert df.select(bh(F.col("v")).alias("o")).collect()[0]["o"] is True
    bh2 = compile_jq('has("z")', input_type="object", input_fields=["a", "b"])
    assert df.select(bh2(F.col("v")).alias("o")).collect()[0]["o"] is False

    bw = compile_jq(
        'with_entries({key: .key, value: (.value * 2)}) | .b',
        input_type="object", input_fields=["a", "b"],
    )
    assert df.select(bw(F.col("v")).alias("o")).collect()[0]["o"] == 10


def test_in_builtin(spark):
    # string | in(constructed object)
    b = compile_jq('in({"a": 1, "b": 2})', input_type="string")
    df = spark.createDataFrame([("a",), ("z",)], "v string")
    vals = [r["o"] for r in df.select(b(F.col("v")).alias("o")).collect()]
    assert vals == [True, False]
    # number | in(array): index exists
    bi = compile_jq("in([10, 20, 30])", input_type="integer")
    dfi = spark.createDataFrame([(1,), (5,)], "v bigint")
    vals = [r["o"] for r in dfi.select(bi(F.col("v")).alias("o")).collect()]
    assert vals == [True, False]


def test_capture_named_groups(spark):
    b = compile_jq(
        'capture("(?<user>[a-z]+)@(?<host>[a-z.]+)") | .host',
        input_type="string",
    )
    df = spark.createDataFrame([("bob@example.com",), ("nope",)], "v string")
    vals = [r["o"] for r in df.select(b(F.col("v")).alias("o")).collect()]
    assert vals == ["example.com", None]  # no match → NULL (empty stream)
    with pytest.raises(ValueError, match="named group"):
        compile_jq('capture("[a-z]+")', input_type="string")(F.lit("a"))


def test_split_regex_two_arg(spark):
    b = compile_jq('split("[-,]"; "") | length', input_type="string")
    df = spark.createDataFrame([("a-b,c",)], "v string")
    assert df.select(b(F.col("v")).alias("o")).collect()[0]["o"] == 3
    # one-arg split stays LITERAL: '.' splits on dots, not on every char
    bl = compile_jq('split(".") | length', input_type="string")
    dfl = spark.createDataFrame([("a.b.c",)], "v string")
    assert dfl.select(bl(F.col("v")).alias("o")).collect()[0]["o"] == 3


def test_splits_requires_collect():
    with pytest.raises(ValueError, match=r"wrap"):
        compile_jq('splits("-")', input_type="string")(F.lit("a"))


def test_getpath_nested(spark):
    b = compile_jq('getpath(["a", "b"])', input_type="object")
    df = spark.createDataFrame([(((7,),),)], "v struct<a:struct<b:int>>")
    assert df.select(b(F.col("v")).alias("o")).collect()[0]["o"] == 7
    with pytest.raises(ValueError, match="literal string path"):
        compile_jq("getpath([1])", input_type="object")(F.lit("a"))


def test_slice_goldens(spark):
    b = compile_jq("sort | .[1:3]", input_type="array")
    df = spark.createDataFrame([([3.0, 1.0, 2.0, 1.0],)], "v array<double>")
    assert df.select(b(F.col("v")).alias("o")).collect()[0]["o"] == [1.0, 2.0]
    bs = compile_jq(".[1:-1]", input_type="string")
    dfs = spark.createDataFrame([("hello",)], "v string")
    assert dfs.select(bs(F.col("v")).alias("o")).collect()[0]["o"] == "ell"
    with pytest.raises(ValueError, match="statically-typed"):
        compile_jq(".foo | .[1:2]", input_type="object")(F.lit("a"))


# -------------------------------------------------- wave-2 builtins (r5)


def test_min_by_max_by_goldens(spark):
    # jq 1.7: [{k:1,v:"a"},{k:1,v:"b"},{k:2,v:"c"}] | min_by(.k) -> first
    # minimal; max_by -> LAST maximal
    df = spark.createDataFrame([([3.7, 1.2, 2.9, 1.4],)], "v array<double>")
    b = compile_jq("min_by(floor)", input_type="array")
    assert df.select(b(F.col("v")).alias("o")).collect()[0]["o"] == 1.2
    b = compile_jq("max_by(floor)", input_type="array")
    assert df.select(b(F.col("v")).alias("o")).collect()[0]["o"] == 3.7
    # empty -> null (jq), null input -> null
    de = spark.createDataFrame([([],), (None,)], "v array<double>")
    b = compile_jq("min_by(.)", input_type="array")
    got = [r["o"] for r in de.select(b(F.col("v")).alias("o")).collect()]
    assert got == [None, None]


def test_map_values_del_length_objects(spark):
    df = spark.createDataFrame(
        [({"x": 1, "y": 2}, (4, 9))],
        "m map<string,int>, st struct<a:int,b:int>",
    )
    bm = compile_jq("map_values(. * 10) | .y", input_type="object", map_input=True)
    assert df.select(bm(F.col("m")).alias("o")).collect()[0]["o"] == 20
    bd = compile_jq("del(.x) | keys", input_type="object", map_input=True)
    assert df.select(bd(F.col("m")).alias("o")).collect()[0]["o"] == ["y"]
    bl = compile_jq("length", input_type="object", map_input=True)
    assert df.select(bl(F.col("m")).alias("o")).collect()[0]["o"] == 2
    bs = compile_jq(
        "map_values(. + 1) | .b", input_type="object", input_fields=["a", "b"]
    )
    assert df.select(bs(F.col("st")).alias("o")).collect()[0]["o"] == 10
    bsd = compile_jq("del(.a) | keys", input_type="object", input_fields=["a", "b"])
    assert df.select(bsd(F.col("st")).alias("o")).collect()[0]["o"] == ["b"]
    bsl = compile_jq("length", input_type="object", input_fields=["a", "b"])
    assert df.select(bsl(F.col("st")).alias("o")).collect()[0]["o"] == 2
    with pytest.raises(ValueError, match="single field path"):
        compile_jq("del(.a.b)", input_type="object", input_fields=["a"])(F.lit(1))
    with pytest.raises(ValueError, match="empty object"):
        compile_jq("del(.a)", input_type="object", input_fields=["a"])(F.lit(1))


def test_test_with_flags(spark):
    df = spark.createDataFrame([("Hello-World",)], "v string")
    for prog, want in [
        ('test("hello"; "i")', True),
        ('test("hello")', False),
        ('test("h e l l o"; "ix")', True),
        ('test("hello.world"; "is")', True),
    ]:
        b = compile_jq(prog, input_type="string")
        assert df.select(b(F.col("v")).alias("o")).collect()[0]["o"] is want, prog
    with pytest.raises(ValueError, match="unsupported"):
        compile_jq('test("a"; "m")', input_type="string")(F.lit("a"))


def test_update_assignment(spark):
    """`.k |= f` — jq update-assignment over both object backings, plus
    the canonical with_entries(.value |= f) idiom (jq 1.7 goldens)."""
    df = spark.createDataFrame(
        [({"x": 1, "y": 2}, (4, 9))],
        "m map<string,int>, st struct<a:int,b:int>",
    )
    b = compile_jq(".x |= (. + 100) | .x", input_type="object", map_input=True)
    assert df.select(b(F.col("m")).alias("o")).collect()[0]["o"] == 101
    b = compile_jq(
        "with_entries(.value |= (. * 10)) | .y", input_type="object",
        map_input=True,
    )
    assert df.select(b(F.col("m")).alias("o")).collect()[0]["o"] == 20
    b = compile_jq(
        ".b |= (. * 3) | .a + .b", input_type="object", input_fields=["a", "b"]
    )
    assert df.select(b(F.col("st")).alias("o")).collect()[0]["o"] == 31
    b = compile_jq(
        "with_entries(.key |= ascii_upcase) | keys",
        input_type="object", input_fields=["a", "b"],
    )
    assert df.select(b(F.col("st")).alias("o")).collect()[0]["o"] == ["A", "B"]
    # jq: updating an ABSENT key adds it with f(null) (null propagates
    # through our documented SQL semantics)
    dfa = spark.createDataFrame([((4,),)], "st struct<a:int>")
    b = compile_jq(".z |= 1 | .z", input_type="object", input_fields=["a"])
    assert dfa.select(b(F.col("st")).alias("o")).collect()[0]["o"] == 1
    b = compile_jq(".z |= (. // 5) | .z", input_type="object", input_fields=["a"])
    assert dfa.select(b(F.col("st")).alias("o")).collect()[0]["o"] == 5
    bm = compile_jq(".z |= 7 | .z", input_type="object", map_input=True)
    dfm = spark.createDataFrame([({"x": 1},)], "m map<string,int>")
    assert dfm.select(bm(F.col("m")).alias("o")).collect()[0]["o"] == 7
    # jq preserves key POSITION on update (keys_unsorted observes it): an
    # existing key must update in place, not move to the end
    dfo = spark.createDataFrame([({"x": 1, "y": 2},)], "m map<string,int>")
    bo = compile_jq(
        ".x |= (. + 1) | keys_unsorted", input_type="object", map_input=True
    )
    assert dfo.select(bo(F.col("m")).alias("o")).collect()[0]["o"] == ["x", "y"]
    bo2 = compile_jq(
        ".x = 9 | keys_unsorted", input_type="object", map_input=True
    )
    assert dfo.select(bo2(F.col("m")).alias("o")).collect()[0]["o"] == ["x", "y"]
    with pytest.raises(ValueError, match="single field path"):
        compile_jq(".a.b |= 1", input_type="object", input_fields=["a"])(F.lit(1))


def test_range_collect_forms(spark):
    """[range(...)] — jq's arithmetic stream collected to an array
    (end-exclusive; jq 1.7: [range(4)] == [0,1,2,3])."""
    df = spark.createDataFrame([(5.0,)], "n double")

    def run(prog):
        b = compile_jq(prog, input_type="number")
        return df.select(b(F.col("n")).alias("o")).collect()[0]["o"]

    assert run("[range(4)]") == [0, 1, 2, 3]
    assert run("[range(1; 4)]") == [1, 2, 3]
    assert run("[range(0; 10; 3)]") == [0, 3, 6, 9]
    assert run("[range(.)] | length") == 5
    assert run("[range(4) | . * 2] | add") == 12.0
    assert run("[range(3; 1)]") == []  # empty, not descending
    with pytest.raises(ValueError, match="wrap"):
        compile_jq("range(3)", input_type="number")(F.lit(1.0))
    with pytest.raises(ValueError, match="positive"):
        compile_jq("[range(3; 0; -1)]", input_type="number")(F.lit(1.0))
    # fractional literal step would silently truncate under the integer
    # grid ([range(0;2;1.5)] would return [0,1] instead of jq's [0,1.5])
    with pytest.raises(ValueError, match="integer"):
        compile_jq("[range(0; 2; 1.5)]", input_type="number")(F.lit(1.0))
    # DYNAMIC nonpositive step: runtime guard yields the empty stream, not
    # an opaque F.sequence error mid-job
    dfn = spark.createDataFrame([(-1.0,), (2.0,)], "n double")
    b = compile_jq("[range(0; 4; .)]", input_type="number")
    got = [r["o"] for r in dfn.select(b(F.col("n")).alias("o")).collect()]
    assert got == [[], [0, 2]]


def test_plain_assignment(spark):
    """`.k = f` — jq plain assignment: f evaluates against the ROOT (unlike
    |=, which sees the old field value); new keys extend the object."""
    df = spark.createDataFrame(
        [({"x": 1, "y": 2}, (4, 9))],
        "m map<string,int>, st struct<a:int,b:int>",
    )
    b = compile_jq(".a = .b | .a", input_type="object", input_fields=["a", "b"])
    assert df.select(b(F.col("st")).alias("o")).collect()[0]["o"] == 9
    b = compile_jq(
        ".c = (.a + .b) | keys", input_type="object", input_fields=["a", "b"]
    )
    assert df.select(b(F.col("st")).alias("o")).collect()[0]["o"] == ["a", "b", "c"]
    b = compile_jq(".z = 7 | keys", input_type="object", map_input=True)
    assert df.select(b(F.col("m")).alias("o")).collect()[0]["o"] == ["x", "y", "z"]
    # comparison `==` still tokenizes as one operator next to `=`
    b = compile_jq(".a = .b | .a == .b", input_type="object",
                   input_fields=["a", "b"])
    assert df.select(b(F.col("st")).alias("o")).collect()[0]["o"] is True
    with pytest.raises(ValueError, match="single field path"):
        compile_jq(".a[0] = 1", input_type="object", input_fields=["a"])(F.lit(1))


def test_interpolation_nested_escaped_quote(spark):
    r"""An interpolated expression containing an ESCAPED quote inside a
    nested string literal — jq source "x\(sub("\"";"q"))" — must balance
    correctly (the inner \\ + \" pair is one escaped character at the
    nested level, not a delimiter)."""
    # outer-escaped form (the tokenizer delivers nested strings as \"..\"
    # regions): jq source "x\(sub(\"\\\"\"; \"q\"))" — sub replaces the
    # first quote character with q inside the interpolation
    prog = r'"x\(sub(\"\\\"\"; \"q\"))"'
    b = compile_jq(prog, input_type="string")
    df = spark.createDataFrame([('a"b',)], "v string")
    assert df.select(b(F.col("v")).alias("o")).collect()[0]["o"] == "xaqb"
    # the round-4 case stays fixed: a paren inside a nested string
    b2 = compile_jq(r'"y\(ltrimstr(\"(\"))"', input_type="string")
    df2 = spark.createDataFrame([("(z",)], "v string")
    assert df2.select(b2(F.col("v")).alias("o")).collect()[0]["o"] == "yz"


def test_from_entries_duplicate_keys_last_wins(spark):
    """jq duplicate-key semantics: first-occurrence POSITION, LAST value —
    {"a":3,"b":2} — not a SparkRuntimeException from map_from_entries
    under the default mapKeyDedupPolicy=EXCEPTION."""
    df = spark.createDataFrame([(1,)], "x int")
    b = compile_jq(
        '[{key:"a",value:1},{key:"b",value:2},{key:"a",value:3}]'
        " | from_entries | [.a, .b]",
        input_type="number",
    )
    assert df.select(b(F.col("x")).alias("o")).collect()[0]["o"] == [3, 2]
    # position: the deduped key keeps its first slot
    bk = compile_jq(
        '[{key:"a",value:1},{key:"b",value:2},{key:"a",value:3}]'
        " | from_entries | keys_unsorted",
        input_type="number",
    )
    assert df.select(bk(F.col("x")).alias("o")).collect()[0]["o"] == ["a", "b"]


def test_with_entries_key_collision_last_wins(spark):
    """A key-mapping f that collides keys resolves last-wins like jq, not
    with a mid-job duplicate-map-key exception."""
    dfm = spark.createDataFrame([({"A": 1, "B": 2},)], "m map<string,int>")
    b = compile_jq(
        'with_entries(.key |= "z") | .z', input_type="object", map_input=True
    )
    assert dfm.select(b(F.col("m")).alias("o")).collect()[0]["o"] == 2


def test_has_string_key_on_untyped_input_rejected(spark):
    """has("k") where the static type degraded to "any" would compile to
    ARRAY index semantics and return all-NULL on a map column — must be a
    loud compile error telling the user to pin the object type."""
    with pytest.raises(ValueError, match="statically-untyped"):
        compile_jq('.payload | has("amount")', input_type="object",
                   map_input=True)(F.lit("x"))
