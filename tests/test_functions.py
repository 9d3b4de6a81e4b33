"""Golden transformer cases from the reference's jq fixtures (FIXTURES.md §4;
reference jq-transformers.yml:2-19, JqTransformerYamlTest.kt:85-105)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.functions import default_registry
from funcify_feature_eng_spark.functions import scalars as S
from funcify_feature_eng_spark.functions import text as T


@pytest.fixture(scope="module")
def reg():
    return default_registry()


def _one(spark, expr, schema, rows):
    return spark.createDataFrame(rows, schema).select(expr.alias("out")).toPandas()["out"]


def test_negative_to_null_golden(spark, reg):
    out = _one(spark, reg.apply("negative_to_null", F.col("x")), "x double",
               [(-1.0,), (1.0,), (0.0,), (None,)])
    assert pd.isna(out[0]) and out[1] == 1.0 and out[2] == 0.0 and pd.isna(out[3])


def test_list_size_golden(spark, reg):
    df = spark.createDataFrame([([],), (["a", "b", "c"],), (None,)], "x array<string>")
    out = df.select(reg.apply("list_size", F.col("x")).alias("out")).toPandas()["out"]
    assert out[0] == 0 and out[1] == 3 and pd.isna(out[2])


def test_extract_decade_golden(spark, reg):
    out = _one(spark, reg.apply("extract_decade", F.col("x")), "x int",
               [(2020,), (1899,), (1900,), (None,)])
    assert out[0] == 20 and pd.isna(out[1]) and out[2] == 0 and pd.isna(out[3])


def test_duration_parsing(spark, reg):
    out = _one(spark, reg.apply("parse_duration_minutes", F.col("x")), "x string",
               [("90 min",), ("2 Seasons",), (None,)])
    assert out[0] == 90 and pd.isna(out[1]) and pd.isna(out[2])
    out2 = _one(spark, reg.apply("parse_num_seasons", F.col("x")), "x string",
                [("2 Seasons",), ("1 Season",), ("90 min",)])
    assert out2[0] == 2 and out2[1] == 1 and pd.isna(out2[2])


def test_split_and_names(spark, reg):
    df = spark.createDataFrame([("a, b, c", "Jane Q Doe")], "lst string, nm string")
    row = df.select(
        reg.apply("split_list", F.col("lst")).alias("arr"),
        reg.apply("first_name", F.col("nm")).alias("fn"),
        reg.apply("last_name", F.col("nm")).alias("ln"),
    ).collect()[0]
    assert list(row["arr"]) == ["a", "b", "c"] and row["fn"] == "Jane" and row["ln"] == "Doe"


def test_decimal_half_even(spark, reg):
    # HALF_EVEN: 2.5 -> 2, 3.5 -> 4 (HALF_UP would give 3 and 4)
    out = _one(spark, reg.apply("decimal7", F.col("x"), scale=0), "x double",
               [(2.5,), (3.5,)])
    assert float(out[0]) == 2.0 and float(out[1]) == 4.0


def test_naming_conventions():
    assert S.to_snake_case("priorRole") == "prior_role"
    assert S.to_camel_case("prior_role") == "priorRole"
    assert S.to_pascal_case("prior_role") == "PriorRole"
    assert S.name_equivalent("PriorRole", "prior_role")
    assert not S.name_equivalent("priorRole", "prior_tool")


def test_text_functions(spark, reg):
    df = spark.createDataFrame(
        [("the cat and the dog",), ("",), ("el perro y el gato que no es",), (None,)],
        "x string",
    )
    got = df.select(
        reg.apply("token_count", F.col("x")).alias("n"),
        reg.apply("lang_id", F.col("x")).alias("lang"),
        reg.apply("quality_score", F.col("x")).alias("q"),
        reg.apply("fingerprint64", F.col("x")).alias("fp"),
    ).toPandas()
    assert got["n"][0] == 5 and got["n"][1] == 0
    assert got["lang"][0] == "en" and got["lang"][1] == "und" and got["lang"][2] == "es"
    assert 0.0 <= got["q"][0] <= 1.0
    # fingerprint is whitespace/case-normalized
    a = df.select(reg.apply("fingerprint64", F.lit("A  b\tc")).alias("f")).collect()[0]["f"]
    b = df.select(reg.apply("fingerprint64", F.lit("a b c")).alias("f")).collect()[0]["f"]
    assert a == b


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "x string")
    got = df.select(T.shingles(F.col("x"), 3).alias("s")).collect()
    assert list(got[0]["s"]) == ["a b c", "b c d"]
    assert list(got[1]["s"]) == ["a b"]


def test_shingles_and_char_ngrams_match_reference_form(spark):
    """The zip_with-based shingles/char_ngrams (HOF-capture perf rewrite)
    must be byte-identical to the original transform-over-index form on
    edge cases: empty, NULL, short-of-k, multi-whitespace, lead/trail
    space, multibyte, long runs."""
    def old_shingles(c, k):
        tk = T.tokens(F.lower(c))
        n = F.size(tk)
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        return F.when(
            n >= k,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tk, i + 1, k))),
        ).otherwise(F.array(F.concat_ws(" ", tk)))

    def old_char_ngrams(c, n):
        s = F.lower(c)
        ln = F.length(s)
        idx = F.sequence(F.lit(1), F.greatest(ln - n + 1, F.lit(1)))
        return F.when(
            ln >= n, F.transform(idx, lambda i: F.substring(s, i, n))
        ).otherwise(F.array(s))

    rows = [("",), (None,), ("one",), ("one two",), ("one two three",),
            ("a  b\tc\nd",), ("  lead trail  ",), ("x " * 200,),
            ("Mixed CASE tokens here",), ("héllo wörld ünïcode",),
            ("日本語テキストの例です",)]
    df = spark.createDataFrame(rows, "t: string")
    for k in (1, 2, 3, 5):
        got = [r["s"] for r in df.select(T.shingles(F.col("t"), k).alias("s")).collect()]
        exp = [r["s"] for r in df.select(old_shingles(F.col("t"), k).alias("s")).collect()]
        assert got == exp, f"shingles k={k}"
    for n in (2, 5, 7):
        got = [r["s"] for r in df.select(T.char_ngrams(F.col("t"), n).alias("s")).collect()]
        exp = [r["s"] for r in df.select(old_char_ngrams(F.col("t"), n).alias("s")).collect()]
        assert got == exp, f"char_ngrams n={n}"


def test_unit_vector_and_quantize_match_reference_form(spark):
    """zip_with/array_repeat forms of unit_vector and quantize_vec equal
    the original scalar-captured-lambda forms bit-for-bit."""
    from funcify_feature_eng_spark.functions import vectors as V
    from funcify_feature_eng_spark.operators.similarity import quantize_vec

    def old_unit(a):
        v = F.transform(a, lambda x: x.cast("double"))
        n = F.sqrt(F.aggregate(F.zip_with(v, v, lambda x, y: x * y),
                               F.lit(0.0), lambda acc, x: acc + x))
        return F.when(n > 0, F.transform(v, lambda x: x / n)).otherwise(
            F.transform(v, lambda x: F.lit(0.0)))

    def old_quant(a, levels=127):
        v = F.transform(a, lambda x: x.cast("double"))
        amax = F.array_max(F.transform(v, F.abs))
        return F.when(
            amax > 0,
            F.transform(v, lambda x: F.floor(x * levels / amax + F.lit(0.5)).cast("int")),
        ).otherwise(F.transform(v, lambda x: F.lit(0)))

    rows = [([0.1, -0.7, 0.33, 0.0],), ([0.0, 0.0, 0.0, 0.0],),
            ([1e-9, -1e9, 3.7, -0.0001],), ([5.0],)]
    df = spark.createDataFrame(rows, "v: array<float>")
    got = df.select(V.unit_vector(F.col("v")).alias("u"),
                    quantize_vec(F.col("v")).alias("q")).collect()
    exp = df.select(old_unit(F.col("v")).alias("u"),
                    old_quant(F.col("v")).alias("q")).collect()
    assert [list(r["u"]) for r in got] == [list(r["u"]) for r in exp]
    assert [list(r["q"]) for r in got] == [list(r["q"]) for r in exp]


def test_vector_functions(spark, reg):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
        "a array<float>, b array<float>",
    )
    got = df.select(
        reg.apply("cosine", F.col("a"), F.col("b")).alias("cos"),
        reg.apply("dot", F.col("a"), F.col("b")).alias("d"),
        reg.apply("l2_distance", F.col("a"), F.col("b")).alias("l2"),
    ).toPandas()
    assert abs(got["cos"][0] - 1.0) < 1e-12 and abs(got["cos"][1]) < 1e-12
    assert got["d"][0] == 1.0 and got["d"][1] == 0.0
    assert abs(got["l2"][1] - 2**0.5) < 1e-12


def test_registry_convention_insensitive_lookup(reg):
    assert "tokenCount" in reg
    assert "TokenCount" in reg
    with pytest.raises(KeyError):
        reg.get("no_such_fn")
