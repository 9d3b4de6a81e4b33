"""Lock the pure-Python XXH64 (fixture generator) against Spark's xxhash64.

If these pass, fixtures produced by scripts/make_fixtures.py are a genuinely
independent re-computation of the hash-dependent dedup pipelines.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from funcify_feature_eng_spark.functions.xxh64 import spark_xxhash64

STRINGS = [
    "",
    "a",
    "abc",
    "the quick brown fox",
    "x" * 31,
    "y" * 32,
    "z" * 100,
    "héllo wörld ünïcode ß",
    "tab\tand\nnewline",
    "the cat sat on",
]


def test_string_hash_matches_spark(spark):
    df = spark.createDataFrame(
        [(s,) for s in STRINGS], StructType([StructField("s", StringType())])
    )
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    want = [spark_xxhash64(s) for s in STRINGS]
    assert got == want


def test_seeded_int_then_string_matches_spark(spark):
    # the MinHash per-slot hash shape: xxhash64(i, shingle)
    rows = [(i, s) for i in (0, 1, 5, 63) for s in STRINGS[:5]]
    df = spark.createDataFrame(
        rows,
        StructType([StructField("i", IntegerType()), StructField("s", StringType())]),
    )
    got = [r[0] for r in df.select(F.xxhash64("i", "s")).collect()]
    want = [spark_xxhash64(("int", i), s) for i, s in rows]
    assert got == want


def test_long_chain_matches_spark(spark):
    # the band-hash shape: xxhash64(h0, h1, h2, h3) over longs
    rows = [
        (1, 2, 3, 4),
        (-1, -2, -3, -4),
        (0, 0, 0, 0),
        (2**62, -(2**62), 123456789123456789, -987654321987654321),
    ]
    schema = StructType([StructField(c, LongType()) for c in ("a", "b", "c", "d")])
    df = spark.createDataFrame(rows, schema)
    got = [r[0] for r in df.select(F.xxhash64("a", "b", "c", "d")).collect()]
    want = [spark_xxhash64(*[("long", v) for v in r]) for r in rows]
    assert got == want
