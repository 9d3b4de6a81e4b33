"""Tests for operators/substrings.py (exact-substring duplication)."""

from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.substrings import (
    drop_dup_spans,
    dup_span_stats,
)


def _docs(spark):
    rows = [
        (1, "a b c d e a b c"),   # "a b c" at pos 1 and 6
        (2, "x a b c y"),          # "a b c" at pos 2
        (3, "q r"),                # shorter than k -> no grams
        (4, ""),                   # empty
        (5, None),                 # NULL
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_dup_span_stats_hand_computed(spark):
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_grams"], r["dup_tokens"], r["dup_ppm"])
        for r in dup_span_stats(_docs(spark), "doc_id", "text", k=3).collect()
    }
    # doc 1: spans [1,3] and [6,8] -> union 6 of 8 tokens
    assert got[1] == (8, 2, 6, 750000)
    # doc 2: span [2,4] -> 3 of 5 tokens
    assert got[2] == (5, 1, 3, 600000)
    # short / empty / NULL docs survive with zeros
    assert got[3] == (2, 0, 0, 0)
    assert got[4] == (0, 0, 0, 0)
    assert got[5] == (0, 0, 0, 0)


def test_dup_span_union_never_double_counts(spark):
    # every position's trigram repeats; overlapping spans must union to
    # exactly the doc length, not 7 * 3
    df = spark.createDataFrame([(1, "a b c a b c a b c")], "doc_id: long, text: string")
    r = dup_span_stats(df, "doc_id", "text", k=3).collect()[0]
    assert (r["n_tokens"], r["n_dup_grams"], r["dup_tokens"], r["dup_ppm"]) == (
        9, 7, 9, 1000000,
    )


def test_dup_span_stats_hashed_matches_plain(spark):
    df = _docs(spark)
    a = {tuple(r) for r in dup_span_stats(df, "doc_id", "text", k=3, hashed=True).collect()}
    b = {tuple(r) for r in dup_span_stats(df, "doc_id", "text", k=3, hashed=False).collect()}
    assert a == b


def test_min_dup_threshold(spark):
    df = _docs(spark)
    got = {
        r["doc_id"]: r["n_dup_grams"]
        for r in dup_span_stats(df, "doc_id", "text", k=3, min_dup=3).collect()
    }
    # "a b c" occurs exactly 3 times -> still duplicated at min_dup=3
    assert got[1] == 2 and got[2] == 1
    got4 = {
        r["doc_id"]: r["n_dup_grams"]
        for r in dup_span_stats(df, "doc_id", "text", k=3, min_dup=4).collect()
    }
    assert got4[1] == 0 and got4[2] == 0


def test_drop_dup_spans(spark):
    got = {
        r["doc_id"]: r["text_deduped"]
        for r in drop_dup_spans(_docs(spark), "doc_id", "text", k=3).collect()
    }
    assert got[1] == "d e"
    assert got[2] == "x y"
    # pass-through docs come back as their normalized token join
    assert got[3] == "q r"
    assert got[4] == "" and got[5] == ""


def test_stats_stay_jvm_side(spark):
    plan = dup_span_stats(_docs(spark), "doc_id", "text", k=3)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
