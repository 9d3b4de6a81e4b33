"""Tests for operators/ngram_lm.py (n-gram LM training + perplexity)."""

import math

from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.ngram_lm import (
    lm_score,
    ngram_counts,
    train_ngram_lm,
)


def _docs(spark):
    rows = [
        (1, "a b c a b"),
        (2, "a"),
        (3, ""),        # no tokens
        (4, None),      # no tokens
        (5, "A B"),     # case-folds into 'a b'
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def _edge_docs(spark):
    rows = [
        (6, "a  b\tc"),            # runs of mixed whitespace collapse
        (7, "\ta (b) [c]"),        # leading tab -> leading '' token (Java
                                   # split semantics); regex-special tokens
        (8, " "),                  # all-space -> no tokens
        (9, "a b c a b c a b"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_ngram_counts_exact(spark):
    df = _docs(spark)
    got = {
        (r["ord"], r["gram"]): r["cnt"]
        for r in ngram_counts(df, "text", n=3).collect()
    }
    assert got == {
        (1, "a"): 4, (1, "b"): 3, (1, "c"): 1,
        (2, "a b"): 3, (2, "b c"): 1, (2, "c a"): 1,
        (3, "a b c"): 1, (3, "b c a"): 1, (3, "c a b"): 1,
    }


def test_ngram_counts_min_count_and_short_rows(spark):
    df = _docs(spark)
    got = {
        (r["ord"], r["gram"]): r["cnt"]
        for r in ngram_counts(df, "text", n=2, min_count=3).collect()
    }
    # doc 2 has 1 token -> no bigrams; empty/NULL contribute nothing
    assert got == {(1, "a"): 4, (1, "b"): 3, (2, "a b"): 3}


def test_ngram_counts_stays_jvm_side(spark):
    plan = ngram_counts(_docs(spark), "text", n=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_train_prunes_deterministically(spark):
    df = _docs(spark)
    m = train_ngram_lm(df, "text", n=2, min_count=1, max_grams=2)
    # total is the UN-pruned token count
    assert m["total"] == 8
    # top-2 unigrams by (count desc, gram asc): a:4, b:3
    assert m["counts"][0] == {"a": 4, "b": 3}
    # top-2 bigrams: "a b":3, then tie cnt=1 -> lexicographically "b c"
    assert m["counts"][1] == {"a b": 3, "b c": 1}


def test_lm_score_hand_computed(spark):
    train = spark.createDataFrame([("a b",), ("a c",)], "text: string")
    model = train_ngram_lm(train, "text", n=2, min_count=1, max_grams=100)
    assert model["total"] == 4
    score = spark.createDataFrame(
        [(1, "a b"), (2, "a x"), (3, None)], "doc_id: long, text: string"
    )
    got = {r["doc_id"]: r for r in lm_score(score, "text", model).collect()}
    # doc 1: S(a)=2/4, S(b|a)=1/2 -> lp = 2*log10(0.5), ppl = 2.0
    lp1 = 2 * math.log10(0.5)
    assert got[1]["n_tokens"] == 2
    assert got[1]["lp_micro"] == int(math.floor(lp1 * 1e6 + 0.5)) == -602060
    assert got[1]["ppl_micro"] == 2_000_000
    # doc 2: S(a)=0.5; x: bigram miss (alpha) then OOV unigram (alpha/total)
    lp2 = math.log10(0.5) + math.log10(0.4 * 0.4 / 4)
    assert got[2]["lp_micro"] == int(math.floor(lp2 * 1e6 + 0.5))
    assert got[2]["ppl_micro"] == int(
        math.floor(10 ** (-lp2 / 2) * 1e6 + 0.5)
    ) == 7_071_068
    # NULL text -> zeros
    assert (got[3]["n_tokens"], got[3]["lp_micro"], got[3]["ppl_micro"]) == (0, 0, 0)


def test_lm_score_matches_pure_python_twin(spark):
    """Spark train+score == the independent make_fixtures twin."""
    import scripts.make_fixtures as mf

    df = _docs(spark).unionAll(_edge_docs(spark))
    rows = [(r["doc_id"], r["text"]) for r in df.orderBy("doc_id").collect()]
    p = mf.NGRAM_LM
    model = train_ngram_lm(
        df, "text", n=p["n"], min_count=p["min_count"], max_grams=p["max_grams"]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["lp_micro"], r["ppl_micro"])
        for r in lm_score(df, "text", model).collect()
    }
    exp = {d: (nt, lp, ppl) for d, nt, lp, ppl in mf.doc_perplexity(rows)}
    assert got == exp


def test_lm_score_single_map_pass(spark):
    df = _docs(spark)
    model = train_ngram_lm(df, "text", n=2, min_count=1)
    plan = lm_score(df, "text", model)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: one Arrow map pass
    assert plan.count("ArrowEvalPython") == 1
