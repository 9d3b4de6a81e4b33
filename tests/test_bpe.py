"""Tests for operators/bpe.py (BPE vocabulary training + tokenization)."""

from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.bpe import (
    _apply_merge,
    _merge_loop,
    bpe_tokenize,
    bpe_train,
)


def test_merge_loop_classic_example():
    # Sennrich's canonical toy: low/lower/newest/widest-style pair growth.
    wc = [("aaab", 10), ("aab", 5)]
    merges = _merge_loop(wc, n_merges=3, min_count=2)
    # pair counts round 1: (a,a): 10*2 + 5*1 = 25; (a,b): 15 -> merge (a,a)
    assert merges[0] == ("a", "a")
    # after: ("aa","ab"?) no — aaab -> (aa, a, b) left-to-right; aab -> (aa, b)
    # round 2: (aa,a):10, (a,b):10, (aa,b):5 -> tie 10 between ('a','b') and
    # ('aa','a'); lexicographically smallest pair is ('a','b')
    assert merges[1] == ("a", "b")


def test_apply_merge_non_overlapping():
    assert _apply_merge(tuple("aaaa"), ("a", "a")) == ("aa", "aa")
    assert _apply_merge(tuple("aaa"), ("a", "a")) == ("aa", "a")


def test_merge_loop_stops_below_min_count():
    merges = _merge_loop([("ab", 1), ("cd", 1)], n_merges=10, min_count=2)
    assert merges == []


def _docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cats sat"),
        (3, "THE CAT"),          # case-folds into the same words
        (4, ""),                  # empty -> no pieces
        (5, None),                # NULL -> no pieces
        (6, "mat mat mat the"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_bpe_train_and_tokenize_roundtrip(spark):
    df = _docs(spark)
    merges = bpe_train(df, "text", n_merges=20, vocab_words=100, min_count=2)
    assert merges  # frequent words produce merges
    out = {r["doc_id"]: r for r in
           bpe_tokenize(df, "text", merges).select(
               "doc_id", F.col("pieces")).collect()}
    # "the" occurs 5x -> must have merged into a single piece
    assert "the" in set(out[1]["pieces"])
    assert out[4]["pieces"] == [] and out[5]["pieces"] == []
    # reconstruction invariant: concatenated pieces == the lowered words
    joined = "".join(out[1]["pieces"])
    assert joined == "thecatsatonthemat"


def test_bpe_matches_pure_python_twin(spark):
    """Spark train+apply == the independent make_fixtures twins."""
    import scripts.make_fixtures as mf

    df = _docs(spark)
    rows = [(r["doc_id"], r["text"]) for r in df.orderBy("doc_id").collect()]

    # train parity (twin uses mf.BPE params)
    merges = bpe_train(df, "text", n_merges=mf.BPE["n_merges"],
                       vocab_words=mf.BPE["vocab_words"],
                       min_count=mf.BPE["min_count"])
    exp_merges = [(a, b) for _, a, b in mf.bpe_merges([t for _, t in rows])]
    assert merges == exp_merges

    # apply parity
    got = {r["doc_id"]: (r["n"], r["s"]) for r in
           bpe_tokenize(df, "text", merges).select(
               "doc_id",
               F.size("pieces").alias("n"),
               F.concat_ws(" ", "pieces").alias("s")).collect()}
    exp = {d: (n, s) for d, n, s in mf.bpe_pieces(rows)}
    assert got == exp


def test_bpe_deterministic(spark):
    df = _docs(spark)
    m1 = bpe_train(df, "text", n_merges=15, vocab_words=50)
    m2 = bpe_train(df, "text", n_merges=15, vocab_words=50)
    assert m1 == m2
