"""Tests for operators/selection.py (DSIR importance selection +
per-group frequency cap)."""

import math

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.selection import (
    dsir_scores,
    dsir_select,
    frequency_cap,
    preference_pairs,
)


def _corpus(spark):
    # 6 "sciency" target-flavored docs, 6 "casual" raw-only docs, one empty,
    # one NULL text; marker tokens make the target distribution separable.
    rows = [
        (1, "quantum field theory lattice gauge simulation", "sci"),
        (2, "quantum entanglement lattice qubit decoherence", "sci"),
        (3, "gauge theory quantum lattice spectra", "sci"),
        (4, "lattice quantum simulation spectra gauge", "sci"),
        (5, "qubit decoherence entanglement field theory", "sci"),
        (6, "simulation spectra qubit gauge lattice", "sci"),
        (7, "lol that party was great see you tomorrow", "chat"),
        (8, "great party tomorrow see you there lol", "chat"),
        (9, "what time is the party tomorrow lol", "chat"),
        (10, "see you at the party it was great", "chat"),
        (11, "tomorrow lol what a great time", "chat"),
        (12, "party time see you lol", "chat"),
        (13, "", "chat"),
        (14, None, "chat"),
        # mixed doc: some target grams, some not
        (15, "quantum party lattice lol", "chat"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string, kind: string")


def test_dsir_separates_planted_target(spark):
    df = _corpus(spark)
    top = dsir_select(df, "doc_id", "text", F.col("kind") == "sci", k=6)
    got = {r["doc_id"] for r in top.collect()}
    assert got == {1, 2, 3, 4, 5, 6}


def test_dsir_mixed_doc_ranks_between(spark):
    df = _corpus(spark)
    scored = {r["doc_id"]: r["dsir_score"] for r in
              dsir_scores(df, "doc_id", "text", F.col("kind") == "sci").collect()}
    sci_min = min(scored[i] for i in range(1, 7))
    chat_max = max(scored[i] for i in range(7, 13))
    assert chat_max < scored[15] < sci_min
    # empty/NULL text must still be scored (single empty-string gram each),
    # not dropped
    assert 13 in scored and 14 in scored
    assert scored[13] == scored[14]


def test_dsir_matches_pure_python_twin(spark):
    """Spark output == an inline pure-Python recomputation (independent of
    the fixtures pipeline) on the same corpus."""
    from collections import Counter

    from funcify_feature_eng_spark.functions.xxh64 import spark_xxhash64

    nb, a, scale = 64, 1, 1_000_000
    rows = [(r["doc_id"], r["text"], r["kind"]) for r in _corpus(spark).collect()]

    def toks(t):
        t = (t or "").strip(" ")
        import re
        return re.split(r"[ \t\n\x0b\f\r]+", t) if t else []

    def grams(t):
        tk = toks((t or "").lower())
        uni = tk if len(tk) >= 1 else [""]
        bi = ([" ".join(tk[i:i + 2]) for i in range(len(tk) - 1)]
              if len(tk) >= 2 else [" ".join(tk)])
        return uni + bi

    raw, tgt, per_doc = Counter(), Counter(), []
    for did, text, kind in rows:
        bs = [spark_xxhash64(g) % nb for g in grams(text)]
        per_doc.append((did, bs))
        raw.update(bs)
        if kind == "sci":
            tgt.update(bs)
    dr, dt = sum(raw.values()) + a * nb, sum(tgt.values()) + a * nb
    sc = {b: int(math.floor((math.log(tgt[b] + a) - math.log(dt)
                             - math.log(raw[b] + a) + math.log(dr))
                            * scale + 0.5)) for b in raw}
    expected = {did: sum(sc[b] for b in bs) for did, bs in per_doc}

    got = {r["doc_id"]: r["dsir_score"] for r in
           dsir_scores(_corpus(spark), "doc_id", "text",
                       F.col("kind") == "sci", n_buckets=nb).collect()}
    assert got == expected


def test_dsir_deterministic(spark):
    df = _corpus(spark)
    a = sorted(map(tuple, dsir_select(df, "doc_id", "text",
                                      F.col("kind") == "sci", k=8).collect()))
    b = sorted(map(tuple, dsir_select(df, "doc_id", "text",
                                      F.col("kind") == "sci", k=8).collect()))
    assert a == b


def test_dsir_empty_target_raises(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError, match="no rows"):
        dsir_scores(df, "doc_id", "text", F.col("kind") == "nope").collect()


def test_frequency_cap_bounds_and_determinism(spark):
    df = _corpus(spark)
    out = frequency_cap(df, "kind", "doc_id", 3)
    counts = {r["kind"]: r["n"] for r in
              out.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 3 for n in counts.values())
    assert counts["sci"] == 3 and counts["chat"] == 3
    again = frequency_cap(df, "kind", "doc_id", 3)
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())


def test_frequency_cap_two_phase_equivalent(spark):
    df = _corpus(spark)
    for hash_mode in (True, False):
        single = frequency_cap(df, "kind", "doc_id", 2, hash=hash_mode)
        two = frequency_cap(df, "kind", "doc_id", 2, hash=hash_mode,
                            two_phase=True, n_salts=4)
        assert sorted(r["doc_id"] for r in single.collect()) == \
            sorted(r["doc_id"] for r in two.collect())


def test_frequency_cap_under_cap_group_keeps_all(spark):
    df = _corpus(spark)
    out = frequency_cap(df, "kind", "doc_id", 100)
    assert out.count() == df.count()


def test_frequency_cap_rejects_bad_cap(spark):
    with pytest.raises(ValueError):
        frequency_cap(_corpus(spark), "kind", "doc_id", 0)


def _candidates(spark):
    rows = [
        # prompt p1: clear winner/loser
        ("p1", 1, 0.9), ("p1", 2, 0.1), ("p1", 3, 0.5),
        # p2: chosen tie on 0.8 -> larger id (12); rejected tie on
        # 0.2 -> smaller id (13)
        ("p2", 11, 0.8), ("p2", 12, 0.8), ("p2", 13, 0.2), ("p2", 14, 0.2),
        # p3: all tie -> margin 0, dropped when strict
        ("p3", 21, 0.4), ("p3", 22, 0.4),
        # p4: single candidate -> margin 0, dropped when strict
        ("p4", 31, 0.7),
        # p5: NULL scores excluded; only one real candidate left
        ("p5", 41, None), ("p5", 42, 0.3),
    ]
    return spark.createDataFrame(rows, "prompt: string, cand_id: long, score: double")


def test_preference_pairs_basic_and_ties(spark):
    out = {r["prompt"]: r for r in
           preference_pairs(_candidates(spark), "prompt", "cand_id", "score").collect()}
    assert set(out) == {"p1", "p2"}
    assert (out["p1"]["chosen_id"], out["p1"]["rejected_id"]) == (1, 2)
    assert out["p1"]["margin"] == pytest.approx(0.8)
    assert (out["p2"]["chosen_id"], out["p2"]["rejected_id"]) == (12, 13)


def test_preference_pairs_non_strict_keeps_degenerate(spark):
    out = {r["prompt"]: r for r in
           preference_pairs(_candidates(spark), "prompt", "cand_id", "score",
                            strict=False).collect()}
    assert set(out) == {"p1", "p2", "p3", "p4", "p5"}
    assert out["p3"]["margin"] == 0.0
    # all-tie group: chosen tie -> larger id, rejected tie -> smaller id
    assert (out["p3"]["chosen_id"], out["p3"]["rejected_id"]) == (22, 21)
    assert out["p4"]["chosen_id"] == out["p4"]["rejected_id"] == 31
    # NULL-scored candidate never becomes chosen or rejected
    assert out["p5"]["chosen_id"] == out["p5"]["rejected_id"] == 42


def test_preference_pairs_single_shuffle_no_window(spark):
    plan = preference_pairs(
        _candidates(spark), "prompt", "cand_id", "score"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") <= 1


def _texted(spark):
    rows = [
        ("p1", 1, 0.9, "best"), ("p1", 2, 0.1, "worst"), ("p1", 3, 0.5, "mid"),
        # tie on 0.8 -> chosen = larger id (12), text follows the id
        ("p2", 11, 0.8, "t-a"), ("p2", 12, 0.8, "t-b"), ("p2", 13, 0.2, "low"),
        # small margin, cut by min_margin=0.2
        ("p3", 21, 0.55, "x"), ("p3", 22, 0.50, "y"),
    ]
    return spark.createDataFrame(
        rows, "prompt: string, cand_id: long, score: double, text: string"
    )


def test_preference_pairs_text_payload_and_min_margin(spark):
    out = {r["prompt"]: r for r in preference_pairs(
        _texted(spark), "prompt", "cand_id", "score", text_col="text"
    ).collect()}
    assert set(out) == {"p1", "p2", "p3"}
    assert (out["p1"]["chosen_text"], out["p1"]["rejected_text"]) == (
        "best", "worst")
    # tie resolves on (score, id) and the text follows the winning id
    assert (out["p2"]["chosen_id"], out["p2"]["chosen_text"]) == (12, "t-b")
    cut = {r["prompt"] for r in preference_pairs(
        _texted(spark), "prompt", "cand_id", "score",
        text_col="text", min_margin=0.2,
    ).collect()}
    assert cut == {"p1", "p2"}


def test_preference_pairs_text_path_single_shuffle(spark):
    plan = preference_pairs(
        _texted(spark), "prompt", "cand_id", "score", text_col="text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") <= 1


class TestParetoFront:
    def _brute(self, pts):
        out = []
        for i, (x, y) in enumerate(pts):
            dom = any(
                (sx <= x and sy <= y and (sx < x or sy < y))
                for j, (sx, sy) in enumerate(pts) if j != i
            )
            out.append(not dom)
        return out

    def test_matches_bruteforce(self, spark):
        import random

        from funcify_feature_eng_spark.operators.selection import pareto_front

        rng = random.Random(3)
        for trial in range(3):
            pts = [(rng.randrange(0, 20), rng.randrange(0, 20)) for _ in range(120)]
            exp = self._brute(pts)
            df = spark.createDataFrame(
                [(i, x, y) for i, (x, y) in enumerate(pts)], ["i", "x", "y"]
            )
            got = {r["i"]: r["on_front"] for r in pareto_front(df, "x", "y").collect()}
            for i, e in enumerate(exp):
                assert got[i] == e, (trial, i, pts[i])

    def test_exact_ties_both_survive(self, spark):
        from funcify_feature_eng_spark.operators.selection import pareto_front

        df = spark.createDataFrame(
            [(1, 5, 5), (2, 5, 5), (3, 6, 6)], ["i", "x", "y"]
        )
        got = {r["i"]: r["on_front"] for r in pareto_front(df, "x", "y").collect()}
        assert got == {1: True, 2: True, 3: False}

    def test_nulls_incomparable(self, spark):
        from funcify_feature_eng_spark.operators.selection import pareto_front

        df = spark.createDataFrame(
            [(1, 5, 5), (2, None, 1), (3, 1, None)], ["i", "x", "y"]
        )
        got = {r["i"]: r["on_front"] for r in pareto_front(df, "x", "y").collect()}
        assert got[1] is True and got[2] is None and got[3] is None

    def test_grouped(self, spark):
        from funcify_feature_eng_spark.operators.selection import pareto_front

        df = spark.createDataFrame(
            [("a", 1, 9), ("a", 2, 1), ("b", 2, 1), ("b", 1, 9)],
            ["g", "x", "y"],
        )
        got = [
            r["on_front"]
            for r in pareto_front(df, "x", "y", group_by=["g"]).collect()
        ]
        assert all(got)  # within each group both points are incomparable
