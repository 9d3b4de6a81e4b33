"""BM25 top-k: value correctness on a hand-computable corpus + the plan
properties that make it scale (term filter before the shuffle, broadcast
df/stats, no global sort)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.retrieval import bm25_topk


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "cat dog cat"),        # dl=3, cat tf=2, dog tf=1
        (2, "dog dog dog dog"),    # dl=4, dog tf=4
        (3, "bird"),               # dl=1, no query terms
        (4, "cat bird bird bird"), # dl=4, cat tf=1
        (5, ""),                   # empty -> dl=0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected(query):
    # independent reference computation in plain Python (same spec)
    docs = {1: ["cat", "dog", "cat"], 2: ["dog"] * 4, 3: ["bird"],
            4: ["cat", "bird", "bird", "bird"], 5: []}
    n = len(docs)
    s = sum(len(t) for t in docs.values())
    dfreq = {t: sum(1 for toks in docs.values() if t in toks) for t in query}
    scores = {}
    for d, toks in docs.items():
        total = 0
        for t in query:
            tf = toks.count(t)
            if not tf:
                continue
            idf_e3 = (2 * n - 2 * dfreq[t] + 1) * 1000 // (2 * dfreq[t] + 1)
            sat_e3 = (44 * tf * s * 1000
                      // (20 * tf * s + 6 * s + 18 * n * len(toks)))
            total += idf_e3 * sat_e3
        if total:
            scores[d] = total
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def test_bm25_values_match_reference_computation(corpus):
    got = [(r["doc_id"], r["score"])
           for r in bm25_topk(corpus, ["cat", "dog"], k=10).collect()]
    assert got == _expected(["cat", "dog"])
    # doc 3 and the empty doc never appear; doc ordering is deterministic
    assert {d for d, _ in got} == {1, 2, 4}


def test_bm25_case_insensitive_query(corpus):
    up = [(r["doc_id"], r["score"])
          for r in bm25_topk(corpus, ["CAT", "Dog"], k=10).collect()]
    assert up == _expected(["cat", "dog"])


def test_bm25_k_limits_and_empty_query(corpus):
    assert bm25_topk(corpus, ["dog"], k=1).count() == 1
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(corpus, [])


def test_bm25_plan_properties(corpus):
    plan = (bm25_topk(corpus, ["cat", "dog"], k=10)
            ._jdf.queryExecution().executedPlan().toString())
    # df + stats joins are broadcast, never sort-merge
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    # top-k via TakeOrdered, not a global Sort+Exchange
    assert "TakeOrderedAndProject" in plan
    # no Python stages
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rrf_fuse_values_and_errors(spark):
    from funcify_feature_eng_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2)], "doc_id long, rank int")
    got = {r["doc_id"]: r["rrf"] for r in rrf_fuse([a, b], k=10).collect()}
    s = 1_000_000_000
    assert got == {
        1: s // 61 + s // 62,
        2: s // 62,
        3: s // 63 + s // 61,
    }
    # doc 1 (rank 1 + rank 2) outranks doc 3 (rank 3 + rank 1)
    order = [r["doc_id"] for r in rrf_fuse([a, b], k=2).collect()]
    assert order == [1, 3]
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
