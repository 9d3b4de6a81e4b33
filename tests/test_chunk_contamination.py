"""Chunking and contamination-detection operators."""

from __future__ import annotations

import pytest

from funcify_feature_eng_spark.operators.chunking import chunk_documents
from funcify_feature_eng_spark.operators.contamination import contamination_report


def test_chunk_documents_boundaries(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),   # exactly 2 chunks (step 6)
            (2, "a b c"),                                 # shorter than one chunk
            (3, ""),                                      # empty → no chunks
            (4, " ".join(f"x{i}" for i in range(6))),     # exactly one chunk
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=6, overlap_tokens=0)
    rows = {(r.doc_id, r.chunk_idx): (r.chunk_text, r.n_chunk_tokens) for r in out.collect()}
    assert rows[(1, 0)] == ("t0 t1 t2 t3 t4 t5", 6)
    assert rows[(1, 1)] == ("t6 t7 t8 t9", 4)
    assert rows[(2, 0)] == ("a b c", 3)
    assert rows[(4, 0)] == ("x0 x1 x2 x3 x4 x5", 6)
    assert not any(d == 3 for d, _ in rows)
    assert len(rows) == 4


def test_chunk_documents_overlap(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(8)))], "doc_id long, text string"
    )
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=4, overlap_tokens=2)
    rows = {r.chunk_idx: r.chunk_text for r in out.collect()}
    # step 2: [0:4), [2:6), [4:8) — full coverage with 2-token overlap
    assert rows == {0: "t0 t1 t2 t3", 1: "t2 t3 t4 t5", 2: "t4 t5 t6 t7"}


def test_chunk_documents_validates_overlap(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=4, overlap_tokens=4)


def test_contamination_report(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            (10, "quick brown fox jumps over something else entirely now"),  # overlaps
            (11, "completely different words with zero shared grams here"),  # clean
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_shared, r.contaminated) for r in
           contamination_report(train, ev, "doc_id", "text", k=5, min_shared=1).collect()}
    # "quick brown fox jumps over" is a shared 5-gram
    assert out[10][0] >= 1 and out[10][1] is True
    assert out[11] == (0, False)
