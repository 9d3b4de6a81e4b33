"""Fixture oracles must equal live Spark output — value-exact.

The minhash/simhash gate oracles are parquet fixtures produced by the
pure-Python pipeline in scripts/make_fixtures.py. These tests fail if the
fixtures go stale (testdata changed) or if either implementation drifts.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"

needs_testdata = pytest.mark.skipif(
    not os.path.exists(os.path.join(SF_DIR, "documents.parquet")),
    reason="driver testdata not present",
)


def _fixture_rows(name: str) -> set[tuple]:
    path = os.path.join(REPO, "fixtures", name)
    tbl = pq.read_table(path)
    cols = [tbl[c].to_pylist() for c in tbl.column_names]
    return set(zip(*cols))


@needs_testdata
def test_minhash_fixture_matches_spark(spark):
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in entrymod.q_minhash_lsh_pairs(spark, SF_DIR).collect()
    }
    want = _fixture_rows("minhash_pairs_sf0.01.parquet")
    assert got == want


@needs_testdata
def test_simhash_fixture_matches_spark(spark):
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in entrymod.q_simhash_near_pairs(spark, SF_DIR).collect()
    }
    want = _fixture_rows("simhash_pairs_sf0.01.parquet")
    assert got == want


def test_python_replication_matches_spark_on_nasty_text(spark):
    """The fixture generator's tokenize/shingle/fingerprint replication must
    match Spark on adversarial text: unicode whitespace (which Java's \\s and
    trim() do NOT treat as whitespace, unlike Python's str.strip/re \\s),
    tabs/newlines, empties, and repeated separators."""
    import scripts.make_fixtures as mf
    from pyspark.sql import functions as F

    from funcify_feature_eng_spark.functions.text import fingerprint64, shingles

    nasty = [
        "plain words here",
        "  leading and trailing  ",
        "tab\tand\nnewline\x0bmix",
        "\xa0unicode\xa0space\xa0",      # NBSP: NOT whitespace to Java
        "thin space",                # U+2009: NOT whitespace to Java
        "",
        "   ",
        "\t",
        "one",
        "UPPER Case MiXeD",
        "a  b   c    d",
    ]
    df = spark.createDataFrame([(s,) for s in nasty], "text string")
    rows = df.select(
        "text",
        shingles(F.col("text"), 3).alias("sh"),
        fingerprint64(F.col("text")).alias("fp"),
    ).collect()
    for r in rows:
        want_sh = mf._shingles(r["text"], 3)
        assert list(r["sh"]) == want_sh, (r["text"], list(r["sh"]), want_sh)
        assert r["fp"] == mf._fingerprint64(r["text"]), r["text"]


@needs_testdata
def test_kmv_fixture_matches_spark(spark):
    got = {
        (r.lang, r.est_distinct)
        for r in entrymod.q_kmv_distinct(spark, SF_DIR).collect()
    }
    want = _fixture_rows("kmv_distinct_sf0.01.parquet")
    assert got == want


@needs_testdata
def test_kmv_overlap_fixture_matches_spark(spark):
    got = {
        (r.lang, r.est_overlap, r.est_only_a)
        for r in entrymod.q_kmv_overlap(spark, SF_DIR).collect()
    }
    want = _fixture_rows("kmv_overlap_sf0.01.parquet")
    assert got == want


@needs_testdata
def test_cms_tokens_fixture_matches_spark(spark):
    got = {
        (r.tok, r.exact_cnt, r.est_count)
        for r in entrymod.q_cms_tokens(spark, SF_DIR).collect()
    }
    want = _fixture_rows("cms_tokens_sf0.01.parquet")
    assert got == want


@needs_testdata
def test_bloom_probe_fixture_matches_spark(spark):
    got = {
        (r.lang, r.probed, r.hits)
        for r in entrymod.q_bloom_probe(spark, SF_DIR).collect()
    }
    want = _fixture_rows("bloom_probe_sf0.01.parquet")
    assert got == want


@needs_testdata
def test_hash_cross_fixture_matches_spark(spark):
    got = {
        (r.doc_id, r.cross_bucket)
        for r in entrymod.q_hash_crosses(spark, SF_DIR)
        .select("doc_id", "cross_bucket")
        .collect()
    }
    want = _fixture_rows("hash_cross_sf0.01.parquet")
    assert got == want
