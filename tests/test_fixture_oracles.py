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
