"""Driver-contract regression test: every queries() entry runs at sf0.001
and returns rows with a stable schema; oracle keys are a subset."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_).issubset(set(qs))
    # every query is oracle-backed: SQL-expressible ops inline, the
    # hash-dependent dedup ops via precomputed pure-Python fixtures
    assert sorted(set(qs) - set(os_)) == []


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_and_returns_rows(spark, sf_dir, name):
    fn = entrymod.queries()[name]
    df = fn(spark, sf_dir)
    schema1 = df.schema
    assert df.count() > 0
    # schema stability: re-invoking yields the same schema
    assert fn(spark, sf_dir).schema == schema1


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
