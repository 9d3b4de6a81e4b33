"""Bucketed+sorted ingest removes the window exchange (the 100 TB layout)."""

from __future__ import annotations

import pytest

from funcify_feature_eng_spark.operators.windows import turn_features
from funcify_feature_eng_spark.sources.tables import ingest_bucketed


@pytest.fixture(scope="module")
def bucketed_table(spark, transcripts):
    name = "transcripts_bucketed_test"
    ingest_bucketed(transcripts, name, bucket_col="conv_id", n_buckets=4)
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_scan_skips_window_exchange(spark, bucketed_table, transcripts):
    bucketed = spark.read.table(bucketed_table)
    plan_bucketed = (
        turn_features(bucketed)._jdf.queryExecution().executedPlan().toString()
    )
    plan_plain = (
        turn_features(transcripts)._jdf.queryExecution().executedPlan().toString()
    )
    # plain parquet needs a hash exchange for the per-entity window;
    # the bucketed table's output partitioning satisfies it already
    assert "Exchange hashpartitioning(conv_id" in plan_plain
    assert "Exchange hashpartitioning(conv_id" not in plan_bucketed


def test_bucketed_scan_elides_sort_with_ordering_conf(spark, bucketed_table):
    """ingest_bucketed guarantees one file per bucket, so letting the scan
    report its sort order is safe — and the window then needs neither the
    exchange NOR the sort. This is the bench's bucketed-flagship plan; pin
    it so the exchange-free/sort-free property can't silently rot."""
    conf_key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    prior = spark.conf.get(conf_key, "false")
    spark.conf.set(conf_key, "true")
    try:
        bucketed = spark.read.table(bucketed_table)
        plan = turn_features(bucketed)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(conv_id" not in plan
        assert "Sort [conv_id" not in plan
        # and the values still match the plain computation under the conf
        cols = ["conv_id", "turn_idx", "prior_role", "session_id"]
        a = (
            turn_features(bucketed).select(*cols)
            .orderBy("conv_id", "turn_idx").toPandas()
        )
    finally:
        spark.conf.set(conf_key, prior)
    b = (
        turn_features(spark.read.table(bucketed_table)).select(*cols)
        .orderBy("conv_id", "turn_idx").toPandas()
    )
    assert a.equals(b)


def test_bucketed_results_identical(spark, bucketed_table, transcripts):
    cols = ["conv_id", "turn_idx", "prior_role", "gap_secs", "session_id"]
    a = (
        turn_features(spark.read.table(bucketed_table))
        .select(*cols).orderBy("conv_id", "turn_idx").toPandas()
    )
    b = turn_features(transcripts).select(*cols).orderBy("conv_id", "turn_idx").toPandas()
    assert a.equals(b)
