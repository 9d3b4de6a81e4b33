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


def test_bucketed_results_identical(spark, bucketed_table, transcripts):
    cols = ["conv_id", "turn_idx", "prior_role", "gap_secs", "session_id"]
    a = (
        turn_features(spark.read.table(bucketed_table))
        .select(*cols).orderBy("conv_id", "turn_idx").toPandas()
    )
    b = turn_features(transcripts).select(*cols).orderBy("conv_id", "turn_idx").toPandas()
    assert a.equals(b)
