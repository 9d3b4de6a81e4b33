"""Partition-range backfill (operators/backfill.py) vs the one-shot compute.

The invariant under test: for a compute whose temporal dependence is
bounded by ``lookback_s``, per-bucket recomputation with a lookback
margin — both the single-job replication form and the driver-orchestrated
resumable form — is row-for-row identical to computing the whole range at
once, including frames that cross bucket boundaries and same-second ties
AT a bucket edge.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.backfill import (
    backfill_partitions,
    bounded_backfill,
    read_backfill,
)
from funcify_feature_eng_spark.operators.windows import rolling_time_agg


def _compute(df, keys):
    return rolling_time_agg(
        df, keys=keys, ts_col="ts", value_col="v", window_s=60, out_prefix="m1"
    )


def _mk(spark):
    # two entities; rows straddle bucket edges (t=30 bucket width) with a
    # same-second tie exactly at an edge (t=60) and an empty bucket gap
    rows = [
        ("a", 0, 1),
        ("a", 25, 2),
        ("a", 59, 3),
        ("a", 60, 4),  # at the bucket edge
        ("a", 60, 5),  # same-second tie at the edge
        ("a", 95, 6),
        ("a", 200, 7),  # after an empty bucket
        ("b", 10, 10),
        ("b", 70, 20),
        ("b", 130, 30),
    ]
    return spark.createDataFrame(rows, "entity string, t long, v long").select(
        "entity", F.timestamp_seconds(F.col("t")).alias("ts"), "v", "t"
    )


def _collected(df):
    return sorted(
        (r["entity"], r["t"], r["v"], r["m1_cnt"], r["m1_sum"])
        for r in df.select("entity", "t", "v", "m1_cnt", "m1_sum").collect()
    )


def test_bounded_backfill_equals_oneshot(spark):
    df = _mk(spark)
    oneshot = _compute(df, ["entity"])
    for bucket_s, lookback_s in [(30, 60), (60, 60), (100, 60), (17, 60)]:
        out = bounded_backfill(
            df, _compute, ts_col="ts", keys=["entity"], bucket_s=bucket_s,
            lookback_s=lookback_s,
        )
        assert _collected(out) == _collected(oneshot), (bucket_s, lookback_s)


def test_bounded_backfill_row_count_preserved(spark):
    df = _mk(spark)
    out = bounded_backfill(
        df, _compute, ts_col="ts", keys=["entity"], bucket_s=30, lookback_s=60
    )
    assert out.count() == df.count()


def test_bounded_backfill_validation():
    with pytest.raises(ValueError, match="bucket_s"):
        bounded_backfill(
            None, _compute, ts_col="ts", keys=[], bucket_s=0, lookback_s=1
        )
    with pytest.raises(ValueError, match="lookback_s"):
        bounded_backfill(
            None, _compute, ts_col="ts", keys=[], bucket_s=1, lookback_s=-1
        )


def test_orchestrator_equals_oneshot_with_resume(spark, tmp_path):
    df = _mk(spark)
    out_path = os.path.join(str(tmp_path), "bf")
    common = dict(
        ts_col="ts", keys=["entity"], bucket_s=60, lookback_s=60,
        out_path=out_path,
    )
    # leg 1: first half of the range; leg 2: full range, resuming
    s1 = backfill_partitions(df, _compute, start_s=0, end_s=100, **common)
    assert s1["computed"] == 2 and s1["skipped"] == 0
    s2 = backfill_partitions(df, _compute, start_s=0, end_s=201, **common)
    assert s2["skipped"] == 2 and s2["computed"] == s2["buckets_total"] - 2
    got = read_backfill(spark, out_path).drop("bf_part")
    assert _collected(got) == _collected(_compute(df, ["entity"]))
    # idempotent re-run: everything skipped, output unchanged
    s3 = backfill_partitions(df, _compute, start_s=0, end_s=201, **common)
    assert s3["computed"] == 0 and s3["skipped"] == s3["buckets_total"]
    assert _collected(read_backfill(spark, out_path).drop("bf_part")) == _collected(
        _compute(df, ["entity"])
    )


def test_orchestrator_force_recompute(spark, tmp_path):
    df = _mk(spark)
    out_path = os.path.join(str(tmp_path), "bf")
    common = dict(
        ts_col="ts", keys=["entity"], bucket_s=120, lookback_s=60,
        out_path=out_path,
    )
    backfill_partitions(df, _compute, start_s=0, end_s=201, **common)
    s = backfill_partitions(
        df, _compute, start_s=0, end_s=201, resume=False, **common
    )
    assert s["skipped"] == 0 and s["computed"] == s["buckets_total"]
    assert _collected(read_backfill(spark, out_path).drop("bf_part")) == _collected(
        _compute(df, ["entity"])
    )


def test_orchestrator_empty_range(spark):
    with pytest.raises(ValueError, match="empty backfill range"):
        backfill_partitions(
            None, _compute, ts_col="ts", keys=[], bucket_s=60, lookback_s=0,
            out_path="/tmp/x", start_s=10, end_s=10,
        )


def test_orchestrator_validation_matches_single_job(spark, tmp_path):
    df = _mk(spark)
    out = os.path.join(str(tmp_path), "bf")
    with pytest.raises(ValueError, match="bucket_s"):
        backfill_partitions(
            df, _compute, ts_col="ts", keys=["entity"], bucket_s=0,
            lookback_s=0, out_path=out, start_s=0, end_s=10,
        )
    with pytest.raises(ValueError, match="lookback_s"):
        backfill_partitions(
            df, _compute, ts_col="ts", keys=["entity"], bucket_s=60,
            lookback_s=-1, out_path=out, start_s=0, end_s=10,
        )
    with pytest.raises(NotImplementedError, match="resume=True needs a local"):
        backfill_partitions(
            df, _compute, ts_col="ts", keys=["entity"], bucket_s=60,
            lookback_s=0, out_path="s3a://bucket/x", start_s=0, end_s=10,
        )


def test_entity_backfill_touched_entities_only(spark):
    """Only entities with >= 1 row in the range are recomputed, and each
    touched entity's features equal the one-shot compute (complete
    per-entity history reaches compute through the semi join)."""
    from funcify_feature_eng_spark.operators.backfill import entity_backfill

    df = _mk(spark)  # entity 'a' rows at t<=200; 'b' at 10/70/130
    out = entity_backfill(
        df, _compute, ts_col="ts", keys=["entity"], start_s=150, end_s=250
    )
    # only 'a' has rows in [150, 250): b untouched, a complete
    got = _collected(out)
    want = [r for r in _collected(_compute(df, ["entity"])) if r[0] == "a"]
    assert got == want and len(got) == 7

    with pytest.raises(ValueError, match="empty backfill range"):
        entity_backfill(
            df, _compute, ts_col="ts", keys=["entity"], start_s=5, end_s=5
        )


def test_entity_backfill_null_entity_key(spark):
    """A NULL entity key is one entity (as Window.partitionBy groups it):
    when its rows are touched by the range it must be recomputed, not
    silently skipped by a null-unsafe semi join."""
    from funcify_feature_eng_spark.operators.backfill import entity_backfill

    rows = [(None, 10, 1), (None, 40, 2), ("a", 50, 3), ("b", 500, 4)]
    df = spark.createDataFrame(
        rows, "entity string, t long, v long"
    ).select("entity", F.timestamp_seconds(F.col("t")).alias("ts"), "v", "t")
    out = entity_backfill(
        df, _compute, ts_col="ts", keys=["entity"], start_s=0, end_s=60
    )

    def coll(d):
        return sorted(
            (
                (r["entity"] or "", r["t"], r["v"], r["m1_cnt"], r["m1_sum"])
                for r in d.select("entity", "t", "v", "m1_cnt", "m1_sum").collect()
            )
        )

    got = coll(out)
    # NULL entity (both rows) and 'a' are touched; 'b' is not
    assert {r[0] for r in got} == {"", "a"} and len(got) == 3
    want = [r for r in coll(_compute(df, ["entity"])) if r[0] in ("", "a")]
    assert got == want
