"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition a DataFrame whose partition count is below the
    cluster's default parallelism — and leave it untouched otherwise.

    Compute-dense map stages (per-row signature folds, explode fan-outs,
    all-pairs loops) inherit the INPUT split count. A small parquet file
    arrives as one split, so on a 32-core executor the whole stage runs on
    one core; spending an n-row shuffle to buy full parallelism on the dense
    stage is the right trade exactly when n is small. At 100 TB the input
    has orders of magnitude more splits than cores and this is a no-op —
    the check is driver-side plan inspection, no job is triggered.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
