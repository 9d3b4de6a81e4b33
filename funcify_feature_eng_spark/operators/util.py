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
    has orders of magnitude more splits than cores and this is a no-op.

    The probe is only free for SCAN-SHAPED inputs: under AQE, ``df.rdd``
    finalizes the plan and can eagerly execute upstream shuffle stages. So
    a frame whose plan already contains an Exchange is returned untouched
    without probing — its parallelism is governed by the shuffle partition
    count anyway, and the probe could cost real work.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def spread_by_key(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition a few-split input on the key its NEXT aggregation /
    distinct will group by — and leave it untouched otherwise.

    The keyless round-robin spread (:func:`spread_small_input`) pays a
    local sort of its input before repartitioning (Spark's
    sortBeforeRepartition, needed for deterministic retries) — on a
    single-split multi-million-row table that sort runs on one core and
    costs more than it saves. Hash partitioning needs no such sort, and
    when the downstream groupBy/distinct uses the same key the exchange is
    REUSED (guide §2.4): the plan keeps exactly one exchange, but the
    dense aggregation work runs on ``defaultParallelism`` partitions
    instead of on the scan's single split. At scale the input has more
    splits than cores and this is a no-op.

    Same probe discipline as spread_small_input: plans that already
    contain an Exchange are returned untouched without probing.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *cols)
    return df


def materialize_small(df: DataFrame, broadcast_rows: int = 1_000_000):
    """Materialize a DECISION frame (candidate pairs, surviving ids) that is
    expected to be orders of magnitude smaller than the payload tables it
    will be joined against, and broadcast-hint it when the MEASURED row
    count says it fits.

    Why (guide §3.1): a multi-stage candidate subtree has no usable size
    estimate, so Spark plans its payload-fetch joins as sort-merge — both
    exchanges are paid before AQE can see the true (tiny) size. Counting
    the materialized frame and hinting explicitly removes the payload
    side's exchange entirely. The threshold is a ROW COUNT measured at run
    time, not a local tuning constant: at 100 TB a billion-candidate frame
    simply fails the test and the sort-merge path proceeds unchanged.

    Returns ``(frame, n_rows)``; the frame is localCheckpoint-backed either
    way (callers were already re-using these frames across several jobs).
    Call :func:`release` on it when done.
    """
    from pyspark.sql import functions as F

    handle = df.localCheckpoint()
    n = handle.count()
    if n <= broadcast_rows:
        return F.broadcast(handle), n
    return handle, n


def release(df: DataFrame) -> None:
    """Release the storage behind an eagerly-materialized (localCheckpoint)
    DataFrame returned by the dedup operators. The frame must not be used
    afterwards: a local checkpoint truncates lineage, so its data cannot be
    recomputed once unpersisted.

    ``df.rdd.unpersist()`` would be a SILENT NO-OP here: ``df.rdd`` builds
    a fresh Python-conversion RDD pipeline over the checkpoint, and
    unpersisting that new RDD never touches the checkpointed one. The
    actual storage handle lives on the ``LogicalRDD`` leaf the checkpoint
    planted in the logical plan — walk the leaves and unpersist those RDDs
    directly (non-blocking). Any leaf checkpoint reachable from ``df`` is
    released, which is exactly the do-not-use-afterwards contract."""
    plan = df._jdf.queryExecution().optimizedPlan()
    leaves = plan.collectLeaves()
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        if leaf.getClass().getName().endswith("LogicalRDD"):
            leaf.rdd().unpersist(False)
    # persist()-cached frames (no LogicalRDD leaf) release through the
    # regular Dataset cache path; harmless no-op otherwise
    df.unpersist()


def exact_floor_div(num, den):
    """floor(num / den) on DECIMAL columns, exact, as BIGINT.

    ``F.floor(a / b)`` on decimals is NOT a floor: Spark rounds the
    quotient HALF_UP to the result scale (6) before floor() sees it, so
    e.g. floor(19999999/10000000) evaluates to 2. The remainder identity
    ``(num - num % den) / den`` keeps the division integral — an exactly
    representable quotient is immune to the rounding — and the sign
    fixup restores floor (toward −inf) semantics for negative quotients
    (Spark's ``%`` takes the dividend's sign, like Java). Quotients must
    fit BIGINT (every ppm/count use here is ≤ ~1e15).
    """
    from pyspark.sql import functions as F

    r = num % den
    q = ((num - r) / den).cast("bigint")
    return F.when(
        (r != 0) & ((num < 0) != (den < 0)), q - 1
    ).otherwise(q)
