"""Partition-range backfill: recompute bounded-lookback features over a
time range in independent, idempotent partition jobs.

The north rule names backfill as a first-class capability: at 10^12 turns
no feature table is recomputed in one job — history is (re)built
partition-by-partition (day/hour buckets), and the subtle part is WINDOW
features that look across partition boundaries (a trailing-1h count at
00:10 needs rows from the previous day's 23:10+). The reference's analog
is the tracked-value recomputation path (re-publishing a Planned value
with a fresh ``calculated_ts`` — ``schema/tracking/TrackableValue.kt:109-193``);
it never solved the range-partitioned form because the JVM engine
materialises one request batch at a time.

Two layers, same semantics:

- :func:`bounded_backfill` — ONE distributed job, no driver loop: every
  row is replicated into each time bucket whose lookback margin it serves
  (``explode(sequence(own_bucket, floor((t+L)/W)))`` — at most
  ``1 + ceil(L/W)`` replicas), the caller's compute runs with the bucket
  id appended to the entity keys (each bucket computes independently —
  the segmented-window trick generalised), and only each bucket's OWN
  rows survive. Output is provably row-for-row equal to the one-shot
  whole-range compute over rows with non-NULL timestamps whenever the
  compute's temporal dependence is bounded by ``lookback_s`` (gate:
  oracle computes the one-shot form).
- :func:`backfill_partitions` — the operational orchestrator: a driver
  loop over bucket ranges where each iteration is an INDEPENDENT Spark
  job reading only ``[bucket_start - lookback, bucket_end)`` of the
  source (a pushed-down range predicate → partition pruning on a
  date-partitioned source) and overwriting exactly its own output
  partition (dynamic partition overwrite → idempotent; re-running a
  partition replaces it, crashing between partitions loses nothing).
  ``resume=True`` skips partitions already written — restart-after-crash
  continues where it stopped.

At 100 TB the orchestrator is the shape that actually runs (each bucket's
job is bounded by one partition + margin, schedulable, retryable);
``bounded_backfill`` is both its single-job equivalent for moderate
ranges and the correctness witness that bounded-lookback partitioning is
exact.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.windows import epoch_seconds

# compute contract: (df, keys) -> df with feature columns added; every
# feature at a row with timestamp t may depend only on rows of the same
# entity with timestamp in [t - lookback_s, t] — window features built
# from operators.windows with bounded frames satisfy this by construction.
ComputeFn = Callable[[DataFrame, Sequence[str]], DataFrame]

_B = "__bf_bucket"


def bounded_backfill(
    df: DataFrame,
    compute: ComputeFn,
    *,
    ts_col: str,
    keys: Sequence[str],
    bucket_s: int,
    lookback_s: int,
) -> DataFrame:
    """One-job partitioned recomputation, exact for bounded-lookback computes.

    Each time bucket ``b`` (width ``bucket_s`` seconds) is computed as if it
    were an independent backfill partition: its input is every row with
    ``t >= b*W - lookback_s`` (the lookback margin) and ``t < (b+1)*W``; its
    output is only its OWN rows (``floor(t/W) == b``). Replication factor is
    ``1 + ceil(lookback_s / bucket_s)`` — the margin cost you pay on a real
    backfill too (each day's job re-reads the previous lookback window).

    Correctness: a context row ``t'`` needed by a target ``t`` in bucket
    ``b`` satisfies ``t' >= t - L >= b*W - L``, hence
    ``floor((t' + L)/W) >= b >= floor(t'/W)`` — it is always replicated
    into ``b``. Conversely extra replicas are harmless: they are only ever
    *frame members*, never surviving targets, and a bounded-lookback frame
    ignores rows outside its range.

    Contract fine print: ``compute`` must PRESERVE ``ts_col`` (the target
    filter re-derives each row's own bucket from it), and rows with a
    NULL timestamp are dropped (``explode`` of a NULL replica sequence) —
    they have no position in time, matching :mod:`.cv` and the
    orchestrator's range predicate.
    """
    if bucket_s < 1:
        raise ValueError(f"bucket_s must be >= 1, got {bucket_s}")
    if lookback_s < 0:
        raise ValueError(f"lookback_s must be >= 0, got {lookback_s}")
    es = epoch_seconds(ts_col)
    own = F.floor(es / F.lit(int(bucket_s))).cast("long")
    last = F.floor((es + F.lit(int(lookback_s))) / F.lit(int(bucket_s))).cast("long")
    replicated = df.withColumn(_B, F.explode(F.sequence(own, last)))
    out = compute(replicated, [*keys, _B])
    return out.filter(
        F.floor(epoch_seconds(ts_col) / F.lit(int(bucket_s))).cast("long") == F.col(_B)
    ).drop(_B)


def backfill_partitions(
    source: DataFrame,
    compute: ComputeFn,
    *,
    ts_col: str,
    keys: Sequence[str],
    bucket_s: int,
    lookback_s: int,
    out_path: str,
    start_s: int,
    end_s: int,
    resume: bool = True,
    partition_col: str = "bf_part",
) -> dict:
    """Driver-orchestrated backfill over ``[start_s, end_s)`` epoch seconds.

    One Spark job per bucket: reads ``[b*W - L, (b+1)*W)`` of the source
    (range predicate pushed to the scan — on a date-partitioned 100 TB
    source this prunes to one partition + margin), computes, keeps the
    bucket's own rows, writes them under ``partition_col=b`` with dynamic
    partition overwrite (idempotent per bucket; concurrent-safe across
    DISTINCT buckets). ``resume=True`` skips buckets whose output
    partition already exists, so a crashed run restarts where it stopped;
    pass ``resume=False`` to force-recompute (repair) every bucket in the
    range. Returns ``{"buckets_total", "computed", "skipped"}``.

    The resume check inspects the driver-local filesystem for an explicit
    per-bucket ``_bf_done_<b>`` marker the driver writes AFTER the
    bucket's write returns. A bare directory-exists check would be wrong
    in the crash-mid-job-commit window: task outputs move from
    ``_temporary`` into the partition dir one at a time (v1 committer;
    continuously under the v2 committer), so a partition dir can exist
    with a subset of its rows — the marker can't, because the driver only
    writes it once the write call has committed the whole bucket. Markers
    are driver-local files, so ``resume=True`` supports LOCAL ``out_path`` only —
    same contract as ``FeatureStore.compact``'s parquet fallback. Remote
    paths (``hdfs://``, ``s3a://``) must pass ``resume=False`` (each
    bucket's dynamic-partition overwrite is idempotent, so a re-run is
    always safe, just not incremental) or orchestrate resume externally.
    """
    if end_s <= start_s:
        raise ValueError(f"empty backfill range [{start_s}, {end_s})")
    if bucket_s < 1:
        raise ValueError(f"bucket_s must be >= 1, got {bucket_s}")
    if lookback_s < 0:
        raise ValueError(f"lookback_s must be >= 0, got {lookback_s}")
    loc = out_path.removeprefix("file:")
    if resume and ":" in loc.split("/", 1)[0]:
        raise NotImplementedError(
            f"resume=True needs a local out_path (got {out_path!r}): the "
            "skip check is a driver-local directory probe — pass "
            "resume=False (idempotent re-run) for remote storage"
        )
    spark = source.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    b_lo = start_s // bucket_s
    b_hi = (end_s - 1) // bucket_s
    computed = skipped = 0
    try:
        for b in range(b_lo, b_hi + 1):
            marker = os.path.join(
                out_path.removeprefix("file:"), f"_bf_done_{b}"
            )
            if resume and os.path.exists(marker):
                skipped += 1
                continue
            es = epoch_seconds(ts_col)
            lo = b * bucket_s - lookback_s
            hi = (b + 1) * bucket_s
            sl = source.filter((es >= F.lit(lo)) & (es < F.lit(hi)))
            out = compute(sl, list(keys)).filter(
                F.floor(epoch_seconds(ts_col) / F.lit(int(bucket_s))).cast("long")
                == F.lit(b)
            )
            (
                out.withColumn(partition_col, F.lit(b))
                .write.mode("overwrite")
                .partitionBy(partition_col)
                .parquet(out_path)
            )
            # marker AFTER the write returns: the commit is complete, so
            # a crash before this line re-computes the bucket (idempotent
            # dynamic overwrite), never skips a partial one. Leading "_"
            # keeps Spark readers from listing it as data.
            with open(marker, "w") as mf:
                mf.write("")
            computed += 1
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {
        "buckets_total": b_hi - b_lo + 1,
        "computed": computed,
        "skipped": skipped,
    }


def entity_backfill(
    df: DataFrame,
    compute: ComputeFn,
    *,
    ts_col: str,
    keys: Sequence[str],
    start_s: int,
    end_s: int,
) -> DataFrame:
    """Entity-complete backfill: recompute every entity TOUCHED by the
    range — the natural unit when features have UNBOUNDED lookback within
    an entity but none across entities (lag / ffill / session / running
    aggregates over a conversation: exactly the FeatureModel window
    block), where :func:`bounded_backfill`'s fixed time margin cannot
    apply. Conversations are short-lived relative to a backfill window,
    so "entities with >= 1 row in the range" reads only slightly more
    than the range itself.

    One distinct over ``keys`` (rows in range only) + one semi join
    brings in the touched entities' FULL history; the caller's compute
    then runs with its normal keys. Output = ALL rows of touched
    entities, recomputed — identical to what the one-shot whole-table
    compute yields for those entities (entity-scoped computes see the
    same complete per-entity row set either way). Rows with NULL
    timestamps never select an entity (range predicate), but a touched
    entity's NULL-ts rows do flow into compute with their entity. The
    semi join is NULL-SAFE per key: a NULL entity key is one entity here
    exactly as ``Window.partitionBy`` groups it in the one-shot compute —
    a plain column-list join would silently never match it and leave
    NULL-key rows permanently stale after a repair backfill.
    """
    if end_s <= start_s:
        raise ValueError(f"empty backfill range [{start_s}, {end_s})")
    es = epoch_seconds(ts_col)
    left = df.alias("__eb_l")
    touched = (
        df.filter((es >= F.lit(int(start_s))) & (es < F.lit(int(end_s))))
        .select(*keys)
        .distinct()
        .alias("__eb_t")
    )
    cond = None
    for k in keys:
        esc = str(k).replace("`", "``")
        eq = F.col(f"__eb_l.`{esc}`").eqNullSafe(F.col(f"__eb_t.`{esc}`"))
        cond = eq if cond is None else (cond & eq)
    sl = left.join(touched, cond, "leftsemi")
    return compute(sl, list(keys))


def read_backfill(spark: SparkSession, out_path: str) -> DataFrame:
    """Read an orchestrated backfill's output (all partitions)."""
    return spark.read.parquet(out_path)
