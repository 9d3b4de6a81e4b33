"""Validity-interval (range) join: fact rows against interval-keyed state.

The reference's temporal alignment is point-in-time ("latest prior state",
``funcify-feature-eng``'s @lastUpdated lookup — our ``operators/asof.py``).
Its natural sibling, which the reference leaves to the caller, is the
*containment* lookup: attach every interval whose ``[start, end)`` span
covers the fact row's timestamp (SCD-2 dimension epochs, campaign/context
windows, maintenance periods). Spark has no native range join — a raw
``ts >= start AND ts < end`` condition plans as BroadcastNestedLoopJoin
(O(n·m) pairs even with an equi-key, when the key is skewed or absent).

Two explicit strategies, value-identical (pinned by tests):

``broadcast``
    Equi-join on the entity key with the containment filter applied post
    join; right side broadcast. Right for a small interval table (the
    common dimension-epoch case). With the equi-key this is a
    BroadcastHashJoin — the nested loop never appears.

``bucket`` (the 100 TB path)
    Time is cut into fixed-width buckets; each interval explodes to the
    buckets it touches (``sequence`` on epoch-floored longs), each fact row
    computes its single bucket, and the join becomes a pure equi-join on
    ``(key, bucket)`` — ONE shuffle per side, partial pruning for free,
    AQE-skew-splittable. The exact containment filter runs after the hash
    join. A (fact, interval) pair survives exactly once: the fact's single
    bucket either is or is not among the interval's exploded buckets, and
    those are distinct per interval. Pick ``bucket_s`` at or above the
    typical interval length — each interval produces
    ``span/bucket_s + 1`` rows, so a too-fine grid multiplies the right
    side (that amplification is the entire cost model; there is no
    quadratic term anywhere).

Containment is half-open ``start <= ts < end`` (the SCD-2 convention:
adjacent epochs share a boundary instant without double-matching).
Intervals with ``end <= start`` are empty under half-open semantics and are
dropped up front — this also keeps ``sequence`` from generating a
descending bucket range.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _us(col: str) -> Column:
    """Epoch-micros of a timestamp column; TIMESTAMP_NTZ inputs (the parquet
    testdata's type) are cast first — applied to BOTH sides of every
    comparison, so the session-timezone offset cancels."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def interval_join(
    fact: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    start: str = "valid_from",
    end: str = "valid_to",
    how: str = "inner",
    strategy: str = "bucket",
    bucket_s: int = 3600,
) -> DataFrame:
    """Attach every interval row whose ``[start, end)`` contains ``fact.ts``.

    Output = fact columns + the interval's non-key payload columns (callers
    select/rename payload before the call as usual). ``how`` is ``inner``
    (facts covered by no interval drop) or ``left`` (they survive with NULL
    payload). Multi-match fans out — one output row per covering interval.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join: how must be inner|left, got {how!r}")
    if strategy not in ("broadcast", "bucket"):
        raise ValueError(
            f"interval_join: strategy must be broadcast|bucket, got {strategy!r}"
        )
    right = intervals.filter(F.col(end) > F.col(start))
    # compare in epoch-micros so NTZ facts join TZ intervals (or vice versa)
    # without relying on Spark's implicit coercion
    contains = (_us(ts) >= _us(start)) & (_us(ts) < _us(end))

    if strategy == "broadcast":
        joined = fact.join(F.broadcast(right), on=keys, how="inner").filter(contains)
    else:
        w_us = int(bucket_s) * 1_000_000
        # end is exclusive: an interval ending exactly on a bucket boundary
        # never covers a ts in that next bucket, so floor((end-1µs)/W) is the
        # last bucket it can match in
        right_b = right.withColumn(
            "__ij_bucket",
            F.explode(
                F.sequence(
                    F.floor(_us(start) / F.lit(w_us)),
                    F.floor((_us(end) - F.lit(1)) / F.lit(w_us)),
                )
            ),
        )
        fact_b = fact.withColumn(
            "__ij_bucket", F.floor(_us(ts) / F.lit(w_us))
        )
        joined = (
            fact_b.join(right_b, on=keys + ["__ij_bucket"], how="inner")
            .filter(contains)
            .drop("__ij_bucket")
        )

    if how == "inner":
        return joined
    # left: re-attach uncovered facts with NULL payload via the matched set —
    # a second pass over `joined` (cheap: it is the already-joined frame),
    # never a second interval join
    payload = [c for c in intervals.columns if c not in keys]
    matched_ids = joined.select(*fact.columns).distinct()
    unmatched = fact.join(matched_ids, on=fact.columns, how="left_anti")
    for c in payload:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    return joined.unionByName(unmatched)


def session_windows(
    events: DataFrame,
    on: str | list[str],
    ts: str = "ts",
    session_col: str = "session_id",
    margin_s: int = 0,
) -> DataFrame:
    """Per-(key, session) context windows: ``[min ts − margin, max ts +
    margin)`` — the transcript-shaped interval source (sessionize first via
    ``operators.windows.session_id``). With ``margin_s > 0`` adjacent
    windows can overlap, so the downstream :func:`interval_join` genuinely
    multi-matches (an event near a boundary belongs to both contexts)."""
    keys = [on] if isinstance(on, str) else list(on)
    m = F.lit(int(margin_s)).cast("long")
    return events.groupBy(*keys, session_col).agg(
        F.timestamp_micros(
            F.unix_micros(F.min(F.col(ts).cast("timestamp"))) - m * 1_000_000
        ).alias("valid_from"),
        F.timestamp_micros(
            F.unix_micros(F.max(F.col(ts).cast("timestamp"))) + m * 1_000_000
        ).alias("valid_to"),
    )
