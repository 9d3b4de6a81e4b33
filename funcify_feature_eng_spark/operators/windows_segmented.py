"""Segmented (skew-proof) windowed turn features for hot entities.

``Window.partitionBy(conv_id)`` puts an entire conversation in one task — a
10^7-turn conversation breaks that at 100 TB. This module computes the same
turn features partitioned by ``(conv_id, time_bucket)`` plus a tiny
bucket-level prefix pass, so no task ever holds more than one bucket of one
conversation:

1. local pass: per (entity, bucket) compute lag/ffill/gap/session-boundary
   with a window over the bucket only;
2. bucket summary: per (entity, bucket) aggregate last-row state (last ts,
   last role, last non-null tool, boundary count, row count) — ~1 row per
   bucket;
3. prefix pass: window over buckets per entity (orders of magnitude smaller)
   forward-fills carry-in state and prefix-sums counts;
4. stitch: join carry-in back on (entity, bucket) and patch each bucket's
   FIRST rows (the only rows whose local values are wrong).

Exactness: within a bucket the local window is exact; only values that look
across the bucket boundary (first-row lag/gap, ffill before the first
non-null, session/row-number offsets) need the carry — and those are exact
prefix aggregates. This is the same decomposition as
``asof.segmented`` (classic parallel-prefix / segmented-scan construction).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_B = "__seg_bucket"


def turn_features_segmented(
    df: DataFrame,
    *,
    keys: Sequence[str] = ("conv_id",),
    order: Sequence[str] = ("turn_idx", "ts"),
    ts_col: str = "ts",
    role_col: str = "role",
    tool_col: str = "tool",
    text_col: str | None = "text",
    gap_threshold_s: float = 1800.0,
    bucket_rows: int | None = None,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Same output as ``windows.turn_features`` (prior_role, prior_tool,
    gap_secs, session_id, turn_len), safe for arbitrarily hot entities.

    Buckets are time-ranges (``bucket_seconds``); pass ``bucket_rows`` to
    bucket by row index instead when the entity has a known dense index
    (uses ``order[0]`` — e.g. turn_idx — divided by bucket_rows).

    PRECONDITION for time bucketing: ``ts_col`` must be non-decreasing in
    the ``order`` sort within each entity (the transcript ingest contract —
    turn index and wall clock agree). A row whose turn index is later but
    timestamp earlier would land in an earlier bucket and be stitched out
    of turn order. When the two can disagree, use ``bucket_rows`` (bucketing
    on the order column itself), which needs no such assumption.
    """
    keys = list(keys)
    if bucket_rows is not None:
        bucket = (F.col(order[0]) / F.lit(bucket_rows)).cast("long")
    else:
        bucket = F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp")) / F.lit(bucket_seconds))
    d = df.withColumn(_B, bucket)

    # ---- pass 1: local (entity, bucket) window -------------------------
    wloc = Window.partitionBy(*keys, _B).orderBy(*[F.col(c).asc() for c in order])
    wloc_prec = wloc.rowsBetween(Window.unboundedPreceding, 0)
    cur_ts = F.col(ts_col).cast("timestamp")
    d = (
        d.withColumn("__loc_prior_role", F.lag(role_col, 1).over(wloc))
        .withColumn(
            "__loc_prior_tool",
            F.last(tool_col, ignorenulls=True).over(
                wloc.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .withColumn("__loc_prev_ts", F.lag(cur_ts, 1).over(wloc))
        .withColumn("__rn", F.row_number().over(wloc))
    )
    d = d.withColumn(
        "gap_secs_loc",
        (F.unix_micros(cur_ts) - F.unix_micros(F.col("__loc_prev_ts"))) / F.lit(1000000.0),
    )

    # ---- pass 2: bucket summaries (tiny) --------------------------------
    ordk = F.struct(*[F.col(c) for c in order])
    summaries = d.groupBy(*keys, _B).agg(
        F.max_by(F.col(role_col), ordk).alias("__last_role"),
        F.max_by(cur_ts, ordk).alias("__last_ts"),
        F.max_by(
            F.struct(F.col(tool_col).isNotNull().alias("nn"), *[F.col(c) for c in order],
                     F.col(tool_col).alias("t")),
            F.struct(F.col(tool_col).isNotNull().alias("nn"), *[F.col(c) for c in order]),
        ).alias("__last_tool_s"),
        F.count(F.lit(1)).alias("__n_rows"),
    )
    summaries = summaries.withColumn(
        "__last_tool", F.when(F.col("__last_tool_s.nn"), F.col("__last_tool_s.t"))
    ).drop("__last_tool_s")

    # ---- pass 3: prefix over buckets per entity --------------------------
    wb = Window.partitionBy(*keys).orderBy(F.col(_B).asc())
    wb_prec = wb.rowsBetween(Window.unboundedPreceding, -1)
    carry = (
        summaries.withColumn("__carry_role", F.lag("__last_role", 1).over(wb))
        .withColumn("__carry_ts", F.lag("__last_ts", 1).over(wb))
        .withColumn(
            "__carry_tool", F.last("__last_tool", ignorenulls=True).over(wb_prec)
        )
        .withColumn("__rows_before", F.coalesce(F.sum("__n_rows").over(wb_prec), F.lit(0)))
    )

    # carried gap/boundary for each bucket's first row needs the carry ts;
    # session offset needs the count of boundaries in earlier buckets, which
    # itself depends on carried gaps — compute boundary counts bucket-locally
    # WITH the carried first-gap, then prefix-sum those counts.
    first_rows = d.filter(F.col("__rn") == 1).select(
        *keys, _B, *[F.col(c).alias(f"__f_{c}") for c in order], cur_ts.alias("__first_ts")
    )
    carry2 = carry.join(first_rows, on=[*keys, _B], how="left").withColumn(
        "__first_gap",
        (F.unix_micros(F.col("__first_ts")) - F.unix_micros(F.col("__carry_ts")))
        / F.lit(1000000.0),
    )

    # local boundary count per bucket (excluding the first row's boundary)
    local_bounds = d.groupBy(*keys, _B).agg(
        F.sum(
            F.when(F.col("gap_secs_loc") > gap_threshold_s, 1).otherwise(0)
        ).alias("__local_bounds")
    )
    carry3 = (
        carry2.join(local_bounds, on=[*keys, _B], how="left")
        .withColumn(
            "__bucket_bounds",
            F.col("__local_bounds")
            + F.when(F.col("__first_gap") > gap_threshold_s, 1).otherwise(0),
        )
        .withColumn(
            "__sess_offset",
            F.coalesce(F.sum("__bucket_bounds").over(wb_prec), F.lit(0)),
        )
        .select(
            *keys, _B, "__carry_role", "__carry_ts", "__carry_tool",
            "__rows_before", "__sess_offset",
        )
    )

    # ---- pass 4: stitch ---------------------------------------------------
    out = d.join(carry3, on=[*keys, _B], how="left")
    is_first = F.col("__rn") == 1
    gap = F.when(
        is_first,
        (F.unix_micros(cur_ts) - F.unix_micros(F.col("__carry_ts"))) / F.lit(1000000.0),
    ).otherwise(F.col("gap_secs_loc"))
    out = (
        out.withColumn(
            "prior_role",
            F.when(is_first, F.col("__carry_role")).otherwise(F.col("__loc_prior_role")),
        )
        .withColumn(
            "prior_tool",
            F.coalesce(
                F.when(is_first, F.col("__carry_tool")).otherwise(
                    F.coalesce(F.col("__loc_prior_tool"), F.col("__carry_tool"))
                ),
            ),
        )
        .withColumn("gap_secs", gap)
    )
    # session id: local cumulative boundaries (with the first row's carried
    # gap) + offset from earlier buckets
    wloc_cum = Window.partitionBy(*keys, _B).orderBy(
        *[F.col(c).asc() for c in order]
    ).rowsBetween(Window.unboundedPreceding, 0)
    out = out.withColumn(
        "session_id",
        (
            F.sum(F.when(F.col("gap_secs") > gap_threshold_s, 1).otherwise(0)).over(wloc_cum)
            + F.col("__sess_offset")
        ).cast("int"),
    )
    if text_col:
        out = out.withColumn("turn_len", F.length(F.col(text_col)))
    drop = [c for c in out.columns if c.startswith("__") or c == "gap_secs_loc"]
    return out.drop(*drop)
