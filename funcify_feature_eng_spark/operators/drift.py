"""Distribution-drift report between two time slices of a feature.

Training pipelines re-materialize features continuously; a feature whose
distribution moves between the reference window and the current window is
the #1 silent-failure signal (schema stays identical, values rot). This is
the monitoring counterpart of the reference's per-feature tracking metadata
(``schema/tracking/TrackableValue.kt`` — calculated/tracked timestamps):
the store says WHEN a value was computed, the drift report says whether the
population it came from still looks like the one the model trained on.

Metric: total variation distance over a fixed histogram,
``TVD = 1/2 * sum_b |p_ref(b) - p_cur(b)|``. TVD is chosen over PSI/KL
deliberately: it needs no logarithm, so the whole computation stays in
integer arithmetic (cross-engine bit-exact, the gate contract) and is
defined even for empty buckets.

Plan shape: one map stage (side tag + bucket), one groupBy on bucket
(combinable partial aggregates), then a single-partition window over
``n_bins`` rows (constant-size by construction — n_bins is a config
knob, never data-sized). BIGINT products bound the input to ~2^31 rows
per side * counts; for 10^12-row sides move the two final products to
DECIMAL(38,0) — the call shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def drift_report(
    df: DataFrame,
    *,
    value_col: str | Column,
    ts_col: str,
    n_bins: int,
    bin_width: float,
    split_us: int | None = None,
) -> DataFrame:
    """Histogram both halves of ``df`` (split at ``split_us`` epoch-micros,
    default the integer midpoint of the observed time range) and attach the
    global drift score.

    Output: one row per non-empty bucket —
    ``(bucket, cnt_ref, cnt_cur, n_ref, n_cur, tvd_e6)`` with ``tvd_e6``
    the floor of 1e6·TVD, identical on every row. Values are assumed
    non-negative; the last bucket absorbs the right tail.
    """
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = df.select(val.alias("__v"), us.alias("__us"))

    if split_us is None:
        lo, hi = base.agg(F.min("__us"), F.max("__us")).first()
        if lo is None:
            raise ValueError(
                "drift_report: no rows with a non-NULL timestamp — pass an "
                "explicit split_us or fix the event-time column"
            )
        split_us = (int(lo) + int(hi)) // 2

    bucket = F.least(
        F.lit(int(n_bins) - 1), F.floor(F.col("__v") / F.lit(float(bin_width)))
    ).cast("int")
    is_ref = (F.col("__us") <= F.lit(int(split_us))).cast("long")
    # NULL values are excluded (matching histogram_counts): F.least skips
    # NULL operands, so without this filter a NULL __v would silently land
    # in the tail bucket and inflate it on both sides
    counts = (
        base.filter(F.col("__v").isNotNull())
        .select(bucket.alias("bucket"), is_ref.alias("__r"))
        .groupBy("bucket")
        .agg(
            F.sum("__r").cast("long").alias("cnt_ref"),
            F.sum(F.lit(1) - F.col("__r")).cast("long").alias("cnt_cur"),
        )
    )
    # n_bins rows total: a single-partition window here is O(n_bins), not
    # O(data) — the shuffle above already reduced to bucket grain
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out = (
        counts.withColumn("n_ref", F.sum("cnt_ref").over(w).cast("long"))
        .withColumn("n_cur", F.sum("cnt_cur").over(w).cast("long"))
        .withColumn(
            "__num",
            F.sum(
                F.abs(F.col("cnt_ref") * F.col("n_cur") - F.col("cnt_cur") * F.col("n_ref"))
            ).over(w),
        )
        .withColumn(
            "tvd_e6", F.expr("(__num * 1000000L) div (2L * n_ref * n_cur)").cast("long")
        )
    )
    return out.select("bucket", "cnt_ref", "cnt_cur", "n_ref", "n_cur", "tvd_e6")
