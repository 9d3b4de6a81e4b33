"""Key-distribution profiling — the input to skew-handling decisions.

`choose_asof_strategy` (operators/asof.py) SAMPLES key frequencies to pick
broadcast/salted/segmented automatically; this module is the full-fidelity
offline counterpart: an exact top-k heavy-hitter report a pipeline owner
runs before pinning a partitioning strategy (north rule: "partitioning /
shuffle / skew handled explicitly").

Plan shape: one combinable groupBy on the key, a 1-row total aggregate
joined back by broadcast, and a TakeOrdered top-k — no full sort, no
single-partition window over the key space (which can be billions of rows
at 100 TB; the heavy-hitter report must not itself assume the key counts
fit anywhere).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_report(df: DataFrame, *, keys: Sequence[str], top_k: int = 10) -> DataFrame:
    """Exact top-``top_k`` heaviest key groups with their global share.

    Output: ``keys + (n_rows, total, share_e6)``; ties at the cut are
    broken by the key columns ascending, so the reported set is
    deterministic. ``share_e6`` is an integer floor (n*1e6 div total) —
    cross-engine exact.
    """
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").cast("long").alias("total"))
    top = counts.orderBy(
        F.col("n_rows").desc(), *[F.col(k).asc() for k in keys]
    ).limit(int(top_k))
    return top.crossJoin(F.broadcast(total)).select(
        *keys,
        "n_rows",
        "total",
        F.expr("(n_rows * 1000000L) div total").cast("long").alias("share_e6"),
    )


def seasonality_profile(
    df: DataFrame,
    ts_col: str,
    *,
    grain: str = "hour_of_day",
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Activity distribution over a repeating calendar grain — the "when
    does this key's traffic actually happen" profile behind load
    forecasting, anomaly baselines, and bot screens (a key whose
    hour-of-day index is flat is not a human). One row per
    (``group_by``..., ``slot``) with exact ``n``, ``n_total``, floor-ppm
    ``share_ppm``, and ``index_ppm`` = share relative to the uniform
    expectation ×1e6 (1_000_000 = exactly uniform; 2_000_000 = twice the
    uniform share) — integer arithmetic only.

    Grains: ``hour_of_day`` (0..23), ``dow`` (ISO 1=Mon..7=Sun),
    ``hour_of_week`` ((iso_dow-1)*24 + hour, 0..167). Slots with zero
    rows are absent (their share is 0 by construction).

    Scale: one slot-grain aggregate + a ≤168-rows-per-group window."""
    from pyspark.sql import Window

    ts = F.col(ts_col).cast("timestamp")
    dow = F.dayofweek(ts)  # Spark: 1=Sunday..7=Saturday
    iso_dow = F.when(dow == 1, F.lit(7)).otherwise(dow - 1)
    grains = {
        "hour_of_day": (F.hour(ts), 24),
        "dow": (iso_dow, 7),
        "hour_of_week": ((iso_dow - 1) * 24 + F.hour(ts), 168),
    }
    if grain not in grains:
        raise ValueError(f"seasonality_profile: unknown grain {grain!r}")
    slot, n_slots = grains[grain]
    keys = list(group_by)
    counted = (
        df.filter(F.col(ts_col).isNotNull())
        .select(*keys, slot.cast("int").alias("slot"))
        .groupBy(*keys, "slot")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wn = Window.partitionBy(*[F.col(k) for k in keys])
    total = F.sum("n").over(wn).cast("decimal(38,0)")
    num = F.col("n").cast("decimal(38,0)") * F.lit(1_000_000)
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    return (
        counted.withColumn("n_total", total.cast("bigint"))
        .withColumn("share_ppm", exact_floor_div(num, total).cast("bigint"))
        .withColumn(
            "index_ppm",
            exact_floor_div(num * F.lit(n_slots), total).cast("bigint"),
        )
    )
