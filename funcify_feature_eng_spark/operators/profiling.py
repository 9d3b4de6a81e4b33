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


def concentration_report(
    df: DataFrame,
    category_col: str,
    *,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Categorical concentration / diversity in one aggregate — the
    "is this corpus dominated by one source" diagnostic behind mixture
    budgeting and dedup triage. Per group: exact ``n_rows``,
    ``n_categories``, ``top_share_ppm`` (largest category's floor-ppm
    share), ``hhi_ppm`` = Σ share² ×1e6 (Herfindahl-Hirschman, 1e6 =
    monopoly) and ``simpson_d_ppm`` = unbiased Simpson diversity
    Σ nᵢ(nᵢ-1) / (N(N-1)) ×1e6 (probability two draws WITHOUT
    replacement collide; 0 = all distinct) — all integer arithmetic:
    hhi = floor(Σ nᵢ² ·1e6 / N²), no float share ever squared.

    NULL categories count as their own category (missingness
    concentrates too).

    Scale: one category-grain count + one group-grain fold — the output
    is groups-sized."""
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    keys = list(group_by)
    dec = "decimal(38,0)"
    per_cat = df.groupBy(
        *keys, F.col(category_col).alias("__cat")
    ).agg(F.count(F.lit(1)).cast("long").alias("__n"))
    nd = F.col("__n").cast(dec)
    g = per_cat.groupBy(*keys).agg(
        F.sum("__n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_categories"),
        F.max("__n").cast(dec).alias("__top"),
        F.sum(nd * nd).cast(dec).alias("__sq"),
        F.sum(nd * (nd - F.lit(1))).cast(dec).alias("__coll"),
    )
    n = F.col("n_rows").cast(dec)
    ppm = F.lit(1_000_000)
    return g.select(
        *keys,
        "n_rows",
        "n_categories",
        exact_floor_div(F.col("__top") * ppm, n).cast("bigint").alias(
            "top_share_ppm"
        ),
        exact_floor_div(F.col("__sq") * ppm, n * n).cast("bigint").alias(
            "hhi_ppm"
        ),
        F.when(
            F.col("n_rows") > 1,
            exact_floor_div(F.col("__coll") * ppm, n * (n - F.lit(1))),
        ).cast("bigint").alias("simpson_d_ppm"),
    )


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    *,
    scale: int = 2,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Exact Gini inequality coefficient per group over a non-negative
    numeric column — "how unevenly is volume / spend / token mass
    distributed across rows". Sort formula on the 10^-scale integer
    grid: with x_(1) <= ... <= x_(n),
    ``G = (2·Σ i·x_(i) − (n+1)·Σ x) / (n·Σ x)``, emitted as floor-ppm
    ``gini_ppm`` (0 = perfectly equal, → 1e6·(n-1)/n as one row holds
    everything). Tie runs contribute x·Σi regardless of intra-tie
    order, so row_number's arbitrary tie placement cannot change the
    value — deterministic without a tiebreak column. NULLs are
    excluded; groups with Σ x = 0 emit NULL.

    Scale: ONE rank-sort Exchange per group + one fold; DECIMAL(38)
    sums keep i·x exact past 10^12-row groups."""
    if scale < 0:
        raise ValueError(f"gini_coefficient: scale must be >= 0, got {scale}")
    from pyspark.sql import Window

    from funcify_feature_eng_spark.operators.util import exact_floor_div

    dec = "decimal(38,0)"
    units = (
        F.col(value_col).cast(f"decimal(28,{scale})") * F.lit(10**scale)
    ).cast(dec)
    keys = [F.col(k) for k in group_by]
    w = Window.partitionBy(*keys).orderBy(F.col("__u").asc())
    nn = df.filter(F.col(value_col).isNotNull()).select(
        *group_by, units.alias("__u")
    )
    ranked = nn.withColumn("__i", F.row_number().over(w).cast(dec))
    g = ranked.groupBy(*group_by).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.sum("__u").cast(dec).alias("__s1"),
        F.sum(F.col("__i") * F.col("__u")).cast(dec).alias("__s2"),
    )
    n = F.col("n_values").cast(dec)
    num = F.lit(2) * F.col("__s2") - (n + F.lit(1)) * F.col("__s1")
    den = n * F.col("__s1")
    return g.select(
        *group_by,
        "n_values",
        F.when(
            F.col("__s1") > 0,
            exact_floor_div(num * F.lit(1_000_000), den),
        ).cast("bigint").alias("gini_ppm"),
    )
