"""Recency-weighted (exponentially decayed) rollups, exactly.

"How much has this entity done LATELY" is the workhorse online feature —
a counter that halves every H seconds, so last week's click outweighs
last month's. The float formulation (``sum(x * exp(-λΔt))``) is
partition-order nondeterministic and never reproduces across engines;
this operator keeps the repo's exactness contract by quantizing the
decay to half-life BUCKETS:

    k      = floor((ref_ts - ts) / halflife_s)     (integer buckets)
    weight = 2^(max_pow - k)                       (integer, 0 if k > max_pow)
    decayed_q = sum(x * weight)                    (exact, DECIMAL(38))

i.e. weights on a fixed-point grid of 2^-max_pow: a row one half-life
old weighs exactly half a fresh row, rows older than max_pow half-lives
weigh exactly 0 (a documented truncation: 2^-40 is below any feature's
signal floor). Integer sums are associative, so the aggregate is
map-side combinable AND mergeable across shards/batches by addition —
the same property the sketches family builds on.

Temporal hygiene: rows with ts > ref_ts are EXCLUDED (strictly "as of
ref_ts" — the leakage rule every other temporal operator here follows),
not clamped to full weight.

Scale: ONE aggregate onto entity-grain rows, map-side combined; nothing
data-sized shuffles. The double convenience columns divide the exact
integer sums by 2^max_pow — exact-integer → double conversion and
power-of-two division are correctly rounded, so they too are
bit-identical cross-engine.

Reference parity anchor: the reference's @lastUpdated/point-in-time
machinery (schema/tracking/TrackableValue.kt) gives features a
timestamp; it has no recency-weighted aggregate — this extends the
temporal feature surface the north rule centers on.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "time_decay_agg",
    "decay_weight_q",
    "decay_state",
    "merge_decay_states",
    "decay_from_state",
]

_DEC = "decimal(38,0)"

_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def decay_weight_q(
    ts_col: str | Column,
    *,
    ref_ts: str,
    halflife_s: int,
    max_pow: int = 40,
) -> Column:
    """The integer decay weight 2^(max_pow - k) for one row (see module
    doc); 0 for rows older than max_pow half-lives, NULL for NULL ts and
    for rows AFTER ref_ts (future rows carry no defined weight —
    :func:`time_decay_agg` excludes them before aggregating).
    ``ref_ts`` is a plan-time timestamp literal string (``'YYYY-MM-DD
    HH:MM:SS'``) — the "as of" instant, NOT now(): determinism requires
    the caller to pin it."""
    if not (1 <= max_pow <= 62):
        raise ValueError(f"decay_weight_q: max_pow must be in [1, 62], got {max_pow}")
    if halflife_s < 1:
        raise ValueError(f"decay_weight_q: halflife_s must be >= 1, got {halflife_s}")
    ts = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    dt_us = F.unix_micros(F.lit(ref_ts).cast("timestamp")) - F.unix_micros(
        ts.cast("timestamp")
    )
    # exact floor division on longs: subtracting the remainder first makes
    # the numerator exactly divisible, so the intermediate double division
    # is exact (the raw floor(a/b) double route can misround at a bucket
    # boundary when a/b lands within one ulp of an integer)
    hl = F.lit(int(halflife_s) * 1_000_000)
    # LONG, not INT: an ancient row under a short half-life can push k past
    # 2^31, and an INT cast would wrap it negative — turning "weight 0"
    # into "weight NULL" silently
    k = ((dt_us - F.pmod(dt_us, hl)) / hl).cast("long")
    # weights as a PLAN-TIME literal array indexed by the bucket — integer
    # lookup, whole-stage codegen, no runtime shift/pow
    weights = F.array(
        *[F.lit(1 << (max_pow - i)).cast("long") for i in range(max_pow + 1)]
    )
    # element_at wants an INT index; safe here — this branch is only
    # reached for 0 <= k <= max_pow (<= 62)
    return F.when(ts.isNull() | (k < 0), F.lit(None).cast("long")).when(
        k > F.lit(int(max_pow)), F.lit(0).cast("long")
    ).otherwise(F.element_at(weights, (k + F.lit(1)).cast("int")))


def time_decay_agg(
    df: DataFrame,
    *,
    value_col: str,
    ts_col: str,
    keys: Sequence[str],
    ref_ts: str,
    halflife_s: int,
    max_pow: int = 40,
    out_prefix: str = "decayed",
) -> DataFrame:
    """Per-key recency-weighted rollup as of ``ref_ts`` (see module doc).

    Output per key: ``n_rows`` (rows contributing, i.e. ts <= ref_ts with
    non-NULL ts), ``{p}_sum_q`` = sum(x * w) and ``{p}_wsum_q`` = sum(w)
    on the 2^-max_pow grid (BIGINT — the caller bounds |x| * 2^max_pow *
    rows below 2^63; raise the half-life or lower max_pow otherwise;
    overflow raises under the widened-then-narrowed cast check), and the
    double conveniences ``{p}_sum`` / ``{p}_mean``. ``wsum_q`` is the
    decayed EVENT count (every row weighs in, value or not); the mean
    divides by the weight of non-NULL-value rows only — AVG semantics on
    the decayed grid, so NULL values neither drag the average toward 0
    nor inflate it. NULL timestamps are excluded entirely.

    Mergeable: states from disjoint shards/batches with the SAME ref_ts
    merge by adding n_rows/sum_q/wsum_q — the streaming-ledger pattern
    (cf. ``calibration_state``)."""
    state = decay_state(
        df, value_col=value_col, ts_col=ts_col, keys=keys, ref_ts=ref_ts,
        halflife_s=halflife_s, max_pow=max_pow,
    )
    return decay_from_state(state, keys=keys, max_pow=max_pow,
                            out_prefix=out_prefix)


def decay_state(
    df: DataFrame,
    *,
    value_col: str,
    ts_col: str,
    keys: Sequence[str],
    ref_ts: str,
    halflife_s: int,
    max_pow: int = 40,
) -> DataFrame:
    """The MERGEABLE per-key decay state: ``(keys..., n_rows, sum_q,
    wsum_q, vwsum_q)`` with the three sums kept in DECIMAL(38) so states
    merge by plain addition without overflow (:func:`merge_decay_states`)
    — the ledger pattern shared with ``calibration_state``/
    ``check_state``. ``vwsum_q`` is the weight restricted to
    non-NULL-value rows (what the decayed mean divides by). States are
    only meaningful under ONE shared (ref_ts, halflife_s, max_pow)."""
    t = df.schema[value_col].dataType.simpleString()
    if t not in _INTEGRAL:
        raise ValueError(
            f"time_decay_agg requires an integral value column (got "
            f"{value_col}: {t}): pre-scale onto a fixed-point grid"
        )
    v = F.col(value_col)
    ts = F.col(ts_col)
    w = decay_weight_q(ts, ref_ts=ref_ts, halflife_s=halflife_s, max_pow=max_pow)
    base = df.filter(
        ts.isNotNull() & (ts.cast("timestamp") <= F.lit(ref_ts).cast("timestamp"))
    ).select(*keys, v.alias("__v"), w.alias("__w"))
    return base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(
            F.sum(F.col("__v").cast(_DEC) * F.col("__w").cast(_DEC)),
            F.lit(0).cast(_DEC),
        ).alias("sum_q"),
        F.coalesce(F.sum(F.col("__w").cast(_DEC)), F.lit(0).cast(_DEC)).alias(
            "wsum_q"
        ),
        F.coalesce(
            F.sum(F.when(F.col("__v").isNotNull(), F.col("__w")).cast(_DEC)),
            F.lit(0).cast(_DEC),
        ).alias("vwsum_q"),
    )


def merge_decay_states(states: DataFrame, *, keys: Sequence[str]) -> DataFrame:
    """Merge decay states from disjoint shards/micro-batches (same
    ref_ts/halflife/max_pow) by addition — commutative and associative,
    so any merge order and any sharding give the identical state."""
    return states.groupBy(*keys).agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("sum_q").alias("sum_q"),
        F.sum("wsum_q").alias("wsum_q"),
        F.sum("vwsum_q").alias("vwsum_q"),
    )


def decay_from_state(
    state: DataFrame,
    *,
    keys: Sequence[str],
    max_pow: int = 40,
    out_prefix: str = "decayed",
) -> DataFrame:
    """Project a (possibly merged) decay state to the
    :func:`time_decay_agg` output shape. The DECIMAL(38) sums narrow to
    BIGINT under a loud guard — an out-of-contract corpus raises here,
    never emits a wrapped value."""
    p = out_prefix
    pow2 = float(2 ** max_pow)
    sum_q = F.coalesce(F.col("sum_q"), F.lit(0).cast(_DEC))
    over = (F.abs(sum_q) > F.lit(2 ** 63 - 1).cast(_DEC)) | (
        F.col("wsum_q") > F.lit(2 ** 63 - 1).cast(_DEC)
    )
    guard = F.assert_true(
        ~over,
        F.lit(
            "time_decay_agg: decayed sum exceeds BIGINT — lower max_pow or "
            "pre-scale the value grid down"
        ),
    )
    return (
        state.withColumn(
            f"{p}_sum_q",
            (sum_q + F.coalesce(guard.cast(_DEC), F.lit(0).cast(_DEC))).cast(
                "bigint"
            ),
        )
        .withColumn(f"{p}_wsum_q", F.col("wsum_q").cast("bigint"))
        .withColumn(f"{p}_sum", F.col(f"{p}_sum_q").cast("double") / F.lit(pow2))
        .withColumn(
            f"{p}_mean",
            F.when(
                F.col("vwsum_q") > 0,
                F.col(f"{p}_sum_q").cast("double")
                / F.col("vwsum_q").cast("double"),
            ),
        )
        .select(
            *keys, "n_rows", f"{p}_sum_q", f"{p}_wsum_q", f"{p}_sum",
            f"{p}_mean",
        )
    )
