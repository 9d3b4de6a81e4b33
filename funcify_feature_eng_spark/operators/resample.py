"""Per-entity regular-time-grid resampling (as-of alignment to a clock).

Irregular event streams (turns, telemetry) feed models that want a value
per entity per fixed interval — "the state at every hour mark". This is
the reference's point-in-time read (``TrackableValue.valueAtTimestamp``,
``schema/tracking/TrackableValue.kt:147-155``) evaluated at every tick of
a synthetic clock instead of at request timestamps.

Plan shape (all JVM-side, scale-safe):

1. one groupBy per entity for its [first, last] tick bounds;
2. ``sequence`` + ``explode`` to manufacture the grid — map-side, no
   shuffle; grid cardinality per entity = span/step, so choose ``step_s``
   to bound it (the caller knows the retention window);
3. events reduced to one row per (entity, second) with ``max_by``
   latest-wins (makes the as-of tie-deterministic AND shrinks the right
   side before the join);
4. the engine's own :func:`asof_join` aligns each tick to the latest
   state at-or-before it — same operator, same strategies, same skew
   handling as request-time reads.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .asof import asof_join


def resample_to_grid(
    df: DataFrame,
    *,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tie_col: str,
    step_s: int,
    out_value: str = "value_at_tick",
    strategy: str = "union_window",
) -> DataFrame:
    """One row per entity per ``step_s``-second tick spanning the entity's
    observed lifetime, carrying the latest ``value_col`` at-or-before the
    tick (NULL before the first observation — the leading grid point of an
    entity whose first event falls mid-interval has no prior state, and
    inventing one would be leakage).

    ``tie_col`` must be unique within (keys, second) — latest-wins is
    resolved by ``max_by(value, tie_col)``, deterministic under any layout.
    Output grain: ``keys + [tick_es]`` (epoch seconds, long).
    """
    es = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1000000)).cast("long")
    base = df.withColumn("__es", es)

    step = int(step_s)
    latest = base.groupBy(*keys, "__es").agg(
        F.expr(f"max_by(`{value_col}`, `{tie_col}`)").alias("__v")
    )
    # bounds derive from the reduced per-second frame, not the base table:
    # one scan of the input instead of two, and the bounds shuffle reads
    # |distinct (keys, second)| rows instead of |rows|
    bounds = latest.groupBy(*keys).agg(
        F.floor(F.min("__es") / step).cast("long").alias("__g0"),
        F.floor(F.max("__es") / step).cast("long").alias("__g1"),
    )
    grid = bounds.select(
        *keys, F.explode(F.sequence("__g0", "__g1")).alias("__gi")
    ).select(*keys, (F.col("__gi") * F.lit(step)).cast("long").alias("tick_es"))
    return asof_join(
        grid,
        latest,
        on=list(keys),
        left_ts="tick_es",
        right_ts="__es",
        value_cols={"__v": out_value},
        strategy=strategy,
    )
