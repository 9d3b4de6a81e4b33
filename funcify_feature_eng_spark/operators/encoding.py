"""Leakage-free categorical target encoding.

Target encoding replaces a categorical value with a statistic of the target
over *other* rows of the same category. Done naively (a global per-category
mean) it leaks the row's own target and, worse, leaks the FUTURE into the
past — the classic train-time/serve-time skew the reference's point-in-time
store exists to prevent (``schema/tracking/TrackableValue.kt:147-155``:
a tracked value is only visible at timestamps >= when it was calculated).

`cumulative_target_encode` is the streaming-consistent formulation: for each
row, the encoding uses ONLY rows of the same category that are strictly
earlier in the (order)-total-order — exactly what an online system that
updates per-category counters as events arrive would have seen. Computed as
one window pass (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING) per category:
one shuffle on the category key, fully JVM-side, no Python.

Smoothing is additive (m pseudo-observations of a fixed prior), kept on an
integer grid so the result is bit-identical across engines: with integer
target values ``t`` (e.g. a micro-unit fixed-point target),

    enc = (sum_prior(t) + m * prior) DIV (count_prior + m)

never leaves BIGINT arithmetic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cumulative_target_encode(
    df: DataFrame,
    *,
    category_col: str,
    target_col: Column | str,
    order: Sequence[str],
    smoothing_m: int = 10,
    prior: int = 0,
    out_col: str = "target_enc",
) -> DataFrame:
    """Attach the strictly-prior smoothed per-category target mean.

    ``target_col`` must be integral (cast your target onto a fixed-point
    grid first); ``order`` must be a total order (include a unique
    tie-break column) so the "strictly prior" set is deterministic under
    any shuffle layout. Also emits ``{out}_cnt`` / ``{out}_sum`` so
    downstream consumers can re-smooth without a second pass.

    The integer division truncates toward zero; with a non-negative target
    and prior that is floor division, and both Spark's ``DIV`` and
    DuckDB's ``//`` agree on it — the cross-engine-exactness contract used
    throughout the gate.
    """
    tgt = F.col(target_col) if isinstance(target_col, str) else target_col
    w = (
        Window.partitionBy(category_col)
        .orderBy(*[F.col(c).asc() for c in order])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cnt = F.count("__t").over(w).cast("long")
    ssum = F.coalesce(F.sum("__t").over(w), F.lit(0)).cast("long")
    # BIGINT literals (L suffix): under ANSI mode m * prior would otherwise
    # be planned as INT * INT and overflow at ~2^31
    enc = F.expr(
        f"(`{out_col}_sum` + {int(smoothing_m)}L * {int(prior)}L)"
        f" div (`{out_col}_cnt` + {int(smoothing_m)}L)"
    )
    return (
        df.withColumn("__t", tgt)
        .withColumn(f"{out_col}_cnt", cnt)
        .withColumn(f"{out_col}_sum", ssum)
        .withColumn(out_col, enc.cast("long"))
        .drop("__t")
    )
