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
