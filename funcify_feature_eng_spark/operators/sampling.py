"""Deterministic splitting & sampling for training-data pipelines.

Train/val/test assignment and subsampling at 100 TB must be (a) stable
across reruns and cluster layouts, (b) a pure map over the id — never a
global shuffle or a random() that changes per task retry. Both operators key
on a 64-bit content hash of the id (xxhash64, same family the dedup
fingerprints use): bucket = pmod(xxhash64(id), resolution).

``bucket_expr(..., hash=False)`` switches to plain ``pmod(id, resolution)``
for cross-engine oracle checks (modulo is SQL-universal; the hash variant is
what production uses and is covered by tests/fixtures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_expr(id_col: str | Column, resolution: int = 10_000, hash: bool = True) -> Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.xxhash64(c) if hash else c
    return F.pmod(key, F.lit(resolution))


def assign_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    out_col: str = "split",
    resolution: int = 10_000,
    hash: bool = True,
) -> DataFrame:
    """Stable split assignment: id → bucket → first split whose cumulative
    weight covers the bucket. Weights must sum to 1 (±1e-9)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = bucket_expr(id_col, resolution, hash)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cond = b < int(round(acc * resolution))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    resolution: int = 10_000,
    hash: bool = True,
) -> DataFrame:
    """Keep ~fraction of rows, stably (same ids every run, layout-independent
    — unlike ``df.sample`` whose output depends on partitioning)."""
    return df.filter(bucket_expr(id_col, resolution, hash) < int(round(fraction * resolution)))


def quota_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n_per_group: int,
    hash: bool = True,
) -> DataFrame:
    """Per-group quota sampling — the corpus-mixing primitive: keep at most
    ``n_per_group`` rows of each group (domain, language, source), chosen in
    a deterministic pseudo-random order so reruns and layout changes keep
    the SAME rows and no group dominates the mix.

    Order key is ``xxhash64(id)`` (production) or Knuth multiplicative
    hashing ``((id mod 2^31) * 2654435761) mod 2^32`` (``hash=False`` — the
    inner mod keeps the product below 2^63 so the arithmetic is exact (and
    ANSI-safe) in any engine's BIGINT for ALL 64-bit ids; used by
    cross-engine oracle checks, same convention as ``bucket_expr``). One
    shuffle on the
    group key + a per-group sort bounded by group size; at web scale groups
    are domains (thousands) over billions of rows — if a single group is
    shuffle-hot, pre-filter with ``deterministic_sample`` to an upper bound
    first, then apply the exact quota.
    """
    from pyspark.sql import Window

    c = F.col(id_col)
    key = (
        F.xxhash64(c)
        if hash
        else F.pmod(F.pmod(c, F.lit(2147483648)) * F.lit(2654435761), F.lit(4294967296))
    )
    w = Window.partitionBy(group_col).orderBy(key.asc(), c.asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )
