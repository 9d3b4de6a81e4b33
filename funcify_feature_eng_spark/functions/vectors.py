"""Embedding-vector functions over ``array<float>`` columns.

Pure higher-order Column expressions — ``zip_with`` + ``aggregate`` keep the
dot products JVM-side; no Python in the hot path. Double precision is forced
before arithmetic so results are reproducible and comparable against
double-based oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_raw(a: Column, b: Column) -> Column:
    """Dot product of two ``array<double>`` columns (no cast). Use when the
    operands are pre-cast once per ROW — in an all-pairs join the casting
    ``transform`` otherwise re-allocates both arrays per PAIR, which
    dominates the pair loop (measured ~2× on the exact embedding-dup
    baseline)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot(a: Column, b: Column) -> Column:
    return dot_raw(_to_double(a), _to_double(b))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_to_double(a), _to_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def hyperplane_signature(v: Column, planes: list[list[float]], precast: bool = False) -> Column:
    """Random-hyperplane LSH signature: one sign bit per plane, packed into a
    long. ``planes`` are deterministic (seeded numpy) literals — generated at
    plan time, broadcast as constants into codegen. Pass ``precast=True``
    when ``v`` is already ``array<double>`` (hoisted to a per-row projection
    by the caller) so the per-plane dot skips the cast-allocating transform."""
    d = dot_raw if precast else dot
    bits = []
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(d(v, lit) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")
