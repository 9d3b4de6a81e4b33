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


def unit_vector(a: Column) -> Column:
    """L2-normalize once per ROW (``array<double>`` out; zero vectors →
    zeros, matching :func:`cosine`'s 0.0-on-zero-denominator convention).
    In pair loops, ``dot_raw(unit_a, unit_b)`` replaces :func:`cosine`'s
    per-PAIR norm folds + cast allocations — same ranking, one fold per
    pair instead of three plus two casts."""
    v = _to_double(a)
    n = norm(a)
    # array_repeat evaluates the O(dim) norm ONCE per row; n inside the
    # transform lambda would re-run the whole dot-fold per element
    # (O(dim²)/row — the HOF-capture hazard documented at text.py shingles)
    rep = F.array_repeat(n, F.size(v))
    return F.when(n > 0, F.zip_with(v, rep, lambda x, m: x / m)).otherwise(
        F.transform(v, lambda x: F.lit(0.0))
    )


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


def sha_embed_dims(hex_col: Column, dim: int = 8, bytes_per_dim: int = 8) -> list[Column]:
    """Deterministic text-embedding STUB: ``dim`` integer components, each
    the sum of ``bytes_per_dim`` ascii codes of a sha256-hex slice. Real
    embedding models aren't in this container — this keeps the RETRIEVAL
    plumbing (chunk → embed → index → top-k) fully real and cross-engine
    exact (sha256 + ascii exist in any SQL engine), with the model call as
    the single swap point. Pass the PROJECTED hex column (one sha256 per
    row), not an inline expression, so the hash isn't recomputed per
    component."""
    out = []
    for d in range(dim):
        comp = None
        for j in range(bytes_per_dim):
            a = F.ascii(F.substring(hex_col, d * bytes_per_dim + j + 1, 1))
            comp = a if comp is None else comp + a
        out.append(comp)
    return out


def sha_embed_py(text: str, dim: int = 8, bytes_per_dim: int = 8) -> list[int]:
    """Driver-side twin of sha_embed_dims (query-vector construction)."""
    import hashlib

    hx = hashlib.sha256(text.encode()).hexdigest()
    return [
        sum(ord(hx[d * bytes_per_dim + j]) for j in range(bytes_per_dim))
        for d in range(dim)
    ]
