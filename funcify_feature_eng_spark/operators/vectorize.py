"""Feature-hashing (hashing-trick) vectorizer over token arrays.

The classic trick (Weinberger et al., *Feature Hashing for Large Scale
Multitask Learning*, ICML 2009): map each token to a fixed-dimension sparse
vector slot via a hash, optionally flipping the contribution's sign with a
second hash bit so collisions cancel in expectation instead of biasing
upward. The reference engine has no vectorizer tier at all — its transformer
sources emit scalar/JSON features (`jq-transformers.yml`); this supplies the
model-input end of the pipeline the way sklearn's ``HashingVectorizer`` /
Spark MLlib's ``HashingTF`` do, but as a pure Catalyst expression.

Scale shape: the whole computation is a per-row ``transform`` /
``aggregate`` higher-order-function pipeline — **map-only, zero shuffle,
zero Python**, so it rides whatever partitioning the input already has and
survives any scale-up untouched. Memory per row is O(distinct slots) ≤
``dim``.

Hash arithmetic is the repo-standard seeded chain
``xxhash64(int(seed), token)`` (same convention as operators/sketches.py),
reproducible outside Spark via functions/xxh64.py::spark_xxhash64 — the
fixture oracle recomputes every vector independently from that twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _slot(tok: Column, dim: int, seed: int) -> Column:
    """Vector slot of one token: ``pmod(xxhash64(int(seed), tok), dim)``."""
    return F.pmod(F.xxhash64(F.lit(seed).cast("int"), tok), F.lit(dim)).cast("int")


def _sign(tok: Column, seed: int) -> Column:
    """±1 from the hash's top bit (bit 63, i.e. the sign of the signed
    long). ``pmod`` for the slot folds in ALL bits, so slot and sign are
    not independent in the cryptographic sense — but for collision
    debiasing only the sign's marginal balance matters, and bit 63 is
    unbiased under xxhash64. sklearn's HashingVectorizer uses the same
    single-hash sign-bit shortcut."""
    return F.when(
        F.xxhash64(F.lit(seed).cast("int"), tok) < 0, F.lit(-1).cast("long")
    ).otherwise(F.lit(1).cast("long"))


def hashed_vector_cols(
    tokens: Column, dim: int, *, seed: int = 0, signed: bool = True
) -> tuple[Column, Column]:
    """``(indices, values)`` column pair for one ``array<string>`` column.

    ``indices``: strictly increasing occupied slots (``array<int>``).
    ``values``: aligned totals (``array<long>``) — signed sums when
    ``signed`` (collisions cancel in expectation), plain counts otherwise.
    NULL tokens inside the array are skipped (they carry no feature);
    a NULL array stays NULL; an empty array yields two empty arrays.

    Pure higher-order Column expressions: distinct sorted slots, then one
    ``filter``+``aggregate`` per occupied slot — O(slots·tokens) per row,
    all inside whole-stage codegen (the jq ``group_by`` lowering at
    functions/jq_compile.py uses the same distinct-keys-then-filter shape).
    """
    if dim <= 0:
        raise ValueError(f"hashed_vector: dim must be positive (got {dim})")
    toks = F.filter(tokens, lambda t: t.isNotNull())
    # slot each token ONCE; sign rides in a struct so the per-slot fold
    # never re-hashes (HOF-capture hazard: a lambda re-evaluating
    # xxhash64 per (slot, token) pair would be O(slots·tokens) hashes)
    pairs = F.transform(
        toks,
        lambda t: F.struct(
            _slot(t, dim, seed).alias("i"),
            (_sign(t, seed) if signed else F.lit(1).cast("long")).alias("s"),
        ),
    )
    idx = F.array_sort(F.array_distinct(F.transform(pairs, lambda p: p["i"])))
    val = F.transform(
        idx,
        lambda k: F.aggregate(
            F.filter(pairs, lambda p: p["i"] == k),
            F.lit(0).cast("long"),
            lambda acc, p: acc + p["s"],
        ),
    )
    return idx, val


def hashed_count_vector(
    df: DataFrame,
    tokens_col: str,
    dim: int,
    *,
    seed: int = 0,
    signed: bool = True,
    out_indices: str = "indices",
    out_values: str = "values",
) -> DataFrame:
    """Attach a hashed sparse count vector for ``tokens_col``
    (``array<string>``) as two aligned array columns. Map-only — see
    :func:`hashed_vector_cols` for semantics and the per-row cost model.

    With ``signed=True`` a slot whose colliding tokens cancel exactly still
    appears in ``indices`` with value 0 — the occupied-slot set is a
    function of the tokens alone, which keeps vectors from identical token
    multisets byte-identical regardless of sign outcomes.
    """
    idx, val = hashed_vector_cols(
        F.col(tokens_col), dim, seed=seed, signed=signed
    )
    return df.withColumn(out_indices, idx).withColumn(out_values, val)
