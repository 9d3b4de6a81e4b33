"""Distributed PCA over embedding columns: exact integer Gram matrix +
driver-side eigendecomposition + JVM-side projection.

The reference has no linear-algebra stage — embeddings leave its feature
pipeline raw (`feature-json/.../FeatureJsonPublisher.kt` serializes the
materialized vector and stops); dimensionality reduction / whitening is
re-implemented downstream by every consumer. Here PCA is a first-class
operator with the repo's determinism contract: the data-sized pass
accumulates an EXACT int64 Gram matrix over :func:`quantize_vec`-grid
vectors (float sums across partitions are order-nondeterministic; integer
sums are associative, so two runs — and two engines — produce identical
sufficient statistics), and only the tiny d×d eigensolve uses floats.

Scale posture (100 TB): PCA's only data-sized work is the Gram
accumulation — ``n·d²`` multiply-adds with an O(d²) result. The shape
here is the canonical one:

* ``strategy="arrow"`` (the 100 TB path): one ``mapInPandas`` stage
  computes a PARTIAL Gram per Arrow batch with a vectorized int64
  ``QᵀQ`` (numpy integer matmul is exact — no float round-trip), so the
  shuffle carries ONE O(d²) row per partition, never vectors. The final
  reduce is an elementwise sum over #partitions rows — negligible.
* ``strategy="explode"`` (pure-Column twin): per-row upper-triangle pair
  products through a map-side-combined groupBy. Zero Python, exactly the
  same integers — the differential witness for the arrow path and the
  shape the DuckDB oracle mirrors. Row blow-up ×d(d+1)/2 makes it the
  wrong default past toy d, but every product is pipelined pre-shuffle.

Everything downstream of the Gram is group-grain: ``pca_fit`` collects
d(d+1)/2 longs (driver O(d²), like the IVF centroid collects),
``numpy.linalg.eigh`` solves the d×d symmetric eigenproblem, and
``pca_transform`` projects with literal component arrays via
``zip_with``/``aggregate`` — whole-stage-codegen JVM arithmetic, zero
shuffle, zero Python on the data path.

Overflow headroom: |q| <= levels+1 = 128, so each product is <= 16384 and
the int64 Gram sums are exact past 5.6e14 rows — beyond any corpus.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from funcify_feature_eng_spark.operators.similarity import quantize_vec

__all__ = [
    "embedding_gram",
    "pca_fit",
    "pca_transform",
    "PCAModel",
]


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """One bounded driver action (first non-NULL row), same class as the
    ANN family's centroid collects."""
    row = (
        df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
        .select(F.size(vec_col).alias("d"))
        .first()
    )
    if row is None:
        raise ValueError(f"embedding_gram: no non-empty vectors in {vec_col!r}")
    return int(row["d"])


def _pair_index(d: int) -> list[tuple[int, int, int]]:
    """Row-major upper-triangle (incl. diagonal) flattening: pos -> (i, j)."""
    out = []
    pos = 0
    for i in range(d):
        for j in range(i, d):
            out.append((pos, i, j))
            pos += 1
    return out


def embedding_gram(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    levels: int = 127,
    strategy: str = "arrow",
) -> DataFrame:
    """Exact int64 Gram sufficient statistics over quantized embeddings.

    Vectors are snapped onto the :func:`quantize_vec` integer grid
    (JVM-side Column math, identical in DuckDB), NULL/empty/wrong-length
    rows are dropped (mixed dimensions would silently poison components —
    same contract as ``pool_embeddings``), then for every dimension pair
    ``i <= j`` the exact sums are accumulated.

    Output (one row per upper-triangle pair, canonical ``i, j`` order)::

        i int, j int, sxx long,   -- sum of q_i * q_j
        sx_i long, sx_j long,     -- per-dimension linear sums
        n long                    -- surviving row count

    which is everything PCA needs: covariance follows as
    ``(sxx/n) - (sx_i/n)(sx_j/n)`` — see :func:`pca_fit`.
    """
    if strategy not in ("arrow", "explode"):
        raise ValueError(f"embedding_gram: strategy must be arrow|explode, got {strategy!r}")
    d = dim if dim is not None else _infer_dim(df, vec_col)
    spark = df.sparkSession

    qdf = (
        df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == d))
        .select(quantize_vec(F.col(vec_col), levels).alias("__q"))
    )

    if strategy == "arrow":
        partial = _gram_partial_arrow(qdf, d)
    else:
        partial = _gram_partial_explode(qdf, d)

    # Final reduce in ONE traversal of the data-sized pass: fold sxx, sx
    # and n into a single positional array, explode, map-side-combined sum
    # per position (≤ d(d+1)/2 + d + 1 groups), then a BOUNDED O(d²)
    # driver collect assembles the canonical pair frame — the same driver
    # budget pca_fit spends anyway, and it guarantees the input is scanned
    # exactly once (a lazy 3-branch assembly would re-scan it per branch).
    n_pairs = d * (d + 1) // 2
    combined = F.concat("sxx", "sx", F.array(F.col("n")))
    sums = dict(
        partial.select(F.posexplode(combined).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.sum("v").cast("long").alias("s"))
        .collect()
    )
    schema = "i int, j int, sxx long, sx_i long, sx_j long, n long"
    n_total = sums.get(n_pairs + d, 0)
    if n_total == 0:  # no surviving vectors — empty frame, not a zero gram
        return spark.createDataFrame([], schema)
    rows = [
        (i, j, sums[pos], sums[n_pairs + i], sums[n_pairs + j], n_total)
        for pos, i, j in _pair_index(d)
    ]
    return spark.createDataFrame(rows, schema)


def _gram_partial_arrow(qdf: DataFrame, d: int) -> DataFrame:
    """One O(d²) partial-Gram row per partition via vectorized int64
    ``QᵀQ`` per Arrow batch. Always yields (a zero row on an empty
    partition) so an all-empty scan still reduces to n=0 sums."""
    def gram(batches):
        import numpy as np  # noqa: PLC0415 — executor-side import
        import pandas as pd  # noqa: PLC0415

        n = 0
        s = np.zeros(d, dtype=np.int64)
        g = np.zeros((d, d), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.asarray(pdf["__q"].tolist(), dtype=np.int64)
            n += q.shape[0]
            s += q.sum(axis=0)
            g += q.T @ q  # integer matmul: exact, no BLAS float path
        iu0, iu1 = np.triu_indices(d)
        yield pd.DataFrame(
            {"n": [n], "sx": [s.tolist()], "sxx": [g[iu0, iu1].tolist()]}
        )

    return qdf.mapInPandas(gram, schema="n long, sx array<long>, sxx array<long>")


def _gram_partial_explode(qdf: DataFrame, d: int) -> DataFrame:
    """Pure-Column twin: per-row upper-triangle products, map-side-combined
    groupBy, then re-assembled into the same one-row partial shape so both
    strategies share the final reduce."""
    n_pairs = d * (d + 1) // 2
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(d - 1)),
                lambda j: F.struct(
                    (i * d - ((i - 1) * i / F.lit(2)).cast("int") + (j - i))
                    .cast("int")
                    .alias("pos"),
                    (F.element_at("__q", i + 1).cast("long")
                     * F.element_at("__q", j + 1).cast("long")).alias("v"),
                    F.when(i == j, F.element_at("__q", i + 1).cast("long"))
                    .otherwise(F.lit(None))
                    .alias("lin"),
                ),
            ),
        )
    )
    ex = qdf.select(F.explode(pairs).alias("p")).select(
        F.col("p.pos").alias("pos"), F.col("p.v").alias("v"), F.col("p.lin").alias("lin")
    )
    agg = ex.groupBy("pos").agg(
        F.sum("v").cast("long").alias("sxx"),
        F.sum("lin").cast("long").alias("lin"),
        # every row contributes exactly one product per pos; rows/pos = n
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    # pos of the (i, i) diagonal entry, for recovering the linear sums
    diag_pos = [i * d - (i - 1) * i // 2 for i in range(d)]
    spark = qdf.sparkSession
    diag = spark.createDataFrame(
        [(p, k) for k, p in enumerate(diag_pos)], "pos int, dim int"
    )
    rows = agg.join(F.broadcast(diag), "pos", "left")
    packed = rows.groupBy().agg(
        F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("n"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("dim").isNotNull(), F.struct("dim", "lin"))
                )
            ),
            lambda s: s["lin"],
        ).alias("sx"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "sxx"))),
            lambda s: s["sxx"],
        ).alias("sxx"),
    )
    # empty input: groupBy().agg still yields one row (n=0, empty arrays) —
    # pad to full length so the shared final reduce sees zeros
    zeros_pairs = F.array_repeat(F.lit(0).cast("long"), n_pairs)
    zeros_d = F.array_repeat(F.lit(0).cast("long"), d)
    return packed.select(
        "n",
        F.when(F.size("sx") == d, F.col("sx")).otherwise(zeros_d).alias("sx"),
        F.when(F.size("sxx") == n_pairs, F.col("sxx")).otherwise(zeros_pairs).alias("sxx"),
    )


@dataclass(frozen=True)
class PCAModel:
    """Fitted PCA over the quantized grid. ``components[c]`` is a unit
    eigenvector (length d); ``mean_q[k]`` the per-dimension mean of the
    QUANTIZED values; ``explained_var`` the matching eigenvalues
    (descending, quantized-units²)."""

    dim: int
    levels: int
    mean_q: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]
    explained_var: tuple[float, ...]

    @property
    def k(self) -> int:
        return len(self.components)


def pca_fit(gram_df: DataFrame, k: int, levels: int = 127) -> PCAModel:
    """Eigensolve the covariance recovered from :func:`embedding_gram`'s
    exact integers. Driver work is O(d²) memory + O(d³) eigh — group-grain
    like the IVF centroid solve, never data-sized.

    Deterministic: the Gram integers are bit-reproducible, ``eigh`` on
    identical float64 input is deterministic, and each component's sign is
    canonicalized (largest-|coefficient| entry made positive, first index
    winning ties)."""
    import numpy as np  # noqa: PLC0415

    rows = gram_df.collect()
    if not rows:
        raise ValueError("pca_fit: empty gram frame")
    d = max(r["j"] for r in rows) + 1
    n = rows[0]["n"]
    if n < 2:
        raise ValueError(f"pca_fit: need >= 2 vectors, got {n}")
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        g[r["i"], r["j"]] = g[r["j"], r["i"]] = r["sxx"]
        s[r["i"]] = r["sx_i"]
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][: min(k, d)]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))  # first index wins ties
        if v[pivot] < 0:
            v = -v
        comps.append(tuple(float(x) for x in v))
    return PCAModel(
        dim=d,
        levels=levels,
        mean_q=tuple(float(x) for x in mean),
        components=tuple(comps),
        explained_var=tuple(float(max(evals[i], 0.0)) for i in order),
    )


def pca_transform(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
) -> DataFrame:
    """Project onto the fitted components: ``score_c = q · comp_c − μ·comp_c``
    with the mean dot product folded into a literal offset driver-side, so
    the per-row work is k JVM ``zip_with``/``aggregate`` dot products —
    map-only, zero shuffle, zero Python. ``whiten=True`` divides each score
    by sqrt(eigenvalue) (components with ~zero variance yield NULL rather
    than an exploding division).

    Rows whose vector is NULL or the wrong length get ``out_col = NULL``
    (projection of garbage would be silently wrong)."""
    q = quantize_vec(F.col(vec_col), model.levels)
    scores = []
    for c, comp in enumerate(model.components):
        lit = F.array(*[F.lit(float(x)) for x in comp])
        offset = float(sum(m * x for m, x in zip(model.mean_q, comp)))
        dot = F.aggregate(
            F.zip_with(q, lit, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ) - F.lit(offset)
        if whiten:
            ev = model.explained_var[c]
            dot = dot / F.lit(math.sqrt(ev)) if ev > 1e-12 else F.lit(None).cast("double")
        scores.append(dot)
    ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == model.dim)
    return df.withColumn(out_col, F.when(ok, F.array(*scores)))
