"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exactness baseline (one scan, no shuffle
until the top-k, which Spark executes as per-partition TakeOrdered + driver
merge — O(k) memory). The scale path is random-hyperplane LSH bucketing:
signature → bucket join → exact rerank inside buckets, so the cross product
never materializes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from funcify_feature_eng_spark.functions.vectors import cosine, hyperplane_signature


def _query_lit(query_vec) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def cosine_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k by cosine to a constant query vector.

    The query is folded into codegen as a literal array; ordering ties break
    on id for determinism. Rounding makes results comparable across engines
    that sum in different orders.
    """
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), _query_lit(query_vec)), round_to).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def make_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for LSH (public SimHash-for-cosine
    construction, Charikar 2002)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def ann_lsh_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
    max_probe_hamming: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: probe buckets within Hamming ≤ r of the query's
    LSH signature, exact-rerank only those rows.

    At 100 TB the signature column is precomputed/persisted and the probe is
    a partition-pruned scan; here the signature is computed inline.
    """
    planes = make_hyperplanes(len(query_vec), n_planes, seed)
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(query_vec, p)) >= 0:
            qsig |= 1 << i
    sig = df.withColumn("__sig", hyperplane_signature(F.col(vec_col), planes))
    probed = sig.filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig))) <= max_probe_hamming
    )
    return cosine_topk(probed, query_vec, k, id_col, vec_col, round_to)


def all_pairs_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Per-row top-k neighbors (small/broadcastable datasets): broadcast the
    right side, window-rank the cosine. For large N use LSH bucketing first."""
    from pyspark.sql import Window

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    scored = (
        a.join(F.broadcast(b), F.col("id_a") != F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), round_to))
        .select("id_a", "id_b", "cos_sim")
    )
    w = Window.partitionBy("id_a").orderBy(F.col("cos_sim").desc(), F.col("id_b").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
