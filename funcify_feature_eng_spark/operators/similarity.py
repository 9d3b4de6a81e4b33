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

from funcify_feature_eng_spark.functions.vectors import (
    cosine,
    dot_raw,
    hyperplane_signature,
    unit_vector,
)


def _query_lit(query_vec) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def _seq_fold_dot(A: "np.ndarray", B: "np.ndarray") -> "np.ndarray":
    """Row-wise dot products with dot_raw's EXACT float op order: one
    IEEE-double multiply per component, then a strict left-to-right
    ``acc + x`` fold starting at 0.0 — what ``aggregate(zip_with(a, b,
    x*y), 0.0, acc+x)`` executes per row in the JVM. NumPy's own ``dot``
    / ``matmul`` sums in a different (pairwise/SIMD) order, which can
    differ in the last ulp, so it is only ever used here for candidate
    PRE-selection with a safety margin — every emitted score comes from
    this fold and is bit-identical to the Catalyst expression."""
    acc = np.zeros(A.shape[0], dtype=np.float64)
    for d in range(A.shape[1]):
        acc = acc + A[:, d] * B[:, d]
    return acc


def _fold_unit_rows(X32: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
    """(norms, unit_vectors) replicating vectors.norm / unit_vector exactly:
    float->double casts are exact, the norm is sqrt of the sequential
    square fold, and each component divides by that norm (zero vectors ->
    zero rows, the unit_vector convention)."""
    X = X32.astype(np.float64)
    n = np.sqrt(_seq_fold_dot(X, X))
    with np.errstate(divide="ignore", invalid="ignore"):
        U = X / n[:, None]
    U[n <= 0] = 0.0
    return n, U


def _collect_vec_matrix(df: DataFrame, id_col: str, vec_col: str):
    """Bounded driver collect of (id, vector) as (numpy ids, float32 2-D
    matrix); None when the frame isn't arrow-matrix-shaped (nulls, ragged
    dims, non-numeric ids) — callers fall back to the Catalyst pair join."""
    import pyarrow as pa

    tbl = df.select(id_col, vec_col).toArrow()
    idc = tbl.column(0).combine_chunks()
    vc = tbl.column(1).combine_chunks()
    if idc.null_count or vc.null_count or len(tbl) == 0:
        return None
    if not pa.types.is_integer(idc.type):
        return None
    if vc.values.null_count:
        return None
    offs = vc.offsets.to_numpy()
    dims = np.diff(offs)
    if len(dims) == 0 or dims.min() != dims.max() or dims.max() == 0:
        return None
    if not pa.types.is_floating(vc.values.type):
        return None
    # keep the source float width: float->double is exact either way, and
    # forcing float32 would corrupt an array<double> input; flatten()
    # respects the array's logical offset window
    mat = vc.flatten().to_numpy(zero_copy_only=False).reshape(len(tbl), int(dims[0]))
    return idc.to_numpy(), np.ascontiguousarray(mat)


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
    sig = df.withColumn(
        "__vd", F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ).withColumn("__sig", hyperplane_signature(F.col("__vd"), planes, precast=True))
    probed = sig.filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig))) <= max_probe_hamming
    ).drop("__vd", "__sig")
    return cosine_topk(probed, query_vec, k, id_col, vec_col, round_to)


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "ivf_cluster",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    Centroids are plan-time literals (seeded/deterministic); assignment is a
    greatest-over-structs expression — JVM-side, one scan. At 100 TB the
    assignment is computed at ingest and the table is partitioned by
    ``ivf_cluster`` so probes prune partitions.

    The row's double-cast vector and norm are hoisted into their own
    projection (evaluated once, not once per centroid — CollapseProject
    keeps non-cheap multiply-referenced aliases in place), and each
    centroid's norm is a driver-computed constant: Python folds the same
    doubles in the same order as the JVM aggregate would, so the scores are
    bit-identical to the inline ``cosine`` form, preserving greatest-struct
    tie behavior.
    """
    import math

    from funcify_feature_eng_spark.functions.vectors import dot_raw

    base = df.withColumn(
        "__vd", F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ).withColumn("__nv", F.sqrt(dot_raw(F.col("__vd"), F.col("__vd"))))
    scored = []
    for i, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        # plain sequential sum — same add order as the JVM aggregate fold
        # (math.fsum would compensate and diverge in the last ulp)
        sq = 0.0
        for x in c:
            sq += float(x) * float(x)
        cn = math.sqrt(sq)
        denom = F.col("__nv") * F.lit(cn)
        s = F.when(denom > 0, dot_raw(F.col("__vd"), lit) / denom).otherwise(F.lit(0.0))
        scored.append(F.struct(s.alias("s"), F.lit(i).alias("c")))
    return base.withColumn(out_col, F.greatest(*scored)["c"]).drop("__vd", "__nv")


def make_ivf_centroids(
    df: DataFrame,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    lloyd_iters: int = 1,
) -> list[list[float]]:
    """Deterministic IVF centroids: seeded sample init + a few Lloyd
    iterations, all as DataFrame aggregations (mean per cluster)."""
    import numpy as np

    # deterministic init: order by a content hash (seeded), not by partition
    # layout — limit without order is not stable across runs
    sample = [
        r[0]
        for r in df.select(vec_col)
        .orderBy(F.hash(F.col(vec_col), F.lit(seed)))
        .limit(n_clusters)
        .collect()
    ]
    cents = [list(map(float, v)) for v in sample]
    while len(cents) < n_clusters:
        cents.append(cents[len(cents) % max(len(sample), 1)])
    for _ in range(lloyd_iters):
        assigned = ivf_assign(df, cents, vec_col)
        rows = (
            assigned.groupBy("ivf_cluster")
            .agg(
                # sort before folding: float addition is order-sensitive and
                # collect_list order follows the shuffle — sort makes the
                # centroid bits deterministic across runs
                F.aggregate(
                    F.sort_array(
                        F.collect_list(F.transform(F.col(vec_col), lambda x: x.cast("double")))
                    ),
                    F.array(*[F.lit(0.0) for _ in cents[0]]),
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("sums"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = {
            int(r["ivf_cluster"]): (np.asarray(r["sums"], dtype=float) / r["n"]).tolist()
            for r in rows
        }
        cents = [new.get(i, cents[i]) for i in range(len(cents))]
    return cents


def ivf_topk(
    df: DataFrame,
    query_vec,
    centroids: list[list[float]],
    k: int = 10,
    n_probes: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """IVF approximate top-k: score the query against the centroids on the
    driver (O(n_clusters)), scan only the ``n_probes`` nearest clusters,
    exact-rerank inside them."""
    import numpy as np

    q = np.asarray(query_vec, dtype=float)
    qn = np.linalg.norm(q) or 1.0
    sims = []
    for i, c in enumerate(centroids):
        cv = np.asarray(c, dtype=float)
        d = np.linalg.norm(cv) or 1.0
        sims.append((float(np.dot(q, cv) / (qn * d)), i))
    probes = [i for _, i in sorted(sims, reverse=True)[:n_probes]]
    assigned = ivf_assign(df, centroids, vec_col)
    pruned = assigned.filter(F.col("ivf_cluster").isin(probes))
    return cosine_topk(pruned, query_vec, k, id_col, vec_col, round_to)


def all_pairs_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    max_rows: int | None = 20_000,
) -> DataFrame:
    """Per-row top-k neighbors (small/broadcastable datasets): broadcast the
    right side, window-rank the cosine. For large N use LSH bucketing first.

    The quadratic cost is enforced, not just documented: the input is probed
    with a ``limit(max_rows + 1)`` count (cost bounded by max_rows rows, not
    the full input) and a larger frame raises with a routing hint to
    ``ann_lsh_topk`` / ``ivf_topk`` instead of silently broadcasting n² pairs.
    Pass ``max_rows=None`` to opt out when the caller has already bounded n.
    """
    from pyspark.sql import Window

    if max_rows is not None:
        probed = df.limit(max_rows + 1).count()
        if probed > max_rows:
            raise ValueError(
                f"all_pairs_topk: input exceeds max_rows={max_rows} (the pair "
                "loop is O(n²) with a broadcast right side). Route large "
                "inputs through ann_lsh_topk/ivf_topk, or pass max_rows=None "
                "if n is known-bounded."
            )
    from funcify_feature_eng_spark.operators.util import spread_small_input

    # Fast path: BLAS matmul PRE-selects per-row candidates with a safety
    # margin, then every candidate's score is recomputed with dot_raw's
    # sequential fold (bit-identical doubles) and handed back to the JVM,
    # where the SAME round() + row_number window as the expression path
    # runs — so the result is provably identical while the n² scan drops
    # from a per-pair Catalyst fold to one blocked matrix multiply
    # (measured 182s → seconds on the 20k-vector sf1.0 label-eval gate).
    arrow = _all_pairs_topk_arrow(df, k, id_col, vec_col, round_to)
    if arrow is not None:
        scored = arrow
    else:
        # unit-normalize once per ROW: the pair loop then runs ONE zip_with
        # fold per pair instead of cosine()'s three (dot + both norms) plus
        # two cast allocations. The probe side is spread across cores
        # first — a small parquet arrives as ONE split, which would run the
        # whole n² stage single-threaded
        left = spread_small_input(df)
        a = left.select(
            F.col(id_col).alias("id_a"), unit_vector(F.col(vec_col)).alias("ua")
        )
        b = df.select(
            F.col(id_col).alias("id_b"), unit_vector(F.col(vec_col)).alias("ub")
        )
        scored = (
            a.join(F.broadcast(b), F.col("id_a") != F.col("id_b"))
            .withColumn(
                "cos_sim", F.round(dot_raw(F.col("ua"), F.col("ub")), round_to)
            )
            .select("id_a", "id_b", "cos_sim")
        )
    w = Window.partitionBy("id_a").orderBy(F.col("cos_sim").desc(), F.col("id_b").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _all_pairs_topk_arrow(
    df: DataFrame, k: int, id_col: str, vec_col: str, round_to: int
) -> DataFrame | None:
    """Candidate-pruned exact all-pairs scorer (None -> caller falls back).

    Correctness argument: the top-k under (round(cos, r) DESC, id_b ASC)
    is contained in {b : raw_cos >= kth_largest_raw - margin} whenever
    margin covers (a) the maximum movement round() can apply (5e-(r+1))
    on both the boundary pair and its competitors and (b) the matmul-vs-
    fold summation difference (<= dim·eps, ~1e-14 for unit vectors). With
    margin = 2.5·10^-r every pair globally ranked <= k survives selection
    and every selected extra still ranks > k inside the candidate set, so
    the window's first k rows are the global first k rows. Emitted scores
    are sequential-fold doubles, so round()/ordering see the exact bits
    the Catalyst pair join would produce."""
    if round_to is None or k < 1:
        return None
    collected = _collect_vec_matrix(df, id_col, vec_col)
    if collected is None:
        return None
    ids_all, mat = collected
    _, U_all = _fold_unit_rows(mat)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((ids_all, U_all))
    margin = 2.5 * (10.0 ** (-round_to))
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, __raw double"
    from funcify_feature_eng_spark.operators.util import spread_small_input

    def gen(batches):
        import pyarrow as pa

        ids_b, U_b = bc.value
        n_all = len(ids_b)
        for batch in batches:
            idc = batch.column(0)
            vc = batch.column(1)
            if len(batch) == 0:
                continue
            a_ids = idc.to_numpy(zero_copy_only=False)
            # flatten() respects the batch's logical offset window, unlike
            # raw .values on a sliced array
            vals = vc.flatten().to_numpy(zero_copy_only=False)
            A = vals.reshape(len(batch), len(vals) // len(batch))
            _, UA = _fold_unit_rows(np.ascontiguousarray(A))
            # block the matmul so the score slab stays ~100 MB
            blk = max(1, (100 * 1024 * 1024) // (8 * max(1, n_all)))
            rows_a, rows_b = [], []
            for s in range(0, len(a_ids), blk):
                e = min(s + blk, len(a_ids))
                S = UA[s:e] @ U_all.T
                for r in range(e - s):
                    not_self = ids_b != a_ids[s + r]
                    m = int(not_self.sum())
                    if m == 0:
                        continue
                    if m <= k:
                        sel = not_self
                    else:
                        vals = np.where(not_self, S[r], -np.inf)
                        kth = np.partition(vals, n_all - k)[n_all - k]
                        sel = not_self & (S[r] >= kth - margin)
                    idx = np.nonzero(sel)[0]
                    rows_a.append(np.full(len(idx), s + r, dtype=np.int64))
                    rows_b.append(idx)
            if not rows_a:
                continue
            ra = np.concatenate(rows_a)
            rb = np.concatenate(rows_b)
            raw = _seq_fold_dot(UA[ra], U_all[rb])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(a_ids[ra], type=idc.type),
                    pa.array(ids_b[rb], type=idc.type),
                    pa.array(raw, type=pa.float64()),
                ],
                names=["id_a", "id_b", "__raw"],
            )

    cand = spread_small_input(df.select(id_col, vec_col)).mapInArrow(gen, out_schema)
    return cand.select(
        "id_a", "id_b", F.round(F.col("__raw"), round_to).alias("cos_sim")
    )


def quantize_vec(v, levels: int = 127):
    """Symmetric per-vector int8 quantization as a Column expression:
    ``q_i = floor(x_i * levels / max|x| + 0.5)`` (array<int> in [-levels-1,
    levels]; floor-based rounding because ``floor`` is IEEE-exact and
    identical across engines, unlike round()'s HALF_UP/banker variants).
    Zero vectors quantize to zeros.

    At 100 TB this is the memory-bandwidth lever for ANN: 4x smaller scans
    and integer dot products, with cosine UNCHANGED up to quantization
    noise — cosine is scale-free, so per-vector scale factors cancel and
    never need storing for ranking purposes.
    """
    v = F.transform(v, lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    # array_repeat evaluates amax ONCE per row; referencing amax inside the
    # transform lambda would re-evaluate the O(dim) array_max per element
    # (O(dim²)/row — the HOF-capture hazard documented at text.py shingles)
    rep = F.array_repeat(amax, F.size(v))
    return F.when(
        amax > 0,
        F.zip_with(v, rep, lambda x, m: F.floor(x * levels / m + F.lit(0.5)).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q_embedding",
    levels: int = 127,
) -> DataFrame:
    return df.withColumn(out_col, quantize_vec(F.col(vec_col), levels))


def cosine_topk_int8(
    df: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 127,
    round_to: int | None = 6,
) -> DataFrame:
    """Top-k by cosine over int8-QUANTIZED vectors — the quantized-scan
    baseline (compose with LSH/IVF bucketing for the full at-scale path).

    The integer dot products are EXACT in both engines; the final
    ``int_dot / (sqrt(int_norm_a) * sqrt(int_norm_b))`` uses only
    correctly-rounded IEEE ops on exact integers, so the score is
    bit-identical cross-engine (oracle-safe without rounding grids —
    ``round_to`` only stabilizes display/tie behavior like cosine_topk).
    """
    q = quantize_vec(F.col(vec_col), levels)
    qq_lit = None  # quantize the query driver-side with the same formula
    import math

    amax = max(abs(float(x)) for x in query_vec) or 1.0
    qq = [math.floor(float(x) * levels / amax + 0.5) for x in query_vec]
    qq_lit = F.array(*[F.lit(int(x)) for x in qq])
    idot = F.aggregate(
        F.zip_with(q, qq_lit, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    inorm = F.aggregate(
        F.transform(q, lambda x: (x * x).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x,
    )
    qnorm = float(sum(x * x for x in qq))
    score = F.when(
        (inorm > 0) & F.lit(qnorm > 0),
        idot.cast("double") / (F.sqrt(inorm.cast("double")) * F.lit(math.sqrt(qnorm))),
    ).otherwise(F.lit(0.0))
    if round_to is not None:
        score = F.round(score, round_to)
    scored = df.select(F.col(id_col), score.alias("qcos_sim"))
    return scored.orderBy(F.col("qcos_sim").desc(), F.col(id_col).asc()).limit(k)


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold_grid: int = 9500,
    grid: float = 10000.0,
    cluster_col: str = "sem_cluster",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public:
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): coarse-cluster the embeddings, compute pairwise cosine
    WITHIN each cluster only, and drop every row that has a higher-priority
    semantic duplicate — an in-cluster row with a smaller id whose
    floor-grid cosine reaches ``threshold_grid`` (on the ``grid`` scale,
    e.g. 9500/1e4 = 0.95). Returns the kept rows with their cluster id.

    The reference engine has no semantic-dedup operator; this extends the
    dedup family (exact/minhash/simhash/ngram/embedding-grid) with the
    published embedding-clustered method.

    100 TB shape: the assignment is a pure map over plan-time centroid
    literals (``ivf_assign`` — at ingest the table would be PARTITIONED by
    cluster so this join prunes); the quadratic pair work is per-cluster
    (sum of |c|^2, bounded by the quantizer's balance), never
    corpus-quadratic; one shuffle on the cluster id for the self-join. The
    keep rule is a deterministic pure function of (id, cluster, grid
    cosine), so retries and layout changes keep identical rows — and the
    floor-grid score is reproducible across engines (same convention as
    the ann_*/embedding_dup_pairs gates).
    """
    from funcify_feature_eng_spark.functions.vectors import dot_raw, norm

    from funcify_feature_eng_spark.operators.util import spread_small_input

    # the greatest-over-centroids assignment is the dense map stage;
    # spread a single-split input across cores first (no-op at scale)
    assigned = ivf_assign(
        spread_small_input(df), centroids, vec_col=vec_col, out_col=cluster_col
    )
    id_dtype = df.schema[id_col].dataType
    numeric_id = id_dtype.simpleString() in ("tinyint", "smallint", "int", "bigint")
    vec_floating = df.schema[vec_col].dataType.simpleString() in (
        "array<float>", "array<double>",
    )
    if numeric_id and vec_floating:
        # Vectorized per-cluster pair scan (guide §4.2): the quadratic
        # in-cluster work runs as one NumPy pass per cluster instead of a
        # per-pair Catalyst fold (measured 171s → seconds at the 20k-vector
        # sf1.0 gate). Float semantics replicate the expression path
        # EXACTLY — sequential-fold dot and norms, then the identical op
        # order dot/(na*nb)*grid with IEEE floor — so the dropped set is
        # bit-identical to the self-join formulation below (kept for
        # non-numeric ids, where numpy '<' need not match Spark ordering).
        slim = assigned.select(F.col(id_col), F.col(cluster_col), F.col(vec_col)
                               ).persist()
        thr = int(threshold_grid)
        gridf = float(grid)

        def _dropped(pdf):
            import pandas as pd

            ids = pdf[id_col].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            X = np.ascontiguousarray(
                np.stack(pdf[vec_col].to_numpy()[order]), dtype=np.float64
            )
            n, _ = _fold_unit_rows(X)
            c = len(ids)
            if c < 2:
                return pd.DataFrame({id_col: ids[:0]})
            valid = n > 0
            hit = np.zeros(c, dtype=bool)
            # row-blocked so a skewed cluster stays ~100 MB, not O(c²)
            blk = max(1, (100 * 1024 * 1024) // (8 * c))
            for s in range(0, c, blk):
                e = min(s + blk, c)
                # exact sequential-fold pairwise dots, one dim at a time
                D = np.zeros((e - s, c), dtype=np.float64)
                for d in range(X.shape[1]):
                    col = X[:, d]
                    D = D + col[s:e, None] * col[None, :]
                den = n[s:e, None] * n[None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    g = np.floor(D / den * gridf)
                mask = (
                    (g >= thr)
                    & valid[s:e, None] & valid[None, :]
                    & (ids[s:e, None] < ids[None, :])
                )
                hit |= mask.any(axis=0)
            return pd.DataFrame({id_col: ids[hit]})

        dropped = (
            slim.select(id_col, cluster_col, vec_col)
            .groupBy(cluster_col)
            .applyInPandas(_dropped, schema=f"`{id_col}` {id_dtype.simpleString()}")
        )
        kept = slim.select(F.col(id_col), F.col(cluster_col)).join(
            dropped, on=id_col, how="left_anti"
        ).localCheckpoint()
        slim.unpersist()
        return df.join(kept, on=id_col, how="inner")
    ed = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # persist the thin (id, cluster, vec, norm) projection: without it the
    # centroid-assignment expression (greatest over all centroids)
    # recomputes on BOTH self-join sides and again in the final join —
    # three full scans of the largest table. The persist is released
    # before returning (minhash convention): the survivor list is
    # checkpointed below, so no executor storage outlives the call beyond
    # the tiny (id, cluster) frame.
    slim = assigned.select(
        F.col(id_col), F.col(cluster_col),
        ed.alias("__e"), norm(F.col(vec_col)).alias("__n"),
    ).persist()
    a = slim.select(
        F.col(id_col).alias("__ida"), F.col(cluster_col).alias("__ca"),
        F.col("__e").alias("__ea"), F.col("__n").alias("__na"),
    )
    b = slim.select(
        F.col(id_col).alias("__idb"), F.col(cluster_col).alias("__cb"),
        F.col("__e").alias("__eb"), F.col("__n").alias("__nb"),
    )
    cos_grid = F.floor(
        dot_raw(F.col("__ea"), F.col("__eb"))
        / (F.col("__na") * F.col("__nb"))
        * F.lit(float(grid))
    )
    dropped = (
        a.join(
            b,
            (F.col("__ca") == F.col("__cb")) & (F.col("__ida") < F.col("__idb")),
        )
        .filter((F.col("__na") > 0) & (F.col("__nb") > 0))
        .filter(cos_grid >= F.lit(int(threshold_grid)))
        .select(F.col("__idb").alias(id_col))
        .distinct()
    )
    # survivors + their cluster come from the persisted slim frame; the
    # checkpoint materializes them eagerly (assignment evaluated once),
    # then the heavyweight persist is released before returning
    kept = slim.select(F.col(id_col), F.col(cluster_col)).join(
        dropped, on=id_col, how="left_anti"
    ).localCheckpoint()
    slim.unpersist()
    return df.join(kept, on=id_col, how="inner")


def pool_embeddings(
    df: DataFrame,
    group_by,
    vec_col: str = "embedding",
    levels: int = 127,
    how: str = "mean",
    strategy: str = "explode",
    out_col: str = "pooled",
) -> DataFrame:
    """Exact per-group pooling of embeddings on the :func:`quantize_vec`
    integer grid — the conversation/document-group embedding builder
    (mean-pool turn vectors into one conversation vector that feeds the
    ANN family). Pooling RAW floats would be order-nondeterministic under
    Spark's unordered aggregation (float + is not associative); pooling
    the int grid is associative and exact, so two engines (and two runs)
    produce bit-identical vectors. ``how``: ``mean`` (component-wise
    floor(sum/n) — floor, not round, for engine portability) or ``sum``.

    Output: ``group_by`` + ``out_col`` (array<bigint>) + ``n_vecs``.
    Rows with a NULL or EMPTY vector are excluded; all remaining vectors
    in a group must share one dimension (enforced at runtime — a silent
    zip_with pad would poison components with NULL instead).

    Two value-identical strategies (pytest-pinned):

    ``fold``
        collect_list per group, folded JVM-side with zip_with — ONE
        shuffle carrying each vector once, per-group memory
        O(group_size·dim). Right when groups are conversation-sized.

    ``explode`` (the 100 TB path)
        posexplode to (keys, pos, val), partial map-side combined sum per
        component, re-assembled with one run-length-bounded sorted
        collect. Shuffle rows ×dim but reduce-side memory is O(dim) per
        group — no group-size bound at all. Right for corpus-scale
        groups (pool-by-source, pool-by-label).
    """
    gb = [group_by] if isinstance(group_by, str) else list(group_by)
    if how not in ("mean", "sum"):
        raise ValueError(f"pool_embeddings: how must be mean|sum, got {how!r}")
    if strategy not in ("fold", "explode"):
        raise ValueError(
            f"pool_embeddings: strategy must be fold|explode, got {strategy!r}"
        )
    from .util import exact_floor_div

    q = quantize_vec(F.col(vec_col), levels)
    base = (
        df.filter(F.col(vec_col).isNotNull())
        .select(*gb, q.alias("__q"), F.size(q).alias("__dim"))
        # empty vectors carry no components: excluded like NULLs (the
        # explode path would silently treat them as absent anyway —
        # make both strategies agree by construction)
        .filter(F.col("__dim") > 0)
    )

    def _finish(sums: Column, n: Column) -> Column:
        if how == "sum":
            return sums
        return F.transform(sums, lambda s: exact_floor_div(s, n))

    dim_msg = F.concat(
        F.lit("pool_embeddings: mixed vector dimensions within a group ("),
        F.concat_ws("/", *[F.col(c).cast("string") for c in gb]),
        F.lit(")"),
    )
    if strategy == "fold":
        agg = base.groupBy(*gb).agg(
            F.collect_list("__q").alias("__l"),
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.min("__dim").alias("__dmin"),
            F.max("__dim").alias("__dmax"),
        )
        # fold with a zero accumulator of the group's dimension; the
        # assert_true folds into n_vecs so Catalyst cannot prune it
        zero = F.transform(
            F.element_at(F.col("__l"), 1), lambda _: F.lit(0).cast("long")
        )
        sums = F.aggregate(
            F.col("__l"),
            zero,
            lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b.cast("long")),
        )
        n_checked = F.col("n_vecs") + F.coalesce(
            F.assert_true(F.col("__dmin") == F.col("__dmax"), dim_msg).cast("long"),
            F.lit(0),
        )
        return agg.select(
            *gb,
            _finish(sums, n_checked).alias(out_col),
            n_checked.alias("n_vecs"),
        )

    # explode: component cells carry (sum, count); every component of a
    # well-formed group sees the same count — that equality IS the runtime
    # dimension guard (min==max over per-position counts)
    cells = (
        base.select(*gb, F.posexplode("__q").alias("__pos", "__val"))
        .groupBy(*gb, "__pos")
        .agg(
            F.sum(F.col("__val").cast("long")).alias("__s"),
            F.count(F.lit(1)).cast("long").alias("__n"),
        )
    )
    agg = cells.groupBy(*gb).agg(
        F.sort_array(F.collect_list(F.struct("__pos", "__s"))).alias("__cells"),
        F.min("__n").alias("__nmin"),
        F.max("__n").alias("__nmax"),
    )
    n_checked = F.col("__nmin") + F.coalesce(
        F.assert_true(F.col("__nmin") == F.col("__nmax"), dim_msg).cast("long"),
        F.lit(0),
    )
    sums = F.transform(F.col("__cells"), lambda c: c["__s"])
    return agg.select(
        *gb,
        _finish(sums, n_checked).alias(out_col),
        n_checked.cast("long").alias("n_vecs"),
    )


def centroid_similarity(
    df: DataFrame,
    group_by,
    vec_col: str = "embedding",
    levels: int = 127,
    how: str = "mean",
) -> DataFrame:
    """Pairwise cosine similarity between GROUP CENTROIDS — "how close are
    these sources/labels/clusters in embedding space", the group-grain
    companion of the row-grain ANN family (mixture design, dedup-scope
    decisions, label-taxonomy sanity all start from this matrix).

    Centroids come from :func:`pool_embeddings` (exact integer grid, so
    the centroids are bit-identical cross-engine); the cosine then divides
    an exact integer dot by square roots of exact integer norms — every
    double op's inputs are exact, so the similarities reproduce to the
    last bit too (house contract, cf. operators/correlation.py). Pooled
    components are bounded by ``levels`` (mean pooling), so the LONG dot
    products are exact past 10^14 dimensions — no headroom concern.

    Output: one row per unordered group pair (a < b):
    ``(group_a, group_b, n_vecs_a, n_vecs_b, dot_q, cos_sim)`` — dot_q is
    the exact integer dot on the pooled grid; cos NULL for a zero-norm
    centroid. Zero-norm pairs stay in the output (the caller sees WHICH
    pair degenerated rather than losing the row).

    Scale: centroid table is GROUP-grain (pool_embeddings' explode path
    bounds reduce memory at O(dim)); the pair expansion is a broadcast
    self-join over that tiny table — O(G^2) rows of arithmetic, never
    data."""
    gb = [group_by] if isinstance(group_by, str) else list(group_by)
    if len(gb) != 1:
        raise ValueError(
            "centroid_similarity: exactly one group column (pairs of "
            f"composite keys are ambiguous to order), got {gb}"
        )
    g = gb[0]
    pooled = pool_embeddings(
        df, gb, vec_col=vec_col, levels=levels, how=how, strategy="explode"
    )
    a = pooled.select(
        F.col(g).alias("group_a"), F.col("pooled").alias("__va"),
        F.col("n_vecs").alias("n_vecs_a"),
    )
    b = pooled.select(
        F.col(g).alias("group_b"), F.col("pooled").alias("__vb"),
        F.col("n_vecs").alias("n_vecs_b"),
    )
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("group_a") < F.col("group_b"))
    zero = F.lit(0).cast("long")
    # runtime dimension guard: pool_embeddings enforces one dim per group;
    # a cross-GROUP mismatch means corrupt input and must raise, not
    # silently NULL the dot via zip_with padding
    dim_ok = F.assert_true(
        F.size("__va") == F.size("__vb"),
        F.concat(
            F.lit("centroid_similarity: centroid dimensions differ between "
                  "groups "),
            F.col("group_a").cast("string"), F.lit(" and "),
            F.col("group_b").cast("string"),
        ),
    )
    # guard on the LEFT of the +: binary-arithmetic codegen short-circuits
    # when the left operand is NULL, and a dimension mismatch makes the
    # zip_with dot NULL — guard-first guarantees evaluation
    dot = F.coalesce(dim_ok.cast("long"), zero) + F.aggregate(
        F.zip_with(F.col("__va"), F.col("__vb"), lambda x, y: x * y),
        zero, lambda acc, v: acc + v,
    )
    na = F.aggregate(
        F.transform(F.col("__va"), lambda x: x * x), zero, lambda acc, v: acc + v
    )
    nb = F.aggregate(
        F.transform(F.col("__vb"), lambda x: x * x), zero, lambda acc, v: acc + v
    )
    cos = F.when(
        (na == 0) | (nb == 0), F.lit(None).cast("double")
    ).otherwise(
        dot.cast("double") / (F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double")))
    )
    return pairs.select(
        "group_a", "group_b", "n_vecs_a", "n_vecs_b",
        dot.cast("bigint").alias("dot_q"), cos.alias("cos_sim"),
    )
