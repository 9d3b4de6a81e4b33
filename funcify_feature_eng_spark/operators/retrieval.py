"""Lexical retrieval scoring: distributed BM25 top-k.

The reference's retrieval surface is embedding-side (chunk→embed→ANN,
``operators/similarity.py``); production training-data pipelines pair that
with a LEXICAL ranker for hybrid retrieval and hard-negative mining. This
is Okapi BM25 as one declarative Spark job:

  scan → explode(tokens) → filter(term ∈ query)   [pushed before any shuffle]
  → groupBy(doc_id, term) tf                       [shuffle 1, map-side combine]
  → ⋈ broadcast(per-term df)  ⋈ broadcast(corpus stats)
  → groupBy(doc_id) sum                            [shuffle 2]
  → TakeOrdered(k)                                 [no global sort]

Only tokens matching the (tiny) query vocabulary survive past the explode,
so shuffle 1 carries ~|query| rows per doc, not the corpus token stream.
Document length is carried THROUGH the tf aggregation (``first(dl)`` — it
is constant per doc), avoiding a doc-level join. At 100 TB this is two
skew-free shuffles on (doc_id, term)/(doc_id) plus two broadcasts.

Integer-exact scoring (cross-engine hashability, same device as
``q_doc_salient_terms``): with k1 = 6/5 and b = 3/4, BM25's term score

    idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

clears denominators over avgdl = S/N (S = total corpus tokens) into the
integer ratio  44·tf·S / (20·tf·S + 6·S + 18·N·dl), and the Robertson
idf (N − df + ½)/(df + ½) into (2N − 2df + 1)/(2df + 1). Each factor is
floored SEPARATELY via int64 division (idf_e3 at ×1000, saturation_e3 at
×1000) and their product summed per doc — integer sums are associative,
so Spark and DuckDB agree bit-for-bit regardless of aggregation order.
Overflow-safe by construction: saturation numerator 44·tf·S·1000 stays
under 2^63 past 10^12 corpus tokens, idf numerator past 10^15 docs.
Swap the idf factor for ln-based at production if float scores are wanted;
the plan shape is identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from funcify_feature_eng_spark.functions.text import tokens


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query by integer-exact BM25
    (k1=1.2, b=0.75). Returns (id_col, score) with score = sum over query
    terms of idf_e3·saturation_e3 (≈ BM25 × 10^6), deterministic tie-break
    on id_col."""
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]

    base = docs.select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("_toks"),
    ).select(
        id_col,
        F.size("_toks").alias("dl"),
        F.explode("_toks").alias("term"),
    )
    hits = base.filter(F.col("term").isin(terms))
    tf = hits.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    # corpus stats: N docs, S total tokens — 2 longs, broadcast
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(
            F.sum(F.size(tokens(F.lower(F.col(text_col))))), F.lit(0)
        ).alias("s_tokens"),
    )
    # per-term document frequency, derived from tf (≤ |query| rows)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_e3",
            F.expr("(2*n_docs - 2*df + 1) * 1000 DIV (2*df + 1)"),
        )
        .withColumn(
            "sat_e3",
            F.expr(
                "44 * tf * s_tokens * 1000"
                " DIV (20 * tf * s_tokens + 6 * s_tokens + 18 * n_docs * dl)"
            ),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum(F.col("idf_e3") * F.col("sat_e3")).alias("score")
    )
    return per_doc.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 10,
    c: int = 60,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion over candidate lists from heterogeneous
    rankers (the standard lexical+dense hybrid combiner): each input frame
    carries (id_col, rank) with rank 1-based; a document's fused score is
    Σ scale DIV (c + rank) over the lists it appears in. Integer division
    keeps the sum associative and cross-engine exact (same device as
    :func:`bm25_topk`).

    Scale shape: each ranker's list is already top-N-bounded (TakeOrdered
    upstream), so the union carries Σ|lists| rows — one small groupBy
    shuffle, never corpus-sized.
    """
    if not ranked:
        raise ValueError("rrf_fuse: need at least one ranked frame")
    parts = [
        df.select(
            F.col(id_col),
            F.expr(f"CAST({scale} AS BIGINT) DIV ({c} + rank)").alias("contrib"),
        )
        for df in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    agg = u.groupBy(id_col).agg(F.sum("contrib").alias("rrf"))
    return agg.orderBy(F.col("rrf").desc(), F.col(id_col).asc()).limit(k)


def knn_label_precision(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1_000_000,
) -> DataFrame:
    """Embedding-quality evaluation: per-vector kNN label precision@k —
    the standard probe for "do nearest neighbors share the query's class".
    Neighbors come from :func:`~funcify_feature_eng_spark.operators.similarity.all_pairs_topk`
    (exact, size-guarded — route the sampled eval slice here, not the full
    corpus); labels join back via two broadcasts; precision is reported as
    the integer ``match_cnt·scale DIV k`` (fixed denominator k even when
    n−1 < k, so scores are comparable across corpus sizes).
    """
    from funcify_feature_eng_spark.operators.similarity import all_pairs_topk

    top = all_pairs_topk(df, k=k, id_col=id_col, vec_col=vec_col)
    labels = df.select(F.col(id_col), F.col(label_col))
    la = labels.select(F.col(id_col).alias("id_a"), F.col(label_col).alias("_la"))
    lb = labels.select(F.col(id_col).alias("id_b"), F.col(label_col).alias("_lb"))
    j = top.join(F.broadcast(la), "id_a").join(F.broadcast(lb), "id_b")
    return (
        j.groupBy("id_a")
        .agg(
            F.sum(F.when(F.col("_la") == F.col("_lb"), 1).otherwise(0)).alias(
                "match_cnt"
            )
        )
        .select(
            F.col("id_a").alias(id_col),
            "match_cnt",
            F.expr(f"match_cnt * {scale} DIV {k}").alias("prec_e6"),
        )
    )


def bm25_oracle_sql(
    query_terms: list[str],
    k: int = 10,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical integer arithmetic."""
    terms_sql = ", ".join("'" + t.lower().replace("'", "''") + "'"
                          for t in query_terms)
    return f"""
WITH base AS (
  SELECT {id_col},
         CASE WHEN length(trim({text_col})) > 0
              THEN regexp_split_to_array(trim(lower({text_col})), '\\s+')
              ELSE [] END AS toks
  FROM {table}
),
stats AS (
  SELECT COUNT(*) AS n_docs, COALESCE(SUM(len(toks)), 0) AS s_tokens FROM base
),
tk AS (
  SELECT {id_col}, len(toks) AS dl, unnest(toks) AS term FROM base
),
tf AS (
  SELECT {id_col}, term, COUNT(*) AS tf, MIN(dl) AS dl
  FROM tk WHERE term IN ({terms_sql})
  GROUP BY {id_col}, term
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
SELECT {id_col},
       SUM(((2*n_docs - 2*df + 1) * 1000 // (2*df + 1))
           * (44 * tf * s_tokens * 1000
              // (20 * tf * s_tokens + 6 * s_tokens + 18 * n_docs * dl))
          ) AS score
FROM tf JOIN dfreq USING (term) CROSS JOIN stats
GROUP BY {id_col}
ORDER BY score DESC, {id_col} ASC LIMIT {k}
"""


def ndcg_weights_e9(k: int) -> list[int]:
    """The fixed integer DCG weight grid: w_r = floor(1e9 / log2(r+1))
    for ranks r = 1..k, computed ONCE at plan time in Python and embedded
    as literals. Pinning the grid (instead of evaluating log2 per row)
    makes NDCG a pure-integer statistic both engines reproduce
    bit-for-bit — the last-ulp libm differences that make float DCG
    unhashable across engines never enter the plan."""
    import math

    return [int(1_000_000_000 // math.log2(r + 1)) for r in range(1, k + 1)]


def ranking_metrics(
    results: DataFrame,
    labels: DataFrame,
    *,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    k: int = 10,
) -> DataFrame:
    """Per-query retrieval-quality metrics — MRR, precision/recall@k and
    NDCG@k — as exact integer ppm (the eval loop for any BM25 / ANN /
    hybrid ranker in this repo; pairs with :func:`bm25_topk`,
    :func:`rrf_fuse` and the similarity top-k family).

    ``results`` carries one row per (query, doc) with a 1-based
    ``rank_col``; ``labels`` carries graded relevance (query, doc,
    rel >= 0 integer; missing pairs count as rel 0; NULL/negative rel
    rows are dropped). Metrics at cutoff ``k``:

    - ``mrr_ppm`` = floor(1e6 / first rank with rel > 0), 0 if none;
    - ``precision_ppm`` = floor(1e6 · hits@k / k) (fixed denominator k,
      comparable across queries even when fewer than k results exist);
    - ``recall_ppm`` = floor(1e6 · hits@k / n_rel_total), NULL when the
      query has no relevant docs;
    - ``ndcg_ppm`` = floor(1e6 · DCG@k / IDCG@k) with linear gains on
      the pinned :func:`ndcg_weights_e9` grid; IDCG ranks the query's
      relevant set by (rel desc, doc asc — the deterministic tie-break);
      NULL when IDCG = 0.

    Output: ``(query, n_results, n_rel_total, hits_at_k, first_rel_rank,
    mrr_ppm, precision_ppm, recall_ppm, ndcg_ppm)`` — one row per query
    with at least one result in ranks 1..k (rows with a rank outside
    that range are dropped, so a 0/negative rank never indexes the
    weight grid). Queries with labels but no surviving results are the
    retriever's recall-0 bug — surface them by joining your query list.

    Plan: one equi-join of the rank<=k slice against labels, one window
    over the labels' per-query relevant set (judgment-depth-sized), two
    query-keyed aggregates — nothing corpus-sized shuffles.
    """
    if k < 1:
        raise ValueError(f"ranking_metrics: k must be >= 1, got {k}")
    w = ndcg_weights_e9(k)
    warr = F.array(*[F.lit(x).cast("bigint") for x in w])

    lab = labels.filter(
        F.col(query_col).isNotNull() & F.col(doc_col).isNotNull()
        & F.col(rel_col).isNotNull() & (F.col(rel_col) >= 0)
    ).select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d"),
        F.col(rel_col).cast("bigint").alias("__rel"),
    )
    # sets, not bags, on both sides: duplicate judgments (merged files)
    # resolve to the STRONGEST relevance, and a doc listed at two ranks
    # counts once at its best placement — bag semantics would multiply
    # hits/DCG/n_rel_total through the join with no error
    lab = lab.groupBy("__q", "__d").agg(F.max("__rel").alias("__rel"))
    res = results.filter(
        (F.col(rank_col) >= 1) & (F.col(rank_col) <= k)
    ).select(
        F.col(query_col).alias("__q"), F.col(doc_col).alias("__d"),
        F.col(rank_col).cast("int").alias("__rk"),
    )
    res = res.groupBy("__q", "__d").agg(F.min("__rk").alias("__rk"))
    j = res.join(lab, on=["__q", "__d"], how="left").withColumn(
        "__rel", F.coalesce(F.col("__rel"), F.lit(0))
    )
    per_res = j.groupBy("__q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_results"),
        F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0))
        .cast("bigint").alias("hits_at_k"),
        F.min(F.when(F.col("__rel") > 0, F.col("__rk"))).alias(
            "first_rel_rank"
        ),
        F.sum(
            F.col("__rel") * F.element_at(warr, F.col("__rk"))
        ).cast("decimal(38,0)").alias("__dcg"),
    )
    from pyspark.sql import Window

    rel_only = lab.filter(F.col("__rel") > 0)
    iw = Window.partitionBy("__q").orderBy(
        F.col("__rel").desc(), F.col("__d").asc()
    )
    ideal = rel_only.withColumn("__rn", F.row_number().over(iw))
    per_lab = ideal.groupBy("__q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rel_total"),
        F.sum(
            F.when(
                F.col("__rn") <= k,
                F.col("__rel") * F.element_at(warr, F.col("__rn")),
            ).otherwise(0)
        ).cast("decimal(38,0)").alias("__idcg"),
    )
    out = per_res.join(per_lab, on="__q", how="left")
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    ppm = F.lit(1_000_000).cast("decimal(38,0)")
    nrel = F.coalesce(F.col("n_rel_total"), F.lit(0).cast("bigint"))
    idcg = F.coalesce(F.col("__idcg"), F.lit(0).cast("decimal(38,0)"))
    return out.select(
        F.col("__q").alias(query_col),
        "n_results",
        nrel.alias("n_rel_total"),
        "hits_at_k",
        "first_rel_rank",
        F.coalesce(
            F.expr("1000000 DIV first_rel_rank"), F.lit(0).cast("bigint")
        ).alias("mrr_ppm"),
        F.expr(f"hits_at_k * 1000000 DIV {int(k)}").alias("precision_ppm"),
        F.when(
            nrel > 0,
            exact_floor_div(
                F.col("hits_at_k").cast("decimal(38,0)") * ppm,
                nrel.cast("decimal(38,0)"),
            ),
        ).alias("recall_ppm"),
        F.when(
            idcg > 0, exact_floor_div(F.col("__dcg") * ppm, idcg)
        ).alias("ndcg_ppm"),
    )


def ranking_summary(
    per_query: DataFrame,
    *,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Macro-averaged corpus verdict over :func:`ranking_metrics` output:
    ``group_by + (n_queries, mean_mrr_ppm, mean_precision_ppm,
    mean_recall_ppm, mean_ndcg_ppm)`` — each mean is the exact
    ``floor(Σ ppm / n)`` over the queries where that metric is defined
    (recall/ndcg skip their NULL rows, the no-relevant-docs queries;
    NULL when no query defines them). Integer sums of integer ppms, so
    the headline "mean NDCG@10" is reproducible bit-for-bit."""
    gb = list(group_by)
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    def _mean(col):
        return F.when(
            F.count(F.col(col)) > 0,
            exact_floor_div(
                F.sum(F.col(col)).cast("decimal(38,0)"),
                F.count(F.col(col)).cast("decimal(38,0)"),
            ),
        ).alias(f"mean_{col}")

    exprs = [
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        _mean("mrr_ppm"),
        _mean("precision_ppm"),
        _mean("recall_ppm"),
        _mean("ndcg_ppm"),
    ]
    return per_query.groupBy(*gb).agg(*exprs) if gb else per_query.agg(*exprs)
