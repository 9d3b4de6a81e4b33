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
