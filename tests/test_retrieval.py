

def _ranking_ref(results, labels, k):
    """Independent pure-Python ranking-metrics reference (floor ppm)."""
    from math import floor, log2

    w = [int(1_000_000_000 // log2(r + 1)) for r in range(1, k + 1)]
    lab = {
        (q, d): r for q, d, r in labels if None not in (q, d, r) and r >= 0
    }
    out = {}
    byq = {}
    for q, d, rk in results:
        if rk <= k:
            byq.setdefault(q, []).append((rk, d))
    for q, rows in byq.items():
        rels = [(rk, lab.get((q, d), 0)) for rk, d in rows]
        hits = sum(1 for _, r in rels if r > 0)
        first = min((rk for rk, r in rels if r > 0), default=None)
        dcg = sum(r * w[rk - 1] for rk, r in rels)
        qrel = sorted(
            ((d, r) for (qq, d), r in lab.items() if qq == q and r > 0),
            key=lambda t: (-t[1], t[0]),
        )
        idcg = sum(r * w[i] for i, (_, r) in enumerate(qrel[:k]))
        out[q] = (
            len(rows), len(qrel), hits, first,
            1_000_000 // first if first else 0,
            hits * 1_000_000 // k,
            floor(1_000_000 * hits / len(qrel)) if qrel else None,
            floor(1_000_000 * dcg / idcg) if idcg else None,
        )
    return out


def test_ranking_metrics_match_reference(spark):
    from funcify_feature_eng_spark.operators.retrieval import ranking_metrics

    results = [
        ("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3), ("q1", "d9", 4),
        ("q2", "d4", 1), ("q2", "d5", 2),
        ("q3", "d6", 1), ("q3", "d7", 2),          # nothing relevant
        ("q1", "d8", 99),                            # beyond cutoff
    ]
    labels = [
        ("q1", "d2", 2), ("q1", "d3", 1), ("q1", "d7", 3),  # d7 unretrieved
        ("q2", "d4", 1),
        ("q3", "dX", 1),                             # relevant, missed
        ("q1", "dN", -1), ("q1", None, 5),           # dropped rows
    ]
    rdf = spark.createDataFrame(results, "query_id string, doc_id string, rank int")
    ldf = spark.createDataFrame(labels, "query_id string, doc_id string, rel int")
    got = {
        r["query_id"]: (
            r["n_results"], r["n_rel_total"], r["hits_at_k"],
            r["first_rel_rank"], r["mrr_ppm"], r["precision_ppm"],
            r["recall_ppm"], r["ndcg_ppm"],
        )
        for r in ranking_metrics(rdf, ldf, k=3).collect()
    }
    ref = _ranking_ref(
        results, [(q, d, r) for q, d, r in labels], 3)
    assert got == ref
    # q2 retrieved its only relevant doc at rank 1: perfect scores
    assert got["q2"][4] == 1_000_000 and got["q2"][7] == 1_000_000
    # q3 found nothing relevant: mrr 0, ndcg NULL only if idcg 0 — here
    # dX is relevant but unretrieved, so idcg > 0 and ndcg = 0
    assert got["q3"][4] == 0 and got["q3"][7] == 0


def test_ranking_metrics_edges(spark):
    import pytest
    from funcify_feature_eng_spark.operators.retrieval import ranking_metrics

    rdf = spark.createDataFrame(
        [("q", "d", 1)], "query_id string, doc_id string, rank int")
    ldf = spark.createDataFrame(
        [], "query_id string, doc_id string, rel int")
    row = ranking_metrics(rdf, ldf, k=5).collect()[0]
    # no labels at all: recall and ndcg undefined, mrr/precision 0
    assert row["recall_ppm"] is None and row["ndcg_ppm"] is None
    assert row["mrr_ppm"] == 0 and row["precision_ppm"] == 0
    with pytest.raises(ValueError):
        ranking_metrics(rdf, ldf, k=0)


def test_ranking_metrics_rejects_nonpositive_ranks(spark):
    from funcify_feature_eng_spark.operators.retrieval import ranking_metrics

    rdf = spark.createDataFrame(
        [("q", "d0", 0), ("q", "dneg", -1), ("q", "d1", 1)],
        "query_id string, doc_id string, rank int")
    ldf = spark.createDataFrame(
        [("q", "d1", 1), ("q", "dneg", 1)],
        "query_id string, doc_id string, rel int")
    row = ranking_metrics(rdf, ldf, k=5).collect()[0]
    # rank 0 / negative rows are dropped BEFORE any weight-grid indexing:
    # no INVALID_INDEX_OF_ZERO crash, no last-weight aliasing, and the
    # relevant-but-invalid-rank doc never contributes to MRR
    assert row["n_results"] == 1 and row["first_rel_rank"] == 1
    assert row["mrr_ppm"] == 1_000_000 and row["ndcg_ppm"] is not None


def test_ranking_summary_macro_average(spark):
    from funcify_feature_eng_spark.operators.retrieval import ranking_summary

    rows = [
        ("q1", 1_000_000, 600_000, 500_000, 800_000),
        ("q2", 500_000, 200_000, None, None),      # no relevant docs
        ("q3", 0, 0, 0, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "query_id string, mrr_ppm long, precision_ppm long, "
        "recall_ppm long, ndcg_ppm long",
    )
    row = ranking_summary(df).collect()[0]
    assert row["n_queries"] == 3
    assert row["mean_mrr_ppm"] == 500_000
    assert row["mean_precision_ppm"] == (600_000 + 200_000 + 0) // 3
    # NULL metrics averaged over DEFINED queries only
    assert row["mean_recall_ppm"] == 250_000
    assert row["mean_ndcg_ppm"] == 400_000
