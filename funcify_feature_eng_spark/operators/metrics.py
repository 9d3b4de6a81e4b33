"""Distributed evaluation metrics for feature/model pipelines.

Rounds out the eval family (kNN label precision in retrieval.py, allclose
parity in parity.py, TVD drift in drift.py) with the standard ranking
metric: per-group ROC-AUC via the Mann-Whitney rank-sum identity —
``AUC = (R_pos − n_pos·(n_pos+1)/2) / (n_pos·n_neg)`` where ``R_pos`` is
the sum of the positives' AVERAGE ranks (ties share the mean of their rank
range, the textbook tie treatment). No O(n²) pair enumeration: one window
sort per group + one aggregation.

Engine-portable by construction (oracle-gated): ranks are integers, tie
adjustments are exact halves, and every intermediate (rank sums bounded by
n² ≪ 2^52, halves) is exactly representable in IEEE doubles — so the one
final division produces bit-identical results in any engine from the same
rows, no matter the summation order.

Reference anchor: the reference computes features, not metrics
(materializer modules) — scoring the features it produces is the
capability a Spark user adds on top (SURVEY §2 extensions).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def group_auc(
    df: DataFrame,
    label_col: str | Column,
    score_col: str | Column,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Per-group ROC-AUC of ``score_col`` against boolean ``label_col``.

    Emits ``(group..., n_pos, n_neg, auc)``; ``auc`` is NULL when a group
    lacks both classes (undefined). Rows with NULL label or score drop.
    Higher scores ranking positives higher ⇒ AUC → 1; 0.5 = chance.

    Scale shape: ONE exchange (the per-group rank window; the tie-count
    window shares its partitioning) + a combinable aggregation. At 10^12
    rows partition by entity/day groups — a single global AUC over
    everything funnels one group through one task, like any global sort.
    """
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    sc = F.col(score_col) if isinstance(score_col, str) else score_col
    keys = list(group_by)
    part = keys or [F.lit(1)]
    base = df.filter(lab.isNotNull() & sc.isNotNull()).select(
        *keys, lab.cast("boolean").alias("__y"), sc.alias("__s")
    )
    w_rank = W.partitionBy(*part).orderBy("__s")
    w_tie = W.partitionBy(*part, "__s")
    # average rank of a tie block = min_rank + (block_size - 1)/2
    avg_rank = (
        F.rank().over(w_rank).cast("double")
        + (F.count(F.lit(1)).over(w_tie).cast("double") - F.lit(1.0)) / F.lit(2.0)
    )
    ranked = base.withColumn("__r", avg_rank)
    gb = ranked.groupBy(*keys) if keys else ranked.groupBy()
    agg = gb.agg(
        F.sum(F.when(F.col("__y"), F.col("__r"))).alias("__rpos"),
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("long").alias("n_pos"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).cast("long").alias("n_neg"),
    )
    np_, nn = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    auc = (F.col("__rpos") - np_ * (np_ + F.lit(1.0)) / F.lit(2.0)) / (np_ * nn)
    return agg.select(
        *keys,
        "n_pos",
        "n_neg",
        F.when((F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc).alias("auc"),
    )


def label_gini(
    df: DataFrame,
    *,
    feature: str,
    label: str,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Per-feature-value label purity: Gini impurity + majority share,
    exact to the ppm floor — the split-quality screen ("does bucketing
    by this feature separate the labels?") that pairs with
    :func:`~funcify_feature_eng_spark.operators.agreement.chi2_association`
    (global association) and cumulative target encoding (per-value
    signal). Gini is the impurity measure that stays RATIONAL —
    1 − Σ_k (c_k/n)² — so unlike entropy it needs no log call and an
    independent engine reproduces it bit-for-bit:
    ``gini_ppm = floor(1e6 · (n² − Σ_k c_k²) / n²)``.

    NULL feature/label rows are excluded. Output per group:
    ``group_by + (feature value, n, n_labels, majority_ppm, gini_ppm)``
    where ``majority_ppm = floor(1e6 · max_k c_k / n)``. Gini of a pure
    value is 0; of a uniform K-label value, (1 − 1/K) · 1e6 (floored).

    Scale: one groupBy onto (feature × label)-sized rows, one onto
    feature-sized rows — both map-side combined; decimal(38) headroom
    past 10^15 rows per feature value.
    """
    gb = list(group_by)
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    pairs = df.filter(
        F.col(feature).isNotNull() & F.col(label).isNotNull()
    ).select(*gb, F.col(feature).alias("__f"), F.col(label).alias("__y"))
    cell = pairs.groupBy(*gb, "__f", "__y").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__c")
    )
    per = cell.groupBy(*gb, "__f").agg(
        F.sum("__c").alias("__n"),
        F.count(F.lit(1)).cast("bigint").alias("n_labels"),
        F.max("__c").alias("__maj"),
        F.sum(F.col("__c") * F.col("__c")).alias("__sq"),
    )
    n = F.col("__n")
    return per.select(
        *gb,
        F.col("__f").alias(feature),
        n.cast("bigint").alias("n"),
        "n_labels",
        exact_floor_div(F.col("__maj") * F.lit(1_000_000), n)
        .alias("majority_ppm"),
        exact_floor_div(
            (n * n - F.col("__sq")) * F.lit(1_000_000), n * n
        ).alias("gini_ppm"),
    )


def poisson_cdf_thresholds_u32(max_events: int = 8) -> list[int]:
    """Cumulative Poisson(1) CDF on the u32 grid: threshold t_k =
    round(2^32 · P(X <= k)) for k = 0..max_events−1, computed ONCE at
    plan time in Python and embedded as literals in both engines (the
    same device as :func:`~funcify_feature_eng_spark.operators.retrieval.ndcg_weights_e9`
    — no transcendental call ever enters a plan). A uniform u32 draw u
    maps to the replicate weight w = #{k : u >= t_k} (so w follows
    Poisson(1) truncated at max_events, the standard online-bootstrap
    approximation; P(X > 8) ≈ 1e-6)."""
    import math

    inv_e = math.exp(-1.0)
    cdf, term = 0.0, inv_e
    out = []
    for k in range(max_events):
        cdf += term
        out.append(min(int(round(cdf * 2**32)), 2**32))
        term /= (k + 1)
    return out


def poisson_bootstrap(
    df: DataFrame,
    *,
    value: str,
    id_col: str,
    n_replicates: int = 32,
    group_by: Sequence[str] = (),
    hash: bool = True,
    max_events: int = 8,
) -> DataFrame:
    """One-pass Poisson bootstrap (Owen & Eckles 2012, public method):
    per-replicate weighted means of an INTEGER metric column, without
    ever materializing a resample. The way to put a confidence interval
    on a corpus statistic at 10^12 rows — resampling-with-replacement
    is a shuffle of the whole corpus per replicate; Poisson weights are
    a map-side expression.

    Each row gets, per replicate r, a deterministic weight w ~
    Poisson(1) derived from a uniform key over (id, r): ``hash=True``
    uses xxhash64 (production — properly mixed); ``hash=False`` uses the
    knuth multiplicative key on ``(id mod 2^31)·2654435761 + r·40503``
    (the SQL-universal oracle convention, exact in any engine's BIGINT).
    The knuth key is LINEAR in id, so hash=False exists for cross-engine
    value gating, not statistics: a metric that is itself periodic in id
    can correlate with the weights. Use hash=True for real intervals.
    ``value`` must be integral (the house fixed-point rule — pre-scale
    doubles onto a ppm grid); means are exact floor-ppm:
    ``mean_e6 = floor(1e6 · Σ w·x / Σ w)``, NULL when the replicate
    drew no rows. NULL id/value rows are excluded.

    Output: ``group_by + (replicate, n_eff, mean_e6)`` with
    ``n_eff = Σ w`` — n_replicates rows per group. Pair with
    :func:`bootstrap_ci` for the rank-based interval.

    Scale: explode(replicates) multiplies rows ×B BEFORE the aggregate,
    but partial aggregation combines per partition, so the shuffle
    carries B rows per partition per group — not B× the data. B=32–100
    replicates is the published operating range.
    """
    if n_replicates < 1:
        raise ValueError(f"n_replicates must be >= 1, got {n_replicates}")
    gb = list(group_by)
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    thresholds = poisson_cdf_thresholds_u32(max_events)
    rows = df.filter(
        F.col(id_col).isNotNull() & F.col(value).isNotNull()
    ).select(
        *gb, F.col(id_col).alias("__id"),
        F.col(value).cast("bigint").alias("__x"),
    )
    rep = rows.withColumn(
        "replicate",
        F.explode(F.array(*[F.lit(r) for r in range(n_replicates)])),
    )
    if hash:
        u = F.pmod(
            F.xxhash64(F.col("__id"), F.col("replicate")), F.lit(2**32)
        )
    else:
        u = F.pmod(
            F.pmod(F.col("__id"), F.lit(2**31)) * F.lit(2654435761)
            + F.col("replicate").cast("bigint") * F.lit(40503),
            F.lit(2**32),
        )
    w = None
    for t in thresholds:
        term = (u >= F.lit(t)).cast("long")
        w = term if w is None else (w + term)
    rep = rep.withColumn("__w", w)
    agg = rep.groupBy(*gb, "replicate").agg(
        F.sum("__w").cast("bigint").alias("n_eff"),
        F.sum(
            (F.col("__w") * F.col("__x")).cast("decimal(38,0)")
        ).alias("__wx"),
    )
    return agg.select(
        *gb, "replicate", "n_eff",
        F.when(
            F.col("n_eff") > 0,
            exact_floor_div(
                F.col("__wx") * F.lit(1_000_000),
                F.col("n_eff").cast("decimal(38,0)"),
            ),
        ).alias("mean_e6"),
    )


def bootstrap_ci(
    replicates: DataFrame,
    *,
    mean_col: str = "mean_e6",
    group_by: Sequence[str] = (),
    alpha_ppm: int = 50_000,
) -> DataFrame:
    """Rank-based bootstrap interval over :func:`poisson_bootstrap`'s
    per-replicate means: with the B non-NULL means sorted ascending,
    ``lo = elem[floor((B−1)·α)]``, ``hi = elem[ceil((B−1)·(1−α))]``
    (α = alpha_ppm/1e6 per tail — the percentile-bootstrap endpoints on
    exact integer ranks, no interpolation, so any engine reproduces
    them). Output: ``group_by + (n_replicates, lo_e6, median_e6,
    hi_e6)``. B values per group collect into one array — bounded by
    n_replicates, never data-sized."""
    if not (0 <= alpha_ppm < 500_000):
        raise ValueError(f"alpha_ppm must be in [0, 5e5), got {alpha_ppm}")
    gb = list(group_by)
    vals = replicates.filter(F.col(mean_col).isNotNull())
    exprs = [
        F.array_sort(F.collect_list(F.col(mean_col))).alias("__ms"),
    ]
    agg = vals.groupBy(*gb).agg(*exprs) if gb else vals.agg(*exprs)
    b = F.size("__ms")
    # integer rank arithmetic: floor via DIV, ceil via negated DIV
    lo_rank = F.expr(
        f"(size(__ms) - 1) * {int(alpha_ppm)} DIV 1000000"
    )
    # ceil for non-negative operands = (a + b - 1) DIV b (Spark's DIV
    # truncates toward zero, so the negate trick would floor, not ceil)
    hi_rank = F.expr(
        f"((size(__ms) - 1) * {int(1_000_000 - alpha_ppm)} + 999999)"
        " DIV 1000000"
    )
    med_rank = F.expr("(size(__ms) - 1) DIV 2")
    def _pick(rank):
        # try_element_at: zero non-NULL means (empty input) must yield a
        # NULL-endpoint row, not an ANSI INVALID_ARRAY_INDEX crash — the
        # same degenerate answer the SQL twin's ms[1] gives
        return F.try_element_at(F.col("__ms"), (rank + 1).cast("int"))

    return agg.select(
        *gb,
        b.cast("int").alias("n_replicates"),
        _pick(lo_rank).alias("lo_e6"),
        _pick(med_rank).alias("median_e6"),
        _pick(hi_rank).alias("hi_e6"),
    )


def ranking_metrics(
    results: DataFrame,
    truth: DataFrame,
    *,
    query_col: str,
    doc_col: str,
    rank_col: str,
    k: int,
) -> DataFrame:
    """Exact per-query retrieval quality on the integer ppm grid:
    precision@k, recall@k, and reciprocal rank — the eval harness for the
    retrieval family (bm25_topk, ann_*_topk, hybrid_rrf), whose outputs
    are exactly this ``(query, doc, rank)`` shape.

    Inputs: ``results`` holds predicted rankings (``rank_col`` 1-based;
    rows with rank > k or NULL ignored; duplicate ``(query, doc)`` rows
    collapse to their best rank — sets, not bags, on BOTH sides); ``truth``
    holds the relevant ``(query, doc)`` pairs (binary relevance;
    duplicates collapse). Output
    one row per query appearing in EITHER side::

        (query_col, n_relevant, n_retrieved, n_hits,
         precision_ppm, recall_ppm, rr_ppm)

    ``precision_ppm = floor(hits*1e6 / n_retrieved)`` (NULL when the query
    retrieved nothing), ``recall_ppm = floor(hits*1e6 / n_relevant)``
    (NULL when the query has no relevant docs — undefined, not zero), and
    ``rr_ppm = floor(1e6 / first_hit_rank)`` (0 when no hit in the top k —
    the MRR convention). All exact LONG division; any engine reproduces
    the numbers from the same rows.

    Plan shape: ONE combinable aggregate per side plus an inner join of
    results x truth on (query, doc) for the hit set — every shuffle is on
    (query) or (query, doc) keys at group grain; nothing is windowed over
    the corpus. Skewed queries cost what their own top-k costs.

    Reference anchor: the reference computes features, not metrics —
    SURVEY §2 extension beside group_auc / knn_label_eval.
    """
    if k < 1:
        raise ValueError(f"ranking_metrics: k must be >= 1, got {k}")
    q, d, r = F.col(query_col), F.col(doc_col), F.col(rank_col)
    res = (
        results.filter(
            q.isNotNull() & d.isNotNull() & r.isNotNull() & (r <= k) & (r >= 1)
        )
        .select(q.alias("__q"), d.alias("__d"), r.cast("long").alias("__r"))
        # sets, not bags: a doc listed at two ranks within the top k counts
        # once (best rank) — truth is already deduped, and bag semantics
        # would inflate n_hits/precision past the true hit-set size
        .groupBy("__q", "__d")
        .agg(F.min("__r").alias("__r"))
    )
    tru = (
        truth.filter(q.isNotNull() & d.isNotNull())
        .select(q.alias("__q"), d.alias("__d"))
        .distinct()
    )
    ret = res.groupBy("__q").agg(F.count(F.lit(1)).cast("long").alias("n_retrieved"))
    rel = tru.groupBy("__q").agg(F.count(F.lit(1)).cast("long").alias("n_relevant"))
    hits = (
        res.join(tru, ["__q", "__d"])
        .groupBy("__q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.min("__r").alias("__first_hit"),
        )
    )
    j = (
        rel.join(ret, "__q", "full_outer")
        .join(hits, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.coalesce("n_relevant", F.lit(0)).cast("long").alias("n_relevant"),
            F.coalesce("n_retrieved", F.lit(0)).cast("long").alias("n_retrieved"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.col("__first_hit"),
        )
    )
    return j.select(
        query_col,
        "n_relevant",
        "n_retrieved",
        "n_hits",
        F.when(
            F.col("n_retrieved") > 0,
            F.expr("(n_hits * 1000000L) div n_retrieved"),
        )
        .cast("long")
        .alias("precision_ppm"),
        F.when(
            F.col("n_relevant") > 0,
            F.expr("(n_hits * 1000000L) div n_relevant"),
        )
        .cast("long")
        .alias("recall_ppm"),
        F.coalesce(
            F.expr("1000000L div __first_hit"), F.lit(0)
        )
        .cast("long")
        .alias("rr_ppm"),
    )
