"""Data-selection operators for LLM training-corpus curation.

Two first-class curation ops a 100 TB pipeline needs beyond dedup/sampling:

* :func:`dsir_scores` / :func:`dsir_select` — Data Selection via Importance
  Resampling (DSIR; Xie et al. 2023, arXiv:2302.03169, public): score every
  raw document by how target-like its hashed n-gram distribution is, then
  keep the top-k. The published method fits two bag-of-hashed-ngrams
  unigram models (target vs raw) and weights each doc by the log-likelihood
  ratio; the sampling step here is the deterministic top-k variant so the
  result is reproducible and oracle-checkable (documented divergence from
  the paper's Gumbel resampling).
* :func:`frequency_cap` — per-group document cap (RefinedWeb/C4-style
  domain capping): keep at most ``cap`` documents per group, chosen by a
  deterministic pseudo-random order so no content bias sneaks in.

Scale design (100 TB posture):

* DSIR shuffles only O(n_buckets) count rows (map-side combined), never
  text; the bucket→score table (default 4096 rows of two ints) is computed
  once driver-side from the collected counts — a bounded collect in the
  same class as IVF's centroid collect — and broadcast back, so the scoring
  pass is explode → broadcast hash join → one map-side-combined sum per
  doc. Integer micro-nat scores make the result independent of engine float
  `ln` (the same hazard BM25 rationalized away).
* frequency_cap's default path is a single window; ``two_phase=True``
  pre-prunes each salted partition to ``cap`` rows before the per-group
  window, so a pathologically hot group shuffles at most cap × n_salts
  rows into the final sort instead of its full population.

This extends the reference's transformer surface (no counterpart there —
the reference's selection story stops at GraphQL argument filtering,
`materializer/.../DefaultSingleRequestMaterializationGraphService.kt`);
it is part of the beyond-reference LLM-pipeline tier alongside
``operators/dedup.py`` and ``operators/sampling.py``.
"""

from __future__ import annotations

import math

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import shingles
from .sampling import knuth_key

__all__ = ["dsir_scores", "dsir_select", "frequency_cap", "preference_pairs"]


def _grams(c: Column) -> Column:
    """Word unigrams + bigrams (the DSIR paper's hashed n-gram features).

    Reuses :func:`~funcify_feature_eng_spark.functions.text.shingles`
    (k=1 and k=2) so the tokenization is byte-identical to the dedup
    family and its locked pure-Python twin (`scripts/make_fixtures.py::
    _shingles`). Empty/NULL text contributes the single empty-string gram
    each (shingles' short-input convention), identically on both sides.
    """
    return F.concat(shingles(c, 1), shingles(c, 2))


def _bucket_scores(
    pair_counts: list[tuple[int, int, int]],
    n_buckets: int,
    smoothing: int,
    scale: int,
) -> list[tuple[int, int]]:
    """Integer micro-nat log-likelihood-ratio score per bucket.

    score_b = round(scale * ln( p_target(b) / p_raw(b) )) with add-
    ``smoothing`` Laplace estimates. Computed in driver Python from exact
    integer counts, so the only float op (`math.log`) runs once per bucket
    in one interpreter — engine-side arithmetic stays integer-exact.
    """
    total_raw = sum(r for _, r, _ in pair_counts)
    total_tgt = sum(t for _, _, t in pair_counts)
    denom_raw = total_raw + smoothing * n_buckets
    denom_tgt = total_tgt + smoothing * n_buckets
    out: list[tuple[int, int]] = []
    for b, r, t in pair_counts:
        llr = (
            math.log(t + smoothing)
            - math.log(denom_tgt)
            - math.log(r + smoothing)
            + math.log(denom_raw)
        )
        out.append((b, int(math.floor(llr * scale + 0.5))))
    return out


def dsir_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    *,
    n_buckets: int = 4096,
    smoothing: int = 1,
    scale: int = 1_000_000,
) -> DataFrame:
    """Score every row by target-likeness (DSIR importance weight).

    ``target`` is a boolean Column marking the in-``df`` rows that define
    the target distribution (e.g. ``F.col("lang") == "en"``); the raw
    distribution is all of ``df``. Returns ``(id_col, dsir_score)`` with
    ``dsir_score: bigint`` = sum over the doc's gram occurrences of the
    bucket's integer micro-nat log-likelihood ratio. Higher = more
    target-like. Deterministic given the corpus.

    Plan shape: one explode+count pass (shuffle = O(n_buckets) rows), a
    bounded driver collect of the count table, then one explode + broadcast
    join + map-side-combined sum keyed by ``id_col``.
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    from funcify_feature_eng_spark.operators.util import spread_small_input

    spark = df.sparkSession
    # the gram explode runs twice (count pass + score pass) and is the
    # dense map stage; spread a single-split input across cores (no-op at
    # scale)
    df = spread_small_input(df)
    exploded = df.select(
        F.col(id_col),
        target.cast("boolean").alias("__is_tgt"),
        F.explode(_grams(F.col(text_col))).alias("__g"),
    ).withColumn("__b", F.pmod(F.xxhash64(F.col("__g")), F.lit(n_buckets)))

    counts = (
        exploded.groupBy("__b")
        .agg(
            F.count(F.lit(1)).alias("__raw"),
            F.sum(F.when(F.col("__is_tgt"), 1).otherwise(0)).alias("__tgt"),
        )
        .collect()  # bounded: at most n_buckets rows (default 4096)
    )
    pair_counts = [(int(r["__b"]), int(r["__raw"]), int(r["__tgt"])) for r in counts]
    if not any(t for _, _, t in pair_counts):
        raise ValueError("dsir_scores: target predicate selected no rows")
    score_rows = _bucket_scores(pair_counts, n_buckets, smoothing, scale)
    # Buckets absent from the corpus never appear in any doc, so they need
    # no score row; the broadcast table is <= n_buckets rows of two longs.
    score_df = spark.createDataFrame(score_rows, "__b: long, __s: long")

    return (
        exploded.join(F.broadcast(score_df), on="__b", how="inner")
        .groupBy(id_col)
        .agg(F.sum("__s").alias("dsir_score"))
    )


def dsir_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    k: int,
    *,
    n_buckets: int = 4096,
    smoothing: int = 1,
    scale: int = 1_000_000,
) -> DataFrame:
    """Keep the ``k`` most target-like documents (deterministic DSIR).

    Top-k by ``(dsir_score desc, id asc)`` — the id tie-break makes the
    boundary reproducible (integer scores tie exactly, never by float
    noise). Spark plans the orderBy+limit as TakeOrderedAndProject (per-
    partition heap + driver merge of k rows), so no global sort happens.
    """
    scored = dsir_scores(
        df, id_col, text_col, target,
        n_buckets=n_buckets, smoothing=smoothing, scale=scale,
    )
    return (
        scored.orderBy(F.col("dsir_score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "dsir_score")
    )


def frequency_cap(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    *,
    hash: bool = True,
    two_phase: bool = False,
    n_salts: int = 16,
) -> DataFrame:
    """Keep at most ``cap`` rows per ``group_col`` (domain capping).

    The kept rows are the ``cap`` smallest under a deterministic
    pseudo-random order key — ``xxhash64(id)`` (``hash=True``, the scale
    path) or the module's knuth multiplicative key (``hash=False``, the
    SQL-oracle-expressible twin used across ``operators/sampling.py``) —
    with ``id_col`` as the tie-break, so the selection is content-unbiased
    and reproducible.

    ``two_phase=True`` is the hot-group path: rows are first ranked within
    (group, salt) partitions — salt = pmod(key, n_salts), so the phase-1
    window's partition count is n_salts× the group count and no single
    sort sees a whole hot group — and pruned to ``cap`` each; only
    cap × n_salts survivors per group reach the final per-group window.
    Identical output to the single-window path (both rank by the same
    (key, id) order; phase 1 only discards rows that provably cannot be in
    the group's true top-``cap``).
    """
    if cap <= 0:
        raise ValueError("cap must be positive")
    key = (F.xxhash64(F.col(id_col)) if hash else knuth_key(id_col)).alias("__fc_key")
    from pyspark.sql import Window

    ranked = df.withColumn("__fc_key", key)
    if two_phase:
        salted = Window.partitionBy(
            group_col, F.pmod(F.col("__fc_key"), F.lit(n_salts))
        ).orderBy(F.col("__fc_key").asc(), F.col(id_col).asc())
        ranked = (
            ranked.withColumn("__fc_local", F.row_number().over(salted))
            .where(F.col("__fc_local") <= cap)
            .drop("__fc_local")
        )
    w = Window.partitionBy(group_col).orderBy(
        F.col("__fc_key").asc(), F.col(id_col).asc()
    )
    return (
        ranked.withColumn("__fc_rank", F.row_number().over(w))
        .where(F.col("__fc_rank") <= cap)
        .drop("__fc_rank", "__fc_key")
    )


def preference_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    *,
    strict: bool = True,
    text_col: str | None = None,
    min_margin: float | None = None,
) -> DataFrame:
    """Mine one (chosen, rejected) preference pair per group (DPO/RLHF
    pair construction): within each ``group_col`` (e.g. prompt id), chosen
    is the candidate with the highest ``score_col``, rejected the lowest.

    Tie rule is the struct-ordering convention used across the repo:
    chosen ties resolve to the LARGER ``id_col``, rejected ties to the
    SMALLER — both deterministic and SQL-reproducible. NULL-scored
    candidates are excluded up front. ``strict=True`` (default) keeps only
    groups with ``margin > 0`` (a group whose candidates all tie yields no
    training signal; it would also make chosen == rejected possible).
    ``min_margin`` additionally drops pairs below the floor — low-margin
    pairs are near-noise for a DPO trainer; margin is a plain subtraction
    of two stored values (no accumulation), so the cut is IEEE-exact
    cross-engine.

    ``text_col`` carries the candidate payload through as ``chosen_text``
    / ``rejected_text`` (the actual DPO training unit) via ``max_by`` /
    ``min_by`` on the same ``(score, id)`` ordering struct — identical tie
    semantics; ``id_col`` must be unique within a group for the carried
    text to be deterministic (ids are, on every spine this repo builds).

    Returns ``(group_col, chosen_id, rejected_id, chosen_score,
    rejected_score, margin[, chosen_text, rejected_text])``. Plan: a
    single map-side-combined groupBy with two struct min/max (or
    min_by/max_by) aggregates — one shuffle of one row per group, no
    window, no self-join; at 100 TB this is the cheapest possible shape
    for per-group argmax/argmin.
    """
    scored = df.where(F.col(score_col).isNotNull())
    ordkey = F.struct(F.col(score_col), F.col(id_col))
    if text_col is None:
        top, bot = F.max(ordkey), F.min(ordkey)
    else:
        payload = F.struct(
            F.col(score_col), F.col(id_col), F.col(text_col).alias("__txt")
        )
        top, bot = F.max_by(payload, ordkey), F.min_by(payload, ordkey)
    agg = scored.groupBy(group_col).agg(top.alias("__hi"), bot.alias("__lo"))
    # getField, not F.col(f"__hi.{name}"): a dotted user column name would
    # parse as a deeper nested reference in the string form
    hi, lo = F.col("__hi"), F.col("__lo")
    out = agg.select(
        group_col,
        hi.getField(id_col).alias("chosen_id"),
        lo.getField(id_col).alias("rejected_id"),
        hi.getField(score_col).alias("chosen_score"),
        lo.getField(score_col).alias("rejected_score"),
        (hi.getField(score_col) - lo.getField(score_col)).alias("margin"),
        *(
            []
            if text_col is None
            else [
                F.col("__hi.__txt").alias("chosen_text"),
                F.col("__lo.__txt").alias("rejected_text"),
            ]
        ),
    )
    cond = F.col("margin") > 0
    if min_margin is not None:
        cond = cond & (F.col("margin") >= F.lit(float(min_margin)))
    if not strict and min_margin is None:
        return out
    return out.where(cond)


def pareto_front(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    group_by: Sequence[str] = (),
    out_col: str = "on_front",
) -> DataFrame:
    """2-D skyline: flag rows not strictly dominated on (minimize
    ``x_col``, minimize ``y_col``) within each group — "the cheapest
    option at every quality level", the multi-objective selection
    primitive behind price/size trade-off picks and quality/cost corpus
    curation. A row is dominated iff some other row is <= on both
    dimensions and < on at least one; exact ties on both dimensions
    dominate nothing (both survive).

    Plan: the naive definition is an O(n²) self-join. This is the sort +
    running-min formulation instead: ordered by (x, y), a row is
    dominated exactly when ``min(y) over rows with smaller x`` <= its y,
    or ``min(y) over rows with x <= its x`` < its y (the second clause
    catches equal-x dominators). Two RANGE-frame aggregates over ONE
    sort Exchange per group — no join at all. Rows with NULL in either
    dimension get NULL ``out_col`` (incomparable). ``x_col`` must be
    numeric (RANGE frame requirement); put decimals on an integer grid
    first.

    Scale: one group-grain sort shuffle, O(n) after it."""
    from pyspark.sql import Window

    # the rangeBetween(-1) clause equals "x strictly less" ONLY on an
    # integer grid: a fractional dominator with x in (x_probe - 1,
    # x_probe) and equal y would be invisible to both window clauses and
    # the dominated row silently flagged on_front — enforce the contract
    # instead of relying on the docstring (ADVICE r5)
    from .correlation import _check_integral

    _check_integral(df, (x_col,), "pareto_front")
    x, y = F.col(x_col), F.col(y_col)
    keys = [F.col(k) for k in group_by]
    valid = x.isNotNull() & y.isNotNull()
    w_lt = (
        Window.partitionBy(*keys)
        .orderBy(x.asc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_le = (
        Window.partitionBy(*keys)
        .orderBy(x.asc())
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    m_lt = F.min(F.when(valid, y)).over(w_lt)
    m_le = F.min(F.when(valid, y)).over(w_le)
    dominated = (m_lt.isNotNull() & (m_lt <= y)) | (m_le < y)
    return df.withColumn(out_col, F.when(valid, ~dominated))
