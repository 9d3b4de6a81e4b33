"""N-gram language-model training + perplexity scoring (CCNet-style filter).

The classic LLM-corpus quality filter (Wenzek et al. 2020, CCNet,
arXiv:1911.00359): train a small n-gram LM on the corpus (or a clean
reference slice), score every document's perplexity, keep the
low-perplexity head / bucket into quality tiers. The industrial shape is
exactly the BPE one (:mod:`.bpe`):

1. :func:`ngram_counts` — ONE corpus pass: per row, every order-1..n gram
   is built JVM-side (``transform`` + ``slice`` + ``array_join`` over the
   token array — no Python), flattened, exploded once, then a single
   map-side-combined ``groupBy(order, gram)`` count. This is the only part
   that touches the corpus, and it scales like any word-count.
2. :func:`train_ngram_lm` — prune the count table per order to the top
   ``max_grams`` by (count desc, gram asc) — deterministic truncation —
   and collect the bounded result (same bounded-collect class as IVF
   centroids / BPE vocab). A production KenLM artifact is likewise a
   fixed-size model shipped to workers.
3. :func:`lm_score` — broadcast the pruned model into ONE Arrow-batched
   pandas UDF; per-doc stupid-backoff scoring (Brants et al. 2007,
   "Large Language Models in Machine Translation": S(w|ctx) =
   count(ctx·w)/count(ctx), else alpha·S(w|shorter ctx); unigram base
   count(w)/total, OOV alpha/total) is an inherently sequential per-row
   loop — the intended Arrow tier, same as BPE apply. No shuffle.

Scores are emitted as fixed-point int64 (``lp_micro``/``ppl_micro`` =
round-half-up micros) so the oracle gate hash-compares integers, never
float repr; the independent pure-Python twin
(scripts/make_fixtures.py::doc_perplexity) reproduces them exactly.
``ppl_micro`` overflows int64 only past ppl ~9.2e12 — unreachable while
alpha^(n-1)/total > 1e-13 (docstring guard, not a runtime branch).

The reference's text surface stops at whitespace/regex token counting
(`StreamFunctions.kt:333-349`); LM-based quality scoring is part of this
repo's beyond-reference LLM-pipeline tier.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from ..functions.text import tokens

__all__ = ["ngram_counts", "train_ngram_lm", "lm_score"]

_ALPHA = 0.4  # stupid-backoff discount (Brants et al. 2007, §4)


def ngram_counts(
    df: DataFrame,
    text_col: str,
    *,
    n: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Count every order-1..n gram of lowered whitespace tokens.

    Returns ``(ord int, gram string, cnt long)`` with ``cnt >= min_count``;
    grams are space-joined token runs. One corpus scan: all orders are
    built per row JVM-side and exploded once, so the shuffle is a single
    map-side-combined aggregate on (ord, gram) — a word-count at any
    scale. Rows whose text has fewer than k tokens contribute no order-k
    grams; NULL/empty text contributes nothing.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from funcify_feature_eng_spark.operators.util import spread_small_input

    # the zip_with gram build + explode is compute-dense; spread a
    # single-split input across cores first (no-op at scale)
    df = spread_small_input(df)
    toks = tokens(F.lower(F.col(text_col)))
    sz = F.size(toks)

    # grams via zip_with over shifted slices, NOT transform(sequence, i ->
    # slice(toks, i, k)): a lambda capturing `toks` re-evaluates the whole
    # trim/lower/split pipeline once PER GRAM POSITION (the repo-wide HOF
    # hazard, measured 64x on shingles) — zip_with's children evaluate
    # once per row, so this is k token-array evaluations total. The struct
    # wrap below captures only lit(k), which is free per element.
    def _wrap(k: int):
        # closure factory, NOT a `_k=k` default arg — a second parameter
        # (even defaulted) flips pyspark's transform into (element, index)
        # mode and silently rebinds k to the array index
        def f(g):
            return F.struct(F.lit(k).alias("ord"), g.alias("gram"))

        return f

    per_order = []
    for k in range(1, n + 1):
        if k == 1:
            gk = toks
        else:
            acc = toks
            for j in range(1, k):
                acc = F.zip_with(
                    acc,
                    F.slice(toks, j + 1, F.greatest(sz - j, F.lit(1))),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            gk = F.slice(acc, 1, F.greatest(sz - k + 1, F.lit(1)))
        grams_k = F.when(
            sz >= k, F.transform(gk, _wrap(k))
        ).otherwise(F.array().cast("array<struct<ord:int,gram:string>>"))
        per_order.append(grams_k)
    out = (
        df.select(F.explode(F.flatten(F.array(*per_order))).alias("__g"))
        .select("__g.ord", "__g.gram")
        .groupBy("ord", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count > 1:
        out = out.where(F.col("cnt") >= min_count)
    return out


def train_ngram_lm(
    df: DataFrame,
    text_col: str,
    *,
    n: int = 3,
    min_count: int = 2,
    max_grams: int = 200_000,
) -> dict:
    """Train a pruned stupid-backoff model; returns the broadcastable dict
    ``{"n": n, "total": total_tokens, "counts": [{gram: cnt} per order]}``.

    ``total`` is the UN-pruned corpus token count (the unigram normalizer
    must not shrink with pruning). Per-order pruning keeps the top
    ``max_grams`` by (count desc, gram asc) — a deterministic truncation,
    so an independent engine reproduces the exact model. The collect is
    bounded at n * max_grams rows.
    """
    counts = ngram_counts(df, text_col, n=n, min_count=1).persist()
    try:
        total_row = counts.where(F.col("ord") == 1).agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("t")
        ).collect()[0]
        total = int(total_row["t"])
        order_maps: list[dict[str, int]] = []
        for k in range(1, n + 1):
            # Arrow collect: at max_grams=200k the Row-object path spends
            # seconds per order on driver-side deserialization alone
            tbl = (
                counts.where((F.col("ord") == k) & (F.col("cnt") >= min_count))
                .orderBy(F.col("cnt").desc(), F.col("gram").asc())
                .limit(max_grams)
                .toArrow()
            )
            order_maps.append(
                dict(
                    zip(tbl.column("gram").to_pylist(),
                        (int(c) for c in tbl.column("cnt").to_pylist()))
                )
            )
    finally:
        counts.unpersist()
    return {"n": n, "total": total, "counts": order_maps}


def _score_tokens(ws: list[str], model: dict) -> float:
    """Sum of log10 stupid-backoff scores, left-to-right (deterministic)."""
    n, total, counts = model["n"], model["total"], model["counts"]
    lp = 0.0
    for i in range(len(ws)):
        s = None
        mult = 1.0
        for k in range(min(n - 1, i), 0, -1):  # longest context first
            g = " ".join(ws[i - k : i + 1])
            c = counts[k].get(g) if k < len(counts) else None
            if c:
                ctx = counts[k - 1].get(" ".join(ws[i - k : i]))
                if ctx:
                    s = mult * c / ctx
                    break
            mult *= _ALPHA
        if s is None:
            c1 = counts[0].get(ws[i]) if counts else None
            s = mult * (c1 if c1 else _ALPHA) / total
        lp += math.log10(s)
    return lp


def lm_score(
    df: DataFrame,
    text_col: str,
    model: dict,
    *,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Score documents against a trained model.

    Adds ``n_tokens`` (int64), ``lp_micro`` (total log10-prob in
    round-half-up micros) and ``ppl_micro`` (perplexity
    ``10^(-lp/n_tokens)`` in micros; 0-token docs get ppl_micro = 0).
    One Arrow-batched map pass, no shuffle; the model ships as an explicit
    SparkContext broadcast (fetched once per executor), NOT inside the
    pickled UDF — at max_grams=200k the closure would otherwise re-ship
    tens of MB with every task.
    """
    if model["total"] <= 0:
        raise ValueError("lm_score: model trained on an empty corpus")
    bc_model = df.sparkSession.sparkContext.broadcast(model)
    fields = StructType(
        [
            StructField("n_tokens", LongType()),
            StructField("lp_micro", LongType()),
            StructField("ppl_micro", LongType()),
        ]
    )

    @F.pandas_udf(fields)
    def _score(texts: pd.Series) -> pd.DataFrame:
        model = bc_model.value
        out = {"n_tokens": [], "lp_micro": [], "ppl_micro": []}
        for t in texts:
            if t is None:
                ws: list[str] = []
            else:
                t = t.strip(" ")
                ws = re.split(r"[ \t\n\x0b\f\r]+", t.lower()) if t else []
            nt = len(ws)
            if nt == 0:
                out["n_tokens"].append(0)
                out["lp_micro"].append(0)
                out["ppl_micro"].append(0)
                continue
            lp = _score_tokens(ws, model)
            ppl = 10.0 ** (-lp / nt)
            out["n_tokens"].append(nt)
            out["lp_micro"].append(int(math.floor(lp * 1e6 + 0.5)))
            out["ppl_micro"].append(int(math.floor(ppl * 1e6 + 0.5)))
        return pd.DataFrame(out)

    from funcify_feature_eng_spark.operators.util import spread_small_input

    # the Python scoring pass inherits the input split count — spread a
    # single-split input so every core runs a worker (no-op at scale)
    df = spread_small_input(df)
    return df.select(*id_cols, _score(F.col(text_col)).alias("__s")).select(
        *id_cols, "__s.n_tokens", "__s.lp_micro", "__s.ppl_micro"
    )
