"""Byte-pair-encoding vocabulary training + tokenization at corpus scale.

The industrial shape (and the only one that survives 100 TB): BPE training
never iterates over the corpus — it iterates over the DISTINCT-WORD count
table. So:

1. :func:`bpe_train` — one distributed word-count aggregate (explode →
   map-side-combined groupBy), truncated to the top ``vocab_words`` words
   by (count desc, word asc) via TakeOrdered, collected to the driver
   (bounded, default 2^16 rows — the same bounded-collect class as IVF
   centroids). The classic merge loop (Sennrich et al. 2016,
   arXiv:1508.07909 — counts include overlapping pairs, merges apply
   left-to-right non-overlapping, ties break to the lexicographically
   smallest pair) then runs driver-side over that bounded table with
   incremental pair-count maintenance (only words containing the merged
   pair are recounted), so cost is O(vocab_words · avg_len + n_merges ·
   touched), independent of corpus size.
2. :func:`bpe_tokenize` — the merge ranks broadcast into ONE Arrow-batched
   pandas UDF (per-batch word→pieces memoization); a single map pass, no
   shuffle. Python is unavoidable here (per-word merge loops are not
   expressible as Column ops) — this is the intended Arrow path, the same
   tier as NFC normalization.

Everything is integer/deterministic: an independent pure-Python pipeline
(scripts/make_fixtures.py::bpe_merges/bpe_pieces) reproduces both outputs
exactly, which is what the oracle gates check.

The reference's tokenization surface stops at whitespace/regex counting
(`StreamFunctions.kt:333-349` splits); trained-subword vocab is part of
this repo's beyond-reference LLM-pipeline tier.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..functions.text import tokens

__all__ = ["bpe_train", "bpe_tokenize", "bpe_merge_table"]

Merge = tuple[str, str]


def _pairs(sym: tuple[str, ...]) -> list[Merge]:
    return [(sym[i], sym[i + 1]) for i in range(len(sym) - 1)]


def _apply_merge(sym: tuple[str, ...], pair: Merge) -> tuple[str, ...]:
    """Merge all left-to-right non-overlapping occurrences of ``pair``."""
    out: list[str] = []
    i, n = 0, len(sym)
    a, b = pair
    while i < n:
        if i < n - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _merge_loop(
    word_counts: list[tuple[str, int]], n_merges: int, min_count: int
) -> list[Merge]:
    """Driver-side merge loop with incremental pair-count maintenance."""
    words: list[tuple[tuple[str, ...], int]] = [
        (tuple(w), c) for w, c in word_counts if w
    ]
    pair_counts: Counter = Counter()
    pair2words: defaultdict[Merge, set[int]] = defaultdict(set)
    for wi, (sym, c) in enumerate(words):
        for p in _pairs(sym):
            pair_counts[p] += c
            pair2words[p].add(wi)

    merges: list[Merge] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best_count = max(pair_counts.values())
        if best_count < min_count:
            break
        best = min(p for p, c in pair_counts.items() if c == best_count)
        merges.append(best)
        # re-count only the words that contain the merged pair
        for wi in list(pair2words.get(best, ())):
            sym, c = words[wi]
            for p in _pairs(sym):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair2words[p].discard(wi)
            new_sym = _apply_merge(sym, best)
            words[wi] = (new_sym, c)
            for p in _pairs(new_sym):
                pair_counts[p] += c
                pair2words[p].add(wi)
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 200,
    vocab_words: int = 65536,
    min_count: int = 2,
) -> list[Merge]:
    """Train BPE merges from a text column; returns the ordered merge list.

    One corpus pass (word-count aggregate with map-side combine), then a
    bounded TakeOrdered collect of the top ``vocab_words`` (count desc,
    word asc — deterministic), then the driver merge loop. Words are the
    same whitespace tokens of lowered text used across the text family.
    """
    wc = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("__w"))
        .where(F.col("__w") != "")
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__w").asc())
        .limit(vocab_words)
        .collect()  # bounded: at most vocab_words rows
    )
    return _merge_loop([(r["__w"], int(r["__c"])) for r in wc], n_merges, min_count)


def bpe_merge_table(spark, merges: list[Merge]) -> DataFrame:
    """The trained merges as a DataFrame (rank, left, right)."""
    rows = [(i, a, b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(rows, "rank: int, left: string, right: string")


def bpe_tokenize(
    df: DataFrame,
    text_col: str,
    merges: list[Merge],
    out_col: str = "pieces",
) -> DataFrame:
    """Apply trained merges: adds ``out_col: array<string>`` of word pieces.

    GPT-2-style apply: per word, repeatedly merge the LOWEST-RANK adjacent
    pair (all its non-overlapping occurrences) until none remains. One
    Arrow-batched pandas-UDF map pass with per-batch word memoization; no
    shuffle. Empty/NULL text yields an empty piece array. The rank table
    ships as an explicit SparkContext broadcast (fetched once per
    executor), not inside the pickled UDF — a production-size merge list
    (tens of thousands) would otherwise re-ship with every task.
    """
    bc_ranks = df.sparkSession.sparkContext.broadcast(
        {p: i for i, p in enumerate(merges)}
    )

    @F.pandas_udf(ArrayType(StringType()))
    def _encode(texts: pd.Series) -> pd.Series:
        ranks = bc_ranks.value
        cache: dict[str, list[str]] = {}

        def encode_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            sym: tuple[str, ...] = tuple(w)
            while len(sym) > 1:
                best_rank, best_pair = None, None
                for p in _pairs(sym):
                    r = ranks.get(p)
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_pair = r, p
                if best_pair is None:
                    break
                sym = _apply_merge(sym, best_pair)
            out = list(sym)
            cache[w] = out
            return out

        def encode_doc(t) -> list[str]:
            if t is None:
                return []
            t = t.strip(" ")
            if not t:
                return []
            pieces: list[str] = []
            for w in re.split(r"[ \t\n\x0b\f\r]+", t.lower()):
                pieces.extend(encode_word(w))
            return pieces

        return texts.map(encode_doc)

    return df.withColumn(out_col, _encode(F.col(text_col)))
