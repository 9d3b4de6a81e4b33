"""Exact-substring duplication analysis (Lee et al. 2022 style).

"Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499) removes verbatim substrings that occur more than once
in the corpus. The exact tool there is a suffix array; the
shuffle-friendly equivalent at 100 TB is k-gram span marking, which this
module implements:

1. every token position emits its k-gram (one JVM-side map pass —
   ``transform`` + ``slice`` + ``array_join``, exploded once);
2. one map-side-combined count per gram finds grams occurring
   ``min_dup``+ times corpus-wide;
3. a semi-join back marks the duplicated positions, and a per-doc window
   computes the UNION length of the covered spans ``[pos, pos+k-1]``
   (gaps-and-islands with a running max-end — overlap is never
   double-counted);
4. :func:`drop_dup_spans` rebuilds text keeping only uncovered tokens.

Production hashes grams to 8 bytes before the shuffle (``hashed=True``,
xxhash64) so stages 2-3 never move text; ``hashed=False`` keeps the gram
string for cross-engine oracle checks (same convention as the
``knuth_key`` hash=False modes in :mod:`.sampling`). Ratios are emitted
as exact integer parts-per-million (``x * 1000000 DIV n``) — no float in
the gate.

The reference has no substring-level dedup (its text surface is
`StreamFunctions.kt:333-349` token counting); this is part of the
beyond-reference LLM-pipeline tier alongside :mod:`.dedup`'s doc-level
MinHash/SimHash and line-level C4 dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["dup_span_stats", "drop_dup_spans"]


def _positioned_grams(df: DataFrame, id_col: str, text_col: str, k: int, hashed: bool):
    """(id, pos, gram) for every k-gram position; pos is 1-based.

    Grams build via zip_with over shifted slices, NOT
    ``transform(sequence, i -> slice(toks, i, k))`` — a lambda capturing
    ``toks`` re-runs the trim/lower/split pipeline once PER POSITION
    (O(len²) per row, the repo-wide HOF hazard measured 64x on shingles);
    zip_with's children evaluate once per row."""
    toks = tokens(F.lower(F.col(text_col)))
    sz = F.size(toks)
    acc = toks
    for j in range(1, k):
        acc = F.zip_with(
            acc,
            F.slice(toks, j + 1, F.greatest(sz - j, F.lit(1))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    grams = F.when(
        sz >= k, F.slice(acc, 1, F.greatest(sz - k + 1, F.lit(1)))
    ).otherwise(F.array().cast("array<string>"))
    out = df.select(
        F.col(id_col),
        F.posexplode(grams).alias("__p0", "__gram"),
    ).select(id_col, (F.col("__p0") + 1).alias("__pos"), "__gram")
    if hashed:
        # 8-byte shuffle keys: the count + semi-join never move text
        out = out.withColumn("__gram", F.xxhash64("__gram"))
    return out


def dup_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    min_dup: int = 2,
    hashed: bool = True,
) -> DataFrame:
    """Per-doc duplicated-substring coverage.

    Returns ``(id, n_tokens, n_dup_grams, dup_tokens, dup_ppm)`` where
    ``n_dup_grams`` counts positions whose k-gram occurs >= min_dup times
    corpus-wide, ``dup_tokens`` is the union length of their spans
    ``[pos, pos+k-1]`` (overlaps counted once), and ``dup_ppm`` =
    ``dup_tokens * 1000000 DIV n_tokens`` (0 for empty docs). Docs with
    no duplicated span still appear (zeros). Three shuffles: gram count,
    semi-join, per-doc window — all on 8-byte keys when ``hashed``.
    """
    from ..operators.util import spread_small_input

    # the gram build (k-1 zip_with passes + posexplode) is the dense map
    # stage; a single-split parquet input would run it on ONE core
    # (guide §2/§6 — measured 38s → ~8s on the sf1.0 gate), so spread
    # small inputs across the cluster first. No-op at scale.
    df = spread_small_input(df)
    pg = _positioned_grams(df, id_col, text_col, k, hashed)
    # shuffle-free spine: every doc appears with zero stats by default
    base = df.select(
        F.col(id_col), F.size(tokens(F.lower(F.col(text_col)))).alias("n_tokens")
    )

    dup_grams = (
        pg.groupBy("__gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= min_dup)
        .select("__gram")
    )
    marked = pg.join(dup_grams, "__gram", "leftsemi")

    w = (
        Window.partitionBy(id_col)
        .orderBy("__pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    end = F.col("__pos") + (k - 1)
    prev_max_end = F.max(F.col("__pos") + (k - 1)).over(w)
    floor_ = F.greatest(F.coalesce(prev_max_end, F.col("__pos") - 1), F.col("__pos") - 1)
    contrib = F.greatest(F.lit(0), end - floor_)
    per_doc = (
        marked.withColumn("__cov", contrib)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_dup_grams"),
            F.sum("__cov").alias("dup_tokens"),
        )
    )
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.when(F.col("n_tokens") > 0, F.expr(
                "CAST(coalesce(dup_tokens, 0) * 1000000 DIV n_tokens AS BIGINT)"
            )).otherwise(F.lit(0)).cast("long").alias("dup_ppm"),
        )
    )


def drop_dup_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 8,
    min_dup: int = 2,
    hashed: bool = True,
    out_col: str = "text_deduped",
) -> DataFrame:
    """Remove every token covered by a duplicated k-gram span.

    Adds ``out_col``: the lowered tokens NOT covered by any span
    ``[pos, pos+k-1]`` of a >=min_dup k-gram, re-joined by single spaces
    (the Lee-et-al removal step at span granularity; docs shorter than k
    or with no duplicated gram pass through as their normalized token
    join). The covered-position set is shipped back to the doc row as an
    interval array — bounded by the doc's own length.
    """
    pg = _positioned_grams(df, id_col, text_col, k, hashed)
    dup_grams = (
        pg.groupBy("__gram")
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") >= min_dup)
        .select("__gram")
    )
    spans = (
        pg.join(dup_grams, "__gram", "leftsemi")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("__pos")).alias("__starts"))
    )
    toks = tokens(F.lower(F.col(text_col)))
    joined = df.join(spans, id_col, "left")
    # token at 1-based index i is covered iff some start s in __starts has
    # s <= i <= s + k - 1
    kept = F.filter(
        toks,
        lambda t, i0: ~F.exists(
            F.coalesce(F.col("__starts"), F.array().cast("array<int>")),
            lambda s: (s <= i0 + 1) & (i0 + 1 <= s + (k - 1)),
        ),
    )
    return joined.withColumn(out_col, F.array_join(kept, " ")).drop("__starts")
