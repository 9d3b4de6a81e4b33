"""Fuzzy record linkage / entity resolution: blocked edit-distance matching.

The one dedup family the token/hash tier (operators/dedup.py) cannot express:
two values that are *spelled* almost identically — "blue widgett" vs
"blue widget" — share few shingles and no exact fingerprint, but sit at
Levenshtein distance 1. Classic entity-resolution shape (Fellegi–Sunter
blocking): compare only within cheap blocks, never all-pairs.

Scale contract (the part that must survive 100 TB):

1. **Link the vocabulary, not the rows.** Distances are computed over
   DISTINCT values of the text column — on real corpora the distinct value
   set is orders of magnitude smaller than the row count (the gate's table
   has 2 000 rows but 64 distinct names). Records rejoin by equality at the
   end (:func:`canonicalize`), so the quadratic piece never sees row
   multiplicity.
2. **Blocking bounds the quadratic.** Candidates pair only inside a block
   (one shuffle on the block key); per-block cost is size², so block sizes
   are measured FIRST (one cheap aggregate) and an oversized block raises
   — or is skipped under ``on_oversize="skip"`` — the same
   loud-before-quadratic posture as the n-gram hot-gram cap
   (operators/dedup.py) and all_pairs_topk's max_rows guard.
3. **Band before distance.** ``|len(a) − len(b)| ≤ max_dist`` is a free
   necessary condition evaluated before ``levenshtein`` in the join
   condition, pruning most candidates at integer-compare cost.

Everything is JVM-side (``F.levenshtein`` is a Catalyst expression); no
Python anywhere.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_edit_pairs(
    df: DataFrame,
    text_col: str,
    *,
    block: Callable[[Column], Column] | Column | str,
    max_dist: int = 2,
    max_block: int = 10_000,
    on_oversize: str = "error",
) -> DataFrame:
    """Distinct-value near-match pairs ``(name_a, name_b, dist)`` with
    ``levenshtein ≤ max_dist``, compared only within equal ``block`` keys.

    ``block``: the blocking key — a Column, a SQL expression string, or a
    callable ``Column -> Column`` applied to the text column (e.g.
    ``lambda c: F.soundex(c)`` or a token extract). A good block key is
    cheap, high-recall for true matches, and low-cardinality-per-key;
    values whose block key is NULL are unblockable and excluded.

    ``name_a < name_b`` canonical ordering (each unordered pair once);
    NULL texts excluded. ``on_oversize``: ``"error"`` (default) raises
    naming the offending blocks; ``"skip"`` drops oversized blocks whole —
    documented degradation, never a silent quadratic.
    """
    if on_oversize not in ("error", "skip"):
        raise ValueError(f"on_oversize must be 'error'|'skip' (got {on_oversize!r})")
    c = F.col(text_col)
    # distinct FIRST (keeping the original column name so a string/Column
    # block expression can still reference it), block key second
    if callable(block):
        bkey = block(c)
    elif isinstance(block, str):
        bkey = F.expr(block)
    else:
        bkey = block
    names = (
        df.select(c)
        .filter(c.isNotNull())
        .distinct()
        .select(c.alias("__name"), bkey.alias("__blk"))
        .filter(F.col("__blk").isNotNull())
    )
    sizes = names.groupBy("__blk").agg(F.count(F.lit(1)).alias("__n"))
    over = sizes.filter(F.col("__n") > max_block)
    if on_oversize == "error":
        bad = over.orderBy(F.desc("__n")).limit(5).collect()
        if bad:
            worst = ", ".join(f"{r['__blk']!r}×{r['__n']}" for r in bad)
            raise ValueError(
                f"blocked_edit_pairs: block(s) exceed max_block={max_block} "
                f"({worst}); refine the block key, raise max_block, or pass "
                "on_oversize='skip'"
            )
    else:
        # drop oversized blocks BEFORE the self-join (broadcast of a tiny
        # block-key list — |oversized| is small by construction)
        names = names.join(
            F.broadcast(over.select("__blk")), on="__blk", how="left_anti"
        )
    a = names.select(
        F.col("__blk"), F.col("__name").alias("name_a"),
        F.length("__name").alias("__la"),
    )
    b = names.select(
        F.col("__blk"), F.col("__name").alias("name_b"),
        F.length("__name").alias("__lb"),
    )
    # equi-join on the block key; the ordering + length band + distance all
    # evaluate as post-join filters INSIDE the join operator, so the length
    # band (integer compare) guards the O(len²) levenshtein
    cond = (
        (F.col("name_a") < F.col("name_b"))
        & (F.abs(F.col("__la") - F.col("__lb")) <= F.lit(max_dist))
        & (F.levenshtein("name_a", "name_b") <= F.lit(max_dist))
    )
    return (
        a.join(b, on="__blk", how="inner")
        .filter(cond)
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
        )
    )


def canonicalize(
    df: DataFrame,
    text_col: str,
    pairs: DataFrame,
    *,
    out_col: str = "canonical",
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """Attach the canonical spelling of every row's ``text_col``: connected
    components over the match ``pairs`` (transitive closure — a↔b, b↔c puts
    a,c in one entity even at distance 2·max_dist), component id = MINIMUM
    member string; values never matched canonicalize to themselves.

    Entity resolution end-to-end: ``canonicalize(df, col,
    blocked_edit_pairs(df, col, ...))``. The closure runs on the distinct-
    value match graph (tiny; driver union-find fast path below
    ``driver_threshold`` edges, distributed pointer jumping above —
    operators/graph.py), and rows rejoin by equality: one broadcast-sized
    map join, no quadratic ever touches row multiplicity.
    """
    from .graph import connected_components

    comp = connected_components(
        pairs,
        src="name_a",
        dst="name_b",
        driver_threshold=driver_threshold,
    )
    node_col, comp_col = comp.columns[0], comp.columns[1]
    mapping = comp.select(
        F.col(node_col).alias("__from"), F.col(comp_col).alias("__to")
    )
    out = df.join(
        F.broadcast(mapping),
        on=F.col(text_col).eqNullSafe(F.col("__from")),
        how="left",
    ).drop("__from")
    return out.withColumn(out_col, F.coalesce(F.col("__to"), F.col(text_col))).drop(
        "__to"
    )
