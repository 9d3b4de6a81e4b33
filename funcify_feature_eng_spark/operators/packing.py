"""Sequence packing for LLM training pipelines.

Packing concatenates documents into fixed-token-budget training sequences.
The scalable formulation is *per-shard prefix-sum packing*: shard the corpus
(documents are independent), order deterministically within the shard, and
assign each document to the pack containing its start offset
(``floor(prefix_tokens / budget)``). One window pass per shard, no global
sort, embarrassingly parallel across shards — the 100 TB posture. Documents
may straddle pack boundaries (standard for packed pretraining batches where
the loader chunks the concatenated stream); ``offset_in_pack`` gives the
straddle position.

This is an engine extension beyond the reference (its pipeline stops at
feature vectors); it lives with the other training-data operators
(SURVEY.md "training-data pipeline extensions").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_documents(
    df: DataFrame,
    id_col: str,
    token_col: str | Column,
    budget: int,
    shard_col: str | Column | None = None,
    order: Sequence[str] | None = None,
) -> DataFrame:
    """Assign each document a (shard, pack_id, offset_in_pack).

    ``shard_col`` defaults to a single shard (small data); at scale pass a
    shard expression (e.g. ``F.pmod(F.col(id), F.lit(1024))``) so each shard
    packs independently in one window pass. ``order`` defaults to the id —
    any deterministic total order within the shard works.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    shard = (
        F.lit(0) if shard_col is None
        else (F.col(shard_col) if isinstance(shard_col, str) else shard_col)
    )
    order_cols = [F.col(c).asc() for c in (order or [id_col])]
    out = df.withColumn("__shard", shard)
    w = (
        Window.partitionBy("__shard")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(tok).over(w)
    start = cum - tok  # prefix tokens strictly before this document
    return (
        out.withColumn("pack_id", F.floor(start / F.lit(budget)))
        .withColumn("offset_in_pack", start % F.lit(budget))
        .withColumnRenamed("__shard", "shard")
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    token_col: str | Column,
    bucket_width: int = 128,
    batch_rows: int = 32,
) -> DataFrame:
    """Length-bucketed micro-batching: group rows of similar token length
    and assign fixed-size batch ids within each bucket — the standard
    padding-waste reducer for inference/eval and non-packed training
    (padding cost per batch ~ max_len - mean_len; bucketing by
    ``floor(tokens / bucket_width)`` bounds that spread by bucket_width).

    Adds ``len_bucket``, ``batch_in_bucket`` (0-based, ``batch_rows`` rows
    per batch, deterministic fill order by (tokens, id)), and
    ``pad_to`` (the bucket's padding target = (bucket+1) * bucket_width).
    One window exchange partitioned by bucket; at 10^12 rows buckets are
    large and uniform — no skew treatment needed beyond the id tiebreak.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    bucket = F.floor(tok / F.lit(bucket_width)).cast("int")
    w = Window.partitionBy(bucket).orderBy(tok.asc(), F.col(id_col).asc())
    return (
        df.withColumn("len_bucket", bucket)
        .withColumn(
            "batch_in_bucket",
            F.floor((F.row_number().over(w) - 1) / F.lit(batch_rows)).cast("int"),
        )
        .withColumn("pad_to", ((F.col("len_bucket") + 1) * bucket_width).cast("int"))
    )
