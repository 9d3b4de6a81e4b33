"""Train/eval contamination detection (benchmark decontamination).

The standard pretraining hygiene check: an eval document is contaminated
when enough of its word n-grams appear anywhere in the training corpus.
Implementation is an inverted-index SEMI join on 64-bit gram hashes — the
shuffle carries 8-byte keys, never documents, and the train side is reduced
to DISTINCT gram hashes first (at 100 TB that set is the only thing that
moves; partial aggregation dedups map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from funcify_feature_eng_spark.functions.text import shingles
from funcify_feature_eng_spark.operators.util import spread_small_input


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    # shingling+explode is the dense map stage — keep it parallel when the
    # input arrives as a handful of splits (no-op at scale)
    df = spread_small_input(df)
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("g"),
    ).select("doc", F.xxhash64("g").alias("gh"))


def contamination_report(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_shared: int = 1,
) -> DataFrame:
    """Per eval document: total distinct k-gram count, how many of those
    grams occur anywhere in ``train``, and the contamination verdict."""
    train_grams = _gram_hashes(train, id_col, text_col, k).select("gh").distinct()
    eg = _gram_hashes(eval_df, id_col, text_col, k)
    totals = eg.groupBy("doc").agg(F.count(F.lit(1)).alias("n_grams"))
    shared = (
        eg.join(train_grams, on="gh")  # inner ≡ semi here: train_grams is distinct
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        totals.join(shared, on="doc", how="left")
        .select(
            F.col("doc").alias(id_col),
            "n_grams",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) >= min_shared).alias("contaminated"),
        )
    )
