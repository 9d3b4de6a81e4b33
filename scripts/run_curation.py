"""spark-submit entry point: resumable corpus-curation pipeline.

Ships the declarative curation job to a cluster (same contract as
scripts/run_job.py)::

    zip -r engine.zip funcify_feature_eng_spark
    spark-submit --py-files engine.zip scripts/run_curation.py \\
        --documents s3://bucket/documents \\
        --output s3://bucket/curated \\
        --checkpoint-dir s3://bucket/_lineage/curation1 \\
        --min-quality-e6 600000 --lang en

With --checkpoint-dir every stage checkpoints lineage + per-partition
metrics and a killed job resumes without recompute (north rule); without
it the pipeline runs as one composed lazy plan. The declared stages are
the gated curation capstone: quality/lang derivation -> exact dedup ->
near-dup clusters keep-best -> lang+quality filter.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pipeline(lang: str, min_quality_e6: int):
    from pyspark.sql import functions as F

    from funcify_feature_eng_spark.functions.text import (
        alpha_ratio,
        lang_id_from_tokens,
        stopword_ratio,
        tokens,
    )
    from funcify_feature_eng_spark.pipeline import CorpusPipeline

    n = F.length("text")
    len_score = (
        F.when((n >= 50) & (n <= 5000), F.lit(1.0))
        .when(n > 0, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )
    quality = F.floor(
        (len_score + alpha_ratio(F.col("text")) + stopword_ratio(F.col("text")))
        / F.lit(3.0) * F.lit(1000000.0)
    )
    return (
        CorpusPipeline()
        .derive("quality_e6", quality)
        .derive("lang_pred", lang_id_from_tokens(tokens(F.lower(F.col("text")))))
        .exact_dedup()
        .near_dedup(quality_col="quality_e6")
        .filter(
            (F.col("lang_pred") == lang)
            & (F.col("quality_e6") >= int(min_quality_e6))
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--documents", required=True, help="table name or parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="lineage base dir; enables resume-without-recompute")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-quality-e6", type=int, default=600000)
    args = ap.parse_args()

    from funcify_feature_eng_spark import get_spark
    from funcify_feature_eng_spark.sources.tables import read_table

    spark = get_spark("corpus-curation")
    docs = read_table(spark, args.documents)
    pipe = build_pipeline(args.lang, args.min_quality_e6)
    print("declared stages:", " -> ".join(pipe.describe()))

    tracker = None
    if args.checkpoint_dir:
        from funcify_feature_eng_spark.lineage import LineageTracker

        tracker = LineageTracker(spark, args.checkpoint_dir)
    out = pipe.run(docs, tracker=tracker)
    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"curated rows: {n} -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
