"""spark-submit entry point: materialize a transcript feature vector.

Ships the engine to a cluster (north rule: ``spark-submit --py-files``)::

    zip -r engine.zip funcify_feature_eng_spark
    spark-submit --py-files engine.zip scripts/run_job.py \\
        --transcripts s3://bucket/transcripts \\
        --store s3://bucket/feature_store \\
        --columns conv_id turn_idx text prior_role prior_tool gap_secs \\
                  session_id turn_len asof_store_value \\
        --output s3://bucket/feature_vectors \\
        --checkpoint-dir s3://bucket/_lineage/job1

On a cluster spark-submit supplies the master; locally the engine default
(local[$SPARK_GRAFT_CPUS]) applies. With --checkpoint-dir, every stage
checkpoints lineage + per-partition metrics and a killed job resumes
without recompute (funcify_feature_eng_spark.lineage).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_model(store_df=None, features_yaml: str | None = None):
    from funcify_feature_eng_spark.plans.model import FeatureModel

    m = FeatureModel(entity_key="conv_id", order=("turn_idx", "ts"), event_time="ts")
    m.declare_window_feature("prior_role", op="lag", col="role")
    m.declare_window_feature("prior_tool", op="ffill_strict", col="tool")
    m.declare_window_feature("gap_secs", op="gap")
    m.declare_window_feature("session_id", op="session", gap_threshold_s=1800.0)
    m.declare_transformer_feature("turn_len", "char_len", args=["text"])
    if store_df is not None:
        m.register_store("fs", store_df)
        m.declare_asof_feature(
            "asof_store_value", store="fs", right_ts="value_at_ts", value_col="value",
            allow_exact_matches=False, right_order=("value",),
        )
    if features_yaml:
        from funcify_feature_eng_spark.functions.yaml_loader import (
            load_features_yaml,
            load_transformers_yaml,
        )

        with open(features_yaml) as f:
            text = f.read()
        load_transformers_yaml(m.registry, text)
        load_features_yaml(m, text)
    return m


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--transcripts", required=True, help="table name or parquet path")
    ap.add_argument("--store", default=None, help="feature-store table/path (optional)")
    ap.add_argument("--columns", nargs="+", required=True)
    ap.add_argument("--output", required=True, help="output table/path")
    ap.add_argument("--checkpoint-dir", default=None, help="lineage/resume dir")
    ap.add_argument("--features-yaml", default=None, help="extra YAML declarations")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from funcify_feature_eng_spark import get_spark
    from funcify_feature_eng_spark.sources.tables import read_table, write_table

    spark = get_spark("feature-materialize", master=args.master)
    transcripts = read_table(spark, args.transcripts)
    store_df = read_table(spark, args.store) if args.store else None
    model = build_model(store_df, args.features_yaml)

    out = model.materialize(transcripts, args.columns)
    if args.checkpoint_dir:
        from funcify_feature_eng_spark.lineage import LineageTracker

        lt = LineageTracker(spark, args.checkpoint_dir)
        out = lt.run_stage("feature_vector", out)
        metrics = lt.metrics("feature_vector")
        print(f"rows={metrics['n_rows']} partitions={metrics['n_partitions']} "
              f"wall={metrics['wall_sec']}s")
    write_table(out, args.output, mode="overwrite")
    print(f"wrote {args.output}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
