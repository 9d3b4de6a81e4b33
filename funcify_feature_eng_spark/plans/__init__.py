"""Feature-DAG planning: the materializer analog (request → plan → lineage)."""

from funcify_feature_eng_spark.plans.model import FeatureModel

__all__ = ["FeatureModel"]
