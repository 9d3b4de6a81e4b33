"""Scalar/transformer function surface: the Spark-native equivalent of the
reference's jq transformer-source registry (``funcify-feature-eng-jq``)."""

from funcify_feature_eng_spark.functions.registry import (
    TransformerRegistry,
    default_registry,
)

__all__ = ["TransformerRegistry", "default_registry"]
