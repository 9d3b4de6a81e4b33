"""funcify_feature_eng_spark — a from-scratch PySpark-native feature-engineering engine.

Re-expresses the capabilities of the reference feature-materialization service
(``anticipasean/funcify-feature-eng``, Kotlin/GraphQL/Reactor — see SURVEY.md)
as an idiomatic Spark DataFrame engine:

* declared feature DAGs (``plans.FeatureModel``) instead of GraphQL documents
  (reference: ``funcify-feature-eng-schema/.../FeatureEngineeringModel.kt:24-52``),
* a vectorized scalar/transformer registry (``functions``) instead of jq
  transformer sources (reference: ``funcify-feature-eng-jq``),
* a sort-merge **as-of join** (``operators.asof``) instead of the
  point-in-time ``FeatureJsonValueStore`` read-through
  (reference: ``schema/feature/FeatureJsonValueStore.kt:11-18``),
* windowed sequence features (``operators.windows``) for the temporal
  ``@lastUpdated`` semantics
  (reference: ``shared-definitions/.../LastUpdatedDirective.kt:13-21``).

Everything is public-API PySpark: DataFrame/SQL + Arrow pandas UDFs; no RDDs,
no custom Catalyst extensions.
"""

from funcify_feature_eng_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
