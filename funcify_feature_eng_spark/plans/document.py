"""Entry point A analog: document-shaped (nested) requests.

The reference's main path is a GraphQL document parsed, validated and
compiled to the request-materialization graph
(``DefaultMaterializationPreparsedDocumentProvider.kt:250-327``, composer
``schema/document/DefaultGQLDocumentComposer.kt``, traverser
``StandardQueryTraverser.kt``). Spark-first, the document becomes a nested
dict compiled onto the same FeatureModel plan the tabular entry point uses —
the two entry points are the two directions of
``TabularQueryDocumentCreator.kt:44-108``.

Document shape::

    {
      "variables": {"gap": 900.0},            # optional
      "select": {
        "columns": ["event_id", "user_id"],   # data-element passthrough (P1)
        "features": {
          "prior_event_type": {},             # declared feature, as-is
          "sess": {                            # aliased + parameterized
            "feature": "session_id",
            "args": {"gap_threshold_s": "$gap"},
          },
        },
      },
    }

Argument value sources mirror the MaterializationEdge kinds
(``MaterializationEdge.kt:7-14``): a ``$name`` string is
VARIABLE_VALUE_PROVIDED (unknown variable → error, like graphql-java
validation), any other literal is DIRECT_ARGUMENT_VALUE_PROVIDED, and an
omitted argument keeps the declared default (DEFAULT_ARGUMENT_VALUE_PROVIDED).
Compiled plans are cached on the model keyed by the canonical document +
variable-key set — the analog of the 24h plan cache keyed by
(metamodel.created, variable keys, opName, document)
(``DefaultSingleRequestMaterializationGraphService.kt:105-180``).
"""

from __future__ import annotations

import json
from dataclasses import replace
from typing import Any

from pyspark.sql import DataFrame

from funcify_feature_eng_spark.plans.model import FeatureModel, PlanError

_TOP_KEYS = {"variables", "select"}
_SELECT_KEYS = {"columns", "features"}
_FEATURE_KEYS = {"feature", "args"}


def _resolve_args(args: dict[str, Any], variables: dict[str, Any]) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for k, v in args.items():
        if isinstance(v, str) and v.startswith("$"):
            name = v[1:]
            if name not in variables:
                raise PlanError(
                    f"argument {k!r} references undefined variable ${name} "
                    f"(defined: {sorted(variables)})"
                )
            out[k] = variables[name]  # VARIABLE_VALUE_PROVIDED
        else:
            out[k] = v  # DIRECT_ARGUMENT_VALUE_PROVIDED
    return out


def parse_document(doc: dict[str, Any]) -> tuple[dict, list[str], dict[str, dict]]:
    """Validate the request document (the parse/validate stage). Returns
    (variables, passthrough columns, feature selections)."""
    if not isinstance(doc, dict):
        raise PlanError("request document must be a dict")
    unknown = set(doc) - _TOP_KEYS
    if unknown:
        raise PlanError(f"unknown top-level document keys: {sorted(unknown)}")
    variables = doc.get("variables", {})
    if not isinstance(variables, dict):
        raise PlanError("'variables' must be a dict")
    select = doc.get("select")
    if not isinstance(select, dict):
        raise PlanError("document requires a 'select' dict")
    unknown = set(select) - _SELECT_KEYS
    if unknown:
        raise PlanError(f"unknown 'select' keys: {sorted(unknown)}")
    columns = list(select.get("columns", []))
    feats = select.get("features", {})
    if not isinstance(feats, dict):
        raise PlanError("'select.features' must be a dict of name -> spec")
    norm: dict[str, dict] = {}
    for out_name, spec in feats.items():
        if spec is None:
            spec = {}
        if not isinstance(spec, dict):
            raise PlanError(f"feature selection {out_name!r} must be a dict")
        unknown = set(spec) - _FEATURE_KEYS
        if unknown:
            raise PlanError(
                f"feature selection {out_name!r} has unknown keys: {sorted(unknown)}"
            )
        norm[out_name] = {
            "feature": spec.get("feature", out_name),
            "args": dict(spec.get("args", {})),
        }
    if not columns and not norm:
        raise PlanError("document selects nothing")
    return variables, columns, norm


def _doc_cache_key(doc: dict[str, Any]) -> str:
    # canonical form: sorted-key JSON of the select block + variable KEYS
    # (values are coerced at dispatch, like the reference's cache key)
    return json.dumps(
        {"select": doc.get("select", {}), "var_keys": sorted(doc.get("variables", {}))},
        sort_keys=True,
        separators=(",", ":"),
        default=str,
    )


def compile_document(model: FeatureModel, doc: dict[str, Any]) -> tuple[FeatureModel, list[str]]:
    """Compile a request document against a base model: returns a
    request-scoped model (base features + parameterized/aliased variants)
    and the output column list for ``materialize``."""
    variables, columns, feats = parse_document(doc)

    req = FeatureModel(
        entity_key=model.entity_key,
        order=model.order,
        event_time=model.event_time,
        registry=model.registry,
        max_depth=model.max_depth,
    )
    req._features = dict(model._features)
    req._aliases = dict(model._aliases)
    req._stores = dict(model._stores)
    req._sources = dict(model._sources)

    out_cols = list(columns)
    for out_name, sel in feats.items():
        base_name = sel["feature"]
        if base_name not in model._features:
            raise PlanError(
                f"document selects unknown feature {base_name!r} "
                f"(declared: {sorted(model._features)})"
            )
        args = _resolve_args(sel["args"], variables)
        base = model._features[base_name]
        if out_name == base_name and not args:
            out_cols.append(out_name)
            continue
        # aliased/parameterized variant: a request-scoped FeatureSpec with
        # document args overriding the declared defaults
        variant = replace(
            base, name=out_name, params={**base.params, **args}
        )
        if out_name in req._features:
            del req._features[out_name]
        req._features[out_name] = variant
        out_cols.append(out_name)
    return req, out_cols


def materialize_document(
    model: FeatureModel, spine: DataFrame, doc: dict[str, Any]
) -> DataFrame:
    """Execute a document-shaped request on a spine through the base model.

    Request-scoped compiled models are cached on the base model keyed by the
    canonical document (the 24h-plan-cache analog); variable VALUES are
    applied at compile because they parameterize column expressions — a
    changed value is a different plan, hence part of the key via args."""
    cache = getattr(model, "_doc_cache", None)
    if cache is None:
        cache = {}
        model._doc_cache = cache
    key = (_doc_cache_key(doc), json.dumps(doc.get("variables", {}), sort_keys=True, default=str))
    hit = cache.get(key)
    if hit is None:
        hit = compile_document(model, doc)
        cache[key] = hit
    req, out_cols = hit
    # variables also feed J1 tier-6 resolution (names satisfiable from the
    # request's variable set), not just feature arguments
    return req.materialize(spine, out_cols, variables=doc.get("variables"))
