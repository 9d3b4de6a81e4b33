"""Declarative transformer/feature loading from YAML.

Reference parity: transformer sources are declared in YAML with a name,
typed args, and an expression
(``jq/.../JqTransformerYamlReader.kt``; fixture
``stream/src/main/resources/jq-transformers.yml:2-19``). Here the expression
language is Spark SQL (jq-comparable for the scalar surface the reference
uses), compiled via ``F.expr`` with named-argument substitution — JVM-side,
codegen-eligible, no Python in the hot path.

YAML shape::

    transformers:
      - name: negative_to_null
        args: [input]
        expr: "CASE WHEN input >= 0.0 THEN input END"
      - name: add_n
        args: [input, n]
        defaults: {n: 1}
        expr: "input + n"
    features:
      - name: gap_nonneg
        transformer: negative_to_null
        args: [gap_secs]

Argument binding substitutes each arg name in the SQL text with the SQL
fragment of the bound Column (parenthesized). Arg names inside string
literals are not protected — don't name args after words you quote.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from funcify_feature_eng_spark.functions.registry import TransformerRegistry


_PLAIN_REF = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def _sql_fragment(value: Any) -> str:
    """SQL text for a bound argument: a plain column reference or a Python
    literal. Composed Column expressions have no reliable SQL rendering —
    pre-project them to a named column first (that is also how FeatureModel
    wires args: always by name)."""
    if isinstance(value, Column):
        text = value._jc.toString()
        if _PLAIN_REF.match(text):
            return text
        raise ValueError(
            f"YAML transformers bind args by column NAME; got a composed "
            f"expression ({text!r}). Pre-project it: df.withColumn('tmp', expr) "
            "and pass F.col('tmp')."
        )
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, str):
        escaped = value.replace("'", "''")
        return f"'{escaped}'"
    raise ValueError(f"unsupported literal type for YAML transformer arg: {type(value)}")


def compile_sql_transformer(expr: str, arg_names: list[str], defaults: dict[str, Any]):
    """SQL expression + named args → Column builder (the jq-engine analog)."""
    pattern = re.compile(r"\b(" + "|".join(map(re.escape, arg_names)) + r")\b") if arg_names else None

    def build(*cols: Column, **kwargs: Any) -> Column:
        bound: dict[str, Any] = dict(zip(arg_names, cols))
        for name in arg_names[len(cols):]:
            if name in kwargs:
                bound[name] = kwargs[name]
            elif name in defaults:
                bound[name] = defaults[name]
            else:
                raise ValueError(f"transformer arg {name!r} not supplied and has no default")
        if pattern is None:
            return F.expr(expr)
        out = pattern.sub(lambda m: f"({_sql_fragment(bound[m.group(1)])})", expr)
        return F.expr(out)

    return build


def load_transformers_yaml(registry: TransformerRegistry, yaml_text: str) -> list[str]:
    """Register every transformer declared in ``yaml_text``; returns names.

    Two shapes are accepted:

    1. The reference's **verbatim** shape (``JqTransformerYamlReader.kt``;
       fixture ``stream/src/main/resources/jq-transformers.yml:2-19``): a
       top-level LIST of ``{name, input_schema, output_schema, expression}``
       where ``expression`` is a jq program — compiled to Column expressions
       by :mod:`funcify_feature_eng_spark.functions.jq_compile`.
    2. This engine's native shape: ``transformers:`` entries with either
       ``expr:`` (Spark SQL text) or ``jq:`` (jq program), typed args and
       defaults.
    """
    import yaml

    from funcify_feature_eng_spark.functions.jq_compile import compile_jq

    doc = yaml.safe_load(yaml_text) or {}
    if isinstance(doc, list):
        # reference-verbatim shape: unary jq transformers (input arg named
        # "input" per DefaultFeatureCalculatorCallable.kt:91-103)
        doc = {
            "transformers": [
                {
                    "name": e["name"],
                    "jq": e["expression"],
                    "input_schema": e.get("input_schema") or {},
                    "output_schema": e.get("output_schema") or {},
                    "args": ["input"],
                }
                for e in doc
            ]
        }
    names = []
    for t in doc.get("transformers", []):
        args = [str(a) for a in t.get("args", ["input"])]
        if "jq" in t:
            in_schema = t.get("input_schema") or {}
            out_schema = t.get("output_schema") or {}
            props = list((in_schema.get("properties") or {}).keys())
            builder = compile_jq(
                t["jq"],
                input_type=str(in_schema.get("type", "any")),
                output_type=out_schema.get("type"),
                input_fields=props or None,
            )
            if len(args) != 1:
                raise ValueError(
                    f"jq transformer {t['name']!r} must be unary (got args={args})"
                )
            # plan-time input typing from the JSON Schema (P6): numeric
            # families map to the registry's "number" family; exact string
            # type maps through; array/object element types are unknown at
            # this level so no plan-time constraint is emitted
            arg_types = {}
            st = in_schema.get("type")
            if st in ("number", "integer"):
                arg_types[args[0]] = "number"
            elif st == "string":
                arg_types[args[0]] = "string"
            registry.register(
                t["name"], builder, args=args, defaults=t.get("defaults", {}),
                description=t.get("description", f"jq: {t['jq']}"),
                arg_types=arg_types,
            )
        else:
            registry.register(
                t["name"],
                compile_sql_transformer(t["expr"], args, t.get("defaults", {})),
                args=args,
                defaults=t.get("defaults", {}),
                description=t.get("description", "yaml-declared"),
                # P6: optional input schema — `types: {input: double}` (or the
                # JSON-Schema-ish family "number"), enforced at plan time
                arg_types={str(k): str(v) for k, v in (t.get("types") or {}).items()},
            )
        names.append(t["name"])
    return names


def load_features_yaml(model, yaml_text: str) -> list[str]:
    """Declare features (transformer/window/asof) on a FeatureModel from YAML."""
    import yaml

    doc = yaml.safe_load(yaml_text) or {}
    names = []
    for f in doc.get("features", []):
        kind = f.get("kind", "transformer")
        if kind == "transformer":
            model.declare_transformer_feature(
                f["name"], f["transformer"], args=f.get("args", []), **f.get("params", {})
            )
        elif kind == "window":
            model.declare_window_feature(
                f["name"], op=f["op"], col=f.get("col"), **f.get("params", {})
            )
        elif kind == "asof":
            model.declare_asof_feature(
                f["name"], store=f["store"], right_ts=f["right_ts"],
                value_col=f["value_col"],
                allow_exact_matches=f.get("allow_exact_matches", True),
                right_order=f.get("right_order", ()),
            )
        else:
            raise ValueError(f"unknown feature kind {kind!r}")
        names.append(f["name"])
    return names
