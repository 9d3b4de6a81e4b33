"""P6 value-level input validation: declarative JSON checks at execution
time, with quarantine — not silent nulls.

The reference validates every transformer input VALUE against the
transformer's declared JSON Schema at call time and fails the call with the
schema violations (``jq/.../jackson/DefaultJacksonJqTransformer.kt:89-113``,
validator wiring ``DefaultJacksonJqTransformerFactory.kt``); plan-time
column-TYPE validation alone (plans/model.py) would let malformed values
inside a JSON-blob column pass silently.

Spark-first realization: the schema compiles to pure Column predicates (no
Python UDF — validation stays inside whole-stage codegen at scan speed) that
produce a per-row ``violations`` array. Rows with violations split into a
quarantine frame carrying the reasons; at 100 TB this is a map-only stage
and the quarantine write is the standard dead-letter pattern.

Supported schema subset (JSON-Schema shaped)::

    {
      "type": "object",
      "required": ["k", "tag"],
      "properties": {
        "k":   {"type": "integer", "minimum": 0, "maximum": 100},
        "tag": {"type": "string", "enum": ["a", "b"]},
        "ok":  {"type": "boolean"},
        "x":   {"type": "number"},
      },
    }
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUM_RE = r"^-?[0-9]+(\.[0-9]+)?([eE][+-]?[0-9]+)?$"
_INT_RE = r"^-?[0-9]+$"


def _prop_checks(col: str, name: str, spec: dict[str, Any]) -> list[Column]:
    """Violation messages (NULL = pass) for one declared property."""
    raw = F.get_json_object(F.col(col), f"$.{name}")
    present = raw.isNotNull()
    checks: list[Column] = []
    t = spec.get("type")
    if t in ("number", "integer"):
        rx = _INT_RE if t == "integer" else _NUM_RE
        checks.append(
            F.when(present & ~raw.rlike(rx), F.lit(f"{name}: expected {t}"))
        )
        num = raw.cast("double")
        if "minimum" in spec:
            checks.append(
                F.when(
                    present & raw.rlike(rx) & (num < F.lit(float(spec["minimum"]))),
                    F.lit(f"{name}: below minimum {spec['minimum']}"),
                )
            )
        if "maximum" in spec:
            checks.append(
                F.when(
                    present & raw.rlike(rx) & (num > F.lit(float(spec["maximum"]))),
                    F.lit(f"{name}: above maximum {spec['maximum']}"),
                )
            )
    elif t == "boolean":
        checks.append(
            F.when(present & ~raw.isin("true", "false"), F.lit(f"{name}: expected boolean"))
        )
    elif t == "string":
        # get_json_object unquotes strings AND stringifies numbers/bools, so
        # the unquoted value can't distinguish "123" from 123 — enforce the
        # string type on the raw JSON text shape: the property's value must
        # start with a quote. The property name is regex-escaped (names like
        # "a+b" are data, not patterns). Flat-object subset only: a nested
        # object containing the same key name elsewhere can satisfy this
        # shape check (documented limitation of the supported subset).
        import re as _re

        quoted = F.col(col).rlike(f'"{_re.escape(name)}"\\s*:\\s*"')
        checks.append(
            F.when(present & ~quoted, F.lit(f"{name}: expected string"))
        )
        if "enum" in spec:
            checks.append(
                F.when(
                    present & ~raw.isin(*[str(v) for v in spec["enum"]]),
                    F.lit(f"{name}: not in enum"),
                )
            )
    if "enum" in spec and t != "string":
        checks.append(
            F.when(
                present & ~raw.isin(*[str(v) for v in spec["enum"]]),
                F.lit(f"{name}: not in enum"),
            )
        )
    return checks


def violations_col(col: str, schema: dict[str, Any]) -> Column:
    """``array<string>`` of violation messages for a JSON-blob column under
    the declared schema; empty array = valid."""
    checks: list[Column] = []
    blob = F.col(col)
    # malformed JSON: non-null text that the JSON parser rejects. try_parse:
    # from_json yields NULL on corrupt records with a permissive map schema.
    parsed = F.from_json(blob, "map<string,string>")
    checks.append(
        F.when(blob.isNotNull() & parsed.isNull(), F.lit("malformed JSON"))
    )
    if schema.get("type") == "object":
        # ltrim: leading whitespace (CSV ingestion etc.) is valid JSON and
        # must not flip a parseable object into quarantine
        checks.append(
            F.when(
                blob.isNotNull() & parsed.isNotNull() & ~F.ltrim(blob).startswith("{"),
                F.lit("expected object"),
            )
        )
    for name in schema.get("required", []):
        checks.append(
            F.when(
                blob.isNotNull()
                & parsed.isNotNull()
                & ~F.array_contains(
                    F.coalesce(F.json_object_keys(blob), F.array()), name
                ),
                F.lit(f"{name}: required"),
            )
        )
    for name, spec in schema.get("properties", {}).items():
        checks.extend(_prop_checks(col, name, spec))
    return F.array_compact(F.array(*checks))


def validate_json_values(
    df: DataFrame,
    col: str,
    schema: dict[str, Any],
    violations: str = "violations",
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (valid, quarantined) on value-level JSON validation
    of ``col``. The quarantine frame carries a ``violations`` array<string>
    column naming every failed check — counted, inspectable, never silently
    nulled. NULL blobs count as valid (nullability is the plan-time type
    layer's concern)."""
    tagged = df.withColumn(violations, violations_col(col, schema))
    valid = tagged.filter(F.size(violations) == 0).drop(violations)
    quarantined = tagged.filter(F.size(violations) > 0)
    return valid, quarantined
