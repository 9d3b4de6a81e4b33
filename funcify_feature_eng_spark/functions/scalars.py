"""Built-in scalar transformers (reference §2.7 F1–F9, all JVM-side).

Each function takes/returns ``pyspark.sql.Column`` so Catalyst folds them
into whole-stage codegen; none drops to Python. Golden semantics come from
the reference's jq fixtures (``stream/src/main/resources/jq-transformers.yml:2-19``)
and input-reshaping code (``stream/StreamFunctions.kt:289-375``).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def negative_to_null(c: Column) -> Column:
    """F1 — ``numbers | if . >= 0.0 then . else null end``
    (jq-transformers.yml:2-7)."""
    return F.when(c >= 0, c)


def list_size(c: Column) -> Column:
    """F2 — ``arrays | length`` (jq-transformers.yml:8-13). NULL in → NULL out
    (Spark's size() returns -1 for NULL under legacy conf; normalize)."""
    return F.when(c.isNotNull(), F.size(c))


def extract_decade(c: Column) -> Column:
    """F3 — ``numbers | if . >= 1900 then . % 100 else null end``
    (jq-transformers.yml:14-19). NB: the reference computes year % 100
    (two-digit year), not a decade — parity beats the name."""
    return F.when(c >= 1900, c % 100)


def parse_duration_minutes(c: Column) -> Column:
    """F5 — regex ``(\\d+) min`` → int (StreamFunctions.kt:297-322)."""
    m = F.regexp_extract(c, r"(\d+)\s+min", 1)
    return F.when(m != "", m.cast("int"))


def parse_num_seasons(c: Column) -> Column:
    """F5 — regex ``(\\d+) [Ss]easons?`` → int (StreamFunctions.kt:297-322)."""
    m = F.regexp_extract(c, r"(\d+)\s+[Ss]easons?", 1)
    return F.when(m != "", m.cast("int"))


def split_list(c: Column, sep: str = ", ") -> Column:
    """F6 — ``"a, b, c"`` → array (StreamFunctions.kt:333-349). Empty/NULL → NULL."""
    return F.when((c.isNotNull()) & (F.length(c) > 0), F.split(c, re.escape(sep)))


def name_components(c: Column) -> Column:
    """F7 — NameFormat(FIRST_NAME, LAST_NAME) support: split a full name
    (netflix_movies_and_tv_shows.graphqls:110-121)."""
    return F.split(F.trim(c), r"\s+")


def first_name(c: Column) -> Column:
    return F.element_at(name_components(c), 1)


def last_name(c: Column) -> Column:
    parts = name_components(c)
    return F.when(F.size(parts) > 1, F.element_at(parts, -1))


def decimal_coerce(c: Column, precision: int, scale: int) -> Column:
    """F9 — Decimal3/7/16 coercion with HALF_EVEN rounding.

    The reference uses MathContext.DECIMAL32-family (HALF_EVEN —
    ``shared-definitions/.../scalar/decimal/Decimal7.kt:14-27``); Spark's
    ``round`` is HALF_UP so parity requires ``bround``.
    """
    return F.bround(c.cast("double"), scale).cast(f"decimal({precision},{scale})")


def decimal3(c: Column, scale: int = 0) -> Column:
    return decimal_coerce(c, 3, scale)


def decimal7(c: Column, scale: int = 2) -> Column:
    return decimal_coerce(c, 7, scale)


def decimal16(c: Column, scale: int = 4) -> Column:
    return decimal_coerce(c, 16, scale)


# F8 — naming-convention helpers (plan-time Python; reference
# naming/StandardNamingConventions.kt:12-78). Used by the tabular API's
# alias resolution, not inside DataFrame plans.
_CAMEL_RE1 = re.compile(r"(.)([A-Z][a-z]+)")
_CAMEL_RE2 = re.compile(r"([a-z0-9])([A-Z])")


def to_snake_case(name: str) -> str:
    s = _CAMEL_RE1.sub(r"\1_\2", name)
    return _CAMEL_RE2.sub(r"\1_\2", s).replace("-", "_").replace(" ", "_").lower()


def to_camel_case(name: str) -> str:
    parts = to_snake_case(name).split("_")
    return parts[0] + "".join(p.capitalize() for p in parts[1:] if p)


def to_pascal_case(name: str) -> str:
    return "".join(p.capitalize() for p in to_snake_case(name).split("_") if p)


def name_equivalent(a: str, b: str) -> bool:
    """Two names match if equal under any supported convention — the
    @alias-registry matching rule (TabularQueryDocumentCreator.kt:44-108)."""
    return to_snake_case(a) == to_snake_case(b)
