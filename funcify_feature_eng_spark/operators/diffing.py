"""Distributed feature-parity diff — numpy.allclose at table scale.

The acceptance criterion for this whole engine is "outputs match the
reference's materialized feature vectors via numpy allclose at every
entity × timestamp, preserving per-turn text equality" (reference
parity contract; see also the reference's fixture-compare tests,
``funcify-feature-eng-materializer/src/test/.../materializer`` spec
style). At 10^12 turns nobody collects two frames into numpy — the
comparison itself must be a Spark job. :func:`frame_diff` is that job:
one full-outer sort-merge join on the entity keys plus one
map-side-combinable aggregate, emitting a constraints-sized summary —
never the data.

Companion to :func:`operators.parity.allclose_audit` (same criterion,
opposite output shape): the audit returns the row-level VIOLATIONS for
debugging a failed comparison; this module returns the per-column
SUMMARY (mismatch counts, max |diff|, presence totals) for the CI
verdict and for tracking drift magnitude over time — plus array-column
and equal_nan semantics the row audit doesn't need.

Closeness follows ``numpy.isclose(actual, expected)``:
``|expected − actual| <= atol + rtol·|expected|`` (expected is the
reference operand that scales ``rtol``), exact equality short-circuits
(so ``inf == inf`` is close, as numpy treats it), NaN pairs are a
mismatch unless ``equal_nan=True``, and a NULL on one side only is
always a mismatch. Non-numeric columns (strings — "per-turn text
equality" — booleans, timestamps, structs) compare null-safe exact.
Numeric-array columns (feature/embedding vectors) compare element-wise
with the same rule via JVM higher-order functions; a length difference
is a mismatch.

Scale: the summary has one row per compared column plus one ``__rows__``
presence row. All float aggregation is MAX (order-independent — a float
SUM across partitions would be nondeterministic and break bit-exact
verification); every count is BIGINT.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["frame_diff", "frames_allclose"]

_E, _A = "__fd_e_present", "__fd_a_present"


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, T.NumericType)


def _is_float(dt: T.DataType) -> bool:
    return isinstance(dt, (T.FloatType, T.DoubleType))


def _is_exact(dt: T.DataType) -> bool:
    return isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType)
    )


def _exact_abs_diff(e: Column, a: Column, dt: T.DataType, dt2: T.DataType) -> Column:
    # integral/decimal pairs subtract in DECIMAL so 64-bit values past
    # 2^53 keep their low bits; only the final |diff| drops to double
    if isinstance(dt, T.DecimalType) or isinstance(dt2, T.DecimalType):
        return F.abs(e - a).cast("double")
    return F.abs(e.cast("decimal(38,0)") - a.cast("decimal(38,0)")).cast("double")


def _scalar_close(
    e: Column, a: Column, dt: T.DataType, rtol: float, atol: float,
    equal_nan: bool, dt2: T.DataType | None = None,
) -> Column:
    """True when the non-NULL pair (e, a) is close (numpy.isclose rule).

    When BOTH sides are exact types (integral/decimal), equality is
    evaluated in the native exact type — a double cast would declare
    bigints differing past 2^53 equal even at rtol=atol=0, silently
    passing a real regression through the parity gate."""
    if _is_exact(dt) and _is_exact(dt2 if dt2 is not None else dt):
        eq = e == a
        if rtol == 0.0 and atol == 0.0:
            return eq
        dd = _exact_abs_diff(e, a, dt, dt2 if dt2 is not None else dt)
        return eq | (
            dd <= F.lit(float(atol))
            + F.lit(float(rtol)) * F.abs(e.cast("double"))
        )
    ed, ad = e.cast("double"), a.cast("double")
    close = (ed == ad) | (
        F.abs(ed - ad) <= F.lit(float(atol)) + F.lit(float(rtol)) * F.abs(ed)
    )
    if _is_float(dt):
        both_nan = F.isnan(ed) & F.isnan(ad)
        either_nan = F.isnan(ed) | F.isnan(ad)
        close = F.when(both_nan, F.lit(bool(equal_nan))).when(
            either_nan, F.lit(False)
        ).otherwise(close)
    return close


def _pair_mismatch(
    e: Column, a: Column, close: Column | None
) -> Column:
    """Mismatch over a present row pair, NULL-aware.

    both NULL -> equal; one NULL -> mismatch; else 1 - close.
    """
    if close is None:
        return ~e.eqNullSafe(a)
    return F.when(e.isNull() & a.isNull(), F.lit(False)).when(
        e.isNull() | a.isNull(), F.lit(True)
    ).otherwise(~close)


def frame_diff(
    expected: DataFrame,
    actual: DataFrame,
    *,
    keys: Sequence[str],
    value_cols: Sequence[str] | None = None,
    rtol: float = 0.0,
    atol: float = 0.0,
    equal_nan: bool = False,
) -> DataFrame:
    """Compare two frames at the ``keys`` grain; return a per-column summary.

    ``keys`` must identify a row on each side (the entity × timestamp
    grain — duplicate keys would multiply through the join) and must be
    non-NULL (NULL keys never match and are reported as one-sided rows).
    ``value_cols`` defaults to every non-key column present in BOTH
    frames, in ``expected``'s column order.

    Output — one ``__rows__`` presence row then one row per column:

    - ``__rows__``: ``n_expected``/``n_actual`` = side row counts,
      ``n_compared`` = matched key pairs, ``n_mismatch`` = rows present
      on exactly one side.
    - column rows: ``n_expected``/``n_actual`` = non-NULL counts of the
      column within matched pairs, ``n_compared`` = matched pairs,
      ``n_mismatch`` = pairs failing the closeness/equality rule,
      ``max_abs_diff`` = MAX |expected − actual| over non-NULL numeric
      pairs (element-wise max for numeric arrays; NULL for non-numeric
      columns and when nothing was comparable).
    """
    keys = list(keys)
    if not keys:
        raise ValueError("frame_diff: keys must be non-empty")
    for k in keys:
        if k not in expected.columns or k not in actual.columns:
            raise ValueError(f"frame_diff: key {k!r} missing from a side")
    if value_cols is None:
        value_cols = [
            c for c in expected.columns
            if c not in keys and c in actual.columns
        ]
    value_cols = list(value_cols)
    if not value_cols:
        raise ValueError("frame_diff: no value columns to compare")
    e_types = dict(expected.dtypes)  # names only; real types from schema
    e_schema = {f.name: f.dataType for f in expected.schema.fields}
    a_schema = {f.name: f.dataType for f in actual.schema.fields}
    for c in value_cols:
        if c in keys or c not in e_schema or c not in a_schema:
            raise ValueError(f"frame_diff: bad value column {c!r}")
    del e_types

    e = expected.select(
        *keys, *[F.col(c).alias(f"__fd_e_{c}") for c in value_cols]
    ).withColumn(_E, F.lit(1))
    a = actual.select(
        *keys, *[F.col(c).alias(f"__fd_a_{c}") for c in value_cols]
    ).withColumn(_A, F.lit(1))
    j = e.join(a, on=keys, how="full_outer")

    both = F.col(_E).isNotNull() & F.col(_A).isNotNull()
    aggs: list[Column] = [
        F.coalesce(F.sum(F.col(_E)), F.lit(0)).cast("bigint").alias("__ne"),
        F.coalesce(F.sum(F.col(_A)), F.lit(0)).cast("bigint").alias("__na"),
        F.coalesce(F.sum(F.when(both, 1)), F.lit(0)).cast("bigint")
        .alias("__nb"),
    ]
    for i, c in enumerate(value_cols):
        ec, ac = F.col(f"__fd_e_{c}"), F.col(f"__fd_a_{c}")
        edt, adt = e_schema[c], a_schema[c]
        diff: Column | None = None
        if _is_numeric(edt) and _is_numeric(adt):
            close = _scalar_close(ec, ac, edt, rtol, atol, equal_nan, adt)
            if _is_exact(edt) and _is_exact(adt):
                diff = _exact_abs_diff(ec, ac, edt, adt)
            else:
                diff = F.abs(ec.cast("double") - ac.cast("double"))
        elif (
            isinstance(edt, T.ArrayType) and isinstance(adt, T.ArrayType)
            and _is_numeric(edt.elementType) and _is_numeric(adt.elementType)
        ):
            elem_dt = edt.elementType
            a_elem_dt = adt.elementType
            pair_bad = F.exists(
                F.zip_with(
                    ec, ac,
                    lambda x, y: F.when(
                        x.isNull() & y.isNull(), F.lit(False)
                    ).when(x.isNull() | y.isNull(), F.lit(True)).otherwise(
                        ~_scalar_close(
                            x, y, elem_dt, rtol, atol, equal_nan, a_elem_dt
                        )
                    ),
                ),
                lambda b: b,
            )
            close = ~((F.size(ec) != F.size(ac)) | pair_bad)
            if _is_exact(elem_dt) and _is_exact(a_elem_dt):
                diff = F.array_max(
                    F.zip_with(
                        ec, ac,
                        lambda x, y: _exact_abs_diff(x, y, elem_dt, a_elem_dt),
                    )
                )
            else:
                diff = F.array_max(
                    F.zip_with(
                        ec, ac,
                        lambda x, y: F.abs(x.cast("double") - y.cast("double")),
                    )
                )
        else:
            close = None
        mism = _pair_mismatch(ec, ac, close)
        aggs.append(
            F.coalesce(F.sum(F.when(both & ec.isNotNull(), 1)), F.lit(0))
            .cast("bigint").alias(f"__e{i}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(both & ac.isNotNull(), 1)), F.lit(0))
            .cast("bigint").alias(f"__a{i}")
        )
        aggs.append(
            F.coalesce(F.sum(F.when(both & mism, 1)), F.lit(0))
            .cast("bigint").alias(f"__m{i}")
        )
        if diff is not None:
            aggs.append(
                F.max(
                    F.when(both & ec.isNotNull() & ac.isNotNull(), diff)
                ).alias(f"__d{i}")
            )

    one = j.agg(*aggs)
    nodiff = F.lit(None).cast("double")
    rows = [
        F.struct(
            F.lit("__rows__").alias("column"),
            F.col("__ne").alias("n_expected"),
            F.col("__na").alias("n_actual"),
            F.col("__nb").alias("n_compared"),
            (F.col("__ne") + F.col("__na") - F.lit(2) * F.col("__nb"))
            .cast("bigint").alias("n_mismatch"),
            nodiff.alias("max_abs_diff"),
        )
    ]
    agg_names = {c for c in one.columns}
    for i, c in enumerate(value_cols):
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__e{i}").alias("n_expected"),
                F.col(f"__a{i}").alias("n_actual"),
                F.col("__nb").alias("n_compared"),
                F.col(f"__m{i}").alias("n_mismatch"),
                (F.col(f"__d{i}") if f"__d{i}" in agg_names else nodiff)
                .alias("max_abs_diff"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("__r")).select("__r.*")


def frames_allclose(
    expected: DataFrame,
    actual: DataFrame,
    *,
    keys: Sequence[str],
    value_cols: Sequence[str] | None = None,
    rtol: float = 0.0,
    atol: float = 0.0,
    equal_nan: bool = False,
) -> bool:
    """True iff no one-sided rows and every compared pair is close/equal.

    The CI-style boolean over :func:`frame_diff`'s summary — the
    distributed ``np.allclose(actual, expected)`` verdict. Collects only
    the columns-sized summary.
    """
    summary = frame_diff(
        expected, actual, keys=keys, value_cols=value_cols,
        rtol=rtol, atol=atol, equal_nan=equal_nan,
    ).collect()
    return all(r["n_mismatch"] == 0 for r in summary)
