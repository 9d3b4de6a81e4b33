"""Distributed feature-parity audit — "allclose at every entity×timestamp".

The north rule's acceptance criterion is that materialized feature vectors
match a reference engine's via numpy-allclose at each entity×timestamp
(BASELINE.json north_star). At 10^12 rows nobody collects two frames into
numpy; the audit itself must be a distributed operator. This is it: a
full-outer join on the entity/timestamp keys + per-column tolerance
predicates, returning ONLY the violations (empty result = parity). The
reference's own notion of identity lives in its tracked-value registry
(``schema/tracking/TrackableValue.kt``); here identity is the join keys.

Plan shape: one shuffle on the keys (or zero, if both sides are already
co-partitioned/bucketed on them), pure Column predicates, no Python. The
violation frame is tiny by construction (it's the bug report), so it can
be collected/alerted cheaply.

Companion to :func:`operators.diffing.frame_diff` (same criterion,
opposite output shape): that one emits the per-column SUMMARY (mismatch
counts, max |diff|) for the CI verdict; this one emits the row-level
violations to debug a failure the summary reported.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def allclose_audit(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: Sequence[str],
    value_cols: Sequence[str],
    atol: float = 1e-9,
    rtol: float = 0.0,
) -> DataFrame:
    """One row per detected violation between two feature frames.

    Presence mismatches (a key on one side only) come back as
    ``kind='left_only'/'right_only'`` with NULL values; value mismatches
    as one row per offending column, ``kind='value'``, when
    ``|l - r| > atol + rtol*|r|`` (numpy.isclose's asymmetric rule).
    NULL vs non-NULL is a value violation; NULL vs NULL is close.
    Empty result = the frames are allclose.

    ``keys`` must uniquely identify a row ON EACH SIDE (the audit grain is
    entity×timestamp); duplicate keys would cross-multiply in the
    full-outer join and report phantom comparisons.
    """
    lt = left.select(
        *keys, F.lit(1).alias("__lp"), *[F.col(c).alias(f"__l_{c}") for c in value_cols]
    )
    rt = right.select(
        *keys, F.lit(1).alias("__rp"), *[F.col(c).alias(f"__r_{c}") for c in value_cols]
    )
    j = lt.join(rt, on=list(keys), how="full_outer")

    presence = j.filter(F.col("__lp").isNull() | F.col("__rp").isNull()).select(
        *keys,
        F.lit(None).cast("string").alias("col"),
        F.lit(None).cast("double").alias("left_val"),
        F.lit(None).cast("double").alias("right_val"),
        F.when(F.col("__rp").isNull(), F.lit("left_only"))
        .otherwise(F.lit("right_only"))
        .alias("kind"),
    )
    both = j.filter(F.col("__lp").isNotNull() & F.col("__rp").isNotNull())

    out = presence
    for c in value_cols:
        lc, rc = F.col(f"__l_{c}"), F.col(f"__r_{c}")
        diff_bad = F.abs(lc - rc) > (F.lit(float(atol)) + F.lit(float(rtol)) * F.abs(rc))
        null_mismatch = lc.isNull() != rc.isNull()
        out = out.unionByName(
            both.filter(diff_bad | null_mismatch).select(
                *keys,
                F.lit(c).alias("col"),
                lc.cast("double").alias("left_val"),
                rc.cast("double").alias("right_val"),
                F.lit("value").alias("kind"),
            )
        )
    return out
