"""k-anonymity / l-diversity privacy audit over quasi-identifier groups.

The training-data privacy question beside PII *detection* (functions/
text.py::pii_flags finds explicit identifiers): even with direct
identifiers stripped, a row is re-identifiable when its combination of
quasi-identifiers (zip, age band, segment, ...) is rare. Sweeney's
k-anonymity (IJUFKS 2002): every quasi-identifier (QI) combination must
be shared by >= k rows. Machanavajjhala's l-diversity (TKDD 2007): each
QI group must also contain >= l distinct sensitive values, or the group
leaks the sensitive attribute even at high k (the "homogeneity attack").

Everything is one exact aggregate — integer counts, no approximation, no
sampling — because a privacy audit that under-counts a singleton group is
worse than none.

Physical shape: ONE data-sized shuffle onto QI grain (map-side combined
count + an exact ``count(DISTINCT sensitive)`` expand — exact because an
under-counted l leaks; sensitive-attribute cardinality per QI group is
small in practice, so the expand is bounded by the data's own diversity);
the summary variant folds the group table (never data-sized) a second
time.
At 100 TB the QI-grain table is the dataset's QI cardinality — exactly
what a partitioned count handles; no windows, no joins.

Reference parity anchor: the reference has no privacy tier (its closest
surface is schema-level validation, ``materializer/.../
MaterializationPreparsedDocumentProvider``); this extends the
quality/compliance family beside checks.py and parity.py (SURVEY §2
extensions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_report", "k_anonymity_summary"]


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    *,
    sensitive_col: str | None = None,
    k: int = 5,
    l: int = 2,
    violations_only: bool = True,
) -> DataFrame:
    """Per-QI-group audit: ``(quasi_cols..., n:bigint, l_distinct:bigint,
    k_violation:boolean, l_violation:boolean)``.

    A group violates k-anonymity when fewer than ``k`` rows share its QI
    combination, and l-diversity when it holds fewer than ``l`` distinct
    non-NULL ``sensitive_col`` values (``l_distinct``/``l_violation`` are
    NULL/False-free only when a sensitive column is given; without one
    they are NULL and never flag). NULL quasi-identifier values are a
    legitimate (often the rarest!) combination — they group as their own
    key, never silently drop. ``violations_only=False`` returns every
    group.
    """
    qs = [str(c) for c in quasi_cols]
    if not qs:
        raise ValueError("k_anonymity_report: need at least one quasi column")
    if k < 1:
        raise ValueError(f"k_anonymity_report: k must be >= 1, got {k}")
    if l < 1:
        raise ValueError(f"k_anonymity_report: l must be >= 1, got {l}")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).cast("bigint").alias("l_distinct")
        )
    g = df.groupBy(*qs).agg(*aggs)
    if sensitive_col is None:
        g = g.withColumn("l_distinct", F.lit(None).cast("bigint"))
    out = g.select(
        *qs,
        "n",
        "l_distinct",
        (F.col("n") < F.lit(int(k))).alias("k_violation"),
        F.when(
            F.lit(sensitive_col is not None), F.col("l_distinct") < F.lit(int(l))
        ).alias("l_violation"),
    )
    if violations_only:
        out = out.filter(
            F.col("k_violation") | F.coalesce(F.col("l_violation"), F.lit(False))
        )
    return out


def k_anonymity_summary(
    df: DataFrame,
    quasi_cols: Sequence[str],
    *,
    sensitive_col: str | None = None,
) -> DataFrame:
    """One-row dataset-level verdict: ``(n_rows, n_groups, k_anonymity,
    l_diversity, n_singletons, singleton_row_ppm)`` — all bigint.

    ``k_anonymity`` = the dataset's actual k (the SMALLEST QI group);
    ``l_diversity`` = the smallest distinct-sensitive count over groups
    (NULL without a sensitive column); ``n_singletons`` = groups of size
    1 (each one a fully re-identifiable row); ``singleton_row_ppm`` =
    floor(singleton rows · 1e6 / total rows) on the repo-wide ppm grid.
    Empty input: one row of zeros with NULL k/l (no group to take a min
    over — a vacuous dataset is not '0-anonymous').
    """
    from .util import exact_floor_div

    groups = k_anonymity_report(
        df,
        quasi_cols,
        sensitive_col=sensitive_col,
        violations_only=False,
    )
    agg = groups.agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("n").alias("k_anonymity"),
        F.min("l_distinct").alias("l_diversity"),
        F.coalesce(
            F.sum(F.when(F.col("n") == 1, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_singletons"),
    )
    return agg.select(
        F.coalesce(F.col("n_rows"), F.lit(0).cast("bigint")).alias("n_rows"),
        "n_groups",
        "k_anonymity",
        "l_diversity",
        "n_singletons",
        F.when(
            F.coalesce(F.col("n_rows"), F.lit(0)) > 0,
            # cast BEFORE multiplying: n_singletons · 1e6 in LONG would
            # silently wrap past ~9.2e12 singletons under non-ANSI math
            exact_floor_div(
                F.col("n_singletons").cast("decimal(38,0)")
                * F.lit(1_000_000).cast("decimal(38,0)"),
                F.col("n_rows").cast("decimal(38,0)"),
            ),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("singleton_row_ppm"),
    )
