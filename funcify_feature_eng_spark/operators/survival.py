"""Kaplan-Meier survival curves, integer-exact.

Time-to-event with right-censoring — "how long until a user churns / a
conversation errors / a job fails", with subjects that never fired the
event counted as *censored* at their last observation instead of dropped
(dropping them biases survival down). The product-limit estimator
(Kaplan & Meier 1958, JASA 53:457) at event time ``t``::

    S(t) = prod over event times t_i <= t of (n_risk(t_i) - d_i) / n_risk(t_i)

**The exactness trick**: a floating cumulative product (``exp(sum(ln))``)
is not reproducible across engines — libm ``ln`` implementations differ in
the last ulp and windowed float sums re-associate. Instead the survival is
carried on a fixed-point 1e-12 grid with a PINNED integer rounding
sequence::

    s_0 = 10^12;   s_k = floor(s_{k-1} * (n_k - d_k) / n_k)

Every step is integer arithmetic (the intermediate product needs DECIMAL /
HUGEINT width, never doubles), so ANY engine replaying the fold gets the
identical bit pattern — the DuckDB oracle reproduces it with a recursive
CTE. Per-step floor loses < 1 grid unit, so after ``k`` event times the
value is within ``k * 1e-12`` of the real-valued estimator — noise at
analytics scale, determinism where it counts.

Pinned semantics (cross-engine contract):

- Durations are integers (cast to BIGINT) on the caller's grid (seconds,
  days, ...); NULL duration / NULL event-flag rows are excluded.
- One output row per distinct observed duration (event or censor times);
  ``n_risk(t)`` counts subjects with duration >= t.
- The standard tie convention: events at ``t`` precede censorings at
  ``t`` — a subject censored at ``t`` IS at risk for the events at ``t``.
- ``survival_e12`` updates only at rows with ``n_event > 0``; censor-only
  rows carry the running value (the KM step function).

Physical shape: ONE data-sized shuffle onto (group, duration) grain
(map-side combined counts), then a group-grain collect of the LIFE TABLE
(bounded by distinct durations per group — thousands even for years of
second-grain data, the retention_cohorts bound), a JVM ``F.aggregate``
fold threading (n_risk, survival) through the sorted rows, and an explode
back to row grain. Zero Python stages, no window.

Reference parity anchor: the reference's temporal surface is
point-in-time reads (``schema/.../TrackableValue.kt``); survival extends
the experiment/metrics family beside cuped_readout and group_auc
(SURVEY §2 extensions).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["km_survival"]

_E12 = 10**12


def km_survival(
    df: DataFrame,
    *,
    duration_col: str,
    event_col: str,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Kaplan-Meier life table + survival per group.

    ``duration_col``: integer time-to-event/censoring on the caller's
    grid (cast to BIGINT; pre-scale fractional durations onto a fixed
    grid). ``event_col``: 1/true = the event fired at ``duration``;
    0/false = right-censored there. Output per group, one row per
    distinct duration: ``(group..., duration:bigint, n_risk:bigint,
    n_event:bigint, n_censored:bigint, survival_e12:bigint)`` —
    ``survival_e12`` is S(duration) on the fixed-point 1e-12 grid under
    the module's pinned rounding sequence.
    """
    keys = [str(c) for c in group_by]
    dur = F.col(duration_col).cast("bigint")
    ev = F.col(event_col).cast("boolean")
    base = df.filter(dur.isNotNull() & ev.isNotNull()).select(
        *[F.col(c) for c in keys],
        dur.alias("__t"),
        ev.cast("long").alias("__e"),
    )
    # life-table grain: ONE data-sized shuffle, map-side combined
    lt = base.groupBy(*keys, "__t").agg(
        F.sum("__e").cast("bigint").alias("__d"),
        F.sum(F.lit(1) - F.col("__e")).cast("bigint").alias("__c"),
    )
    # group grain: the life table is bounded by distinct durations per
    # group; collect it sorted and fold once in the JVM
    grouped = lt.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__t"), F.col("__d"), F.col("__c")))
        ).alias("__rows"),
        F.sum(F.col("__d") + F.col("__c")).cast("bigint").alias("__n"),
    )

    # fold state: (remaining at-risk BEFORE this row, survival_e12 so far,
    # emitted rows). s * (n-d) needs > 63 bits (1e12 * n_risk), so the
    # survival arithmetic runs in DECIMAL(38,0); all values non-negative,
    # so floor division is the plain remainder identity.
    zero = F.struct(
        F.col("__n").alias("risk"),
        F.lit(_E12).cast("decimal(38,0)").alias("s"),
        F.lit([]).cast(
            "array<struct<t:bigint,risk:bigint,d:bigint,c:bigint,s:decimal(38,0)>>"
        ).alias("out"),
    )

    def _step(acc: Column, r: Column) -> Column:
        risk = acc["risk"]
        num = acc["s"] * (risk - r["__d"]).cast("decimal(38,0)")
        den = risk.cast("decimal(38,0)")
        s_new = F.when(
            r["__d"] > 0, ((num - num % den) / den).cast("decimal(38,0)")
        ).otherwise(acc["s"])
        return F.struct(
            (risk - r["__d"] - r["__c"]).alias("risk"),
            s_new.alias("s"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        r["__t"].alias("t"),
                        risk.alias("risk"),
                        r["__d"].alias("d"),
                        r["__c"].alias("c"),
                        s_new.alias("s"),
                    )
                ),
            ).alias("out"),
        )

    folded = grouped.select(
        *[F.col(c) for c in keys],
        F.explode(F.aggregate(F.col("__rows"), zero, _step)["out"]).alias("__r"),
    )
    return folded.select(
        *[F.col(c) for c in keys],
        F.col("__r.t").alias("duration"),
        F.col("__r.risk").alias("n_risk"),
        F.col("__r.d").alias("n_event"),
        F.col("__r.c").alias("n_censored"),
        F.col("__r.s").cast("bigint").alias("survival_e12"),
    )
