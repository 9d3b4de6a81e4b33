"""CUPED variance-reduced experiment readout, exact moments.

The standard A/B readout upgrade (Deng, Xu, Kohavi & Walker, WSDM'13
"Improving the Sensitivity of Online Controlled Experiments by Utilizing
Pre-Experiment Data"): regress the experiment metric on a pre-period
covariate and report arm means of the residualized metric,

    theta     = cov(x, y) / var(x)          (pooled across arms)
    adj_mean_a = mean_a(y) - theta * (mean_a(x) - mean_pooled(x))

which removes the variance the covariate explains (typically the same
metric measured before the experiment) without biasing the treatment
contrast — the workhorse that cuts experiment runtimes 30-50%.

House exactness contract (cf. correlation.py, stats_tests.py): inputs are
INTEGRAL fixed-point columns; all moments (n, Sx, Sy, Sxx, Sxy) aggregate
exactly — per-row products in LONG under the runtime |value| < 2^31
witness, running sums in DECIMAL(38) — and doubles appear only in the
final mirrored expression (each division/multiply takes exact-integer
inputs, so IEEE engines agree to the last bit; the SQL twin mirrors the
expression shape verbatim).

Zero-variance covariate (or a single unit): theta is NULL and the
adjusted mean falls back to the raw mean — CUPED with nothing to regress
on is the plain readout, not an error.

Scale: ONE map-side-combined aggregate onto (group, arm) grain, then a
window over the group's arm rows for the pooled moments — no second data
pass, no join. The data-sized work is the per-unit aggregate the caller
feeds in (unit-grain metric/covariate rows), which is the natural
experiment-analysis input anyway.

Reference parity anchor: the reference has no experimentation surface;
this completes the eval/stats family (SURVEY §2 extensions) beside the
two-sample tests (stats_tests.py) that gate the same readouts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cuped_readout"]

_DEC = "decimal(38,0)"
_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def cuped_readout(
    df: DataFrame,
    *,
    arm_col: str,
    metric_col: str,
    covariate_col: str,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Per-arm CUPED readout over unit-grain rows.

    ``df``: one row per experiment unit with the metric (``metric_col``)
    and pre-period covariate (``covariate_col``) on an INTEGRAL
    fixed-point grid (pre-scale: ``F.floor(x * 1e6).cast('long')``), plus
    the assignment ``arm_col``. Rows with a NULL arm, metric, or covariate
    are excluded (pairwise-complete, the pearson_corr convention).

    Output: ``group_by + (arm, n, mean_y, mean_adj, theta)`` — ``n``
    units, raw and CUPED-adjusted metric means, and the pooled theta
    (identical on every arm row of a group; NULL theta ⇒ ``mean_adj ==
    mean_y``). Means are doubles from the final mirrored expression over
    exact integer moments.
    """
    for c in (metric_col, covariate_col):
        t = df.schema[c].dataType.simpleString()
        if t not in _INTEGRAL:
            raise ValueError(
                f"cuped_readout requires integral metric/covariate (got {c}: "
                f"{t}): pre-scale onto a fixed-point grid "
                "(e.g. F.floor(x * 1e6).cast('long'))"
            )
    keys = list(group_by)
    y = F.col(metric_col)
    x = F.col(covariate_col)
    both = x.isNotNull() & y.isNotNull() & F.col(arm_col).isNotNull()
    xl = F.when(both, x.cast("long"))
    yl = F.when(both, y.cast("long"))

    per_arm = df.groupBy(*keys, F.col(arm_col).alias("arm")).agg(
        F.count(F.when(both, F.lit(1))).cast(_DEC).alias("__n"),
        F.coalesce(F.sum(xl.cast(_DEC)), F.lit(0).cast(_DEC)).alias("__sx"),
        F.coalesce(F.sum(yl.cast(_DEC)), F.lit(0).cast(_DEC)).alias("__sy"),
        F.coalesce(F.sum((xl * xl).cast(_DEC)), F.lit(0).cast(_DEC)).alias("__sxx"),
        F.coalesce(F.sum((xl * yl).cast(_DEC)), F.lit(0).cast(_DEC)).alias("__sxy"),
        F.coalesce(F.max(F.abs(xl)), F.lit(0)).alias("__mx"),
        F.coalesce(F.max(F.abs(yl)), F.lit(0)).alias("__my"),
    ).filter(F.col("__n") > 0)

    # pooled moments: a window over the group's arm rows (group-grain data,
    # a handful of rows per group) — no join, no second pass
    w = Window.partitionBy(*[F.col(k) for k in keys]) if keys else Window.partitionBy(
        F.lit(1)
    )
    n_p = F.sum("__n").over(w)
    sx_p = F.sum("__sx").over(w)
    sxx_p = F.sum("__sxx").over(w)
    sxy_p = F.sum("__sxy").over(w)
    sy_p = F.sum("__sy").over(w)

    # runtime witness that the LONG per-row products were exact (the
    # correlation.py contract): ride the assert through an output column
    ok = (F.max("__mx").over(w) < F.lit(2**31)) & (
        F.max("__my").over(w) < F.lit(2**31)
    )
    guard = F.coalesce(
        F.assert_true(
            ok,
            F.lit(
                "cuped_readout: |value| >= 2^31 breaks the exact LONG-product "
                "contract — rescale the fixed-point grid down"
            ),
        ).cast("bigint"),
        F.lit(0),
    )

    num = n_p * sxy_p - sx_p * sy_p
    den = n_p * sxx_p - sx_p * sx_p
    theta = F.when(
        den > 0, num.cast("double") / den.cast("double")
    )  # NULL on zero covariate variance / single unit
    # mirrored final expression — every operand an exact integer, every
    # op correctly rounded, shape duplicated verbatim in the SQL twin:
    #   mean_y   = sy_a / n_a
    #   mean_adj = mean_y - theta * (sx_a / n_a - sx_p / n_p)
    mean_y = F.col("__sy").cast("double") / (F.col("__n").cast("double") + guard)
    mean_x_a = F.col("__sx").cast("double") / F.col("__n").cast("double")
    mean_x_p = sx_p.cast("double") / n_p.cast("double")
    mean_adj = F.when(theta.isNull(), mean_y).otherwise(
        mean_y - theta * (mean_x_a - mean_x_p)
    )
    return per_arm.select(
        *keys,
        "arm",
        F.col("__n").cast("bigint").alias("n"),
        mean_y.alias("mean_y"),
        mean_adj.alias("mean_adj"),
        theta.alias("theta"),
    )
