"""Exact Pearson correlation — the numeric feature-selection stat.

Before a feature ships, its owner asks two questions this module answers
at corpus scale: "does it move with the label" and "is it redundant with
a feature we already have" (a correlation matrix over the candidate
set). ``F.corr`` exists but aggregates doubles — partition-order
nondeterministic and irreproducible across engines; the house contract
(cf. ``scaling.standardize``, ``agreement.chi2_association``) is exact
integer moments first, floats only at the last step:

    r = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))

with n, sx, sy, sxx, syy, sxy exact DECIMAL(38) sums over
pairwise-complete rows (both values non-NULL — the convention pandas
calls ``min_periods=1`` pairwise deletion). Every double operation's
inputs are exact integers and the expression shape is mirrored verbatim
in the SQL twin, so IEEE-754 engines agree to the last bit. Degenerate
inputs (no pairs, zero variance on either side) yield NULL, never a
division error.

Scale: ONE map-side-combined aggregate onto group-grain rows — for the
matrix form, all column pairs' moments ride the SAME aggregate (one data
pass, one tiny shuffle of group-grain partials), then a plan-time
literal pair list explodes the moments into tidy (col_x, col_y) rows.
Per-row products stay in LONG (cheap, allocation-free) under a
RUNTIME-ENFORCED |value| < 2^31 contract — a max(abs) witness per column
rides the same aggregate and a violation raises loudly before any output
row emerges (never a wrapped sum). 2^31 on the e6 ppm grid is ±2147 in
raw units; rescale the grid down for wider-ranged features. Sums in
DECIMAL(38): headroom past 10^18 rows at the contract bound.

Reference parity anchor: the reference has no statistical operators; this
extends the eval family (SURVEY §2 extensions) beside chi2_association
(categorical) with the numeric counterpart.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pearson_corr", "corr_matrix", "spearman_corr"]

_DEC = "decimal(38,0)"

_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def _check_integral(df: DataFrame, cols: Sequence[str], op: str) -> None:
    for c in cols:
        t = df.schema[c].dataType.simpleString()
        if t not in _INTEGRAL:
            raise ValueError(
                f"{op} requires integral columns (got {c}: {t}): pre-scale "
                "onto a fixed-point grid (e.g. F.floor(x * 1e6).cast('long'))"
            )


def _pair_moments(x: Column, y: Column, tag: str) -> list[Column]:
    """The six pairwise-complete moment aggregates for one (x, y) pair.

    Per-row products are computed in LONG (exact while |value| < 2^31 —
    the guard aggregates in :func:`_abs_guards` make a violation a loud
    error, never a wrapped sum) and only the running sums widen to
    DECIMAL(38): one decimal allocation per row per moment instead of a
    128-bit multiply chain — measurably less per-row garbage, which is
    what keeps this aggregate fast when the heap is busy."""
    both = x.isNotNull() & y.isNotNull()
    xl = F.when(both, x.cast("long"))
    yl = F.when(both, y.cast("long"))
    return [
        F.count(F.when(both, F.lit(1))).cast(_DEC).alias(f"__n_{tag}"),
        F.coalesce(F.sum(xl.cast(_DEC)), F.lit(0).cast(_DEC)).alias(f"__sx_{tag}"),
        F.coalesce(F.sum(yl.cast(_DEC)), F.lit(0).cast(_DEC)).alias(f"__sy_{tag}"),
        F.coalesce(
            F.sum((xl * xl).cast(_DEC)), F.lit(0).cast(_DEC)
        ).alias(f"__sxx_{tag}"),
        F.coalesce(
            F.sum((yl * yl).cast(_DEC)), F.lit(0).cast(_DEC)
        ).alias(f"__syy_{tag}"),
        F.coalesce(
            F.sum((xl * yl).cast(_DEC)), F.lit(0).cast(_DEC)
        ).alias(f"__sxy_{tag}"),
    ]


def _abs_guards(cols: Sequence[str]) -> list[Column]:
    """One max(abs(col)) aggregate per distinct column — the runtime
    witness that every value stayed under 2^31 (so the LONG products in
    :func:`_pair_moments` were exact)."""
    return [
        F.coalesce(F.max(F.abs(F.col(c).cast("long"))), F.lit(0)).alias(
            f"__mabs_{c}"
        )
        for c in cols
    ]


def _guard_col(cols: Sequence[str]) -> Column:
    """NULL when every column's witness passes; raises otherwise. Ride it
    through an output column (the intervals.py span-guard device) so
    Catalyst cannot prune it — a wrapped product can then never emerge."""
    ok = None
    for c in cols:
        this = F.col(f"__mabs_{c}") < F.lit(2 ** 31)
        ok = this if ok is None else (ok & this)
    msg = F.lit(
        "pearson correlation: |value| >= 2^31 breaks the exact LONG-product "
        f"contract for columns {list(cols)} — rescale the fixed-point grid "
        "down (the moments would wrap silently otherwise)"
    )
    return F.coalesce(F.assert_true(ok, msg).cast("bigint"), F.lit(0))


def _r_from_moments(tag: str) -> tuple[Column, Column]:
    """(n_pairs bigint, r double) from the six tagged moment columns."""
    n = F.col(f"__n_{tag}")
    sx, sy = F.col(f"__sx_{tag}"), F.col(f"__sy_{tag}")
    sxx, syy, sxy = (
        F.col(f"__sxx_{tag}"), F.col(f"__syy_{tag}"), F.col(f"__sxy_{tag}")
    )
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    num = n * sxy - sx * sy
    r = F.when(
        (vx <= 0) | (vy <= 0), F.lit(None).cast("double")
    ).otherwise(
        num.cast("double") / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
    )
    return n.cast("bigint"), r


def pearson_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    group_by: Sequence[str] = (),
    out_col: str = "pearson_r",
) -> DataFrame:
    """Per-group exact Pearson correlation of two integral columns (see
    module doc). Output: group keys + ``n_pairs`` (pairwise-complete
    count) + ``out_col`` (double in [-1, 1], NULL when degenerate)."""
    _check_integral(df, (x_col, y_col), "pearson_corr")
    keys = list(group_by)
    cols = [x_col] if x_col == y_col else [x_col, y_col]
    agg = df.groupBy(*keys).agg(
        *_pair_moments(F.col(x_col), F.col(y_col), "0"),
        *_abs_guards(cols),
    )
    n, r = _r_from_moments("0")
    return agg.select(
        *keys, (n + _guard_col(cols)).alias("n_pairs"), r.alias(out_col)
    )


def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
    *,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Tidy correlation matrix over a candidate feature set: one row per
    group x unordered column pair (i < j in the given order) with
    ``(col_x, col_y, n_pairs, pearson_r)``. ALL pairs' moments ride ONE
    map-side-combined aggregate (a single data pass); the pair expansion
    is a plan-time literal over the group-grain result, so the cost is
    O(k^2) aggregate expressions, never extra shuffles. Keep k modest
    (a 50-column candidate set = 1,275 pairs x 6 moments — fine; pick a
    narrower set before trying thousands)."""
    if len(cols) < 2:
        raise ValueError("corr_matrix: need at least two columns")
    if len(set(cols)) != len(cols):
        raise ValueError(f"corr_matrix: duplicate columns in {list(cols)}")
    _check_integral(df, cols, "corr_matrix")
    keys = list(group_by)
    pairs = [
        (i, j) for i in range(len(cols)) for j in range(len(cols)) if i < j
    ]
    aggs: list[Column] = []
    for i, j in pairs:
        aggs.extend(
            _pair_moments(F.col(cols[i]), F.col(cols[j]), f"{i}_{j}")
        )
    aggs.extend(_abs_guards(cols))
    agg = df.groupBy(*keys).agg(*aggs)
    guard = _guard_col(cols)
    structs = []
    for i, j in pairs:
        n, r = _r_from_moments(f"{i}_{j}")
        structs.append(
            F.struct(
                F.lit(cols[i]).alias("col_x"),
                F.lit(cols[j]).alias("col_y"),
                (n + guard).alias("n_pairs"),
                r.alias("pearson_r"),
            )
        )
    return (
        agg.select(*keys, F.explode(F.array(*structs)).alias("__p"))
        .select(*keys, "__p.col_x", "__p.col_y", "__p.n_pairs", "__p.pearson_r")
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    group_by: Sequence[str] = (),
    out_col: str = "spearman_rho",
) -> DataFrame:
    """Per-group exact Spearman rank correlation — the monotone-
    relationship stat (outlier-immune, scale-free): Pearson over the
    columns' average ranks. Ties get their mid-rank (the statistics
    convention), kept EXACT on a doubled integer grid: for a value with
    dense rank run [lo..hi], 2*midrank = 2*lo + ties - 1 — an integer,
    and Pearson is affine-invariant, so rho over these equals rho over
    the mid-ranks with no float rank ever materialized. The result is
    then bit-identical cross-engine like :func:`pearson_corr` (whose
    guard also bounds groups at ~2^30 rows on this grid — an exact
    all-rank Spearman beyond that wants a sampled or binned variant
    anyway).

    Rows where EITHER side is NULL are dropped BEFORE ranking (pairwise-
    complete, pandas' convention), so ranks are over the complete pairs.

    Scale: one Exchange on the group keys carries BOTH rank windows (two
    in-partition sorts), then the single corr aggregate."""
    _check_integral(df, (x_col, y_col), "spearman_corr")
    keys = list(group_by)
    x, y = F.col(x_col), F.col(y_col)
    nn = df.filter(x.isNotNull() & y.isNotNull())

    def pos2(c: Column) -> Column:
        lo = F.rank().over(
            Window.partitionBy(*[F.col(k) for k in keys]).orderBy(c.asc())
        ).cast("long")
        ties = F.count(F.lit(1)).over(
            Window.partitionBy(*[F.col(k) for k in keys], c)
        ).cast("long")
        return F.lit(2) * lo + ties - F.lit(1)

    ranked = nn.select(
        *keys, pos2(x).alias("__rx"), pos2(y).alias("__ry")
    )
    return pearson_corr(
        ranked, "__rx", "__ry", group_by=keys, out_col=out_col
    )


def acf(
    df: DataFrame,
    value_col: str,
    *,
    ts_col: str,
    order_col: str,
    max_lag: int,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Per-group autocorrelation function at lags 1..``max_lag``: the
    exact Pearson correlation of the pairs (x_t, x_{t+k}) over the
    series ordered by (``ts_col``, ``order_col``) — the correlogram
    estimator with per-pair-set means (each lag's r uses the means of
    exactly its own paired subsequences; the textbook global-mean
    variant differs only by O(k/n) edge terms and needs a separate
    global pass). Same integral-grid contract as :func:`pearson_corr`
    (|value| < 2^31, guard-asserted).

    Output: (``group_by``..., ``lag`` int, ``n_pairs`` bigint, ``acf_r``
    double in [-1, 1], NULL when degenerate). The double is IEEE-
    deterministic — exact DECIMAL moments, then one correctly-rounded
    /, *, sqrt chain — so an independent engine reproduces it bit-for-
    bit.

    Scale: ONE window sort Exchange produces every lag's lead column in
    the same pass; the explode factor is ``max_lag`` (small), then one
    (group, lag)-grain aggregate. Nothing quadratic, no self-join of the
    series."""
    if max_lag < 1:
        raise ValueError(f"acf: max_lag must be >= 1, got {max_lag}")
    _check_integral(df, (value_col,), "acf")
    keys = list(group_by)
    # a NULL timestamp has no position in the series — and engines
    # disagree on NULL sort placement (Spark asc = nulls FIRST, ANSI
    # default LAST), so rows without one must not shift anyone's lead
    df = df.filter(F.col(ts_col).isNotNull())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(ts_col).asc(), F.col(order_col).asc()
    )
    v = F.col(value_col)
    # window expressions can't appear inside a generator — materialize
    # every lead in ONE window pass, then explode plain columns
    with_leads = df.select(
        *keys, v.alias("__x0"),
        *[F.lead(v, k).over(w).alias(f"__y{k}") for k in range(1, max_lag + 1)],
    )
    pairs = F.array(*[
        F.struct(
            F.lit(k).alias("lag"),
            F.col("__x0").alias("x"),
            F.col(f"__y{k}").alias("y"),
        )
        for k in range(1, max_lag + 1)
    ])
    exploded = with_leads.select(*keys, F.explode(pairs).alias("__p")).select(
        *keys,
        F.col("__p.lag").alias("lag"),
        F.col("__p.x").alias("__x"),
        F.col("__p.y").alias("__y"),
    )
    agg = exploded.groupBy(*keys, "lag").agg(
        *_pair_moments(F.col("__x"), F.col("__y"), "0"),
        *_abs_guards(["__x"]),
    )
    n, r = _r_from_moments("0")
    return agg.select(
        *keys, "lag", (n + _guard_col(["__x"])).alias("n_pairs"),
        r.alias("acf_r"),
    )
