"""Declarative data-quality constraints over one aggregate pass.

The AWS Deequ shape (Schelter et al., VLDB 2018 — "Automating Large-Scale
Data Quality Verification", public): declare constraints, compute every
backing metric in ONE job, emit one verdict row per constraint. A 100 TB
ingest runs this between landing and curation — the contract gate that
stops a bad batch before it poisons dedup stores and feature tables.

Constraints (all metrics are exact BIGINT counts or integer
parts-per-million — no float in a verdict, so an independent engine
reproduces every row bit-for-bit):

- :func:`complete` — non-NULL fraction of a column >= min_ratio
  (ppm; empty input is vacuously complete, the Deequ convention)
- :func:`unique` — (col, ...) is a key: no fully-non-NULL row twice
  (metric = duplicate surplus; NULL-bearing rows are completeness's
  job and are excluded here, as count-distinct semantics dictate)
- :func:`min_at_least` / :func:`max_at_most` — bound violations
  (metric = number of out-of-bound rows; NULLs don't violate bounds)
- :func:`matches` — regex compliance fraction over non-NULL values
- :func:`isin` — allowed-value fraction over non-NULL values
- :func:`row_count_between` — dataset size bounds

Scale: every metric is a map-side-combinable aggregate; the whole
constraint list costs one aggregate job (count-distinct adds Spark's
expand, still one shuffle round). The verdict frame is
constraints-sized, never data-sized.

Incremental computation (Deequ §3.3's state-store analog): a 100 TB
table lands in daily batches, and re-scanning history to re-verify the
whole table is exactly what the paper's mergeable *states* avoid.
:func:`check_state` computes a per-batch state frame, :func:`merge_check_states`
folds any number of them (commutative + associative groupBy-sum), and
:func:`check_verdicts` turns a state into the same verdict rows
:func:`check_constraints` emits — so verifying N+1 batches costs one
scan of the new batch plus a merge of constraint-sized (or, for key
constraints, distinct-keys-sized) state tables. Scalar constraint state
is O(1) counters per constraint; ``unique`` state is an exact
per-key frequency table (key rendered with ``to_json``, the
FrequenciesAndNumRows analog) — the same distinct-keys footprint an
incremental dedup store already pays, never the raw data.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "complete", "unique", "min_at_least", "max_at_most", "matches",
    "isin", "row_count_between", "check_constraints",
    "check_state", "merge_check_states", "check_verdicts",
    "detect_metric_anomalies", "suggest_constraints",
    "constraints_from_suggestions", "referential_integrity",
    "column_profile", "profile_drift", "benford_audit",
]

_PPM = 1_000_000


@dataclass(frozen=True)
class _Constraint:
    kind: str
    column: str
    threshold: int  # ppm for ratio kinds; count/bound otherwise
    extra: Any = None

    def describe(self) -> str:
        return f"{self.kind}({self.column})"


def complete(column: str, min_ratio: float = 1.0) -> _Constraint:
    return _Constraint("complete", column, int(round(min_ratio * _PPM)))


def unique(*columns: str) -> _Constraint:
    if not columns:
        raise ValueError("unique: at least one column required")
    return _Constraint("unique", ",".join(columns), 0, extra=tuple(columns))


def min_at_least(column: str, bound) -> _Constraint:
    return _Constraint("min_at_least", column, 0, extra=bound)


def max_at_most(column: str, bound) -> _Constraint:
    return _Constraint("max_at_most", column, 0, extra=bound)


def matches(column: str, pattern: str, min_ratio: float = 1.0) -> _Constraint:
    return _Constraint("matches", column, int(round(min_ratio * _PPM)),
                       extra=pattern)


def isin(column: str, values: Sequence, min_ratio: float = 1.0) -> _Constraint:
    return _Constraint("isin", column, int(round(min_ratio * _PPM)),
                       extra=tuple(values))


def row_count_between(lo: int, hi: int) -> _Constraint:
    if lo > hi:
        raise ValueError(f"row_count_between: lo {lo} > hi {hi}")
    return _Constraint("row_count_between", "*", lo, extra=hi)


def _ratio_ppm(num: Column, den: Column) -> Column:
    # vacuous pass on an empty denominator (Deequ convention). DECIMAL
    # arithmetic, not `/` on bigints: the double path loses integer
    # exactness past 2^53 (num*1e6 crosses it at ~9e9 rows). The floor
    # itself goes through exact_floor_div — F.floor over Spark's decimal
    # `/` sees a HALF_UP-rounded quotient and can overshoot by one when
    # the true fraction is within 5e-7 of the next integer.
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    q = exact_floor_div(
        num.cast("decimal(38,0)") * F.lit(_PPM), den.cast("decimal(38,0)")
    )
    return F.when(den == 0, F.lit(_PPM).cast("bigint")).otherwise(q)


def check_constraints(
    df: DataFrame, constraints: Sequence[_Constraint]
) -> DataFrame:
    """Evaluate the constraint list in one aggregate pass.

    Returns one row per constraint, in declaration order:
    ``(check_id, kind, column, metric, threshold, passed)`` where
    ``metric`` is the measured value (ppm for ratio constraints, a
    violation / surplus count for bound and key constraints, the row
    count for size constraints) and ``passed`` is the verdict. Integer
    arithmetic throughout.
    """
    if not constraints:
        raise ValueError("check_constraints: empty constraint list")
    n = F.count(F.lit(1))
    aggs: list[Column] = [n.alias("__n")]
    for i, c in enumerate(constraints):
        col = F.col(c.column) if c.column != "*" else None
        if c.kind == "complete":
            aggs.append(F.count(col).alias(f"__m{i}"))
        elif c.kind == "unique":
            cols = [F.col(x) for x in c.extra]
            nonnull = F.count(
                F.when(
                    reduce(lambda a, b: a & b, [x.isNotNull() for x in cols]),
                    1,
                )
            )
            aggs.append(nonnull.alias(f"__m{i}"))
            aggs.append(F.countDistinct(*cols).alias(f"__d{i}"))
        elif c.kind == "min_at_least":
            aggs.append(
                F.coalesce(F.sum(F.when(col < F.lit(c.extra), 1)), F.lit(0))
                .alias(f"__m{i}")
            )
        elif c.kind == "max_at_most":
            aggs.append(
                F.coalesce(F.sum(F.when(col > F.lit(c.extra), 1)), F.lit(0))
                .alias(f"__m{i}")
            )
        elif c.kind == "matches":
            aggs.append(
                F.coalesce(
                    F.sum(F.when(col.rlike(c.extra), 1)), F.lit(0)
                ).alias(f"__m{i}")
            )
            aggs.append(F.count(col).alias(f"__d{i}"))
        elif c.kind == "isin":
            aggs.append(
                F.coalesce(
                    F.sum(F.when(col.isin(list(c.extra)), 1)), F.lit(0)
                ).alias(f"__m{i}")
            )
            aggs.append(F.count(col).alias(f"__d{i}"))
        elif c.kind == "row_count_between":
            pass  # __n suffices
        else:  # pragma: no cover - constructors gate the kinds
            raise ValueError(f"unknown constraint kind {c.kind!r}")

    one = df.agg(*aggs)

    rows: list[Column] = []
    for i, c in enumerate(constraints):
        m = F.col(f"__m{i}") if c.kind != "row_count_between" else F.col("__n")
        if c.kind == "complete":
            metric = _ratio_ppm(m, F.col("__n"))
            passed = metric >= F.lit(c.threshold)
        elif c.kind == "unique":
            metric = (m - F.col(f"__d{i}")).cast("bigint")
            passed = metric == 0
        elif c.kind in ("min_at_least", "max_at_most"):
            metric = m.cast("bigint")
            passed = metric == 0
        elif c.kind in ("matches", "isin"):
            metric = _ratio_ppm(m, F.col(f"__d{i}"))
            passed = metric >= F.lit(c.threshold)
        else:  # row_count_between
            metric = m.cast("bigint")
            passed = (metric >= F.lit(c.threshold)) & (metric <= F.lit(c.extra))
        rows.append(
            F.struct(
                F.lit(i).alias("check_id"),
                F.lit(c.kind).alias("kind"),
                F.lit(c.column).alias("column"),
                metric.alias("metric"),
                F.lit(int(c.threshold)).cast("bigint").alias("threshold"),
                passed.alias("passed"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("__c")).select("__c.*")


def check_state(df: DataFrame, constraints: Sequence[_Constraint]) -> DataFrame:
    """Compute this batch's mergeable constraint state.

    Returns ``(check_id, kind, column, fp, n, m, d)``: one counter row
    (``fp`` NULL) per constraint — ``n`` the row/denominator count,
    ``m`` the metric numerator (non-NULL / matched / in-set / violation
    count), ``d`` the non-NULL denominator for ``matches``/``isin`` —
    plus, for each ``unique`` constraint, one exact frequency row per
    distinct fully-non-NULL key (``fp`` = ``to_json`` of the key tuple,
    ``m`` = its occurrence count). Every field is additive, so states
    from disjoint batches merge by summation; the counter row doubles as
    a seed so a constraint whose batch had no qualifying rows still
    yields a verdict. One aggregate job for the counters plus one
    distinct-keys-sized groupBy per ``unique`` constraint.
    """
    if not constraints:
        raise ValueError("check_state: empty constraint list")
    n = F.count(F.lit(1))
    aggs: list[Column] = [n.alias("__n")]
    for i, c in enumerate(constraints):
        col = F.col(c.column) if c.column != "*" else None
        if c.kind == "complete":
            aggs.append(F.count(col).alias(f"__m{i}"))
        elif c.kind == "min_at_least":
            aggs.append(
                F.coalesce(F.sum(F.when(col < F.lit(c.extra), 1)), F.lit(0))
                .alias(f"__m{i}")
            )
        elif c.kind == "max_at_most":
            aggs.append(
                F.coalesce(F.sum(F.when(col > F.lit(c.extra), 1)), F.lit(0))
                .alias(f"__m{i}")
            )
        elif c.kind == "matches":
            aggs.append(
                F.coalesce(
                    F.sum(F.when(col.rlike(c.extra), 1)), F.lit(0)
                ).alias(f"__m{i}")
            )
            aggs.append(F.count(col).alias(f"__d{i}"))
        elif c.kind == "isin":
            aggs.append(
                F.coalesce(
                    F.sum(F.when(col.isin(list(c.extra)), 1)), F.lit(0)
                ).alias(f"__m{i}")
            )
            aggs.append(F.count(col).alias(f"__d{i}"))
        # unique / row_count_between: __n and the frequency rows suffice

    one = df.agg(*aggs)
    zero = F.lit(0).cast("bigint")
    rows: list[Column] = []
    for i, c in enumerate(constraints):
        if c.kind == "complete":
            nn, mm, dd = F.col("__n"), F.col(f"__m{i}"), zero
        elif c.kind in ("min_at_least", "max_at_most"):
            nn, mm, dd = zero, F.col(f"__m{i}"), zero
        elif c.kind in ("matches", "isin"):
            nn, mm, dd = zero, F.col(f"__m{i}"), F.col(f"__d{i}")
        elif c.kind == "row_count_between":
            nn, mm, dd = F.col("__n"), zero, zero
        else:  # unique: seed-only counter row; frequencies carry the data
            nn, mm, dd = zero, zero, zero
        rows.append(
            F.struct(
                F.lit(i).alias("check_id"),
                F.lit(c.kind).alias("kind"),
                F.lit(c.column).alias("column"),
                F.lit(None).cast("string").alias("fp"),
                nn.cast("bigint").alias("n"),
                mm.cast("bigint").alias("m"),
                dd.cast("bigint").alias("d"),
            )
        )
    state = one.select(F.explode(F.array(*rows)).alias("__c")).select("__c.*")

    for i, c in enumerate(constraints):
        if c.kind != "unique":
            continue
        cols = [F.col(x) for x in c.extra]
        nonnull = reduce(lambda a, b: a & b, [x.isNotNull() for x in cols])
        freq = (
            df.filter(nonnull)
            .groupBy(
                F.to_json(
                    F.struct(*[F.col(x).alias(x) for x in c.extra])
                ).alias("fp")
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
            .select(
                F.lit(i).alias("check_id"),
                F.lit(c.kind).alias("kind"),
                F.lit(c.column).alias("column"),
                F.col("fp"),
                F.lit(0).cast("bigint").alias("n"),
                F.col("m"),
                F.lit(0).cast("bigint").alias("d"),
            )
        )
        state = state.unionByName(freq)
    return state


def merge_check_states(*states: DataFrame) -> DataFrame:
    """Fold any number of batch states into one (commutative, associative).

    Pure groupBy-sum on ``(check_id, kind, column, fp)`` — counter rows
    (NULL ``fp``) collapse to one summed row per constraint; ``unique``
    frequency rows collapse per key. Merging merged states is the same
    operation, so a lineage of daily states folds in any tree shape.
    """
    if not states:
        raise ValueError("merge_check_states: no states given")
    u = reduce(DataFrame.unionByName, states)
    return u.groupBy("check_id", "kind", "column", "fp").agg(
        F.sum("n").alias("n"), F.sum("m").alias("m"), F.sum("d").alias("d")
    )


def check_verdicts(
    state: DataFrame, constraints: Sequence[_Constraint]
) -> DataFrame:
    """Turn a (possibly merged) state into verdict rows.

    ``constraints`` must be the same list (same order) the states were
    computed with — thresholds/bounds live in the plan, never the state.
    Output schema and semantics match :func:`check_constraints`
    exactly: ``(check_id, kind, column, metric, threshold, passed)``;
    the invariant ``check_verdicts(check_state(df, cs), cs) ≡
    check_constraints(df, cs)`` is property-tested. For ``unique``,
    surplus = Σ key counts − number of DISTINCT keys (``sum(m) −
    count(distinct fp)``) — distinct, not a row count, so a raw
    ``unionByName`` of per-batch states (where the same key appears in
    several states' frequency rows) verdicts identically to the
    :func:`merge_check_states` output; every other kind already sums
    correctly over raw unions.
    """
    if not constraints:
        raise ValueError("check_verdicts: empty constraint list")
    g = state.groupBy("check_id", "kind", "column").agg(
        F.sum("n").alias("__n"),
        F.sum("m").alias("__m"),
        F.sum("d").alias("__d"),
        F.count_distinct(F.col("fp")).alias("__k"),
    )
    metric_w: Column | None = None
    thr_w: Column | None = None
    pass_w: Column | None = None
    for i, c in enumerate(constraints):
        cond = F.col("check_id") == F.lit(i)
        if c.kind == "complete":
            m_i = _ratio_ppm(F.col("__m"), F.col("__n"))
            p_i = m_i >= F.lit(c.threshold)
        elif c.kind == "unique":
            m_i = (F.col("__m") - F.col("__k")).cast("bigint")
            p_i = m_i == 0
        elif c.kind in ("min_at_least", "max_at_most"):
            m_i = F.col("__m").cast("bigint")
            p_i = m_i == 0
        elif c.kind in ("matches", "isin"):
            m_i = _ratio_ppm(F.col("__m"), F.col("__d"))
            p_i = m_i >= F.lit(c.threshold)
        else:  # row_count_between
            m_i = F.col("__n").cast("bigint")
            p_i = (m_i >= F.lit(c.threshold)) & (m_i <= F.lit(c.extra))
        t_i = F.lit(int(c.threshold)).cast("bigint")
        metric_w = F.when(cond, m_i) if metric_w is None else metric_w.when(cond, m_i)
        thr_w = F.when(cond, t_i) if thr_w is None else thr_w.when(cond, t_i)
        pass_w = F.when(cond, p_i) if pass_w is None else pass_w.when(cond, p_i)
    return (
        g.select(
            F.col("check_id"),
            F.col("kind"),
            F.col("column"),
            metric_w.alias("metric"),
            thr_w.alias("threshold"),
            pass_w.alias("passed"),
        )
        .orderBy("check_id")
    )


def detect_metric_anomalies(
    history: DataFrame,
    *,
    order_col: str = "batch_id",
    rel_max_change_ppm: int | None = None,
    abs_lo: int | None = None,
    abs_hi: int | None = None,
) -> DataFrame:
    """Flag anomalous batches in a constraint-metric history.

    Deequ's anomaly-detection pillar (Schelter et al. VLDB 2018 §3.4:
    verdicts on *this* batch aren't enough — a metric can pass its static
    threshold while silently drifting): ``history`` holds one row per
    (batch, constraint) — ``(order_col, check_id, kind, column,
    metric)``, the natural product of tagging per-batch
    :func:`check_verdicts` output with an ingest id — and each metric is
    compared against its own series.

    Strategies (integer-exact, combinable; a row is ``anomalous`` when
    any enabled strategy fires):

    - relative rate of change (``rel_max_change_ppm``): ``change_ppm`` =
      floor(|metric − prev| · 1e6 / |prev|) in DECIMAL, fires when it
      exceeds the cap. The first batch of a series has no ``prev`` and
      never fires; a zero ``prev`` fires iff the metric moved off zero
      (``change_ppm`` is NULL in both edge cases).
    - absolute bounds (``abs_lo`` / ``abs_hi``): metric outside
      [lo, hi] fires regardless of history.

    Output: history columns + ``(prev_metric, change_ppm, anomalous)``,
    one row per input row. Plan: a single lag window partitioned by
    (check_id, kind, column) — the history frame is batches ×
    constraints, never data-sized, so this runs on a 10-year ingest
    ledger without a second scan of any data.
    """
    from pyspark.sql import Window

    if rel_max_change_ppm is None and abs_lo is None and abs_hi is None:
        raise ValueError(
            "detect_metric_anomalies: enable at least one strategy"
        )
    w = (
        Window.partitionBy("check_id", "kind", "column")
        .orderBy(F.col(order_col).asc())
    )
    prev = F.lag("metric").over(w)
    from funcify_feature_eng_spark.operators.util import exact_floor_div

    change = F.when(
        prev.isNotNull() & (prev != 0),
        exact_floor_div(
            F.abs(F.col("metric") - prev).cast("decimal(38,0)")
            * F.lit(_PPM),
            F.abs(prev).cast("decimal(38,0)"),
        ),
    )
    fired = F.lit(False)
    if rel_max_change_ppm is not None:
        rel = F.when(prev.isNull(), F.lit(False)).when(
            prev == 0, F.col("metric") != 0
        ).otherwise(F.col("change_ppm") > F.lit(int(rel_max_change_ppm)))
        fired = fired | rel
    if abs_lo is not None:
        fired = fired | (F.col("metric") < F.lit(int(abs_lo)))
    if abs_hi is not None:
        fired = fired | (F.col("metric") > F.lit(int(abs_hi)))
    return (
        history.withColumn("prev_metric", prev)
        .withColumn("change_ppm", change)
        .withColumn("anomalous", fired)
    )


def suggest_constraints(
    df: DataFrame,
    *,
    columns: Sequence[str] | None = None,
    low_card_max: int = 10,
) -> DataFrame:
    """Profile the frame and emit suggested constraints (Deequ §4's
    constraint-suggestion analog: don't ask the pipeline owner to write
    the contract from scratch — derive a candidate contract from the
    data's observed shape, then let them tighten it).

    One aggregate pass computes per-column non-NULL and exact distinct
    counts plus numeric min/max; ALL string columns whose cardinality is
    within ``low_card_max`` share one combined follow-up aggregate that
    fetches every value set in a single second pass (Deequ's two-phase
    profile — never one scan per column). The 1-row profile and the
    ≤ ``low_card_max`` value sets are the only driver-side collects —
    both constraints-sized, never data-sized.

    Rules (deterministic; rendered so :func:`constraints_from_suggestions`
    can replay them as a real :func:`check_constraints` list):

    - every column: ``complete`` at the observed ppm floor
    - ``unique`` when distinct == non-NULL count > 0
    - ``isin`` for strings with 1 <= distinct <= ``low_card_max``
      (``param_str`` = compact-JSON sorted value list)
    - ``min_at_least`` / ``max_at_most`` for numeric columns
      (``param_num`` = observed bound as double; integer bounds beyond
      2^53 would lose exactness — tighten by hand at that magnitude)

    Output: ``(column, kind, param_num, param_str, observed)`` where
    ``observed`` is the backing metric (ppm for complete, distinct count
    for unique/isin, NULL for bounds).
    """
    import json

    if low_card_max < 1:
        raise ValueError("suggest_constraints: low_card_max must be >= 1")
    cols = list(columns) if columns is not None else list(df.columns)
    schema = {f.name: f.dataType for f in df.schema.fields}
    for c in cols:
        if c not in schema:
            raise ValueError(f"suggest_constraints: unknown column {c!r}")
    from pyspark.sql import types as T

    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__c{i}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__d{i}"))
        if isinstance(schema[c], T.NumericType):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__lo{i}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__hi{i}"))
    prof = df.agg(*aggs).head()

    n = prof["__n"]
    # ONE combined follow-up aggregate for every low-cardinality string
    # column (the Deequ two-phase shape): a per-column df.agg loop would
    # re-scan the whole table once per suggested isin
    low_card = [
        c for i, c in enumerate(cols)
        if isinstance(schema[c], T.StringType)
        and 1 <= prof[f"__d{i}"] <= low_card_max
    ]
    value_sets: dict[str, list] = {}
    if low_card:
        vrow = df.agg(
            *[
                F.sort_array(F.collect_set(F.col(c))).alias(f"__v{j}")
                for j, c in enumerate(low_card)
            ]
        ).head()
        value_sets = {c: vrow[f"__v{j}"] for j, c in enumerate(low_card)}
    out: list[tuple] = []
    for i, c in enumerate(cols):
        nonnull, distinct = prof[f"__c{i}"], prof[f"__d{i}"]
        ppm = _PPM if n == 0 else (nonnull * _PPM) // n
        out.append((c, "complete", None, None, ppm))
        if nonnull > 0 and distinct == nonnull:
            out.append((c, "unique", None, None, distinct))
        if c in value_sets:
            out.append((
                c, "isin", None,
                json.dumps(list(value_sets[c]), separators=(",", ":")),
                distinct,
            ))
        if isinstance(schema[c], T.NumericType) and nonnull > 0:
            out.append((c, "min_at_least", float(prof[f"__lo{i}"]), None, None))
            out.append((c, "max_at_most", float(prof[f"__hi{i}"]), None, None))
    spark = df.sparkSession
    return spark.createDataFrame(
        out,
        "column string, kind string, param_num double, param_str string,"
        " observed bigint",
    )


def constraints_from_suggestions(rows: Sequence) -> list[_Constraint]:
    """Replay collected :func:`suggest_constraints` rows as constraints.

    The round trip ``check_constraints(df,
    constraints_from_suggestions(suggest_constraints(df).collect()))``
    passes by construction on the profiled frame — the suggested
    contract is the loosest one the data satisfies.
    """
    import json

    out: list[_Constraint] = []
    for r in rows:
        kind, col = r["kind"], r["column"]
        if kind == "complete":
            out.append(_Constraint("complete", col, int(r["observed"])))
        elif kind == "unique":
            out.append(unique(col))
        elif kind == "isin":
            out.append(isin(col, json.loads(r["param_str"]), 1.0))
        elif kind == "min_at_least":
            out.append(min_at_least(col, r["param_num"]))
        elif kind == "max_at_most":
            out.append(max_at_most(col, r["param_num"]))
        else:
            raise ValueError(f"unknown suggestion kind {kind!r}")
    return out


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    *,
    on: Sequence[tuple[str, str]] | Sequence[str],
    relation: str = "child->parent",
) -> DataFrame:
    """Foreign-key containment: how many child rows point at no parent.

    The dbt `relationships` / Deequ-style integrity test as one
    left-anti semi-join: ``on`` is either shared column names or
    (child_col, parent_col) pairs. Child rows with any NULL key column
    are excluded (NULL FKs are completeness's job). Output: one row
    ``(relation, n_child, n_checked, n_orphans, ok)`` — BIGINT counts.

    Scale: the anti-join shuffles on the key like any equi-join; the
    parent side is deduplicated to distinct keys first, so a 10^12-row
    child checks against a keys-sized build side, broadcastable when the
    parent key set is small.
    """
    pairs = [
        (p, p) if isinstance(p, str) else (p[0], p[1]) for p in on
    ]
    if not pairs:
        raise ValueError("referential_integrity: empty key list")
    ckeys = [c for c, _ in pairs]
    pkeys = [p for _, p in pairs]
    nonnull = reduce(
        lambda a, b: a & b, [F.col(c).isNotNull() for c in ckeys]
    )
    checked = child.select(*ckeys).filter(nonnull)
    parent_keys = parent.select(
        *[F.col(p).alias(c) for c, p in pairs]
    ).dropDuplicates(ckeys)
    orphans = checked.join(parent_keys, on=ckeys, how="left_anti")
    # n_child and n_checked come from ONE aggregate over the child (a
    # separate count per subplan would scan the table twice more)
    counts = child.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_child"),
        F.coalesce(F.sum(F.when(nonnull, 1)), F.lit(0))
        .cast("bigint").alias("n_checked"),
    )
    orph = orphans.agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
    out = counts.crossJoin(orph)
    return out.select(
        F.lit(relation).alias("relation"),
        "n_child", "n_checked", "n_orphans",
        (F.col("n_orphans") == 0).alias("ok"),
    )


def column_profile(
    df: DataFrame,
    *,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Per-column shape profile as a small DataFrame — the distributed,
    value-gateable sibling of :func:`suggest_constraints` (which collects
    a 1-row profile to render contract suggestions; this one stays on the
    cluster so two epochs' profiles can be joined by
    :func:`profile_drift`).

    One aggregate pass over the data (count + per-column non-NULL count +
    exact distinct), then an unpivot of the single profile row into
    ``(column, n_rows, n_nonnull, n_distinct, null_ppm)`` — the unpivot is
    a stack over a 1-row frame, so the whole thing is one job with a
    1-row shuffle-free tail. ``null_ppm`` is the exact floor ppm of NULLs
    over all rows (0 when the frame is empty: no rows, no nulls).

    At 100 TB: exact count-distinct per column expands to one
    partial-aggregate pass per column under Spark's expand; for profile
    MONITORING at that scale swap in approx_count_distinct — drift
    detection tolerates sketch error, the contract gate here prefers
    exactness (and is what an independent engine can reproduce).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    schema = {f.name for f in df.schema.fields}
    for c in cols:
        if c not in schema:
            raise ValueError(f"column_profile: unknown column {c!r}")
    if not cols:
        raise ValueError("column_profile: no columns")
    aggs: list[Column] = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).cast("bigint").alias(f"__c{i}"))
        aggs.append(F.count_distinct(F.col(c)).cast("bigint").alias(f"__d{i}"))
    prof = df.agg(*aggs)
    stack_args: list[Column] = []
    for i, c in enumerate(cols):
        stack_args += [
            F.lit(c),
            F.col(f"__c{i}"),
            F.col(f"__d{i}"),
        ]
    unp = prof.select(
        F.col("__n").alias("n_rows"),
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("column", "n_nonnull", "n_distinct"),
    )
    return unp.select(
        "column",
        "n_rows",
        "n_nonnull",
        "n_distinct",
        # LONG `div` keeps the ppm exact (long `/` is double — drifts past
        # 2^53); (n_rows · 1e6) fits LONG to ~9e12 rows
        F.when(F.col("n_rows") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.expr(f"((n_rows - n_nonnull) * {_PPM}) div n_rows")
        )
        .cast("bigint")
        .alias("null_ppm"),
    )


def profile_drift(base: DataFrame, cur: DataFrame) -> DataFrame:
    """Schema/profile drift between two epochs of the same table — the
    data-contract diff: which columns appeared or vanished, whose
    nullability moved, whose cardinality grew or collapsed. The companion
    to the DISTRIBUTION drift family (drift.py TVD, KS/MW shift tests):
    those watch a value column's shape; this watches the table's contract.

    Inputs are two :func:`column_profile` outputs (base epoch, current
    epoch). Output, one row per column in either profile::

        (column, status, n_rows_base, n_rows_cur,
         null_ppm_base, null_ppm_cur, null_ppm_delta,
         n_distinct_base, n_distinct_cur, distinct_ratio_ppm)

    ``status`` ∈ added | dropped | kept; ``null_ppm_delta`` = cur − base
    (kept rows only); ``distinct_ratio_ppm`` = floor(distinct_cur · 1e6 /
    distinct_base), NULL when base distinct is 0 or the column isn't kept
    — >1e6 means cardinality grew. Deterministic, integer-exact, and a
    pure 2-sided outer join of two constraints-sized frames (profiles are
    O(columns) rows — the join is trivially broadcast).
    """
    b = base.select(
        F.col("column"),
        F.col("n_rows").alias("n_rows_base"),
        F.col("n_nonnull").alias("n_nonnull_base"),
        F.col("n_distinct").alias("n_distinct_base"),
        F.col("null_ppm").alias("null_ppm_base"),
    )
    c = cur.select(
        F.col("column"),
        F.col("n_rows").alias("n_rows_cur"),
        F.col("n_nonnull").alias("n_nonnull_cur"),
        F.col("n_distinct").alias("n_distinct_cur"),
        F.col("null_ppm").alias("null_ppm_cur"),
    )
    j = b.join(c, on="column", how="full_outer")
    kept = F.col("n_rows_base").isNotNull() & F.col("n_rows_cur").isNotNull()
    return j.select(
        "column",
        F.when(kept, F.lit("kept"))
        .when(F.col("n_rows_base").isNull(), F.lit("added"))
        .otherwise(F.lit("dropped"))
        .alias("status"),
        "n_rows_base",
        "n_rows_cur",
        "null_ppm_base",
        "null_ppm_cur",
        F.when(kept, F.col("null_ppm_cur") - F.col("null_ppm_base")).alias(
            "null_ppm_delta"
        ),
        "n_distinct_base",
        "n_distinct_cur",
        F.when(
            kept & (F.col("n_distinct_base") > 0),
            F.expr(f"(n_distinct_cur * {_PPM}) div n_distinct_base"),
        )
        .cast("bigint")
        .alias("distinct_ratio_ppm"),
    )


# log10(1 + 1/d) in parts-per-million, pinned as literals so NEITHER
# engine evaluates a logarithm — the same constants appear verbatim in
# any oracle replaying the audit
BENFORD_FIRST_DIGIT_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_audit(
    df: DataFrame,
    value_col: str,
    *,
    scale: int = 2,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    fraud/synthetic-data screen for naturally-occurring amounts
    (prices, durations, counts). Emits one row per (``group_by``...,
    ``digit``) with exact ``n``, total ``n_total``, floor-ppm
    ``observed_ppm``, the pinned Benford ``expected_ppm``, and
    ``delta_ppm`` = observed - expected.

    Exactness: the value lands on a 10^-scale DECIMAL grid, scales to
    integer units, and the first digit is the first character of the
    integer's decimal string — no log10, no float anywhere (the Benford
    expectations themselves are pinned literal constants,
    ``BENFORD_FIRST_DIGIT_PPM``). Non-positive and NULL values are
    excluded (Benford is defined on positive magnitudes).

    Scale: one digit-grain aggregate (≤ 9 rows per group) + a window to
    attach the group total — nothing row-grain ever shuffles twice."""
    dec = f"decimal(28,{scale})"
    units = (F.col(value_col).cast(dec) * F.lit(10**scale)).cast("decimal(38,0)")
    digit = F.substring(units.cast("string"), 1, 1).cast("int")
    from pyspark.sql import Window

    keys = list(group_by)
    counted = (
        df.filter(F.col(value_col).isNotNull() & (units > 0))
        .select(*keys, digit.alias("digit"))
        .groupBy(*keys, "digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wn = Window.partitionBy(*[F.col(k) for k in keys])
    expected = F.create_map(
        *[F.lit(x) for kv in BENFORD_FIRST_DIGIT_PPM.items() for x in kv]
    )
    return (
        counted.withColumn("n_total", F.sum("n").over(wn).cast("bigint"))
        .withColumn(
            "observed_ppm",
            _ratio_ppm(F.col("n"), F.col("n_total")).cast("bigint"),
        )
        .withColumn(
            "expected_ppm", expected[F.col("digit")].cast("bigint")
        )
        .withColumn(
            "delta_ppm", (F.col("observed_ppm") - F.col("expected_ppm")).cast("bigint")
        )
    )
